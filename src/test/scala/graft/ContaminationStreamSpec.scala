package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime

import graft.streaming.{ContaminationStream, EventStream}
import org.apache.spark.sql.functions._

/** Stream == batch parity for the contamination filter: the stateless
  * stream-static gram semi-join must flag exactly the x108 doc set,
  * with identical hit counts, across micro-batch boundaries. */
class ContaminationStreamSpec extends SparkSpec {

  private val replayDir = "/tmp/graft-contam-replay"

  private def writeReplay(): (Long, org.apache.spark.sql.types.StructType) = {
    val docs = Catalog.load(spark, sf0001, "documents")
      .where(col("source") =!= "src0")
    val n = docs.count()
    new java.io.File(replayDir).mkdirs()
    new java.io.File(replayDir).listFiles().foreach(_.delete())
    val t0 = System.currentTimeMillis()
    (0 until 3).foreach { i =>
      val tmp = s"$replayDir-tmp$i"
      docs.where(pmod(col("doc_id"), lit(3)) === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = Paths.get(replayDir, s"d$i.parquet")
      Files.copy(part.toPath, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(t0 + i * 10000L))
    }
    (n, docs.schema)
  }

  test("streaming contamination hits == batch x108 semantics per doc") {
    val (_, schema) = writeReplay()
    val docs = Catalog.load(spark, sf0001, "documents")
    val bench = ContaminationStream
      .benchmarkGrams(docs.where(col("source") === "src0")).cache()
    assert(bench.count() > 0)

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .parquet(replayDir)
    EventStream.drainToMemory(spark,
      ContaminationStream.contaminationHits(stream, bench), "contam", "update")
    // update mode may emit a doc several times; counts are monotone
    val got = spark.table("contam").groupBy("doc_id", "source")
      .agg(max("n_hits").as("n_hits"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap

    // batch expectation: x108's doc set, with per-doc shared-gram counts
    val want = ContaminationStream.contaminationHits(
        docs.where(col("source") =!= "src0"), bench)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(want.nonEmpty, "corpus precondition: some contaminated docs")
    assert(got === want)

    // and the per-source rollup equals the x108 contract query itself
    val x108 = Catalog.sql(spark, sf0001, Queries.sparkSql("x108_contamination"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rolled = want.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(rolled === x108)
    bench.unpersist()
  }
}
