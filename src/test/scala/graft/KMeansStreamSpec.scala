package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming mini-batch k-means (§2.9 set): the stream replay must fold
  * to EXACTLY the state a direct sequential fold of the same ordered
  * batches produces — integer arithmetic leaves no tolerance. */
class KMeansStreamSpec extends SparkSpec {

  private def writeReplay(df: DataFrame, dir: String, n: Int): Unit = {
    val d = new java.io.File(dir)
    if (d.exists()) new scala.reflect.io.Directory(d).deleteRecursively()
    d.mkdirs()
    val t0 = System.currentTimeMillis()
    (0 until n).foreach { i =>
      val tmp = s"$dir-tmp$i"
      df.where(pmod(col("vec_id"), lit(n.toLong)) === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = Paths.get(dir, s"b$i.parquet")
      Files.copy(part.toPath, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(t0 + i * 10000L))
      new scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }

  test("stream replay folds to the exact state of a direct sequential fold") {
    val vecs = Catalog.load(spark, sf0001, "embeddings")
      .select("vec_id", "embedding")
    val dir = "/tmp/graft-kmeans-stream-spec"
    writeReplay(vecs, dir, 4)

    val streamed = streaming.KMeansStream.drain(spark,
      spark.readStream.schema(vecs.schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(dir))

    val direct = new streaming.MiniBatchKMeans(8, 64)
    (0 until 4).foreach { i =>
      direct.applyBatch(spark,
        vecs.where(pmod(col("vec_id"), lit(4L)) === i), i.toLong)
    }

    assert(streamed.centroids == direct.centroids,
      "stream replay and direct fold must land bit-identical centroids")
    assert(streamed.stats.map(s => (s.n, s.inertia, s.movedComponents)) ==
      direct.stats.map(s => (s.n, s.inertia, s.movedComponents)))
    // every non-seed vector folded exactly once
    val total = vecs.count() - 8
    assert(streamed.stats.map(_.n).sum == total)
    // driver state is index-sized: k × dims centroid components
    assert(streamed.centroids.size == 8 * 64)
  }

  test("an empty first batch is a recorded no-op; seeding waits for data") {
    val vecs = Catalog.load(spark, sf0001, "embeddings")
      .select("vec_id", "embedding")
    val withEmpty = new streaming.MiniBatchKMeans(8, 64)
    withEmpty.applyBatch(spark, vecs.where(org.apache.spark.sql.functions.lit(false)), 0L)
    assert(withEmpty.centroids.isEmpty, "an empty batch must not seed")
    assert(withEmpty.stats == Seq(withEmpty.BatchStat(0L, 0L, 0L, 0L)))
    withEmpty.applyBatch(spark, vecs, 1L)
    val direct = new streaming.MiniBatchKMeans(8, 64)
    direct.applyBatch(spark, vecs, 0L)
    assert(withEmpty.centroids == direct.centroids,
      "a leading empty batch must not change where the fold lands")
  }
}
