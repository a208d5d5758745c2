package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime

import graft.streaming.{EventStream, PsiDriftStream}
import org.apache.spark.sql.functions._

/** Stream == batch parity for the PSI drift monitor: the stateful
  * (event_type, bin) histogram folded across micro-batch boundaries
  * must equal the batch histogram EXACTLY (integer counts), and the
  * PSI pass over it must reproduce x313's per-type score and drift
  * flag on the same halves split. */
class PsiDriftStreamSpec extends SparkSpec {

  private val replayDir = "/tmp/graft-psi-replay"

  test("streaming PSI == batch x313 on the halves split (counts exact, micro-PSI equal)") {
    val events = Catalog.load(spark, sf0001, "events")
    val cut = events.agg(date_add(min(to_date(col("ts"))), 15)).head.getDate(0)
    val ref = events.where(to_date(col("ts")) <= lit(cut))
    val cur = events.where(to_date(col("ts")) > lit(cut))
    assert(ref.count() > 0 && cur.count() > 0, "halves split precondition")

    val refHist = PsiDriftStream.referenceHist(ref).cache()

    // replay the second half as a 3-file stream
    val curFiles = cur.select("event_id", "event_type", "value")
    new java.io.File(replayDir).mkdirs()
    new java.io.File(replayDir).listFiles().foreach(_.delete())
    val t0 = System.currentTimeMillis()
    (0 until 3).foreach { i =>
      val tmp = s"$replayDir-tmp$i"
      curFiles.where(pmod(col("event_id"), lit(3)) === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = Paths.get(replayDir, s"e$i.parquet")
      Files.copy(part.toPath, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(t0 + i * 10000L))
    }
    val stream = spark.readStream.schema(curFiles.schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .parquet(replayDir)
    EventStream.drainToMemory(spark,
      PsiDriftStream.currentHist(stream), "psihist", "complete")

    // the drained state is the exact second-half histogram
    val got = spark.table("psihist")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = PsiDriftStream.currentHist(cur)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(want.nonEmpty && got === want,
      "stream-folded histogram must equal the batch histogram exactly")

    // and the PSI pass over it reproduces x313 per event type
    def score(r: org.apache.spark.sql.Row) =
      (r.getDouble(1), r.getAs[Number](2).longValue, r.getAs[Number](3).longValue)
    val mine = PsiDriftStream.psi(spark.table("psihist"), refHist)
      .collect().map(r => r.getString(0) -> score(r)).toMap
    val x313 = Catalog.sql(spark, sf0001, Queries.sparkSql("x313_temporal_psi"))
      .collect().map(r => r.getString(0) -> score(r)).toMap
    assert(mine.keySet == x313.keySet)
    x313.foreach { case (ty, (psi, micro, flag)) =>
      assert(mine(ty)._2 == micro && mine(ty)._3 == flag && mine(ty)._1 == psi,
        s"$ty: stream PSI ${mine(ty)} vs x313 ($psi, $micro, $flag)")
    }
    refHist.unpersist()
  }

  test("planted fixtures: identical distribution scores exactly zero; a shifted one trips the flag") {
    import spark.implicits._
    // uniform reference: 10 bins x 100 events
    val ref = (0 until 10).flatMap(b => Seq.fill(100)(("a", b * 100.0 + 1.0)))
      .toDF("event_type", "value")
    val same = PsiDriftStream.psi(
      PsiDriftStream.currentHist(ref), PsiDriftStream.referenceHist(ref))
      .collect().map(r => (r.getDouble(1), r.getLong(2), r.getLong(3))).head
    // p == q per bin makes every PSI term EXACTLY (p-q)ln(p/q) = 0
    assert(same == ((0.0, 0L, 0L)), s"identical halves must score zero: $same")

    // all mass collapses into bin 9: a textbook significant shift
    val shifted = Seq.fill(1000)(("a", 950.0)).toDF("event_type", "value")
    val drift = PsiDriftStream.psi(
      PsiDriftStream.currentHist(shifted), PsiDriftStream.referenceHist(ref))
      .collect().map(r => (r.getDouble(1), r.getLong(2), r.getLong(3))).head
    assert(drift._3 == 1L && drift._2 > 200000L,
      s"bin-collapse must trip the 0.2 micro-PSI flag: $drift")
  }
}
