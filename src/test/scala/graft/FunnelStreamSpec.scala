package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime
import org.apache.spark.sql.functions._
import graft.streaming.EventStream

/** Stream-batch parity for the stateful funnel: on a time-ordered
  * bounded replay, the greedy per-user state machine must land on
  * exactly the batch x138 triple (each stage's first qualifying event
  * in time order IS its global minimum). */
class FunnelStreamSpec extends SparkSpec {

  private val replayDir = "/tmp/graft-funnel-replay"

  /** Write events as three single-file time-ordered batches with
    * strictly increasing mod times — the file source replays them as
    * three micro-batches under maxFilesPerTrigger=1. Cut points are
    * taken from the BATCH funnel itself (just before the latest user's
    * t2 and t3), guaranteeing stage transitions straddle micro-batch
    * boundaries — ts terciles don't: the sf0.001 corpus completes every
    * funnel in its first third. Returns the first cut in µs. */
  private def writeReplay(): Long = {
    val events = Catalog.load(spark, sf0001, "events")
    val Array(c1, c2) = SparkEntry.queries("x138_funnel")(spark, sf0001)
      .selectExpr("max(unix_micros(t2)) AS m2", "max(unix_micros(t3)) AS m3")
      .head() match { case r => Array(r.getLong(0) - 1, r.getLong(1) - 1) }
    new java.io.File(replayDir).mkdirs()
    new java.io.File(replayDir).listFiles().foreach(_.delete())
    val t0 = System.currentTimeMillis()
    // c2 can land before c1 when the latest t3 belongs to an earlier
    // funnel than the latest t2 — an empty middle batch is fine, an
    // inverted range is not
    val c2g = math.max(c2, c1 + 1)
    val bounds = Seq((Long.MinValue, c1), (c1, c2g), (c2g, Long.MaxValue))
    bounds.zipWithIndex.foreach { case ((lo, hi), i) =>
      val tmp = s"$replayDir-tmp$i"
      events.where(expr(s"unix_micros(ts) > $lo AND unix_micros(ts) <= $hi"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = Paths.get(replayDir, s"e$i.parquet")
      Files.copy(part.toPath, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(t0 + i * 10000L))
    }
    c1
  }

  test("streaming funnel == batch x138 over 3 time-ordered micro-batches") {
    val cut1us = writeReplay()
    val events = Catalog.load(spark, sf0001, "events")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet")
      .parquet(replayDir)
    EventStream.drainToMemory(spark, EventStream.funnel(stream),
      "funnelS", mode = "update")
    // stages only ever transition MinValue -> fixed value, so max() over
    // the per-batch update rows is the final state per user
    val got = spark.table("funnelS").groupBy("user_id")
      .agg(max("t1us").as("t1us"), max("t2us").as("t2us"),
        max("t3us").as("t3us"), max("depth").as("depth"))
      .where(col("t1us") =!= Long.MinValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSeq.sortBy(_._1)
    val U = Long.MinValue
    val want = SparkEntry.queries("x138_funnel")(spark, sf0001)
      .selectExpr("user_id", "unix_micros(t1)",
        "coalesce(unix_micros(t2), " + U + "L)",
        "coalesce(unix_micros(t3), " + U + "L)", "cast(depth AS INT)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getInt(4))).toSeq.sortBy(_._1)
    assert(got == want, s"stream funnel != batch x138")
    // cross-batch precondition: some user must REACH a later stage after
    // the first batch boundary with t1 set before it — otherwise this
    // proved nothing about state carrying across micro-batches
    val straddlers = want.count { case (_, t1, t2, _, d) =>
      d >= 2 && t1 <= cut1us && t2 > cut1us }
    assert(straddlers > 0,
      "corpus precondition: a funnel transition must straddle micro-batches")
  }
}
