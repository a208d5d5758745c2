package graft

import org.apache.spark.sql.functions._
import graft.operators.Sequential

/** Contract for the clamped running-balance fold. The x245 entry
  * hash-checks it against a DuckDB recursive CTE at sf0.01; this spec
  * pins the clamp semantics against an in-memory reference fold over
  * the real corpus (an independent second implementation — scalar
  * Scala, no Spark) and the window-inexpressibility edge cases. */
class SequentialSpec extends SparkSpec {

  private def cents(v: Double): Long = math.round(v * 100)

  test("matches a driver-side reference fold over sf0.001") {
    val ev = Catalog.load(spark, sf0001, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("tsu"),
        col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
    val want = ev.groupBy(_._1).map { case (uid, rows) =>
      var bal = 0L; var clamps = 0L
      rows.sortBy(r => (r._2, r._3)).foreach { r =>
        val d = if (r._4 == "purchase" || r._4 == "signup") cents(r._5)
                else -cents(r._5)
        val next = bal + d
        if (next < 0) { bal = 0; clamps += 1 } else bal = next
      }
      uid -> ((bal, clamps, rows.length.toLong))
    }
    val got = Sequential.clampedRunningSum(Catalog.load(spark, sf0001, "events"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == want, "distributed fold diverged from the reference fold")
    assert(got.nonEmpty && got.values.exists(_._2 > 0),
      "corpus should exercise the clamp at least once")
  }

  test("clamp is not a plain running-sum floor (order dependence)") {
    import spark.implicits._
    // spend 50 then deposit 30: clamped = 0 -> 30. A max(running_sum, 0)
    // rewrite would give max(-20, 0) = 0 — different answer, proving the
    // operator is not window-expressible.
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 0L, "click", 0.50),
      (1L, "2024-01-01 00:00:01", 1L, "purchase", 0.30)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val r = Sequential.clampedRunningSum(df).collect().head
    assert((r.getLong(1), r.getLong(2)) == ((30L, 1L)),
      s"got (${r.getLong(1)}, ${r.getLong(2)})")
  }

  test("all-deposit and all-spend degenerate cases") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 0L, "purchase", 1.00),
      (1L, "2024-01-01 00:00:01", 1L, "signup", 2.00),
      (2L, "2024-01-01 00:00:00", 2L, "error", 1.00),
      (2L, "2024-01-01 00:00:01", 3L, "view", 2.00)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = Sequential.clampedRunningSum(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 300L, 0L), (2L, 0L, 2L)), s"got $got")
  }

  test("x352 holt fold equals the x274 recursive-CTE declared form bit-for-bit") {
    def rows(name: String) =
      SparkEntry.queries(name)(spark, sf0001).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5))).toSeq
    val declared = rows("x274_holt_linear")
    assert(declared.nonEmpty)
    assert(rows("x352_holt_native") == declared,
      "the per-series fold must land on the CTE's exact IEEE trajectory")
  }

  test("holt fold: a single-day series emits nothing (the CTE's rn=1⋈rn=2 seeding)") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1L, "only", 0.0),
      (2L, "2024-01-01 10:00:00", 2L, "pair", 0.0),
      (3L, "2024-01-02 10:00:00", 3L, "pair", 0.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val got = Sequential.holtLinear(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(("pair", 2L, 1.0, 0.0)), s"got ${got.toSeq}")
  }
}
