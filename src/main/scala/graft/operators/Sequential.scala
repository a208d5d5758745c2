package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order-dependent per-key folds that plain window frames CANNOT
  * express. A running sum clamped at zero (credit balances, inventory
  * depletion, token-bucket quotas) is non-associative — the clamp makes
  * each step depend on the folded value, so there is no partial-
  * aggregate decomposition and no window-function rewrite; the honest
  * distributed shape is "shuffle by key, fold each key's ordered
  * sequence", which is exactly `groupByKey` + `mapGroups` (category (d)
  * of the custom-operator preference order — justified here because
  * (a)-(c) cannot express the semantics; the DuckDB oracle needs a
  * recursive CTE for the same reason).
  *
  * Scale contract: parallelism is across KEYS (users) — the natural
  * axis at 100 TB where keys number in the millions; one key's history
  * is buffered and sorted in executor memory (bounded by per-key
  * cardinality, the same assumption every sessionization/window-by-user
  * operator in the inventory already makes). Nothing touches the
  * driver. */
object Sequential {

  /** Clamped running balance per user over `events` (the Catalog view:
    * user_id, ts, event_id, event_type, value). Deposits (purchase,
    * signup) add round(value*100) cents; every other event spends the
    * same; the balance never goes below zero — a spend past zero clamps
    * to 0 and counts as a `clamps` incident. Output: one row per user
    * (user_id, final_cents, clamps, n_events), ordered by user. */
  def clampedRunningSum(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      // a NULL ts or value would otherwise surface as an encoder error
      // ("Null value appeared in non-nullable field") for the whole job
      // — name the actual defect instead: the ordering key and delta
      // are undefined on such a row
      .where(coalesce(assert_true(col("ts").isNotNull && col("value").isNotNull,
        lit("clampedRunningSum: NULL ts or value — ordering key / delta " +
          "undefined; filter or impute upstream")), lit(true)))
      .select(col("user_id"),
        // µs since epoch: a total, timezone-free ordering key identical
        // to the oracle's ORDER BY ts
        expr("unix_micros(ts)").as("tsu"), col("event_id"),
        expr("""CASE WHEN event_type IN ('purchase','signup')
               |     THEN cast(round(value * 100) AS BIGINT)
               |     ELSE -cast(round(value * 100) AS BIGINT) END""".stripMargin)
          .as("delta"))
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (uid, it) =>
        val rows = it.toArray.sortBy(r => (r._2, r._3)) // (ts, event_id)
        var bal = 0L
        var clamps = 0L
        rows.foreach { r =>
          val next = bal + r._4
          if (next < 0) { bal = 0L; clamps += 1 } else bal = next
        }
        (uid, bal, clamps, rows.length.toLong)
      }
      .toDF("user_id", "final_cents", "clamps", "n_events")
      .orderBy("user_id")
  }

  /** Holt double exponential smoothing per event-type daily series —
    * the PRODUCTION twin of x274's recursive-CTE declared form (r16,
    * closing the xops heavy tail: the declared CTE re-joins the whole
    * frontier once per recursion STEP, ~17 s at sf0.1, where this fold
    * pays one in-memory array step — same class as [[clampedRunningSum]],
    * and the same reason: the recurrence is non-associative, so the
    * honest distributed shape is shuffle-by-series + per-series ordered
    * fold, parallel across event types).
    *
    * Bit-equality with the oracle: α = β = 0.5 evaluated in the EXACT
    * IEEE op tree of the declared SQL (0.5·y + 0.5·(l+b) with the same
    * association; the trend reuses the freshly computed level exactly as
    * the CTE's inline recomputation does, which is bit-identical because
    * it is the same op sequence), and the 4dp rounding happens in the
    * DataFrame layer through the same `round` expression the declared
    * form uses. Series shorter than 2 days emit nothing, matching the
    * CTE's rn=1⋈rn=2 seeding. x352 shares x274's oracle verbatim. */
  def holtLinear(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type"), col("ts").cast("date").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
      .select(col("event_type"),
        expr("datediff(day, DATE'1970-01-01')").as("d"), col("y"))
      .as[(String, Int, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (et, it) =>
        val ys = it.toArray.sortBy(_._2).map(_._3)
        if (ys.length < 2) Iterator.empty
        else {
          var l = ys(1) * 1e0
          var b = (ys(1) - ys(0)) * 1e0
          var i = 2
          while (i < ys.length) {
            val lNew = 5e-1 * ys(i) + 5e-1 * (l + b)
            b = 5e-1 * (lNew - l) + 5e-1 * b
            l = lNew
            i += 1
          }
          Iterator.single((et, ys.length.toLong, ys.last, l, b))
        }
      }
      .toDF("event_type", "rn", "y", "l", "b")
      .select(col("event_type"), col("rn"), col("y"),
        expr("round(l, 4)").as("level"), expr("round(b, 4)").as("trend"),
        expr("round(l + b, 4)").as("forecast_next"))
      .orderBy("event_type")
  }
}
