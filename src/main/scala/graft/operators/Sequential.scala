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
}
