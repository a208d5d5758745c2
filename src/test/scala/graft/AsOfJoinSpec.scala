package graft

import graft.plans.AsOf
import org.apache.spark.sql.functions._

/** The native as-of operator must reproduce q23 (the oracle-validated
  * window emulation of DuckDB ASOF LEFT JOIN) exactly. */
class AsOfJoinSpec extends SparkSpec {

  def native(dir: String) = {
    val events = Catalog.load(spark, dir, "events")
    val purchases = events.where("event_type = 'purchase'")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val clicks = events.where("event_type = 'click'")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    AsOf.join(purchases, clicks,
      "user_id", "c_user", "ts", "c_ts", "click_id")
      .select(col("purchase_id"), col("click_id"))
      .orderBy("purchase_id")
  }

  test("native as-of equals oracle-validated q23 at sf0.001") {
    val want = SparkEntry.queries("q23_asof_join")(spark, sf0001)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    val got = native(sf0001)
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(got.size == want.size)
    assert(got == want)
  }

  test("native as-of equals q23 at sf0.01 (including NULL matches)") {
    val want = SparkEntry.queries("q23_asof_join")(spark, "/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    val got = native("/root/testdata/sf0.01")
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(got == want)
    assert(want.exists(_._2 == -1L), "corpus must exercise the no-match path")
  }

  test("plan shape: two exchanges, no union, no window") {
    val plan = native(sf0001).queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window"), "native operator must not fall back to window emulation")
    assert(!plan.contains("Union"), "native operator must not union the sides")
  }

  test("ts-equal click joins (>= semantics) and tie-break picks max id") {
    import spark.implicits._
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val left = Seq((100L, 1L, ts0)).toDF("purchase_id", "user_id", "ts")
    val right = Seq(
      (10L, 1L, ts0),  // same instant — must match (>=), id 11 preferred
      (11L, 1L, ts0),
      (12L, 2L, ts0)   // other user — never matches
    ).toDF("click_id", "c_user", "c_ts")
    val got = AsOf.join(left, right, "user_id", "c_user",
      "ts", "c_ts", "click_id")
      .select("purchase_id", "click_id").collect()
    assert(got.length == 1 && got.head.getLong(1) == 11L)
  }

  test("left rows with no prior right rows get nulls") {
    import spark.implicits._
    val t = (s: String) => java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, 7L, t("2024-01-01 00:00:00")),
      (2L, 7L, t("2024-01-03 00:00:00"))).toDF("purchase_id", "user_id", "ts")
    val right = Seq((50L, 7L, t("2024-01-02 00:00:00")))
      .toDF("click_id", "c_user", "c_ts")
    val got = AsOf.join(left, right, "user_id", "c_user",
      "ts", "c_ts", "click_id")
      .select("purchase_id", "click_id").orderBy("purchase_id").collect()
    assert(got(0).isNullAt(1), "purchase before any click must get null")
    assert(got(1).getLong(1) == 50L)
  }

  test("NULL keys and timestamps match nothing, per the ASOF LEFT JOIN contract") {
    // SQL comparison with NULL is never true: a NULL left key/ts gets no
    // match, and a NULL right key/ts is nobody's candidate — RowOrdering
    // alone would sort nulls first and CONSUME them as matches
    // (probe-confirmed against DuckDB ASOF LEFT JOIN semantics)
    import spark.implicits._
    val t = (s: String) => java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, Option(7L), Option(t("2024-01-05 00:00:00"))), // normal: matches
      (2L, None, Option(t("2024-01-05 00:00:00"))),       // null key
      (3L, Option(7L), None)                              // null ts
    ).toDF("purchase_id", "user_id", "ts")
    val right = Seq(
      (50L, Option(7L), Option(t("2024-01-02 00:00:00"))), // real candidate
      (60L, None, Option(t("2024-01-01 00:00:00"))),       // null key: unusable
      (70L, Option(7L), None)                              // null ts: unusable
    ).toDF("click_id", "c_user", "c_ts")
    val got = AsOf.join(left, right, "user_id", "c_user", "ts", "c_ts", "click_id")
      .select("purchase_id", "click_id").orderBy("purchase_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got === Map(1L -> 50L, 2L -> -1L, 3L -> -1L), s"got $got")
  }

  test("mismatched key/ts types fail at build time, not as garbage comparisons") {
    import spark.implicits._
    val left = Seq((1L, 7L, 5L)).toDF("purchase_id", "user_id", "ts")
    val rightIntKey = Seq((50L, 7, 3L)).toDF("click_id", "c_user", "c_ts")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(left, rightIntKey, "user_id", "c_user", "ts", "c_ts", "click_id")
    }
    assert(e.getMessage.contains("key types differ"), e.getMessage)
    val rightIntTs = Seq((50L, 7L, 3)).toDF("click_id", "c_user", "c_ts")
    val e2 = intercept[IllegalArgumentException] {
      AsOf.join(left, rightIntTs, "user_id", "c_user", "ts", "c_ts", "click_id")
    }
    assert(e2.getMessage.contains("timestamp types differ"), e2.getMessage)
  }
}
