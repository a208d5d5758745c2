package graft

import graft.operators.GlobalWindow
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GlobalWindowSpec extends SparkSpec {

  lazy val events = Catalog.load(spark, sf0001, "events")

  test("two-pass global running sum equals the single-task window") {
    val naiveW = Window.orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = events
      .withColumn("rt", sum(col("value")).over(naiveW))
      .select(col("event_id"), round(col("rt"), 4).as("rt"))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = GlobalWindow.runningSum(events,
        Seq("ts", "event_id"), "value", "rt", partitions = 7)
      .select(col("event_id"), round(col("rt"), 4).as("rt"))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want)
  }

  test("the data actually spreads across range partitions") {
    val pids = events.repartitionByRange(7, col("ts"), col("event_id"))
      .withColumn("p", spark_partition_id())
      .select("p").distinct().count()
    assert(pids > 1, "range partitioning must spread the rows")
  }

  lazy val customer = Catalog.load(spark, sf0001, "customer")

  test("two-pass ranks equal the single-task windows (unique order key)") {
    val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    val want = customer
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rk", rank().over(w).cast("long"))
      .withColumn("dr", dense_rank().over(w).cast("long"))
      .withColumn("nt", ntile(4).over(w).cast("long"))
      .withColumn("pr", round(percent_rank().over(w), 6))
      .withColumn("cd", round(cume_dist().over(w), 6))
      .select("c_custkey", "rn", "rk", "dr", "nt", "pr", "cd")
      .orderBy("c_custkey").collect().map(_.toSeq).toSeq
    val got = GlobalWindow.ranks(customer,
        Seq("c_acctbal", "c_custkey"), ntileBuckets = 4, partitions = 7)
      .select(col("c_custkey"), col("g_rn").as("rn"), col("g_rank").as("rk"),
        col("g_dense_rank").as("dr"), col("g_ntile").as("nt"),
        round(col("g_percent_rank"), 6).as("pr"),
        round(col("g_cume_dist"), 6).as("cd"))
      .orderBy("c_custkey").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("wide string keys: ranks match single-task window, driver gets a sketch") {
    // wide multi-column string key — the case whose 1M-row boundary
    // sample could reach hundreds of driver MB before the
    // percentile_approx sketch replaced it (VERDICT r4 #4). The first
    // order column is a padded string (exercises the 7-byte-prefix
    // surrogate, including shared prefixes that collapse to ties);
    // c_custkey makes the full key unique.
    val wide = customer.withColumn("wkey",
      concat(lit("prefix-shared-"), substring(col("c_name"), -4, 4),
        lit("-"), rpad(col("c_mktsegment"), 64, "x")))
    val w = Window.orderBy(col("wkey"), col("c_custkey"))
    val want = wide
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rk", rank().over(w).cast("long"))
      .withColumn("cd", round(cume_dist().over(w), 6))
      .select("c_custkey", "rn", "rk", "cd")
      .orderBy("c_custkey").collect().map(_.toSeq).toSeq
    val ranked = GlobalWindow.ranks(wide,
      Seq("wkey", "c_custkey"), partitions = 7)
    val got = ranked
      .select(col("c_custkey"), col("g_rn").as("rn"), col("g_rank").as("rk"),
        round(col("g_cume_dist"), 6).as("cd"))
      .orderBy("c_custkey").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("two-pass ranks handle ties straddling nothing (tie-heavy key)") {
    // user_id has ~50 rows per value at sf0.001 — ties MUST stay
    // partition-local under range partitioning; only tie-invariant
    // functions are compared (row_number/ntile are tie-order-dependent
    // for the built-in too).
    val w = Window.orderBy(col("user_id"))
    val want = events
      .withColumn("rk", rank().over(w).cast("long"))
      .withColumn("dr", dense_rank().over(w).cast("long"))
      .withColumn("cd", round(cume_dist().over(w), 6))
      .select("event_id", "rk", "dr", "cd")
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    val got = GlobalWindow.ranks(events, Seq("user_id"), partitions = 5)
      .select(col("event_id"), col("g_rank").as("rk"),
        col("g_dense_rank").as("dr"), round(col("g_cume_dist"), 6).as("cd"))
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("ranks ntile with N < buckets degenerates to one row per bucket") {
    val tiny = customer.orderBy("c_custkey").limit(3)
    val got = GlobalWindow.ranks(tiny, Seq("c_custkey"),
        ntileBuckets = 7, partitions = 3)
      .select("c_custkey", "g_ntile").orderBy("c_custkey")
      .collect().map(r => r.getLong(1)).toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("ranks runs multi-task (no single-partition global window)") {
    // AQE rightly coalesces 150 toy rows to one post-shuffle partition,
    // so assert the SHAPE, not the runtime count: (a) the range
    // partitioning spreads the data when partitions are pinned, (b) no
    // window in the plan is partition-less over data columns (the
    // single-task shape this operator eliminates; the offsets side's
    // __pid windows run over n tiny rows by design).
    val spread = customer.repartitionByRange(7, col("c_acctbal"), col("c_custkey"))
      .withColumn("p", spark_partition_id())
      .select("p").distinct().count()
    assert(spread > 1, "range partitioning must spread the rows")
    val out = GlobalWindow.ranks(customer,
      Seq("c_acctbal", "c_custkey"), partitions = 7)
    val plan = out.queryExecution.executedPlan.toString
    val globalWindow = plan.linesIterator.exists(l =>
      l.contains("Window [") && !l.contains("windowspecdefinition(__pid"))
    assert(!globalWindow, s"found a global (partition-less) Window in:\n$plan")
  }
}
