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
}
