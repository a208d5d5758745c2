package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global running aggregates (SCALE.md known-limit #1).
  *
  * A window with a global ORDER BY and no PARTITION BY executes in ONE
  * task — correct but a scalability cliff. This computes the same result
  * in two passes:
  *   1. range-partition by the order key, per-partition prefix sums
  *      (parallel);
  *   2. per-partition totals (one tiny row each) get prefix-summed on the
  *      driver-sized side and broadcast back as offsets.
  *
  * Requires a total order (unique key suffix) so ties cannot straddle a
  * range boundary ambiguously — same discipline as every contract query.
  */
object GlobalWindow {

  /** Global running sum of `value` in `order` order, `out` column added.
    * Equivalent to sum(value) OVER (ORDER BY order ROWS UNBOUNDED
    * PRECEDING) without the single-task window. */
  def runningSum(df: DataFrame, order: Seq[String], value: String,
                 out: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val oc = order.map(col)
    val ranged = df.repartitionByRange(n, oc: _*)
      .withColumn("__pid", spark_partition_id())
    val localW = Window.partitionBy(col("__pid")).orderBy(oc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__rt", sum(col(value)).over(localW))
    // per-partition totals: `n` rows — the only single-partition step
    val offsets = local.groupBy(col("__pid"))
      .agg(sum(col(value)).as("__tot"))
      .withColumn("__off",
        coalesce(sum(col("__tot")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0.0)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(out, col("__rt") + col("__off"))
      .drop("__pid", "__rt")
  }
}
