package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass column profiler — the fused form of x160's SQL, which scans
  * the table once PER COLUMN for dialect clarity. This operator computes
  * every column's (ndv, nulls, min, max) in a single aggregate over a
  * single scan: at 100 TB the profile pass is priced by table reads, so
  * one-scan-for-all-columns vs one-scan-per-column is the difference
  * between an overnight ANALYZE and a coffee break. The multi-distinct
  * aggregate compiles to Spark's Expand strategy (k replicas of each
  * row INSIDE the scan stage — columns pruned to the profiled set, no
  * extra table IO), and the 1-row result is melted to per-column rows
  * with stack() — driver-sized by construction.
  *
  * Shares x160's DuckDB oracle (the x136/x140/x148 policy: declarative
  * per-column SQL for the oracle, the fused pass as the executable
  * shape). Min/max are string-cast AFTER aggregation, so the agg runs
  * on native types (int/timestamp comparisons, not lexicographic).
  */
object ColumnProfile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        countDistinct(col(c)).as(s"${c}__ndv"),
        sum(when(col(c).isNull, lit(1L)).otherwise(lit(0L))).as(s"${c}__nulls"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      s"'$c', `${c}__ndv`, `${c}__nulls`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    one.selectExpr(
        s"stack(${cols.size}, $stacked) AS (col, ndv, nulls, minv, maxv)")
      .orderBy("col")
  }
}
