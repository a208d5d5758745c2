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

  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => countDistinct(col(c)))

  /** The 100 TB form of [[profile]] (VERDICT r6 #6): `countDistinct`
    * over k columns compiles to Expand — k+1 replicas of every scanned
    * row feed the first-stage aggregate, so the fused profiler's shuffle
    * input is (k+1)× the table. `approx_count_distinct` replaces each
    * exact distinct with an HLL++ sketch: fixed-size mergeable state,
    * NO Expand (one row in, one accumulator update), map-side partials
    * of a few KB per column. ndv becomes an estimate with relative
    * standard deviation `rsd`; nulls/min/max stay exact. The exact
    * [[profile]] remains the oracle-checked contract (x160/x161);
    * InvariantsSpec bounds this estimator against it, and SCALE.md §18
    * prices the two at 1× and 10×. */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.02): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c), rsd))

  private def profileWith(df: DataFrame, cols: Seq[String],
                          ndv: String => Column): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        ndv(c).as(s"${c}__ndv"),
        sum(when(col(c).isNull, lit(1L)).otherwise(lit(0L))).as(s"${c}__nulls"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      // the label is a SQL string literal inside selectExpr — escape
      // embedded quotes or a name like it's breaks the parse (the agg
      // aliases are already backtick-quoted)
      s"'${c.replace("'", "''")}', `${c}__ndv`, `${c}__nulls`, `${c}__min`, `${c}__max`"
    }.mkString(", ")
    one.selectExpr(
        s"stack(${cols.size}, $stacked) AS (col, ndv, nulls, minv, maxv)")
      .orderBy("col")
  }
}
