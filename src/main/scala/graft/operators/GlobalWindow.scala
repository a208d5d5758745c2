package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Deterministic range-bucket id as a PURE FUNCTION of the row.
    *
    * `repartitionByRange` + `spark_partition_id()` is NOT safe here: the
    * two-pass shape references the partitioned child from two branches
    * (local ranks + offsets agg), each branch re-executes the range
    * exchange, and the RangePartitioner re-SAMPLES boundaries per
    * execution — the branches can disagree on which partition a row
    * belongs to, silently corrupting every offset (caught by the sf0.1
    * oracle on x101). Instead: ONE aggregation job computes n-1
    * approximate quantiles of a monotone numeric surrogate of the first
    * order column (percentile_approx — agg-side GK sketch, mergeable
    * fixed-size state; the driver receives n-1 doubles, not a row
    * sample — VERDICT r4 #4 replacing the 1M-row collect), pins them as
    * LITERAL boundaries, and assigns `__pid` = number of boundaries
    * ≤ surrogate(key) — the same id in every branch, every
    * re-execution, every plan shape.
    *
    * Correctness needs only that the bucketing function is a monotone
    * (non-strict) function of the order key: equal keys share a bucket
    * (ties never straddle), bucket ids respect key order, and the
    * offsets are computed exactly from the actual bucket contents —
    * boundary PLACEMENT affects balance, never results. Surrogate
    * collapse (string prefix ties, heavy first-column duplicates) can
    * skew bucket sizes; a degenerate single-value key degrades to one
    * bucket — the single-task shape, correct, and no worse than what
    * any range partitioner does with one key value.
    *
    * NULL keys compare to false against every boundary → bucket 0,
    * matching Spark's ASC NULLS FIRST window-order default (the sketch
    * ignores NULLs, so boundaries are never NULL — ADVICE r3 #4).
    */
  private[operators] def bucketed(df: DataFrame, order: Seq[String], n: Int)
      : (DataFrame, Int) = {
    val s = surrogate(col(order.head), df.schema(order.head).dataType)
    val probs = (1 until n).map(_.toDouble / n).toArray
    val qRow = df.agg(
      percentile_approx(s, lit(probs), lit(10000)).as("q")).head()
    val bounds: Seq[Double] =
      if (qRow.isNullAt(0)) Nil // empty input or all-NULL key
      else qRow.getSeq[Double](0).distinct.filterNot(_.isNaN)
    val pid = bounds.foldLeft(lit(0))((acc, b) =>
      acc + when(s >= lit(b), 1).otherwise(0))
    (df.withColumn("__pid", pid).repartition(math.max(n, 1), col("__pid")),
      bounds.length + 1)
  }

  /** Monotone numeric surrogate for quantile sketching: numeric kinds
    * cast to double (round-to-nearest is order-preserving, collisions
    * become ties); date/timestamp via epoch seconds; strings via their
    * first 7 UTF-8 bytes as a big-endian integer — Spark compares
    * strings byte-wise, so the zero-padded prefix is byte-order-
    * compatible. NOTE the 56-bit prefix EXCEEDS the 53-bit double
    * mantissa: the cast rounds. Rounding-to-nearest is monotone, which
    * is all quantile bucketing needs (collisions become ties on the
    * boundary, handled like any tie) — do not widen the prefix
    * expecting exactness (ADVICE r5 #3). */
  private def surrogate(c: Column, dt: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    dt match {
      case StringType =>
        conv(rpad(substring(hex(c.cast("binary")), 1, 14), 14, "0"), 16, 10)
          .cast("double")
      case DateType | TimestampType | TimestampNTZType =>
        c.cast(TimestampType).cast("double")
      case BooleanType => c.cast("int").cast("double")
      case _ => c.cast("double")
    }
  }

  /** Global running sum of `value` in `order` order, `out` column added.
    * Equivalent to sum(value) OVER (ORDER BY order ROWS UNBOUNDED
    * PRECEDING) without the single-task window. Works for integral and
    * floating `value` columns alike (the zero literal coerces to the
    * sum's type — integral running sums stay exact/hash-checkable; float
    * ones differ from the single-task window only at the ulp level). */
  def runningSum(df: DataFrame, order: Seq[String], value: String,
                 out: String, partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val oc = order.map(col)
    val (ranged, _) = bucketed(df, order, n)
    val localW = Window.partitionBy(col("__pid")).orderBy(oc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__rt", sum(col(value)).over(localW))
    // per-partition totals: `n` rows — the only single-partition step
    val offsets = local.groupBy(col("__pid"))
      .agg(sum(col(value)).as("__tot"))
      .withColumn("__off",
        coalesce(sum(col("__tot")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(out, col("__rt") + col("__off"))
      .drop("__pid", "__rt")
  }

  /** Scalable global ranking functions — the two-pass tier for
    * rank / dense_rank / row_number / ntile / percent_rank / cume_dist
    * with a global ORDER BY and no PARTITION BY (the last single-task
    * plan shape in the inventory; SCALE.md §3 / VERDICT r2 #1).
    *
    * Pass 1: range-bucket by the order key against pinned literal
    * boundaries ([[bucketed]]) — the bucket id is a pure function of the
    * key, so equal keys can never straddle a boundary, ties stay
    * partition-local, and every rank function decomposes into (local
    * value + per-partition offset).
    * Pass 2: per-partition row/distinct-key counts (n tiny rows) are
    * prefix-summed and broadcast back:
    *   g_row_number   = local row_number   + rowsBefore
    *   g_rank         = local rank         + rowsBefore
    *   g_dense_rank   = local dense_rank   + distinctKeysBefore
    *   g_percent_rank = (g_rank - 1) / (N - 1)
    *   g_cume_dist    = (rowsBefore + local max row_number over peers) / N
    *   g_ntile(k)     = bucket of g_row_number under SQL's ceil/floor split
    *
    * Tie discipline: with a non-unique order key, g_row_number and
    * g_ntile are tie-order-dependent (exactly like the built-ins); rank /
    * dense_rank / percent_rank / cume_dist are tie-invariant and fully
    * deterministic.
    *
    * Adds columns g_rn, g_rank, g_dense_rank (BIGINT), g_percent_rank,
    * g_cume_dist (DOUBLE), g_ntile (BIGINT).
    */
  def ranks(df: DataFrame, order: Seq[String], ntileBuckets: Int = 4,
            partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (partitions > 0) partitions
            else spark.sessionState.conf.numShufflePartitions
    val oc = order.map(col)
    val (ranged, _) = bucketed(df, order, n)
    val localW = Window.partitionBy(col("__pid")).orderBy(oc: _*)
    // unordered window over (__pid, order key) = the full peer group
    val peerW = Window.partitionBy((col("__pid") +: oc): _*)
    val local = ranged
      .withColumn("__rn", row_number().over(localW).cast("long"))
      .withColumn("__rk", rank().over(localW).cast("long"))
      .withColumn("__dr", dense_rank().over(localW).cast("long"))
      .withColumn("__peer_max", max(col("__rn")).over(peerW))
    // pass 2: n tiny rows — per-partition row + distinct-key counts,
    // prefix-summed on the driver-sized side, broadcast back
    val offW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val totW = Window.orderBy(col("__pid")).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = local.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"),
           countDistinct(struct(oc: _*)).as("__dk"))
      .withColumn("__rows_before", coalesce(sum(col("__cnt")).over(offW), lit(0L)))
      .withColumn("__keys_before", coalesce(sum(col("__dk")).over(offW), lit(0L)))
      .withColumn("__total", sum(col("__cnt")).over(totW))
      .select(col("__pid"), col("__rows_before"), col("__keys_before"), col("__total"))
    val k = lit(ntileBuckets.toLong)
    val joined = local.join(broadcast(offsets), "__pid")
      .withColumn("g_rn", col("__rn") + col("__rows_before"))
      .withColumn("g_rank", col("__rk") + col("__rows_before"))
      .withColumn("g_dense_rank", col("__dr") + col("__keys_before"))
      .withColumn("g_percent_rank",
        when(col("__total") > 1,
          (col("g_rank") - 1).cast("double") / (col("__total") - 1))
          .otherwise(lit(0.0)))
      .withColumn("g_cume_dist",
        (col("__peer_max") + col("__rows_before")).cast("double") / col("__total"))
    // SQL ntile: first (N mod k) buckets hold ceil(N/k) rows, the rest
    // floor(N/k). q = N/k may be 0 (N < k): then every row is its own
    // bucket and only the `big` branch is reachable (guarded lazily).
    val q = (col("__total") / k).cast("long")
    val r = col("__total") % k
    val big = r * (q + 1)
    joined
      .withColumn("g_ntile",
        when(col("g_rn") <= big, floor((col("g_rn") - 1) / (q + 1)) + 1)
          // q=0 (N<k) makes this branch unreachable (big=N); greatest()
          // keeps the unevaluated denominator non-zero anyway
          .otherwise(r + floor((col("g_rn") - big - 1) / greatest(q, lit(1L))) + 1)
          .cast("long"))
      .drop("__pid", "__rn", "__rk", "__dr", "__peer_max",
            "__rows_before", "__keys_before", "__total")
  }
}
