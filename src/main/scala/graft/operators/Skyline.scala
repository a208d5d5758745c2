package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable 2-d skyline (Pareto frontier): minimize `xCol`, maximize
  * `yCol`, dominance strict on at least one axis.
  *
  * The declarative NOT EXISTS form (x257) rewrites to a quadratic
  * pair-test — fine on a dim table, a scale-killer on a fact table. The
  * 2-d structure admits an exact linear plan instead: a point survives
  * iff no point with strictly smaller x has y ≥ mine and no point with
  * equal x has y > mine. Both tests are prefix maxima along the x axis,
  * so the whole skyline is the [[GlobalWindow]] two-pass shape:
  *
  *   1. range-bucket by x against pinned literal boundaries
  *      ([[GlobalWindow.bucketed]] — the bucket id is a pure function of
  *      x, so equal x never straddles a boundary and bucket id order
  *      implies STRICT x order across buckets);
  *   2. per-bucket max(y) (one tiny row per bucket) prefix-maxed over
  *      strictly-lower buckets and broadcast back as the cross-bucket
  *      prefix; within each bucket a RANGE-frame window supplies the
  *      strictly-cheaper-x-in-bucket max and a peer window the equal-x
  *      max.
  *
  * No single-task stage touches row-sized data: the only global window
  * runs over the ≤`buckets` per-bucket maxima. Duplicate (x, y) points
  * all survive (neither strictly dominates), matching the declared
  * NOT EXISTS semantics exactly — x258 shares x257's oracle.
  */
object Skyline {

  /** Returns the skyline rows of `df` (all columns preserved).
    *
    * `xCol`/`yCol` must be NULL-free and orderable; any numeric type
    * works. Rounds ≤ 9 required integral x (the strictly-smaller-x test
    * was a RANGE frame ending at x-1, strict only on integer domains);
    * round 10 generalizes per ADVICE r8 #1's suggestion: non-integral x
    * ranges the frame over `dense_rank(x) − 1` WITHIN each bucket —
    * dense rank is integral for any orderable x and "rank' ≤ rank − 1 ⇔
    * x' < x" exactly, so fractional measures need no quantization
    * (InvariantsSpec covers a fractional-x frontier). Integral x keeps
    * the direct RANGE-on-x form, which shares the frame's own sort; the
    * surrogate's extra per-bucket window sort is charged only to the
    * types the fast path cannot serve. */
  def skyline2d(df: DataFrame, xCol: String, yCol: String,
                buckets: Int = 0): DataFrame = {
    import org.apache.spark.sql.types._
    val (xt, yt) = (df.schema(xCol).dataType, df.schema(yCol).dataType)
    require(xt.isInstanceOf[NumericType] && yt.isInstanceOf[NumericType],
      s"skyline2d requires numeric x/y; got $xCol:$xt, $yCol:$yt")
    val spark = df.sparkSession
    val n = if (buckets > 0) buckets
            else spark.sessionState.conf.numShufflePartitions
    val (ranged0, _) = GlobalWindow.bucketed(df, Seq(xCol), n)
    // Strict-x comparison within the bucket. Integral x keeps the r9
    // fast path — RANGE to x−1 directly on x, which shares its sort
    // with the frame (no extra window pass). Fractional/other numeric x
    // takes the dense_rank surrogate: integral for any orderable type,
    // "rank' ≤ rank − 1 ⇔ x' < x" exactly, at the cost of one extra
    // per-bucket sorted window (Catalyst cannot prove __xr order equals
    // x order, so the surrogate pays a second SortExec — only charged
    // to the types the fast path cannot serve).
    val integralX = Set[DataType](ByteType, ShortType, IntegerType, LongType)(xt)
    val (ranged, cheaperKey) =
      if (integralX) (ranged0, col(xCol))
      else (ranged0.withColumn("__xr",
              dense_rank().over(
                Window.partitionBy(col("__pid")).orderBy(col(xCol))).cast("long")),
            col("__xr"))

    // pass 2a: per-bucket max(y) — n tiny rows; prefix max over strictly
    // lower bucket ids = max(y) among points with strictly smaller x
    // that live in an earlier bucket. The window is global but runs on
    // bucket-count rows.
    val offW = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("__pid"))
      .agg(max(col(yCol)).as("__bmax"))
      .withColumn("__prev_max", max(col("__bmax")).over(offW))
      .select(col("__pid"), col("__prev_max"))

    // pass 2b: within-bucket prefix max over strictly smaller x (RANGE
    // frame ending at key−1: exact on the integral x fast path, exact on
    // the dense_rank surrogate for every other type) + equal-x peer max.
    val cheaperW = Window.partitionBy(col("__pid")).orderBy(cheaperKey)
      .rangeBetween(Window.unboundedPreceding, -1)
    val peerW = Window.partitionBy(col("__pid"), col(xCol))
    // null-safe "no cheaper point": greatest() skips NULLs, so
    // __cheaper_max is NULL exactly when no strictly-cheaper point exists
    // — no Long.MinValue sentinel (which wrongly dropped a frontier point
    // whose y equals the sentinel, ADVICE r8 #1).
    val scored = ranged.join(broadcast(offsets), "__pid")
      .withColumn("__cheaper_max",
        greatest(max(col(yCol)).over(cheaperW), col("__prev_max")))
      .withColumn("__peer_max", max(col(yCol)).over(peerW))

    scored
      .where((col("__cheaper_max").isNull || col("__cheaper_max") < col(yCol)) &&
             col("__peer_max") <= col(yCol))
      .drop("__pid", "__xr", "__prev_max", "__cheaper_max", "__peer_max")
  }
}
