package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable interval overlap join — the operator behind "which sessions
  * were active in which maintenance window", "which spans contaminate
  * which shards": rows of `a` with [aStart, aEnd) overlapping rows of
  * `b` with [bStart, bEnd), half-open semantics.
  *
  * The declarative form — `a JOIN b ON aStart < bEnd AND bStart < aEnd`
  * — has no equi-key, so Catalyst can only plan a (broadcast) nested
  * loop: O(|a|·|b|) comparisons, a scale-killer when both sides are
  * fact-sized. The standard fix (the x54/x74 bucketing idea applied to
  * time): grid the axis into `bucket`-sized cells, explode each
  * interval to the cells it touches, equi-join on the cell id — cost
  * O(Σ span/bucket + true matches), shuffled by cell. A pair sharing
  * k cells appears k times, so the join result deduplicates on the
  * provided key columns BEFORE the caller sees it; the exact overlap
  * predicate refines any same-cell near-misses away.
  *
  * Skew note (the q31-sessions use case): one hot cell = one hot
  * shuffle key. `bucket` is the knob — size it so a cell holds a
  * bounded interval count; degenerate long intervals (span ≫ bucket)
  * multiply their own explode factor, so cap or split them upstream
  * (SCALE.md §28 measures the explode factor at 1×/10×).
  *
  * Columns must be integral (µs, cents — the repo's unit discipline);
  * both inputs keep all their columns in the output (b's prefixed via
  * the caller's aliasing if names collide).
  */
object IntervalJoin {

  /** Overlap-join with explicit per-side key columns for the dedup.
    * `aKey`/`bKey` must uniquely identify rows of their side. */
  def overlap(a: DataFrame, aStart: String, aEnd: String, aKey: String,
              b: DataFrame, bStart: String, bEnd: String, bKey: String,
              bucket: Long): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    val shared = a.columns.toSet.intersect(b.columns.toSet)
    require(shared.isEmpty,
      s"side column names must be disjoint (alias before joining); shared: $shared")
    import org.apache.spark.sql.types._
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    Seq(a.schema(aStart), a.schema(aEnd), b.schema(bStart), b.schema(bEnd))
      .foreach(f => require(integral(f.dataType),
        s"interval bounds must be integral (got ${f.name}:${f.dataType}) — " +
        "quantize to µs/cents first"))

    def gridded(df: DataFrame, s: String, e: String) =
      df.withColumn("__cell",
        explode(sequence(
          floor(col(s) / lit(bucket)).cast("long"),
          floor((col(e) - 1) / lit(bucket)).cast("long"))))

    val ga = gridded(a, aStart, aEnd)
    val gb = gridded(b, bStart, bEnd)

    ga.join(gb, "__cell")
      // exact refine: half-open overlap
      .where(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .drop("__cell")
      // a pair sharing k cells matched k times
      .dropDuplicates(aKey, bKey)
  }
}
