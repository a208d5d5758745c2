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
  * bounded interval count. Degenerate long intervals (span ≫ bucket)
  * multiply their own explode factor; `maxSpanCells` handles them
  * INSIDE the operator (round 10 — r9 delegated "cap or split" to
  * caller discipline): when set, each interval is first exploded into
  * chunks of ≤ maxSpanCells cells and the chunks re-shuffled before
  * the cell explode, so one degenerate row's span/bucket cells are
  * generated across many tasks instead of one — total cell count is
  * identical, and the terminal dropDuplicates already collapses the
  * multi-cell matches, so results are bit-identical (IntervalJoinSpec
  * proves it against the declarative oracle at span ≫ bucket).
  *
  * Columns must be integral (µs, cents — the repo's unit discipline)
  * and every interval non-empty (end > start): an inverted interval
  * would make the cell `sequence` run DESCENDING and silently explode
  * O(span/bucket) spurious cells (ADVICE r9 #2), so the plan asserts
  * end > start per row — loud, not a cost blow-up. Both inputs keep
  * all their columns in the output (b's prefixed via the caller's
  * aliasing if names collide).
  */
object IntervalJoin {

  /** Overlap-join with explicit per-side key columns for the dedup.
    * `aKey`/`bKey` must uniquely identify rows of their side.
    * `maxSpanCells` > 0 bounds the per-task explode of long intervals
    * (see above); 0 = single-stage explode (fine when spans ≈ bucket). */
  def overlap(a: DataFrame, aStart: String, aEnd: String, aKey: String,
              b: DataFrame, bStart: String, bEnd: String, bKey: String,
              bucket: Long, maxSpanCells: Int = 0): DataFrame = {
    require(bucket > 0, "bucket width must be positive")
    // every user-supplied name is backtick-quoted (embedded backticks
    // doubled) before reaching a parser: unquoted, a dot parses as
    // struct-field access, a space/hyphen breaks the parser, and a
    // reserved word collides — both in expr() SQL text AND in
    // functions.col(), which parses dots the same way (ADVICE r11 #4)
    def q(n: String) = "`" + n.replace("`", "``") + "`"
    def qc(n: String) = col(q(n))
    val shared = a.columns.toSet.intersect(b.columns.toSet)
    require(shared.isEmpty,
      s"side column names must be disjoint (alias before joining); shared: $shared")
    import org.apache.spark.sql.types._
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    Seq(a.schema(aStart), a.schema(aEnd), b.schema(bStart), b.schema(bEnd))
      .foreach(f => require(integral(f.dataType),
        s"interval bounds must be integral (got ${f.name}:${f.dataType}) — " +
        "quantize to µs/cents first"))

    def gridded(df: DataFrame, s: String, e: String, key: String) = {
      // loud per-row contract: half-open [s, e) must be non-empty, else
      // the cell sequence below runs descending (ADVICE r9 #2)
      val checked = df.where(coalesce(
        assert_true(qc(e) > qc(s),
          lit(s"IntervalJoin: empty or inverted interval ($s >= $e)")),
        lit(true)))
      // exact integral floor-division: Spark's `/` on longs is DOUBLE
      // division, which rounds the operand past 2^53 — a bound on a
      // cell boundary could land in the adjacent cell and a truly
      // overlapping pair silently share no cell. (s - pmod(s, b)) is an
      // exact multiple of b, so the truncating `div` is exact floor for
      // any long, negative included.
      val (qs, qe) = (q(s), q(e))
      val c0 = expr(s"($qs - pmod($qs, $bucket)) div $bucket")
      val c1 = expr(s"(($qe - 1) - pmod($qe - 1, $bucket)) div $bucket")
      if (maxSpanCells <= 0)
        checked.withColumn("__cell", explode(sequence(c0, c1)))
      else {
        // two-stage explode FOR THE WHALES ONLY (ADVICE r10 #5: paying
        // the chunk explode + an extra full repartition on every row
        // taxes the well-behaved majority for the degenerate few): rows
        // whose span fits one chunk take the single-stage explode with
        // their input partitioning intact; rows spanning ≥ maxSpanCells
        // cells are chunked first (span/(bucket·m) rows), re-shuffled so
        // one degenerate interval's cells generate across many tasks,
        // then exploded ≤ m cells per chunk row. Same total cell set —
        // the terminal dropDuplicates already collapses multi-cell
        // matches — so results are bit-identical either way
        // (IntervalJoinSpec proves it against the declarative oracle).
        val m = lit(maxSpanCells.toLong)
        val short = checked.where(c1 - c0 < m)
          .withColumn("__cell", explode(sequence(c0, c1)))
        val long = checked.where(c1 - c0 >= m)
          .withColumn("__chunk",
            explode(sequence(lit(0L), floor((c1 - c0) / m).cast("long"))))
          .repartition(qc(key), col("__chunk"))
          .withColumn("__cell", explode(sequence(
            c0 + col("__chunk") * m,
            least(c0 + (col("__chunk") + 1) * m - 1, c1))))
          .drop("__chunk")
        short.unionByName(long)
      }
    }

    val ga = gridded(a, aStart, aEnd, aKey)
    val gb = gridded(b, bStart, bEnd, bKey)

    ga.join(gb, "__cell")
      // exact refine: half-open overlap
      .where(qc(aStart) < qc(bEnd) && qc(bStart) < qc(aEnd))
      .drop("__cell")
      // a pair sharing k cells matched k times
      .dropDuplicates(aKey, bKey)
  }
}
