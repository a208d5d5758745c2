package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document fingerprinting (winnowing): rolling char k-gram hashes →
  * per-window minima → distinct fingerprint set. Containment of one doc's
  * fingerprints in another's detects copy-paste/substring reuse that
  * token-set measures miss. Entirely row-local (codegen'd HOFs). */
object Fingerprint {

  /** Winnowing fingerprint set: min hash of each sliding window of
    * `window` consecutive k-gram hashes, deduplicated. One fused
    * codegen'd loop per row (functions.WinnowFps — same xxhash64/substr
    * semantics as [[fingerprintsHof]], which LlmOpsSpec holds
    * bit-identical). */
  def fingerprints(docs: DataFrame, textCol: String = "text",
                   k: Int = 8, window: Int = 4): DataFrame = {
    graft.functions.WinnowFps.register(docs.sparkSession)
    // spread first — single-row-group parquet otherwise pins this
    // CPU-bound kernel to one task (see fingerprintsHof's note);
    // Dedup.spread is the ONE copy of the parallelism sizing rule
    Dedup.spread(docs)
      .withColumn("fps", graft.functions.WinnowFps(col(textCol), k, window))
  }

  /** The original HOF composition of [[fingerprints]] — kept as the
    * executable specification the native expression is equivalence-
    * tested against (LlmOpsSpec "winnow_fps native == HOF"). */
  def fingerprintsHof(docs: DataFrame, textCol: String = "text",
                      k: Int = 8, window: Int = 4): DataFrame =
    fingerprintsHofWith(docs, textCol, k, window,
      HashFamily.Production, fullWindowsOnly = false)

  /** THE winnowing HOF kernel, shared by both families (round 10,
    * VERDICT r9 #7): rolling k-gram hashes under `family`, per-window
    * minima, distinct. `fullWindowsOnly` pins the portable twin's
    * boundary semantics — a doc with fewer than `window` k-gram
    * positions yields NO fingerprints (exactly the x80 SQL twin's
    * `i >= window` row filter), while the production default keeps a
    * partial-window fallback for tiny docs; the two modes differ only
    * below `k + window - 1` chars.
    *
    * SQL expr() because Column-lambda substring(start=i) is clumsy in
    * the DSL. The k-gram hash array is LET-BOUND via a single-element
    * transform: projection collapse would otherwise inline its
    * construction into the window lambda — O(n) rebuilds of an O(n)
    * array per doc (observed: sf0.1 runtime went from minutes to
    * seconds; see graft.llm.Cols.bind). */
  def fingerprintsHofWith(docs: DataFrame, textCol: String, k: Int,
                          window: Int, family: HashFamily,
                          fullWindowsOnly: Boolean): DataFrame = {
    val hash = family.sqlHash(s"substr($textCol, i, $k)")
    val hashes =
      s"transform(sequence(1, greatest(length($textCol)-${k - 1}, 1)), i -> $hash)"
    val body =
      if (fullWindowsOnly)
        s"""CASE WHEN size(hs) >= $window
           |     THEN array_distinct(transform(sequence(1, size(hs)-${window - 1}),
           |                                   j -> array_min(slice(hs, j, $window))))
           |     ELSE slice(hs, 1, 0) END""".stripMargin
      else
        s"""array_distinct(transform(sequence(1, greatest(size(hs)-${window - 1}, 1)),
           |                         j -> array_min(slice(hs, j, $window))))""".stripMargin
    val fps = s"element_at(transform(array($hashes), hs -> $body), 1)"
    // spread first: single-row-group input parquet pins the scan to
    // one task, serializing this row-local compute otherwise — sized by
    // cluster parallelism via Dedup.spread, the one copy of the rule
    // (measured: under numShufflePartitions=4 the extraction dominated
    // x55 at ~5 s of its runtime)
    Dedup.spread(docs).withColumn("fps", expr(fps))
  }

  /** Containment of the smaller doc's fingerprints in the larger's (basis
    * points). Because fingerprint sets are distinct per doc, |common| falls
    * straight out of the inverted-index pair counts — no per-pair set
    * intersection, so the shuffle carries only (fp → doc_id) and the
    * aggregation is a plain pair count.
    *
    * Plan shape pinned by measurement (sf0.1, BENCH_r04_xops.json;
    * 16.2 s naive → 6.3 s):
    *  1. The rolling-hash extraction dominates, twice over: every plan
    *     branch referencing it re-ran it (3 branches ≈ 15 s), and it was
    *     parallelized by numShufflePartitions (4 in the bench protocol)
    *     instead of cluster cores. `persist()` materializes it once and
    *     [[fingerprints]] now sizes by defaultParallelism. At 100 TB the
    *     same decision holds — write fingerprints to parquet once, every
    *     consumer reads the materialization.
    *  2. Prefilter counter-measurements, recorded so nobody re-walks
    *     them: a df ≥ 2 count-WINDOW over the high-cardinality fp column
    *     is a full sort (41.8 s — 2.6× WORSE than no prefilter), and a
    *     collect_list pair-generation aggregate falls back to sort-based
    *     object aggregation (51.1 s). The hash-agg + broadcast semi-join
    *     prefilter is a wash at this scale (12.8 vs 12.3 s pre-
    *     parallelism) — at 100 TB, add exactly x80's agg-based df ≥ 2
    *     prefilter before this join so only repeated fingerprints are
    *     shuffled; here the plain reused-exchange self-join wins. */
  def containment(docs: DataFrame, minContainBp: Long = 5000L,
                  maxDf: Int = Int.MaxValue): DataFrame =
    containmentFrom(fingerprints(docs), minContainBp, maxDf)

  /** [[containment]] under the portable md5 hash family — same
    * inverted-index pair-count machinery, hash-checked against the x80
    * SQL twin's DuckDB form (Extensions.oracleSql "x55", cap off). */
  def containmentPortable(docs: DataFrame, minContainBp: Long = 5000L,
                          maxDf: Int = Int.MaxValue): DataFrame =
    containmentFrom(fingerprintsPortable(docs), minContainBp, maxDf)

  /** The fingerprints a df-capped [[containment]] skips: every fp whose
    * doc-frequency exceeds `maxDf`, with its df — the "log what was
    * dropped" half of the cap contract (same reporting shape as the
    * x119/semDeDup cap). Sized by distinct over-cap fps, not docs.
    * `portable = true` derives the report from the md5-affine family so
    * it audits [[containmentPortable]] runs — the two hash families
    * produce disjoint fingerprint universes, so the audit MUST use the
    * same family as the capped run it explains. */
  def droppedFingerprints(docs: DataFrame, maxDf: Int,
                          portable: Boolean = false): DataFrame = {
    val withFps = if (portable) fingerprintsPortable(docs) else fingerprints(docs)
    withFps
      .select(col("doc_id"), explode(col("fps")).as("fp"))
      .groupBy("fp").agg(count(lit(1)).as("df"))
      .where(col("df") > maxDf)
      .orderBy(desc("df"), col("fp"))
  }

  /** Winnowing fingerprints under the portable family: md5-prefix 32-bit
    * k-gram hashes (identical on both engines), minima over FULL windows
    * only — a doc with fewer than `window` k-gram positions yields no
    * fingerprints, exactly as the x80 twin's `i >= window` row filter.
    * (The production [[fingerprints]] keeps its partial-window fallback
    * for tiny docs; the two differ only below `k + window - 1` chars.) */
  def fingerprintsPortable(docs: DataFrame, textCol: String = "text",
                           k: Int = 8, window: Int = 4): DataFrame =
    fingerprintsHofWith(docs, textCol, k, window,
      HashFamily.Portable, fullWindowsOnly = true)

  /** `maxDf` is the quadratic-blow-up guard (SCALE.md §17: a 10×-replica
    * corpus makes the inverted-index self-join pay Σ C(df,2) — 52× wall
    * clock). Fingerprints shared by more than `maxDf` docs are excluded
    * from the self-join (one extra hash-agg + fp-key join, co-partitioned
    * with the self-join it feeds), so out-of-order use — containment
    * BEFORE exact dedup — degrades boundedly: join cost ≤ Σ_{df≤cap}
    * C(df,2) ≤ |fps|·cap²/2. Containment for pairs whose overlap was
    * carried by dropped fps is then an UNDERestimate (denominators keep
    * full set sizes) — the x119 bounded-degradation semantic; audit what
    * was dropped with [[droppedFingerprints]]. Default = no cap, which is
    * the x55 oracle contract. */
  private def containmentFrom(withFps: DataFrame, minContainBp: Long,
                              maxDf: Int = Int.MaxValue): DataFrame = {
    val fps = withFps.select(col("doc_id"),
      size(col("fps")).as("n"), col("fps"))
      .where(col("n") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val invAll = fps.select(col("doc_id"), explode(col("fps")).as("fp"))
    val inv =
      if (maxDf == Int.MaxValue) invAll
      else invAll.join(
        invAll.groupBy("fp").agg(count(lit(1)).as("df"))
          .where(col("df") <= maxDf).select("fp"),
        "fp")
    try {
      val common = inv.as("x").join(inv.as("y"),
          col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .agg(count(lit(1)).as("common"))
      common
        .join(fps.select(col("doc_id").as("a"), col("n").as("na")), "a")
        .join(fps.select(col("doc_id").as("b"), col("n").as("nb")), "b")
        .withColumn("contain_bp",
          floor(col("common") * lit(10000.0) / least(col("na"), col("nb"))).cast("long"))
        .where(col("contain_bp") >= minContainBp)
        .select(col("a"), col("b"), col("contain_bp"))
        .orderBy(desc("contain_bp"), col("a"), col("b"))
        // materialize off the persisted fps so it can be released NOW —
        // the operator owns its persists (ADVICE r5 #4: returning a lazy
        // plan over a cached frame leaks one cache entry per call, the
        // cache-accumulation failure mode; same discipline as
        // Dedup.nearDupsWithSig)
        .localCheckpoint(true)
    } finally fps.unpersist()
  }
}
