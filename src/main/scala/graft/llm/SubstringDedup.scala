package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact-substring dedup APPLY — the production twin of the declared
  * x332 entry (the x136/x140/x327 policy: iterative/persist-once native
  * sharing the declared form's DuckDB oracle verbatim).
  *
  * Semantics (identical to x332, bit-for-bit): every `window`-token
  * span shared by ≥ 2 docs is owned by its lowest doc_id (keep-first);
  * every other occurrence merges into disjoint spans and the covered
  * tokens are cut, emitting the cleaned text rebuilt in position order.
  *
  * Why a native form exists: the production consumer is "write the
  * deduped corpus back out", and the declared entry can only ship a
  * deterministic top-15 diagnostic slice (the oracle must hash a
  * bounded result) — this operator returns the FULL cleaned corpus as
  * a composable DataFrame. A persist-once rewrite of the CTE
  * re-derivations was the original premise and was MEASURED INTO
  * REVERSE at 10× (see `persistWindows` below): unlike the x140/x327
  * graph cases, the re-derived subtrees here are one codegen'd
  * split+md5 pass, cheaper to recompute than to cache.
  *
  * Scale shape: window hashes shuffle (never text) for ownership; span
  * merge is one per-doc window cascade; coverage explode is linear in
  * covered tokens; the rebuild is one per-doc aggregation. Nothing
  * quadratic, no driver state.
  */
object SubstringDedup {

  /** Cleaned corpus: one row per document that had at least one span
    * removed — (doc_id, n_tok, n_kept, n_removed, cleaned). Documents
    * with nothing to remove are absent (their cleaned text is the
    * identity; emitting the whole corpus would just copy it).
    *
    * `persistWindows` — MEASURED OFF by default (SCALE.md §40): both
    * persist variants LOST to plain recomputation at 10× (tokens+windows
    * persisted: 5.81 s; windows only: 7.41 s; no persist ≈ the declared
    * form's 4.1 s). The re-derivations the x136/x140 policy usually
    * removes are codegen-cheap here (split + md5 over one pass), while
    * a cache barrier both pays the materialization write and breaks
    * whole-stage fusion around it. The knob stays for upstreams where
    * `docs` is itself expensive (a filtered join, a decoded column) —
    * there the recompute is no longer a cheap split and the trade
    * flips back.
    *
    * CACHE LIFETIME (ADVICE r14 #2): with `persistWindows = true` the
    * MEMORY_AND_DISK entry for the window frame outlives the returned
    * DataFrame's consumption — Spark has no consume-once cache, so it
    * stays until the session ends or the caller releases it. Callers
    * who persist should use [[cleanedDocsWithRelease]] and invoke the
    * release thunk after the result's LAST action; this plain overload
    * keeps the entry alive deliberately (the repeated-apply session
    * shape, where the next call wants the warm windows). */
  def cleanedDocs(docs: DataFrame, window: Int = 8,
                  persistWindows: Boolean = false): DataFrame =
    cleanedDocsWithRelease(docs, window, persistWindows)._1

  /** [[cleanedDocs]] plus the cache-release hook: the returned thunk
    * unpersists the window frame (no-op when `persistWindows` was
    * false). Call it after the cleaned frame's last action — releasing
    * earlier recomputes, never corrupts (Spark caching is a
    * materialization hint, not a correctness dependency). */
  def cleanedDocsWithRelease(docs: DataFrame, window: Int = 8,
                             persistWindows: Boolean = false): (DataFrame, () => Unit) = {
    // 1-based positions throughout, mirroring the declared SQL exactly
    // (slice/sequence are 1-based in SQL; posexplode is 0-based, +1).
    val t = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .where(size(col("w")) >= window)
    val winsRaw = t
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(1), size(col("w")) - (window - 1))).as("i"))
      .select(col("doc_id"), col("i"),
        md5(concat_ws(" ", slice(col("w"), col("i"), lit(window)))).as("h"))
    val wins =
      if (persistWindows) winsRaw.persist(StorageLevel.MEMORY_AND_DISK)
      else winsRaw

    val own = wins.groupBy("h")
      .agg(min("doc_id").as("keeper"),
        countDistinct("doc_id").as("nd"))
      .where(col("nd") >= 2)
      .select("h", "keeper")

    val dup = wins.join(own, "h")
      .where(col("doc_id") > col("keeper"))
      .select(col("doc_id"), col("i").as("s"),
        (col("i") + window).as("e"))

    // classic island merge: a span starts a new group when it begins
    // past the running max end of everything before it
    val byDoc = Window.partitionBy("doc_id").orderBy("s")
    val merged = dup
      .withColumn("pe", max("e").over(
        byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("g", sum(when(col("pe").isNull || col("s") > col("pe"), 1)
        .otherwise(0)).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "g")
      .agg(min("s").as("s"), max("e").as("e"))

    // Range-based rebuild (r15, closing VERDICT r14 #3's open row): the
    // r14 assembly rebuilt by token — explode the covered positions
    // (rows ∝ covered tokens), re-tokenize every affected doc (rows ∝
    // its tokens), anti-join the two, then re-SORT the survivors back
    // into a string. But the merged islands already ARE the coverage,
    // as disjoint ordered ranges — so rebuild by RANGE instead: collect
    // each doc's spans (rows ∝ spans, orders of magnitude below
    // tokens), join the affected docs' token arrays once, and cut the
    // kept text as the concatenation of inter-span slices via
    // zip_with/flatten HOFs — one codegen pass per doc, no coverage
    // explode, no anti-join exchange, no per-token struct sort.
    // Measured under the paired-alternating protocol (SCALE.md §41 —
    // this container drifts several × within minutes, so the two forms
    // are interleaved rep-for-rep and compared by median): native vs
    // declared 1.47 vs 1.81 s at sf0.1, 3.19 vs 4.49 s at 10× — from
    // 31% slower than the declared form (the r14 open row) to 19-29%
    // FASTER.
    val spanList = merged
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("sp"))

    // disjoint sorted spans [s, e) ⇒ kept gaps are [1, s1-1],
    // [e1, s2-1], …, [ek, n]; zero-length gaps slice to empty
    val out = t.join(spanList, "doc_id") // inner ≡ semi: only affected docs carry spans
      .withColumn("starts",
        array_prepend(transform(col("sp"), (x: Column) => x.getField("e")), lit(1)))
      .withColumn("ends",
        array_append(transform(col("sp"), (x: Column) => x.getField("s") - 1),
          size(col("w"))))
      .withColumn("kept", flatten(zip_with(col("starts"), col("ends"),
        (a: Column, b: Column) =>
          slice(col("w"), a, greatest(b - a + lit(1), lit(0))))))
      .select(col("doc_id"), size(col("w")).cast("long").as("n_tok"),
        size(col("kept")).cast("long").as("n_kept"),
        (size(col("w")) - size(col("kept"))).cast("long").as("n_removed"),
        array_join(col("kept"), " ").as("cleaned"))
    (out, () => if (persistWindows) { wins.unpersist(); () })
  }
}
