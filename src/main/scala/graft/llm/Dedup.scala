package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at scale: MinHash+LSH banding and SimHash.
  *
  * Design for 100 TB (SURVEY.md §2.9, M4):
  *  - Signatures are computed row-local with codegen'd higher-order
  *    functions (no UDF, no shuffle) — one narrow pass over the corpus.
  *  - Candidate generation shuffles only (bandKey → docId) pairs, never
  *    text: the explode fan-out is numHashes/rowsPerBand ints per doc.
  *  - Exact Jaccard verification touches only candidate pairs (the LSH
  *    contract), joining back to shingle sets by doc id.
  *  - All hashes are Spark's xxhash64 — deterministic across executors,
  *    no driver-side state to broadcast.
  */
object Dedup {

  /** Distinct word n-gram shingles as an array column. */
  def shingles(words: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(size(words) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(words, i, lit(n)))))

  /** Spread row-local heavy compute across the cluster regardless of input
    * split count — the corpus files are single-row-group parquet, which
    * pins an unshuffled scan to ONE task no matter the split size. Sized
    * by CLUSTER parallelism, not numShufflePartitions: the latter is
    * tuned for shuffle volume (4 in the bench protocol) and starved the
    * CPU-bound signature kernels to 4 of 32 cores (same fix as
    * Fingerprint; measured on x52/x53 in BENCH_r04_xops.json). */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(math.max(
      df.sparkSession.sessionState.conf.numShufflePartitions,
      df.sparkSession.sparkContext.defaultParallelism))

  /** docs(doc_id, text) → (doc_id, shs: array<string>, n: int). */
  def shingleSets(docs: DataFrame, n: Int = 3): DataFrame =
    spread(docs)
      .select(col("doc_id"), shingles(split(col("text"), " "), n).as("shs"))
      .where(size(col("shs")) > 0)
      .withColumn("n", size(col("shs")))

  /** MinHash signature: element i = min over shingles of xxhash64(s, i).
    * The shingle array is let-bound so it's built once per row, not once
    * per hash function (see [[Cols.bind]]). */
  def minHashSignature(shs: Column, numHashes: Int): Column =
    Cols.bind(shs) { a =>
      transform(sequence(lit(0), lit(numHashes - 1)),
        i => array_min(transform(a, s => xxhash64(s, i))))
    }

  /** LSH banding: numHashes/rowsPerBand band keys per doc; docs sharing a
    * band key are candidates. P(candidate) = 1-(1-J^r)^b — pick r small
    * (2) for low-similarity corpora, large (8) for high thresholds. */
  def candidatePairs(docs: DataFrame, numHashes: Int, rowsPerBand: Int,
                     shingleN: Int = 3): DataFrame =
    candidatePairsFromSets(shingleSets(docs, shingleN), numHashes, rowsPerBand)

  /** Banding over precomputed shingle sets — lets [[minHashNearDups]]
    * share (and persist) ONE shingle extraction between candidate
    * generation and Jaccard verification instead of re-running the
    * row-local kernel per plan branch (the x55 lesson applied here). */
  private def candidatePairsFromSets(sets: DataFrame, numHashes: Int,
                                     rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val sig = sets.withColumn("sig", minHashSignature(col("shs"), numHashes))
    // let-bind sig: the banding lambda must slice a computed signature,
    // not recompute it per band
    val bands = sig.select(
      col("doc_id"),
      explode(Cols.bind(col("sig")) { g =>
        transform(sequence(lit(0), lit(numBands - 1)),
          b => struct(b.as("band"),
            xxhash64(b, slice(g, b * rowsPerBand + 1, lit(rowsPerBand)))
              .as("key")))
      }).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    // pairs sharing any band bucket; distinct before the expensive verify
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
  }

  /** Full near-dup pipeline: LSH candidates verified with exact Jaccard
    * (integer basis points), keeping pairs with jac_bp >= minJacBp. */
  def minHashNearDups(docs: DataFrame, numHashes: Int = 64,
                      rowsPerBand: Int = 2, minJacBp: Long = 3000L,
                      shingleN: Int = 3): DataFrame = {
    val sets = shingleSets(docs, shingleN)
      .select(col("doc_id"), col("shs"), col("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = candidatePairsFromSets(sets, numHashes, rowsPerBand)
    cands
      .join(sets.select(col("doc_id").as("a"), col("shs").as("sa"), col("n").as("na")), "a")
      .join(sets.select(col("doc_id").as("b"), col("shs").as("sb"), col("n").as("nb")), "b")
      .withColumn("c", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jac_bp",
        floor(col("c") * lit(10000.0) / (col("na") + col("nb") - col("c"))).cast("long"))
      .where(col("jac_bp") >= minJacBp)
      .select(col("a"), col("b"), col("jac_bp"))
      .orderBy(desc("jac_bp"), col("a"), col("b"))
  }

  /** Exact dedup keeping the lowest-`id` row per `key` — the hierarchical
    * per-partition-then-global dedup of SCALE.md §4 expressed Spark-first:
    * `min_by(struct(row), id)` runs as a PARTIAL aggregate inside each map
    * task (local dedup, no shuffle) and the exchange then carries at most
    * one candidate row per distinct key per task — vs the groupBy +
    * join-back shape, which shuffles the full corpus twice (both join
    * sides) to produce the same rows. Output column set/order preserved. */
  def exactKeepFirst(df: DataFrame, key: Column, id: String): DataFrame = {
    val cols = df.columns
    df.groupBy(key.as("__key"))
      .agg(min_by(struct(cols.map(col): _*), col(id)).as("__row"))
      .select(cols.map(c => col(s"__row.$c")): _*)
  }

  /** Near-dup GROUP dedup: resolve a pair list (a, b) into connected
    * components ([[graft.operators.ConnectedComponents]]) and keep one
    * canonical doc (the min id) per duplicate group. Strictly stronger
    * than dropping the larger id of each pair: with pairs (1,3),(2,3)
    * pairwise dropping keeps BOTH 1 and 2 — near-dups of each other
    * through 3 — while the transitive closure keeps only 1. Cost: the
    * component loop runs on the pair graph (vertices = docs with ≥1
    * near-dup, typically a tiny fraction of the corpus), then one
    * broadcast-sized anti join back to the full table. */
  def keepClusterCanonical(df: DataFrame, pairs: DataFrame,
                           id: String): DataFrame = {
    val losers = graft.operators.ConnectedComponents
      .run(pairs.select(col("a"), col("b")))
      .where(col("label") =!= col("id"))
      .select(col("id").as(id))
    df.join(losers, Seq(id), "left_anti")
  }

  /** 64-bit SimHash over a document's tokens, entirely row-local:
    * bit b = sign of Σ_tokens (bit b of xxhash64(token) ? +1 : -1).
    * HOF reference form — kept as the executable spec for the native
    * [[graft.functions.SimHash64]] expression (LlmOpsSpec asserts
    * equality on the corpus); 64 interpreted aggregate() passes per row
    * made the HOF the x53 bottleneck (x53 end-to-end 2.45 s → 0.40 s
    * at sf0.1 after the swap), so the operator path ([[simHashes]])
    * uses the native one. */
  def simHashHof(words: Column): Column = Cols.bind(words) { w =>
    // hash each token once, then take 64 bit-votes over the hash array
    Cols.bind(transform(w, t => xxhash64(t))) { hs =>
      // unrolled over the 64 bits (shiftright needs a literal bit index)
      val bitVotes: Seq[Column] = (0 until 64).map { b =>
        aggregate(hs, lit(0L), (acc, h) =>
          acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      }
      // pack with shift/or (not *2+bit): ANSI mode rejects the signed-long
      // overflow a full 64-bit signature hits on the top bit
      bitVotes.foldLeft(lit(0L))((acc, v) =>
        shiftleft(acc, 1).bitwiseOR(when(v > 0, 1L).otherwise(0L)))
    }
  }

  /** docs(doc_id, text) → (doc_id, simhash: long), via the native
    * codegen'd expression (identical bits to [[simHashHof]]). */
  def simHashes(docs: DataFrame): DataFrame = {
    graft.functions.SimHash64.register(docs.sparkSession)
    spread(docs)
      .select(col("doc_id"),
        graft.functions.SimHash64(split(col("text"), " ")).as("simhash"))
  }

  /** Pairs within a Hamming radius. Scale path: band the 64-bit signature
    * into (radius+1) chunks — pigeonhole guarantees pairs within the
    * radius share at least one exact chunk — join per chunk, then verify
    * with bit_count(xor). The full cross-join is never materialized. */
  def simHashNearDups(docs: DataFrame, maxHamming: Int = 6): DataFrame = {
    val chunks = maxHamming + 1
    val width = 64 / chunks
    val sigs = simHashes(docs)
    val banded = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until chunks).map(c => struct(
        lit(c).as("chunk"),
        shiftright(col("simhash"), c * width)
          .bitwiseAND((1L << width) - 1).as("key"))): _*)).as("ck"))
      .select(col("doc_id"), col("simhash"), col("ck.chunk"), col("ck.key"))
    banded.as("x").join(banded.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.key") === col("y.key") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hd"))
      .distinct()
      .where(col("hd") <= maxHamming)
      .orderBy(col("hd"), col("a"), col("b"))
  }
}
