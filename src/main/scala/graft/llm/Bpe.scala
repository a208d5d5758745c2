package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary induction (Sennrich et al., ACL 2016)
  * as an iterative operator — the executable scale form of the unrolled
  * x148 SQL, sharing its DuckDB oracle (the x136/x140 policy: the
  * declarative unrolling is for the oracle, iteration with materialized
  * state is the shape you run).
  *
  * Why this scales to 100 TB where the naive form does not:
  *  - The ONE corpus-scale pass is the word census (hash agg on words,
  *    the q13 shape). Every merge iteration after that operates on the
  *    word DICT — bounded by distinct-word count (~10⁷ for a web-scale
  *    corpus), orders of magnitude smaller than the corpus — so 30k
  *    merge steps touch the corpus zero additional times.
  *  - Each step's argmax pair is ONE collected row (cnt DESC, p1, p2
  *    total order) — the same driver-held-constant class as the IVF
  *    centroids; BPE's merge choice is inherently sequential, so this
  *    collect is the algorithm, not a shortcut.
  *  - Encoding applies merges to DISTINCT words and joins back, so the
  *    per-token rewrite cost is paid per dict entry, not per corpus
  *    occurrence.
  *
  * Symbol-string representation (shared with x148, where the rewrite
  * must be a single non-overlapping replace()): every symbol is wrapped
  * in its own spaces — 'the' → ' t  h  e ' — so back-to-back pair
  * occurrences ('a b a b') are non-overlapping matches and greedy
  * left-to-right replace() merges all of them, matching reference BPE.
  */
object Bpe {

  final case class Merge(step: Int, p1: String, p2: String, cnt: Long)

  /** Corpus-scale pass: lowercased whitespace word census; single-char
    * words carry no pairs and are excluded (same filter as x143/x148). */
  def wordCensus(docs: DataFrame): DataFrame =
    docs.select(explode(split(lower(col("text")), " ")).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("c"))

  // (?s): '.' must match LINE TERMINATORS too — without DOTALL a word
  // containing \n (whitespace-split keeps them) leaves the \n unwrapped,
  // producing a corrupt multi-char "symbol" with embedded spaces that
  // silently poisons the pair census and breaks the ' p1  p2 ' literal-
  // replace invariant. The SQL twins carry the same flag in both
  // dialects (Java and RE2 both honor (?s)), so the contract hash moves
  // together or not at all.
  private def wrapChars(w: org.apache.spark.sql.Column) =
    regexp_replace(w, "(?s)(.)", " $1 ")

  private def symbols(cs: org.apache.spark.sql.Column) =
    split(trim(cs), "  ")

  /** Weighted adjacent-pair census over the current encoding. */
  private def pairCensus(enc: DataFrame): DataFrame = {
    val s = enc.select(symbols(col("cs")).as("s"), col("c"))
      .where(size(col("s")) >= 2)
    s.select(col("s"), col("c"),
        explode(sequence(lit(1), size(col("s")) - 1)).as("i"))
      .select(element_at(col("s"), col("i")).as("p1"),
        element_at(col("s"), col("i") + lit(1)).as("p2"), col("c"))
      .groupBy("p1", "p2").agg(sum("c").as("cnt"))
  }

  /** Run nMerges BPE steps over the corpus word census. Returns the
    * merge table and the final (c, cs) encoded dict (persisted —
    * caller unpersists). Each step persists its rewrite and drops the
    * previous one, so lineage stays O(1) regardless of nMerges (the
    * ConnectedComponents/PageRank truncation discipline). */
  def train(docs: DataFrame, nMerges: Int): (Seq[Merge], DataFrame) = {
    var enc = wordCensus(docs)
      .select(col("c"), wrapChars(col("w")).as("cs")).persist()
    enc.count()
    val merges = Seq.newBuilder[Merge]
    var k = 1
    var exhausted = false
    while (k <= nMerges && !exhausted) {
      val best = pairCensus(enc)
        .orderBy(col("cnt").desc, col("p1"), col("p2")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val r = best(0)
        val (p1, p2) = (r.getString(0), r.getString(1))
        merges += Merge(k, p1, p2, r.getLong(2))
        val next = enc.select(col("c"),
          replace(col("cs"), lit(s" $p1  $p2 "), lit(s" $p1$p2 ")).as("cs"))
          .persist()
        next.count()
        enc.unpersist()
        enc = next
        k += 1
      }
    }
    (merges.result(), enc)
  }

  /** x148-shaped report: the merge table + the top-`topSyms` post-merge
    * symbol census, one result the shared DuckDB oracle hash-checks.
    * The global rank window runs on the symbol census — bounded by
    * |alphabet| + nMerges, driver-sized by construction. */
  def trainReport(docs: DataFrame, nMerges: Int = 3, topSyms: Int = 12): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, enc) = train(docs, nMerges)
    val sym = enc
      .select(explode(symbols(col("cs"))).as("a"), col("c"))
      .groupBy("a").agg(sum("c").as("cnt"))
      .withColumn("r", row_number().over(
        Window.orderBy(col("cnt").desc, col("a"))))
      .where(col("r") <= topSyms)
      // the symbol block's rank offset must clear the merge block's
      // 1..nMerges range — a fixed +10 collides once nMerges > 10 and
      // the terminal orderBy(rk) goes nondeterministic; max(10, n)
      // keeps the contract entry (nMerges=3, offset 10, matching the
      // x148 oracle's literal) bit-stable while unbounding the knob
      .select((col("r") + math.max(10, nMerges)).cast("long").as("rk"),
        lit("sym").as("kind"), col("a"), lit("").as("b"), col("cnt"))
    val mergeDf = merges
      .map(m => (m.step.toLong, "merge", m.p1, m.p2, m.cnt))
      .toDF("rk", "kind", "a", "b", "cnt")
    val out = mergeDf.unionByName(sym).orderBy("rk")
    // localCheckpoint (not cache): materializes off enc so it can be
    // released, truncates lineage, and leaves no catalog-cache entry
    // for the caller to leak (ADVICE r5 #4)
    val materialized = out.localCheckpoint(true)
    enc.unpersist()
    materialized
  }

  /** Apply learned merges and count post-BPE tokens per doc. The merge
    * rewrite runs once per DISTINCT word (the dict), then broadcast-
    * joins back to the corpus token stream — per-occurrence cost is a
    * join probe, not a rewrite. Single-char words count 1 token. */
  def encodedTokenCounts(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("w"))
      .where(length(col("w")) >= 1)
    val dict = words.select("w").distinct()
    val encoded = merges.foldLeft(wrapChars(col("w"))) { (cs, m) =>
      replace(cs, lit(s" ${m.p1}  ${m.p2} "), lit(s" ${m.p1}${m.p2} "))
    }
    val dictTok = dict.select(col("w"),
      when(length(col("w")) < 2, lit(1))
        .otherwise(size(symbols(encoded))).cast("long").as("n_tok"))
    words.join(broadcast(dictTok), "w")
      .groupBy("doc_id").agg(sum("n_tok").as("n_tok_bpe"))
  }
}
