package graft

import org.apache.spark.sql.functions._
import graft.llm.Bpe

/** Contract for the iterative BPE trainer (x149's engine). The merge
  * choice and the rewrite are both hand-computable on planted word
  * censuses, so expectations are exact — no tolerance bands. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("picks the count-weighted argmax pair and rewrites all occurrences") {
    // census: 'abab' ×3, 'ab' ×2 → pair (a,b) count 3*2+2 = 8 beats
    // (b,a) count 3. First merge must be (a,b) and the rewrite must
    // merge BOTH back-to-back occurrences inside 'abab' (the space-
    // wrapped encoding makes them non-overlapping matches).
    val docs = docsOf("abab abab abab ab ab")
    val (merges, enc) = Bpe.train(docs, 1)
    assert(merges.map(m => (m.step, m.p1, m.p2, m.cnt)) === Seq((1, "a", "b", 8L)))
    val encoded = enc.select(trim(col("cs"))).as[String].collect().toSet
    assert(encoded === Set("ab  ab", "ab"))
    enc.unpersist()
  }

  test("greedy left-to-right on odd runs: 'aaa' merges once, not twice") {
    // reference BPE on [a,a,a] with merge (a,a): first pair consumes
    // both symbols, leaving [aa, a] — the overlapping second pair must
    // NOT fire. 'aa aa' makes (a,a) the argmax with count 2+2+2(aaa)=6?
    // no: census words: 'aaa' ×1 (pairs (a,a)×2), 'aa' ×2 ((a,a)×1 each)
    // → cnt 4.
    val docs = docsOf("aaa aa aa")
    val (merges, enc) = Bpe.train(docs, 1)
    assert(merges.head.cnt === 4L)
    val encoded = enc.select(trim(col("cs"))).as[String].collect().toSet
    assert(encoded === Set("aa  a", "aa"))
    enc.unpersist()
  }

  test("train stops when no pairs remain and reports fewer merges") {
    // after (a,b) merges, every word is a single symbol — step 2 finds
    // an empty pair census and the loop exits instead of crashing
    val docs = docsOf("ab ab ab")
    val (merges, enc) = Bpe.train(docs, 5)
    assert(merges.size === 1)
    enc.unpersist()
  }

  test("iterative operator equals the unrolled x148 SQL on the corpus") {
    // the same equivalence the DuckDB oracle checks, held in-suite so a
    // refactor of either side trips locally before the driver gate
    val sql = Catalog.sql(spark, sf0001, Queries.sparkSql("x148_bpe_train3"))
      .as[(Long, String, String, String, Long)].collect().toSeq
    val native = SparkEntry.queries("x149_bpe_native")(spark, sf0001)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(native === sql)
  }

  test("encode: counts shrink by exactly the per-word merge applications") {
    // 'abab'(2 applications of (a,b)) + 'ab'(1) + 'cd'(0): with k
    // tokens pre-merge and m in-word applications, post count = k - m.
    val docs = docsOf("abab ab cd x")
    val (merges, enc) = Bpe.train(docs, 1)
    enc.unpersist()
    val got = Bpe.encodedTokenCounts(docs, merges)
      .as[(Long, Long)].collect().toMap
    // abab→[ab,ab]=2, ab→[ab]=1, cd→[c,d]=2, x→1 (single-char word)
    assert(got === Map(0L -> 6L))
  }
}
