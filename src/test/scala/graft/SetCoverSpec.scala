package graft

import org.apache.spark.sql.functions._
import graft.operators.SetCover

/** Contract for the iterative greedy set-cover selector. The x244 entry
  * hash-checks it against x243's unrolled 3-round oracle at sf0.01;
  * this spec pins the greedy semantics on a hand-checkable universe,
  * the early-exhaustion stop, and agreement with the declarative
  * contract query at sf0.001. */
class SetCoverSpec extends SparkSpec {

  test("greedy picks maximize NEW coverage with doc_id tie-breaks") {
    import spark.implicits._
    // universe {a..f}: doc 1 covers {a,b,c}, doc 2 {c,d}, doc 3 {d,e,f},
    // doc 4 {a}. Greedy: pick 1 = doc 1 (3 new; doc 3 also has 3 —
    // smaller id wins), pick 2 = doc 3 (3 new), pick 3 = doc 2 (0 new →
    // exhausted, NOT picked).
    val m = Seq(
      (1L, "a"), (1L, "b"), (1L, "c"),
      (2L, "c"), (2L, "d"),
      (3L, "d"), (3L, "e"), (3L, "f"),
      (4L, "a")).toDF("doc_id", "term")
    val got = SetCover.greedySelect(m, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 1L, 3L), (2L, 3L, 3L)),
      s"greedy trace was $got")
  }

  test("k larger than meaningful picks stops at exhaustion") {
    import spark.implicits._
    val m = Seq((7L, "x"), (8L, "x")).toDF("doc_id", "term")
    val got = SetCover.greedySelect(m, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 7 takes the only term; doc 8 then contributes nothing
    assert(got == Seq((1L, 7L, 1L)), s"got $got")
  }

  test("matches the unrolled x243 contract query at sf0.001") {
    val want = Catalog.sql(spark, sf0001, Queries.sparkSql("x243_setcover3"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val got = SetCover.greedySelect(
      SetCover.bigramMembership(Catalog.load(spark, sf0001, "documents")), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"iterative $got vs unrolled $want")
  }
}
