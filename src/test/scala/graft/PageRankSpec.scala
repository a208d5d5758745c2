package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** Contract for the iterative integer PageRank (x140's engine). Exact
  * nano-unit arithmetic means expected values are computable by hand
  * with the same recurrence — no tolerance bands anywhere. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long, Long)], nodes: Seq[Long],
                    iters: Int, start: Long, teleport: Long): Map[Long, Long] =
    PageRank.run(edges.toDF("src", "dst", "w"), nodes.toDF("node"),
        iters, start, teleport)
      .as[(Long, Long)].collect().toMap

  test("uniform cycle is a fixpoint of the integer recurrence") {
    // 3-cycle, N=3: start 1/3, teleport 0.15/3. Each node receives
    // exactly one full rank, so r' = 50000000 + (85*r) div 100, and
    // r = 333333333 maps to itself (333333333*85 div 100 = 283333333).
    val got = ranks(Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L)),
      Seq(1L, 2L, 3L), iters = 3, start = 333333333L, teleport = 50000000L)
    assert(got === Map(1L -> 333333333L, 2L -> 333333333L, 3L -> 333333333L))
  }

  test("sink keeps teleport only; weighted split follows edge weights") {
    // 1 -> 2 (w=3) and 1 -> 3 (w=1); node 4 isolated. After one round:
    // contrib(2) = (400000000*3) div 4 = 300000000, contrib(3) =
    // 100000000; r' = 37500000 + (85*contrib) div 100. Node 1 and 4
    // receive nothing -> teleport only.
    val got = ranks(Seq((1L, 2L, 3L), (1L, 3L, 1L)),
      Seq(1L, 2L, 3L, 4L), iters = 1,
      start = 400000000L, teleport = 37500000L)
    assert(got === Map(
      1L -> 37500000L,
      2L -> (37500000L + 85L * 300000000L / 100L),
      3L -> (37500000L + 85L * 100000000L / 100L),
      4L -> 37500000L))
  }

  test("zero iterations returns the start ranks for every node") {
    val got = ranks(Seq((1L, 2L, 1L)), Seq(1L, 2L, 3L),
      iters = 0, start = 7L, teleport = 99L)
    assert(got === Map(1L -> 7L, 2L -> 7L, 3L -> 7L))
  }

  test("iterative operator equals the unrolled x136 SQL on the corpus") {
    // the same equivalence the DuckDB oracle checks, held in-suite so a
    // refactor of either side trips locally before the driver gate
    val sql = Catalog.sql(spark, sf0001, Queries.sparkSql("x136_pagerank"))
      .select("nationkey", "rank_nano").as[(Long, Long)].collect().toMap
    val native = SparkEntry.queries("x140_pagerank_native")(spark, sf0001)
      .select("nationkey", "rank_nano").as[(Long, Long)].collect().toMap
    assert(native === sql)
  }
}
