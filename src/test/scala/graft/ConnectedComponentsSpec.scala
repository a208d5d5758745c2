package graft

import org.apache.spark.sql.functions._
import graft.operators.ConnectedComponents

/** Contract for the near-dup clustering operator (x111's engine):
  * component labels are the component-minimum id, convergence is
  * logarithmic (pointer jumping), and the transitive closure merges
  * chained pairs that pairwise logic would miss. */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("two components: chain and isolated pair get min-id labels") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (100L, 101L)).toDF("a", "b")
    val got = ConnectedComponents.run(edges)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (100L, 100L), (101L, 100L)))
  }

  test("long chain converges within the pointer-jump bound, not O(n)") {
    // A 64-vertex path: plain 1-hop propagation needs 63 rounds to carry
    // the min to the far end; propagation+jumping halves remaining
    // distances each round. maxIters=14 only terminates if the fused
    // update is genuinely superlinear (empirically 8 rounds incl. the
    // convergence-confirming one).
    val n = 64
    val edges = (0 until n - 1).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    // smallGraphBudget = 0 forces the DISTRIBUTED loop — this test pins
    // the pointer-jump convergence bound, which the r13 driver
    // union-find fast path would otherwise bypass at this size
    val got = ConnectedComponents.run(edges, maxIters = 14, smallGraphBudget = 0)
    assert(got.where(col("label") =!= 0L).isEmpty,
      "all 64 path vertices must reach label 0 within 14 fused rounds")
    assert(got.count() === n.toLong)
  }

  test("duplicate edges, reversed orientation, and self-loops are tolerated") {
    val edges = Seq((2L, 1L), (1L, 2L), (2L, 2L), (3L, 2L)).toDF("a", "b")
    val got = ConnectedComponents.run(edges)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("empty edge list yields empty labeling") {
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(ConnectedComponents.run(edges).isEmpty)
  }

  test("null-endpoint edges are dropped, not NPE'd, on both paths (ADVICE r13 #4)") {
    // (1,2) is a real edge; (3,null) and (null,4) must vanish entirely —
    // the null side identifies nothing, and the non-null side is not
    // "incident to an edge" once its only edge is dropped
    val edges = Seq((Some(1L), Some(2L)), (Some(3L), None),
      (None, Some(4L))).toDF("a", "b")
    val want = Seq((1L, 1L), (2L, 1L))
    assert(ConnectedComponents.run(edges)
      .orderBy("id").as[(Long, Long)].collect().toSeq === want)
    assert(ConnectedComponents.run(edges, smallGraphBudget = 0)
      .orderBy("id").as[(Long, Long)].collect().toSeq === want)
  }

  test("driver union-find fast path == distributed pointer jumping (same labels)") {
    // the r13 small-graph gate must be invisible in the output: both
    // paths land on the identical (id, component-min label) fixpoint,
    // on the real pair graph and on a synthetic multi-component mix of
    // chains, cliques, self-loops, and duplicate orientations
    val pairs = Catalog.sql(spark, sf0001, Queries.sparkSql("x74_minhash_sql"))
      .select(col("a"), col("b")).localCheckpoint(true)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id").as[(Long, Long)].collect().toSeq
    assert(canon(ConnectedComponents.run(pairs)) ==
      canon(ConnectedComponents.run(pairs, smallGraphBudget = 0)))
    val synth = (Seq((5L, 9L), (9L, 5L), (7L, 7L), (20L, 21L), (21L, 22L)) ++
      (0 until 30).map(i => (100L + i, 100L + (i + 1) % 30))).toDF("a", "b")
    assert(canon(ConnectedComponents.run(synth)) ==
      canon(ConnectedComponents.run(synth, smallGraphBudget = 0)))
  }

  test("x111 clusters refine the x74 pair list transitively (sf0.001)") {
    // Every pair endpoint lands in one cluster with its partner, and the
    // cluster id is the min doc over the whole group — even when the
    // group is larger than any single pair.
    val pairs = Catalog.sql(spark, sf0001, Queries.sparkSql("x74_minhash_sql"))
      .select(col("a"), col("b")).localCheckpoint(true)
    val labels = ConnectedComponents.run(pairs)
      .as[(Long, Long)].collect().toMap
    val ps = pairs.as[(Long, Long)].collect()
    assert(ps.forall { case (a, b) => labels(a) == labels(b) },
      "pair endpoints must share a component label")
    assert(labels.forall { case (id, l) => l <= id },
      "labels are component minima")
  }
}
