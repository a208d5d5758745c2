package graft

import graft.operators.Graph

/** Contract for the triangle tier (x163/x165's engine): oriented-edge
  * enumeration emits each triangle exactly once as a<b<c, co-occurrence
  * edges honor min-support, and the persist-once pass agrees with the
  * naive closed form on known graphs. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("K4 has exactly C(4,3)=4 triangles, each emitted once, a<b<c") {
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
      .toDF("p1", "p2")
    val got = Graph.triangles(k4).as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
  }

  test("a path has no triangles; adding the closing edge creates one") {
    val path = Seq((1L, 2L), (2L, 3L)).toDF("p1", "p2")
    assert(Graph.triangles(path).isEmpty)
    val closed = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("p1", "p2")
    assert(Graph.triangles(closed).as[(Long, Long, Long)].collect().toSeq
      === Seq((1L, 2L, 3L)))
  }

  test("k-core peeling has degree feedback: a chain unravels, a clique survives") {
    // Triangle {1,2,3} + tail 3-4-5: every tail vertex starts at degree
    // ≥1, vertex 4 at degree 2 — a ONE-SHOT degree-2 filter keeps 4,
    // but peeling drops 5 (deg 1) in round 1, which drops 4 in round 2.
    // The triangle (all degree 2) must survive any number of rounds.
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)).toDF("p1", "p2")
    val got = Graph.kCorePeel(g, k = 2, rounds = 3)
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L), (2L, 2L), (3L, 2L)),
      s"2-core of triangle+tail is the triangle: $got")
    // one round is NOT enough: after round 1 vertex 4 is still present
    val oneRound = Graph.kCorePeel(g, k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(oneRound.contains(4L) && !oneRound.contains(5L),
      s"round 1 drops only the leaf: $oneRound")
    // k above the max degree empties the graph (no NPE, no residue)
    assert(Graph.kCorePeel(g, k = 5, rounds = 2).isEmpty)
  }

  test("co-occurrence edges: min-support filters, orientation p1<p2, dup lines collapse") {
    // Baskets: {A,B,C} twice (all three pairs support 2), {A,B} once
    // more (AB support 3), and a dup'd line (10,"A") that must not
    // inflate support. Items as strings to pin orientation is by value.
    val rows = Seq(
      (10L, "A"), (10L, "A"), (10L, "B"), (10L, "C"),
      (11L, "A"), (11L, "B"), (11L, "C"),
      (12L, "A"), (12L, "B")).toDF("basket", "item")
    val got = Graph.coOccurrenceEdges(rows, "basket", "item", minSupport = 2L)
      .orderBy("p1", "p2").as[(String, String, Long)].collect().toSeq
    assert(got === Seq(("A", "B", 3L), ("A", "C", 2L), ("B", "C", 2L)))
  }
}
