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

  // --- HITS (x327's engine) ------------------------------------------

  /** In-test reference: the x326 recurrence in plain Scala longs —
    * scores start at `scale`, each half-step is Σ score·w over in-
    * (auth) / out- (hub) edges then (v·scale) div max(v). All values
    * non-negative, so Scala `/` == SQL `div`. */
  private def refHits(edges: Seq[(Long, Long, Long)], nodes: Seq[Long],
                      iters: Int, scale: Long): Map[Long, (Long, Long)] = {
    var h = nodes.map(_ -> scale).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      val rawA = nodes.map(n =>
        n -> edges.collect { case (s, d, w) if d == n => h(s) * w }.sum).toMap
      val mxA = rawA.values.max
      a = rawA.map { case (n, v) => n -> (v * scale) / mxA }
      val rawH = nodes.map(n =>
        n -> edges.collect { case (s, d, w) if s == n => a(d) * w }.sum).toMap
      val mxH = rawH.values.max
      h = rawH.map { case (n, v) => n -> (v * scale) / mxH }
    }
    nodes.map(n => n -> (h(n), a(n))).toMap
  }

  test("HITS on a star: the center is the unit hub, leaves are the auths") {
    // 1 → {2,3,4} with equal weight: center hub = scale, auth = 0;
    // every leaf auth = scale (ties at the max), hub = 0.
    val edges = Seq((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L)).toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("node")
    val got = Graph.hits(edges, nodes, iters = 2)
      .orderBy("node").as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1000000L, 0L), (2L, 0L, 1000000L),
      (3L, 0L, 1000000L), (4L, 0L, 1000000L)))
  }

  test("HITS matches the exact integer recurrence on a weighted digraph") {
    // asymmetric weights, a node that is both hub and auth (3), an
    // isolated node (6) that must appear with (0, 0), 3 iterations
    val es = Seq((1L, 3L, 5L), (1L, 4L, 2L), (2L, 3L, 1L),
      (3L, 4L, 7L), (3L, 5L, 1L), (4L, 5L, 3L))
    val ns = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    val want = refHits(es, ns, iters = 3, scale = 1000000L)
    val got = Graph.hits(es.toDF("src", "dst", "w"), ns.toDF("node"), iters = 3)
      .as[(Long, Long, Long)].collect()
      .map { case (n, h, a) => n -> (h, a) }.toMap
    assert(got === want)
  }

  test("HITS equals the reference recurrence on seeded random digraphs") {
    // the integer-exactness claim (execution-order-independent sums +
    // integer division) must hold for arbitrary topology, weights and
    // depth, not just the crafted fixture above — 4 seeded random
    // digraphs, 4-8 nodes, weight 1-9, 1-3 iterations
    val rnd = new scala.util.Random(11)
    (1 to 4).foreach { trial =>
      val n = 4 + rnd.nextInt(5)
      val ns = (1L to n.toLong).toSeq
      val es = for {
        s <- ns; d <- ns
        if s != d && rnd.nextInt(3) == 0
      } yield (s, d, 1L + rnd.nextInt(9).toLong)
      if (es.nonEmpty) { // ≥1 edge ⇒ every half-step's max(v) > 0
        val iters = 1 + rnd.nextInt(3)
        val want = refHits(es, ns, iters, 1000000L)
        val got = Graph.hits(es.toDF("src", "dst", "w"), ns.toDF("node"), iters)
          .as[(Long, Long, Long)].collect()
          .map { case (nd, h, a) => nd -> (h, a) }.toMap
        assert(got === want, s"trial $trial: n=$n edges=${es.size} iters=$iters")
      }
    }
  }

  test("per-mille weight shrink preserves hub/auth rank order on share-dominated weights") {
    // weights are exact per-mille multiples of the total (Σw = 10000 →
    // w' = w/10, no rounding) so ordering survives the shrink exactly
    val es = Seq((1L, 3L, 5000L), (2L, 3L, 3000L), (2L, 4L, 1500L),
      (3L, 4L, 500L))
    val ns = Seq(1L, 2L, 3L, 4L)
    def ranks(edges: org.apache.spark.sql.DataFrame): (Seq[Long], Seq[Long]) = {
      val rows = Graph.hits(edges, ns.toDF("node"), iters = 2)
        .as[(Long, Long, Long)].collect().toSeq
      (rows.sortBy(r => (-r._2, r._1)).map(_._1), // hub order
       rows.sortBy(r => (-r._3, r._1)).map(_._1)) // auth order
    }
    val exact = ranks(es.toDF("src", "dst", "w"))
    val shrunk = ranks(Graph.perMilleWeights(es.toDF("src", "dst", "w")))
    assert(shrunk === exact)
    // and the shrink itself floors to per-mille shares, never below 1
    val w2 = Graph.perMilleWeights(
      Seq((1L, 2L, 999999L), (2L, 3L, 1L)).toDF("src", "dst", "w"))
      .orderBy("src").as[(Long, Long, Long)].collect().toSeq
    assert(w2 === Seq((1L, 2L, 999L), (2L, 3L, 1L)))
  }

  test("HITS overflow guard fails loudly instead of wrapping BIGINT") {
    // one in-edge of weight 10^7 at hub score 10^6 → raw v = 10^13 >
    // 2^63/10^6 ≈ 9.22e12: the normalizer product would overflow.
    // Under default ANSI that raises generically; ansi=off would wrap
    // silently where DuckDB raises (ADVICE r10 #4) — either way the
    // entry guard must kill the job FIRST, with the remedy
    val edges = Seq((1L, 2L, 10000000L)).toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L).toDF("node")
    val e = intercept[Exception] {
      Graph.hits(edges, nodes, iters = 1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("perMilleWeights")),
      s"unexpected failure: $e")
  }

  test("HITS overflow guard is not blind past 2^63 with ansi=off (wrap-landing regime)") {
    // w = 2^64/10^6 + δ: true v = 10^6·w ≈ 1.8e19 ≥ 2^63, and with
    // ansi=off the BIGINT sum wraps modulo 2^64 to a SMALL positive
    // value that would sail under any post-aggregation v ≤ bound
    // check — the silent-corruption regime a guard placed after the
    // sum cannot see. The entry guard runs on per-node Σw in DOUBLE
    // (cannot wrap), so it must fail with the named remedy BEFORE any
    // wrapping arithmetic executes, in ansi=off exactly like ANSI-on.
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val edges = Seq((1L, 2L, 18446744073710L)).toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L).toDF("node")
    // sanity of the fixture: 10^6·w mod 2^64 is positive and under the
    // old post-sum bound 2^63/10^6 — i.e. this input WOULD have passed
    val wrapped = 1000000L * 18446744073710L
    assert(wrapped > 0L && wrapped < Long.MaxValue / 1000000L,
      s"fixture no longer lands in the wrap-blind window: $wrapped")
    for (ansi <- Seq("true", "false")) {
      val prev = spark.conf.get("spark.sql.ansi.enabled")
      spark.conf.set("spark.sql.ansi.enabled", ansi)
      try {
        val e = intercept[Exception] {
          Graph.hits(edges, nodes, iters = 1).collect()
        }
        assert(msgs(e).exists(_.contains("perMilleWeights")),
          s"ansi=$ansi raised without the named remedy: $e")
      } finally spark.conf.set("spark.sql.ansi.enabled", prev)
    }
  }

  test("HITS guard bounds each direction separately, not in+out combined") {
    // ADVICE r11 #2: swBound with scale=10^6 is 2^63/10^12 ≈ 9223.37.
    // A node with Σw = 5000 out AND 5000 in is within the bound in
    // EACH direction (each half-step sums one direction only), but an
    // untagged union-then-sum sees 10000 > 9223 and spuriously
    // rejects. The per-direction guard must let this graph through —
    // and the run must produce finite scores.
    val edges = Seq((1L, 2L, 5000L), (2L, 1L, 5000L)).toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L).toDF("node")
    val rows = Graph.hits(edges, nodes, iters = 2).collect()
    assert(rows.length == 2)
    assert(rows.forall(r => r.getLong(1) >= 0L && r.getLong(2) >= 0L))
  }

  test("HITS rejects negative edge weights by name") {
    // a negative weight breaks the v >= 0 induction the zero-guard and
    // the overflow bound both rest on, and with ansi=off it would just
    // sign the scores silently — the entry guard names it instead
    val edges = Seq((1L, 2L, 5L), (2L, 1L, -1L)).toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L).toDF("node")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e = intercept[Exception] {
      Graph.hits(edges, nodes, iters = 1).collect()
    }
    assert(msgs(e).exists(_.contains("non-negative weights")),
      s"unexpected failure: $e")
  }

  test("HITS on an edgeless or zero-weight graph fails loudly, same in both ANSI modes") {
    // max raw score 0 ⇒ the normalizer would divide by zero — which
    // raises GENERICALLY under default ANSI but returns silent
    // all-null scores with ansi=off. The 1-row max guard must name
    // the real cause first, identically in both modes.
    import spark.implicits._
    val nodes = Seq(1L, 2L).toDF("node")
    Seq(
      Seq.empty[(Long, Long, Long)],   // no edges at all
      Seq((1L, 2L, 0L))                // edges exist, all weights 0
    ).foreach { es =>
      val e = intercept[Exception] {
        Graph.hits(es.toDF("src", "dst", "w"), nodes, iters = 1).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("HITS is undefined")),
        s"edges=$es raised without the named cause: $e")
    }
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
