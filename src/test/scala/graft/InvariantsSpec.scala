package graft

import org.apache.spark.sql.functions._
import scala.util.Random

/** Property-style invariants (SURVEY.md §5.2 t4), driven with seeded
  * generated data in single Spark jobs (scalacheck runner integration
  * isn't available offline; generators are hand-seeded). */
class InvariantsSpec extends SparkSpec {

  val rnd = new Random(42)

  test("cosine: symmetry and bound over 200 random float vectors") {
    import spark.implicits._
    Catalog.ensure(spark, sf0001)
    val vecs = Seq.fill(200)(
      (Array.fill(16)(rnd.nextFloat() * 2 - 1), Array.fill(16)(rnd.nextFloat() * 2 - 1)))
    val df = vecs.toDF("a", "b")
      .select(expr("cosine_sim(a, b)").as("ab"), expr("cosine_sim(b, a)").as("ba"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "cosine must be symmetric bit-for-bit")
      assert(r.getDouble(0) <= 1.0 + 1e-9 && r.getDouble(0) >= -1.0 - 1e-9)
    }
  }

  test("cosine: invariant to positive scaling") {
    import spark.implicits._
    Catalog.ensure(spark, sf0001)
    val vecs = Seq.fill(100)(
      (Array.fill(16)(rnd.nextFloat() * 2 - 1), rnd.nextFloat() * 9 + 0.5f))
    val df = vecs.toDF("a", "k")
      .select(expr("cosine_sim(a, a)").as("self"),
        expr("cosine_sim(a, transform(a, x -> cast(x * k AS float)))").as("scaled"))
    df.collect().foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(0)) < 1e-5,
        s"scaling changed cosine: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    }
  }

  test("declared queries are invariant to shuffle width (determinism)") {
    // the riskiest ordering/accumulation queries, executed under different
    // shuffle fan-out — results must be identical row-for-row
    val risky = Seq("q23_asof_join", "q28_running_total",
      "q31_sessionization", "q41_collect_agg", "q13_wordcount")
    Catalog.ensure(spark, sf0001)
    risky.foreach { name =>
      val sql = Queries.sparkSql(name)
      spark.conf.set("spark.sql.shuffle.partitions", "3")
      val a = spark.sql(sql).collect().map(_.toString).toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = spark.sql(sql).collect().map(_.toString).toSeq
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      assert(a == b, s"$name changed under different shuffle widths")
    }
  }

  test("sessionization is invariant to input row order") {
    Catalog.ensure(spark, sf0001)
    val base = SparkEntry.queries("q31_sessionization")(spark, sf0001)
      .collect().map(_.toString).toSeq
    // same computation over a shuffled materialization of events
    val shuffled = Catalog.load(spark, sf0001, "events")
      .orderBy(expr("xxhash64(event_id)"))
    shuffled.createOrReplaceTempView("events_shuffled")
    val sql = Queries.sparkSql("q31_sessionization")
      .replace("FROM events", "FROM events_shuffled")
    val got = spark.sql(sql).collect().map(_.toString).toSeq
    assert(got == base)
  }

  test("typed facade loads every table with the declared schema") {
    assert(Tables.region(spark, sf0001).count() == 5)
    assert(Tables.nation(spark, sf0001).count() == 25)
    assert(Tables.customer(spark, sf0001).filter(_.c_acctbal > 0).count() > 0)
    assert(Tables.orders(spark, sf0001).filter(_.o_orderstatus == "F").count() > 0)
    assert(Tables.lineitem(spark, sf0001).count() == 6000)
    assert(Tables.events(spark, sf0001).filter(_.event_type == "click").count() > 0)
    assert(Tables.documents(spark, sf0001).count() == 500)
    assert(Tables.embeddings(spark, sf0001).head().embedding.length == 64)
    assert(Tables.supplier(spark, sf0001).count() == 10)
    assert(Tables.part(spark, sf0001).count() == 200)
  }

  test("profileApprox: HLL ndv inside error bound; nulls/min/max stay exact") {
    // The x161 scale path (VERDICT r6 #6): sketch ndv replaces the
    // Expand multi-distinct. Contract: ndv within 5×rsd of the exact
    // profiler (HLL++ at rsd=0.02 is a 2% standard deviation — 5σ is
    // the never-flakes margin; small cardinalities are exact by HLL's
    // sparse mode), and the non-sketch stats are bit-identical.
    val li = Catalog.load(spark, sf0001, "lineitem")
    val cols = Seq("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate")
    val exact = graft.operators.ColumnProfile.profile(li, cols)
      .collect().map(r => r.getString(0) -> r).toMap
    val approx = graft.operators.ColumnProfile.profileApprox(li, cols, rsd = 0.02)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet && approx.keySet == cols.toSet)
    cols.foreach { c =>
      val (e, a) = (exact(c), approx(c))
      val (ndvE, ndvA) = (e.getLong(1), a.getLong(1))
      assert(math.abs(ndvA - ndvE) <= math.max(1L, (0.10 * ndvE).toLong),
        s"$c: approx ndv $ndvA vs exact $ndvE exceeds 5×rsd bound")
      assert(a.getLong(2) == e.getLong(2), s"$c: null count must be exact")
      assert(a.getString(3) == e.getString(3) && a.getString(4) == e.getString(4),
        s"$c: min/max must be exact")
    }
  }

  test("percentile_approx stays inside the GK rank-error bound vs exact") {
    // the sketch-tier quantile (mergeable, fixed-size state — the 100 TB
    // replacement for exact percentile sorts, and what GlobalWindow's
    // boundary pass uses). accuracy=100 guarantees rank error <= 1%, so
    // the approx p50 must land between the exact p45 and p55 per group —
    // same error-bound pattern as the HLL spec, wider margin for safety.
    val events = Catalog.load(spark, sf0001, "events")
    val rows = events.groupBy("event_type").agg(
        percentile_approx(col("value"), lit(0.5), lit(100)).as("approx"),
        expr("percentile(value, array(0.45, 0.55))").as("bounds"))
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val approx = r.getDouble(1)
      val lo = r.getSeq[Double](2).head
      val hi = r.getSeq[Double](2).last
      assert(approx >= lo && approx <= hi,
        s"${r.getString(0)}: approx p50 $approx outside exact [$lo, $hi]")
    }
  }
}
