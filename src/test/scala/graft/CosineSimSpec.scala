package graft

import graft.functions.CosineSim
import org.apache.spark.sql.functions._

/** The native expression must be bit-identical to the HOF composition it
  * replaced (the oracle hashes depend on it) and must stay codegen'd. */
class CosineSimSpec extends SparkSpec {

  lazy val embs = Catalog.load(spark, sf0001, "embeddings")

  test("native cosine_sim == HOF composition on every pair vs vec 0") {
    Catalog.ensure(spark, sf0001)
    val hof = spark.sql(
      """WITH q AS (SELECT transform(embedding, x -> cast(x AS DOUBLE)) AS e
        |           FROM embeddings WHERE vec_id=0),
        |v AS (SELECT vec_id, transform(embedding, x -> cast(x AS DOUBLE)) AS e
        |      FROM embeddings WHERE vec_id <> 0)
        |SELECT v.vec_id,
        |       aggregate(zip_with(v.e, q.e, (x,y) -> x*y), 0D, (s,x) -> s+x)
        |       / (sqrt(aggregate(v.e, 0D, (s,x) -> s+x*x))
        |          * sqrt(aggregate(q.e, 0D, (s,x) -> s+x*x))) AS sim
        |FROM v, q ORDER BY v.vec_id""".stripMargin).collect()
    val native = spark.sql(
      """WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id=0)
        |SELECT v.vec_id, cosine_sim(v.embedding, q.e) AS sim
        |FROM embeddings v, q WHERE v.vec_id <> 0 ORDER BY v.vec_id""".stripMargin)
      .collect()
    assert(hof.length == native.length)
    hof.zip(native).foreach { case (a, b) =>
      // bit-identical, not approximately equal: same IEEE op sequence
      assert(a.getDouble(1) == b.getDouble(1),
        s"vec ${a.getLong(0)}: hof=${a.getDouble(1)} native=${b.getDouble(1)}")
    }
  }

  test("column DSL form works and self-similarity is 1.0") {
    Catalog.ensure(spark, sf0001)
    val r = embs.select(CosineSim(col("embedding"), col("embedding")).as("s"))
      .agg(min("s"), max("s")).collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("expression participates in whole-stage codegen") {
    Catalog.ensure(spark, sf0001)
    val df = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS s FROM embeddings")
    // "*(n) Project" marks the operator as inside a WholeStageCodegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("Project") && l.trim.startsWith("*")), plan)
  }

  test("accepts float/double arrays per side (widening), rejects other element types") {
    // r17 widening: each side independently float or double, so the Ann
    // consumers that score pre-cast double columns (query literals,
    // bucketed e) run the native kernel without re-plumbing. Mixed
    // float/double must equal the all-double value exactly — float
    // widens losslessly.
    Catalog.ensure(spark, sf0001)
    val dd = spark.sql(
      "SELECT cosine_sim(array(1.0D, 2.0D), array(2.0D, 1.0D))").head.getDouble(0)
    val fd = spark.sql(
      """SELECT cosine_sim(array(cast(1.0 AS FLOAT), cast(2.0 AS FLOAT)),
        |                  array(2.0D, 1.0D))""".stripMargin).head.getDouble(0)
    val ff = spark.sql(
      """SELECT cosine_sim(array(cast(1.0 AS FLOAT), cast(2.0 AS FLOAT)),
        |                  array(cast(2.0 AS FLOAT), cast(1.0 AS FLOAT)))"""
        .stripMargin).head.getDouble(0)
    assert(dd == fd && fd == ff, s"widening must be exact: $dd $fd $ff")
    assert(math.abs(dd - 0.8) < 1e-12)
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1), array(1))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("cosine_sim") ||
      e.getMessage.contains("array<float|double>"))
  }

  test("unequal lengths and NULL elements yield NULL, matching the HOF edges") {
    // zip_with pads the shorter array with NULL and aggregate propagates
    // it; a min-length truncation would instead return a finite WRONG
    // similarity — the hash-moving divergence the scaladoc rules out.
    // Both eval paths are pinned: interpreted (literal fold at analysis)
    // and codegen (through a projected column).
    Catalog.ensure(spark, sf0001)
    val cases = Seq(
      // (a, b, expected-null)
      ("array(cast(1.0 AS FLOAT), cast(2.0 AS FLOAT))",
       "array(cast(1.0 AS FLOAT))", true),
      ("array(cast(1.0 AS FLOAT), cast(NULL AS FLOAT))",
       "array(cast(1.0 AS FLOAT), cast(1.0 AS FLOAT))", true),
      ("array(cast(1.0 AS FLOAT))", "array(cast(1.0 AS FLOAT))", false))
    cases.foreach { case (a, b, wantNull) =>
      val lit = spark.sql(s"SELECT cosine_sim($a, $b)").collect().head
      assert(lit.isNullAt(0) == wantNull, s"literal: $a vs $b")
      // force the codegen path over a real column
      val row = spark.sql(
        s"SELECT cosine_sim($a, $b) AS s FROM embeddings LIMIT 1").collect().head
      assert(row.isNullAt(0) == wantNull, s"codegen: $a vs $b")
    }
  }
}
