package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TopKPerKey (r17): per-key top-k as a map-side-combining aggregation
  * must be indistinguishable from the row_number window form it
  * replaces on the serving hot paths — selection, order, ties, NaN —
  * while the executed plan carries no Window at all. */
class TopKPerKeySpec extends SparkSpec {

  test("selection and order identical to the window form — ties, NaN, small groups") {
    import spark.implicits._
    val rows = Seq(
      // key 1: a tie on sim (ids 10/11 — id ASC breaks it), a NaN (must
      // rank FIRST, Spark's descending double order), k-sized group
      (1L, 12L, 0.9), (1L, 10L, 0.5), (1L, 11L, 0.5), (1L, 13L, Double.NaN),
      // key 2: fewer than k rows
      (2L, 21L, 0.2), (2L, 20L, 0.1),
      // key 3: negative and zero sims
      (3L, 30L, -0.3), (3L, 31L, 0.0), (3L, 32L, -0.7), (3L, 33L, 0.4)
    ).toDF("k", "id", "sim")
    val win = rows
      .withColumn("rnk", row_number().over(
        Window.partitionBy("k").orderBy(desc("sim"), col("id"))))
      .where(col("rnk") <= 3)
      .select(col("k"), col("rnk").cast("long").as("rnk"), col("id"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    val agg = operators.TopKPerKey
      .topK(rows, col("k"), col("id"), lit(0L), col("sim"), 3, "k")
      .select(col("k"), col("rnk"), col("id"), col("sim"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        java.lang.Double.doubleToLongBits(r.getDouble(3)))).toSet
    assert(agg == win, s"agg form diverged from the window form:\n$agg\nvs\n$win")
  }

  test("payload rides uncompared; null sims are dropped like the window ranks them out") {
    import spark.implicits._
    val rows = Seq(
      (1L, 10L, 7L, Some(0.9)), (1L, 11L, 8L, Some(0.1)),
      (1L, 12L, 9L, None) // null sim: never in a top-k that non-nulls fill
    ).toDF("k", "id", "pay", "sim")
    val got = operators.TopKPerKey
      .topK(rows, col("k"), col("id"), col("pay"), col("sim"), 2, "k")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((1L, 10L, 7L), (2L, 11L, 8L)))
  }

  test("the serving plan carries no Window — top-k is a partial-combining aggregation") {
    val emb = Catalog.load(spark, sf0001, "embeddings")
    val corpusDir = "/tmp/graft-annserve-topk"
    val cents = llm.Ann.ivfTrain(emb, nLists = 8, dim = 64)
    sources.Layout.writeIvfPartitioned(emb, corpusDir, cents)
    val batch = emb.where(col("vec_id") === 3)
      .select(col("vec_id").as("qid"), col("embedding"))
    val ans = streaming.AnnServeStream.answerBatch(batch,
      spark.read.parquet(corpusDir), cents, k = 5, nProbe = 2)
    val plan = ans.queryExecution.executedPlan.toString
    // the probe-table windows (batch × nLists rows, ordered by the
    // centroid score `csim`; the node appears twice — once in the DPP
    // subquery's copy of the probe table) are batch-sized and fine; the
    // corpus-sized top-k must NOT be a Window — assert by what the
    // windows ORDER BY: every Window node in the plan must be a csim
    // probe ranking, none may rank the corpus `sim`
    val windowLines = plan.linesIterator
      .filter(_.replaceAll("^[\\s+:*-]*", "").startsWith("Window")).toSeq
    assert(windowLines.forall(_.contains("csim")),
      s"corpus-sized top-k regressed to a Window:\n${windowLines.mkString("\n")}")
    assert(plan.contains("ObjectHashAggregate"),
      s"expected the partial-combining top-k aggregation:\n$plan")
    assert(ans.count() == 5)
  }
}
