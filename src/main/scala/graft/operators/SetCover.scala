package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Greedy maximum-coverage selection — "pick the k documents that add
  * the most uncovered elements", the curation primitive behind corpus
  * subset selection (greedy is the classic (1-1/e)-approximation to the
  * NP-hard optimum, Nemhauser et al. 1978).
  *
  * Iteration discipline mirrors [[graft.llm.Bpe]]: per round one
  * term-keyed anti-join (membership rows vs the covered-set frame), one
  * hash agg, and a 1-ROW argmax collect (rank-1 by count, doc_id
  * tie-break) — the only driver materialization. The covered set stays
  * a DataFrame, persisted and re-persisted each round with the previous
  * round unpersisted, so lineage is O(1) in k and the covered set never
  * lands on the driver (at 100 TB it is corpus-vocabulary-sized).
  *
  * The x243 contract entry unrolls 3 rounds declaratively in both SQL
  * dialects; [[greedySelect]] must land on exactly those picks — the
  * x148/x149 one-oracle-two-plans pattern. Early exhaustion (no doc
  * contributes a new term) ends the loop, matching the unrolled form's
  * empty-pick CTEs. */
object SetCover {

  /** `membership`: (doc_id, term) rows, distinct or not (made distinct
    * here). Returns (pick, doc_id, new_terms) for up to `k` greedy
    * picks. */
  def greedySelect(membership: DataFrame, k: Int): DataFrame = {
    val spark = membership.sparkSession
    val w = membership.select(col("doc_id"), col("term")).distinct().persist()
    w.count()
    var covered: Option[DataFrame] = None
    val picks = Seq.newBuilder[(Long, Long, Long)]
    val pickedIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    var round = 1
    var exhausted = false
    while (round <= k && !exhausted) {
      val fresh = covered match {
        case None => w
        case Some(c) => w.join(c, Seq("term"), "left_anti")
      }
      val eligible =
        if (pickedIds.isEmpty) fresh
        else fresh.where(!col("doc_id").isInCollection(pickedIds))
      val best = eligible.groupBy("doc_id").count()
        .orderBy(col("count").desc, col("doc_id")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val r = best(0)
        val docId = r.getLong(0)
        picks += ((round.toLong, docId, r.getLong(1)))
        pickedIds += docId
        val nextCovered = covered match {
          case None => w.where(col("doc_id") === docId).select("term").persist()
          case Some(c) =>
            c.union(fresh.where(col("doc_id") === docId).select("term")).persist()
        }
        nextCovered.count()
        covered.foreach(_.unpersist())
        covered = Some(nextCovered)
        round += 1
      }
    }
    covered.foreach(_.unpersist())
    w.unpersist()
    val rows = picks.result().map { case (p, d, c) => Row(p, d, c) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pick",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("new_terms",
          org.apache.spark.sql.types.LongType, nullable = false))))
      .orderBy("pick")
  }

  /** The x243 membership universe: distinct word bigrams per document
    * (916 elements at sf0.01 — no single doc covers it, so 3 greedy
    * rounds are all distinct, meaningful picks). */
  def bigramMembership(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(lower(col("text")), " ").as("a"))
      .where(size(col("a")) >= 2)
      .select(col("doc_id"), col("a"),
        explode(sequence(lit(1), size(col("a")) - 1)).as("i"))
      .select(col("doc_id"),
        element_at(col("a"), col("i")).as("w1"),
        element_at(col("a"), col("i") + 1).as("w2"))
      .where(col("w1") =!= "" && col("w2") =!= "")
      .select(col("doc_id"), concat(col("w1"), lit(" "), col("w2")).as("term"))
}
