package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingest-time ANN serving from a PERSISTED index (r16) — the consume
  * half of [[graft.llm.IndexStore]]'s train-once/serve-many contract,
  * and the §2.9 streaming set's retrieval entry: a stream of query
  * vectors is answered per micro-batch with cosine top-k neighbors
  * from a list-PARTITIONED corpus layout
  * ([[graft.sources.Layout.writeIvfPartitioned]]), probing only each
  * query's nProbe best IVF lists.
  *
  * Shape, entirely distributed (no driver collect of queries or
  * corpus):
  *  1. the loaded centroid table (nLists × dim doubles — index-sized)
  *     broadcasts against the query batch; a per-query window keeps the
  *     nProbe best lists → a (qid, q, list) probe table, batch-sized;
  *  2. the probe table broadcasts into a join with the list-partitioned
  *     corpus — the join key IS the partition column, so Spark's
  *     dynamic partition pruning restricts the scan to the union of
  *     probed lists (nProbe/nLists of the corpus at most, NOT a full
  *     scan — the same pruning LayoutSpec pins statically for
  *     [[graft.llm.Ann.ivfTopKPartitioned]], triggered at runtime here
  *     because the probe set derives from the batch's data);
  *  3. exact cosine + per-query top-k window over the probed slice.
  *
  * foreachBatch rather than a continuous plan because step 2's pruning
  * predicate is data-dependent per batch. Answers are top-k rows per
  * query — request-sized; only THEY return to the caller.
  *
  * Full probe (nProbe ≥ nLists) makes the answer exactly brute-force
  * top-k BY CONSTRUCTION (every list probed — the x103 full-probe
  * argument one tier up); AnnServeStreamSpec pins both that and pruned-
  * probe parity with the inline [[graft.llm.Ann.ivfTopK]].
  */
object AnnServeStream {

  /** Answer one micro-batch of (qid, embedding) queries from the
    * list-partitioned `corpus` under driver-held `cents`. Returns
    * (qid, rnk, vec_id, sim) — k rows per query. */
  def answerBatch(batch: DataFrame, corpus: DataFrame,
                  cents: Array[(Int, Array[Double])],
                  k: Int, nProbe: Int): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    graft.functions.CosineSim.register(spark) // idempotent
    val centDf = cents.toSeq.toDF("list", "c")
    // probe ranking stays on the HOF cosine: it scores batch × nLists
    // rows against double centroid literals — probe-table-sized, never
    // the hot path
    val qp = batch.select(col("qid"), col("embedding").as("qf"),
      transform(col("embedding"), x => x.cast("double")).as("q"))
    // probe table: nProbe best lists per query by centroid cosine —
    // ties to the lower list id, mirroring Ann.probeLists' stable sort
    val probes = qp.join(broadcast(centDf))
      .withColumn("csim", graft.llm.Ann.cosine(col("q"), col("c")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(desc("csim"), col("list"))))
      .where(col("rn") <= nProbe)
      .select(col("qid"), col("qf"), col("list"))
    // the hot path — |queries| × |corpus| × nProbe/nLists cosines per
    // batch — runs the NATIVE codegen'd expression over the raw float
    // arrays (tight primitive loop in whole-stage codegen, no boxed
    // intermediate per row; arithmetic identical to the HOF form per
    // CosineSim's contract, so answers are bit-equal — the spec's
    // full-probe ≡ brute force assertion would catch any divergence).
    // Measured at the 1M rehearsal tier: 476 s → see SCALE.md §44 for
    // the HOF number this replaced.
    corpus
      .select(col("vec_id"), col("list"), col("embedding"))
      .join(broadcast(probes), "list")
      .withColumn("sim",
        graft.functions.CosineSim(col("embedding"), col("qf")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("sim"), col("vec_id"))))
      .where(col("rnk") <= k)
      .select(col("qid"), col("rnk").cast("long").as("rnk"),
        col("vec_id"), col("sim"))
  }

  /** Drain a bounded query stream, answering each micro-batch from the
    * partitioned corpus + loaded centroids; returns every answer row
    * (qid, rnk, vec_id, sim), k per query — request-sized. */
  def drain(spark: SparkSession, queries: DataFrame, corpusPath: String,
            cents: Array[(Int, Array[Double])], k: Int = 10,
            nProbe: Int = 4): Seq[(Long, Long, Long, Double)] = {
    val corpus = spark.read.parquet(corpusPath)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val q = queries.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        out.synchronized {
          out ++= answerBatch(b, corpus, cents, k, nProbe).collect()
            .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        }
        ()
      }.start()
    q.awaitTermination()
    out.toSeq
  }
}
