package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming benchmark-contamination filter: the incremental form of
  * x108, for ingest pipelines that must flag eval-set leakage as
  * documents ARRIVE rather than re-scanning the corpus per release.
  *
  * Shape: the held-out benchmark's distinct word 5-grams are a BATCH
  * frame computed once (the small side x108 broadcasts); the document
  * stream explodes its own distinct grams and left-semi joins them
  * against it — a stream-static join, which is STATELESS: no watermark,
  * no state store, every micro-batch is a pure broadcast-probe. The
  * only stateful operator is the per-doc hit count (update-mode agg),
  * whose state is one row per CONTAMINATED doc — in a healthy corpus a
  * tiny fraction of arrivals. At 100 TB stream volume, cap it the
  * standard way: watermark on arrival time + windowed emission, or
  * sink the semi-join rows directly and count downstream.
  *
  * Gram semantics mirror x108 exactly (docs with ≥5 words; distinct
  * 5-grams; no partial-shingle fallback) so stream == batch is a
  * hash-for-hash parity, spec-held in ContaminationStreamSpec.
  */
object ContaminationStream {

  private def grams5(words: Column): Column =
    array_distinct(transform(sequence(lit(1), size(words) - 4),
      i => concat_ws(" ", slice(words, i, lit(5)))))

  /** Batch side: the held-out set's distinct 5-gram census. */
  def benchmarkGrams(benchmark: DataFrame): DataFrame =
    benchmark.select(split(col("text"), " ").as("w"))
      .where(size(col("w")) >= 5)
      .select(explode(grams5(col("w"))).as("g"))
      .distinct()

  /** Streaming docs(doc_id, source, text) → (doc_id, source, n_hits):
    * docs sharing ≥1 distinct 5-gram with the benchmark, with how many
    * grams hit. Drain in "update" mode; the final value per doc is the
    * max across updates (counts are monotone within the replay). */
  def contaminationHits(docs: DataFrame, benchGrams: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .where(size(col("w")) >= 5)
      .select(col("doc_id"), col("source"), explode(grams5(col("w"))).as("g"))
      .join(broadcast(benchGrams), Seq("g"), "left_semi")
      .groupBy("doc_id", "source").agg(count(lit(1)).as("n_hits"))
}
