package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document fingerprinting (winnowing): rolling char k-gram hashes →
  * per-window minima → distinct fingerprint set. Containment of one doc's
  * fingerprints in another's detects copy-paste/substring reuse that
  * token-set measures miss. Entirely row-local (codegen'd HOFs). */
object Fingerprint {

  /** Winnowing fingerprint set: min hash of each sliding window of
    * `window` consecutive k-gram hashes, deduplicated. */
  def fingerprints(docs: DataFrame, textCol: String = "text",
                   k: Int = 8, window: Int = 4): DataFrame = {
    // SQL expr() because Column-lambda substring(start=i) is clumsy in the
    // DSL. The k-gram hash array is LET-BOUND via a single-element
    // transform: projection collapse would otherwise inline its
    // construction into the window lambda — O(n) rebuilds of an O(n)
    // array per doc (observed: sf0.1 runtime went from minutes to
    // seconds; see graft.llm.Cols.bind).
    val hashes =
      s"transform(sequence(1, greatest(length($textCol)-${k - 1}, 1)), i -> xxhash64(substr($textCol, i, $k)))"
    val fps =
      s"""array_distinct(element_at(transform(array($hashes), hs ->
         |  transform(sequence(1, greatest(size(hs)-${window - 1}, 1)),
         |            j -> array_min(slice(hs, j, $window)))), 1))""".stripMargin
    // repartition first: single-row-group input parquet pins the scan to
    // one task, serializing this row-local compute otherwise
    docs.repartition(docs.sparkSession.sessionState.conf.numShufflePartitions)
      .withColumn("fps", expr(fps))
  }

  /** Containment of the smaller doc's fingerprints in the larger's (basis
    * points). Because fingerprint sets are distinct per doc, |common| falls
    * straight out of the inverted-index pair counts — no per-pair set
    * intersection, so the shuffle carries only (fp → doc_id) and the
    * aggregation is a plain pair count. */
  def containment(docs: DataFrame, minContainBp: Long = 5000L): DataFrame = {
    val fps = fingerprints(docs).select(col("doc_id"),
      size(col("fps")).as("n"), col("fps"))
    val inv = fps.select(col("doc_id"), explode(col("fps")).as("fp"))
    val common = inv.as("x").join(inv.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(fps.select(col("doc_id").as("a"), col("n").as("na")), "a")
      .join(fps.select(col("doc_id").as("b"), col("n").as("nb")), "b")
      .withColumn("contain_bp",
        floor(col("common") * lit(10000.0) / least(col("na"), col("nb"))).cast("long"))
      .where(col("contain_bp") >= minContainBp)
      .select(col("a"), col("b"), col("contain_bp"))
      .orderBy(desc("contain_bp"), col("a"), col("b"))
  }
}
