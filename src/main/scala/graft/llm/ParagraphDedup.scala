package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Paragraph-level dedup APPLY — the full-corpus production twin of the
  * declared x346 slice (the x332/x339 pattern one granularity up, CCNet
  * discipline: Wenzek et al., LREC 2020). Every paragraph occurrence
  * after the GLOBAL first — ordered by (doc_id, position), so ownership
  * is deterministic — is cut, and each document is rejoined from its
  * surviving paragraphs in position order.
  *
  * Output covers EVERY document with ≥ 1 non-empty paragraph — this is
  * the "write the deduped corpus back out" surface, and a corpus write
  * rewrites untouched docs too (their `cleaned` is the canonical rejoin:
  * trimmed paragraphs re-separated by `joiner`). Contrast SubstringDedup,
  * whose affected-only output exists because its unaffected rebuild is
  * the byte-identity; here the rejoin IS the canonical form.
  *
  * Scale shape (what differs from the declared CTE form): the
  * keep-first ranking window runs over (doc_id, i, h) ONLY — 3 fixed-
  * width columns — so the corpus's paragraph TEXT never rides the
  * ownership shuffle; the text joins back by (doc_id, i) exactly once,
  * for the surviving rows. The rebuild is one per-doc aggregation over
  * kept paragraphs. Nothing quadratic, no driver state.
  */
object ParagraphDedup {

  /** One row per document with ≥ 1 non-empty paragraph:
    * (doc_id, n_par, n_kept, n_removed, cleaned). `splitRegex` is a
    * Java regex (the declared twin uses the same '\\. ' pseudo-boundary
    * on this corpus); `joiner` re-separates the survivors. */
  def cleanedDocs(docs: DataFrame, splitRegex: String = "\\. ",
                  joiner: String = ". "): DataFrame = {
    val par = docs
      .select(col("doc_id"), split(col("text"), splitRegex).as("ps"))
      .select(col("doc_id"), posexplode(col("ps")).as(Seq("i0", "p")))
      .select(col("doc_id"), (col("i0") + 1).as("i"), trim(col("p")).as("p"))
      .where(col("p") =!= "")
    // ownership frame: hashes and positions only — paragraph text does
    // not enter this shuffle
    val ranked = par
      .select(col("doc_id"), col("i"), md5(lower(col("p"))).as("h"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("h").orderBy("doc_id", "i")))
    val tot = ranked.groupBy("doc_id")
      .agg(count(lit(1)).as("n_par"),
        count(when(col("rn") > 1, 1)).as("n_removed"))
    // text joins back once, surviving rows only
    val kept = ranked.where(col("rn") === 1)
      .select("doc_id", "i")
      .join(par, Seq("doc_id", "i"))
    val rebuilt = kept.groupBy("doc_id")
      .agg(array_join(transform(array_sort(collect_list(struct(col("i"), col("p")))),
        (x: Column) => x.getField("p")), joiner).as("cleaned"))
    tot.join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_par"),
        (col("n_par") - col("n_removed")).as("n_kept"), col("n_removed"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }
}
