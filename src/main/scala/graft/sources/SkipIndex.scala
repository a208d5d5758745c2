package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data-skipping index — the manifest pattern (what table
  * formats in the Delta/Iceberg family persist next to the data),
  * implemented engine-side for plain parquet directories.
  *
  * Parquet row-group min/max stats already prune WITHIN a file the scan
  * has opened, but opening is not free: at 100 TB a cold range query
  * pays a listing call plus a footer read per file before the first
  * byte of data. A driver-held (or table-persisted) min/max manifest
  * moves that decision before file IO: the planner intersects the
  * query's range with per-file [min,max] and hands Spark only the
  * files that can match — cost proportional to files TOUCHED, not
  * files OWNED. The index is one aggregation row per file (the same
  * size class as IVF centroids / probe lists — driver metadata by
  * construction), built with one scan of the columns being indexed.
  *
  * The index is only selective if the layout clusters the indexed
  * column (range-partitioned or sorted writes → disjoint file ranges);
  * on a random layout every file's range spans the domain and nothing
  * prunes — same contract as any zone map. `Layout.writeBucketed` /
  * `repartitionByRange` writers produce exactly the friendly layout.
  */
object SkipIndex {

  /** One scan over `path`, one output row per file:
    * (file, n_rows, <c>_min, <c>_max per indexed column). */
  def build(spark: SparkSession, path: String, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Files whose [min,max] interval intersects [lo, hi] — NULL-stat
    * files (all-NULL column chunks) are kept, never skipped: a zone map
    * may only prune files that PROVABLY contain no match. */
  def candidateFiles(index: DataFrame, c: String, lo: Column, hi: Column): Seq[String] =
    index.where(
        col(s"${c}_min").isNull || col(s"${c}_max").isNull ||
          !(col(s"${c}_max") < lo || col(s"${c}_min") > hi))
      .select("file").collect().map(_.getString(0)).toSeq

  /** Range read through the index: scan only candidate files. The
    * returned frame still carries the range filter — the index is an
    * overapproximation (file granularity); the predicate stays exact. */
  def readRange(spark: SparkSession, index: DataFrame, c: String,
                lo: Column, hi: Column): DataFrame = {
    val files = candidateFiles(index, c, lo, hi)
    if (files.isEmpty) {
      // preserve schema on an empty match set
      spark.read.parquet(index.select("file").limit(1)
        .collect().head.getString(0)).where(lit(false))
    } else {
      spark.read.parquet(files: _*).where(col(c).between(lo, hi))
    }
  }
}
