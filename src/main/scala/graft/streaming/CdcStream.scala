package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming CDC apply — the sink half of x169's MERGE semantics, fed
  * by a change stream instead of a delta snapshot. Each micro-batch is
  * applied copy-on-write: read the latest table version, merge
  * (latest-wins within the batch by a sequence column, tombstones
  * delete), write version N+1, and only then advance the pointer —
  * the commit loop every COW table format runs, scaled down to plain
  * parquet directories. A crash between write and pointer-advance
  * leaves the previous version live (the orphan version is re-written
  * on replay with the same content — idempotent because merge is a
  * pure function of (base, batch)).
  *
  * At 100 TB the COW rewrite is priced by the base-table read: real
  * deployments bucket the base on the merge key (§6) so the rewrite
  * touches only buckets with changes. The merge core here is exactly
  * x169's full-outer coalesce, kept column-generic via struct packing.
  */
object CdcStream {

  private def versionDirs(spark: SparkSession, tableDir: String): Seq[(Long, String)] = {
    val root = new org.apache.hadoop.fs.Path(tableDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v"))
      .map(s => (s.getPath.getName.drop(1).toLong, s.getPath.toString))
      .sortBy(_._1)
  }

  /** The latest committed table state (empty-schema None if no version). */
  def latest(spark: SparkSession, tableDir: String): Option[DataFrame] =
    versionDirs(spark, tableDir).lastOption.map { case (_, p) => spark.read.parquet(p) }

  /** Apply one micro-batch of changes. Batch schema: the key column,
    * payload columns, a `seq` long (change order — latest wins), and a
    * `deleted` boolean (tombstone). Returns the new version number. */
  def applyBatch(spark: SparkSession, tableDir: String, batch: DataFrame,
                 keyCol: String, seqCol: String = "seq",
                 deletedCol: String = "deleted"): Long = {
    val payloadCols = batch.columns.filterNot(c =>
      c == keyCol || c == seqCol || c == deletedCol).toSeq

    // latest-wins within the batch: one surviving change per key
    val w = Window.partitionBy(keyCol).orderBy(col(seqCol).desc)
    val lastChange = batch
      .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
    val upserts = lastChange.where(!col(deletedCol))
      .select(col(keyCol), struct(payloadCols.map(col): _*).as("__p"))
    val tombstones = lastChange.where(col(deletedCol)).select(col(keyCol))

    val vs = versionDirs(spark, tableDir)
    val merged = vs.lastOption match {
      case None =>
        upserts.select(col(keyCol) +: payloadCols.map(c => col("__p").getField(c).as(c)): _*)
      case Some((_, prev)) =>
        val base = spark.read.parquet(prev)
          .select(col(keyCol).as("__bk"), struct(payloadCols.map(col): _*).as("__b"))
        // x169's full-outer coalesce, struct-packed to stay generic
        base.join(upserts, col("__bk") === col(keyCol), "full_outer")
          .select(coalesce(col(keyCol), col("__bk")).as(keyCol),
                  coalesce(col("__p"), col("__b")).as("__m"))
          .join(tombstones.withColumnRenamed(keyCol, "__dk"),
                col(keyCol) === col("__dk"), "left_anti")
          .select(col(keyCol) +: payloadCols.map(c => col("__m").getField(c).as(c)): _*)
    }
    val next = vs.lastOption.map(_._1 + 1).getOrElse(0L)
    merged.write.mode("overwrite").parquet(s"$tableDir/v$next")
    next
  }
}
