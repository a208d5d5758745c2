package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV and JSON-lines ingestion/egress for the engine's tables — the
  * interchange formats a log pipeline meets upstream (app exports, API
  * dumps) before data is compacted to Parquet.
  *
  * Policy: explicit schema always (schema inference is a full extra pass
  * over the data and type-guesses inconsistently at scale); timestamps
  * written as ISO-8601 UTC strings and parsed back with an explicit
  * format, so a CSV/JSONL round-trip is lossless at µs precision.
  */
object Delimited {

  private val tsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", tsFmt)
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("timestampFormat", tsFmt)
      .option("mode", "FAILFAST") // surface corrupt rows, don't null them
      // the writer quotes embedded newlines into one logical record
      // spanning physical lines; without multiLine the reader splits on
      // physical lines and FAILFAST throws on the halves — log messages
      // are exactly the field class that carries newlines. Costs split-
      // ability per file (multiLine reads each file whole), the standard
      // price of quoted-newline CSV; keep files compaction-sized.
      .option("multiLine", "true")
      .csv(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("timestampFormat", tsFmt)
      .json(path)

  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("timestampFormat", tsFmt)
      .option("mode", "FAILFAST")
      .json(path)

  /** ORC round-trip — the other columnar format a Hadoop-era warehouse
    * hands this engine (Hive's default). Types carry natively (no string
    * bridge needed): Spark's OrcFileFormat preserves timestamps at µs
    * and pushes filters to ORC stripe/row-group indexes the same way
    * parquet pushdown works (SourcesAndUdfsSpec asserts PushedFilters
    * lands in the ORC scan). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
