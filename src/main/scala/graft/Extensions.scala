package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM-data-pipeline operators beyond the SURVEY.md §2.10 inventory
  * (dedup, similarity search, text analysis) — populated incrementally;
  * every declared entry must hash-match its oracle (SURVEY.md §7.3).
  */
object Extensions {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
