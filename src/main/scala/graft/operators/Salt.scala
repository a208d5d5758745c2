package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY.md §4 / SCALE.md §3).
  *
  * AQE's skew-join split handles most skew at runtime; salting is the
  * static fallback for the pathological case AQE can't fix — a single
  * join key so hot that one task would own it (e.g. the null/default
  * user, a bot account, an empty-string group).
  *
  * `saltedJoin(large, small, key, S)`: the large side gets a uniform
  * salt in [0, S); the small side is replicated S× with every salt value;
  * the join key becomes (key, salt), splitting each hot key across S
  * tasks. Row multiplicity is unchanged — each large row matches exactly
  * the one replica carrying its salt.
  *
  * `saltedAggregate(df, keys, S)(aggs)`: two-phase aggregation through a
  * salted intermediate key for skewed group-bys — partial per (key,salt),
  * final per key. Only algebraic aggregates (sum/count/min/max) compose
  * this way; use it for those.
  */
object Salt {

  /** Equi-join `large ⋈ small` on `key`, splitting each large-side hot
    * key across `salts` shuffle partitions. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    // salt must distribute rows of ONE key across values — derive from a
    // per-row source (partition id + row position via a seeded rand is
    // the standard choice; the salt value never affects the result)
    val salted = large.withColumn("__salt",
      (rand(42) * salts).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Skew-resistant sum/count aggregation: partial per (keys, salt),
    * final per keys. `sums` are columns to sum; a row count comes along
    * as `cnt`. */
  def saltedSumCount(df: DataFrame, groupKey: String, valueCol: String,
                     salts: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", (rand(42) * salts).cast("int"))
      .groupBy(col(groupKey), col("__salt"))
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__c"))
    partial.groupBy(col(groupKey))
      .agg(sum(col("__s")).as("sum"), sum(col("__c")).as("cnt"))
  }
}
