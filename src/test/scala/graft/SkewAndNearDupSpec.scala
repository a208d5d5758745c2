package graft

import graft.llm.Ann
import graft.operators.Salt
import org.apache.spark.sql.functions._

class SkewAndNearDupSpec extends SparkSpec {

  lazy val events = Catalog.load(spark, sf0001, "events")

  test("salted join equals plain join on skewed keys") {
    import spark.implicits._
    // skew: collapse users to 3 hot keys
    val fact = events.withColumn("hot", col("user_id") % 3)
      .select("event_id", "hot", "value")
    val dim = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("hot", "tag")
    val plain = fact.join(dim, "hot")
      .agg(count(lit(1)), round(sum("value"), 4)).collect().head
    val salted = Salt.saltedJoin(fact, dim, "hot", salts = 8)
      .agg(count(lit(1)), round(sum("value"), 4)).collect().head
    assert(salted == plain)
  }

  test("salted join splits a hot key across salt partitions in the plan") {
    import spark.implicits._
    val fact = events.withColumn("hot", lit(0L)).select("event_id", "hot")
    val dim = Seq((0L, "x")).toDF("hot", "tag")
    val df = Salt.saltedJoin(fact, dim, "hot", salts = 8)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), plan)
    assert(df.count() == events.count())
  }

  test("salted aggregation equals plain aggregation") {
    val plain = events.groupBy("user_id")
      .agg(sum("value").as("sum"), count(lit(1)).as("cnt"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e4), r.getLong(2))).toSeq
    val salted = Salt.saltedSumCount(events, "user_id", "value", salts = 8)
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e4), r.getLong(2))).toSeq
    assert(salted == plain)
  }

  test("embedding-cosine near-dup finds all planted near-identical vectors") {
    import spark.implicits._
    val embs = Catalog.load(spark, sf0001, "embeddings")
      .select("vec_id", "embedding")
    val planted = embs.limit(5).as[(Long, Array[Float])]
      .map { case (id, e) => (id + 1000000L, e.map(x => x + 1e-4f)) }
      .toDF("vec_id", "embedding")
    val all = embs.unionByName(planted)
    val found = Ann.cosineNearDups(all, minSimBp = 9990L)
      .where(col("b") >= 1000000L && col("a") === col("b") - 1000000L)
    assert(found.count() == 5, "all 5 planted near-identical vectors must pair up")
  }

  test("near-dup pairs are verified: no pair below the sim threshold") {
    val got = Ann.cosineNearDups(
      Catalog.load(spark, sf0001, "embeddings"), minSimBp = 3000L)
      .collect()
    assert(got.forall(_.getLong(2) >= 3000L))
  }
}
