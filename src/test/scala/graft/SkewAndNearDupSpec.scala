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

  test("semdedup: huge cap equals independent exact within-cluster pairs") {
    val embs = Catalog.load(spark, sf0001, "embeddings")
    // independent reference: cross-join + window argmax assignment, then
    // all within-cluster pairs — a different execution path than the
    // operator's greatest-of-structs + salted self-join
    val a = embs.where(col("vec_id") < 8)
      .select(col("vec_id").as("aid"),
        transform(col("embedding"), x => x.cast("double")).as("ae"))
    val v = embs.where(col("vec_id") >= 8)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
    val best = v.crossJoin(a)
      .withColumn("asim", Ann.cosine(col("e"), col("ae")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
          .orderBy(desc("asim"), desc("aid"))))
      .where(col("rn") === 1).select(col("vec_id"), col("e"), col("aid"))
    val want = best.as("x").join(best.as("y"),
        col("x.aid") === col("y.aid") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.aid").as("cluster_id"), col("x.vec_id").as("keep_id"),
        col("y.vec_id").as("drop_id"),
        floor(Ann.cosine(col("x.e"), col("y.e")) * 10000.0).cast("long").as("sim_bp"))
      .where(col("sim_bp") >= 3500L)
      .collect().map(_.toSeq).toSet
    val got = Ann.semDeDup(embs).collect().map(_.toSeq).toSet
    assert(got.nonEmpty && got == want)
  }

  test("semdedup: cap bounds mega-cluster pair cost, dedup coverage survives") {
    import spark.implicits._
    val embs = Catalog.load(spark, sf0001, "embeddings")
      .select("vec_id", "embedding")
    // degenerate mega-cluster: 1500 identical copies of one vector —
    // the boilerplate-duplication shape that makes uncapped SemDeDup
    // quadratic in one shuffle partition
    val proto = embs.where("vec_id = 8").as[(Long, Array[Float])].head()._2
    val planted = (0 until 1500).map(i => (100000L + i, proto)).toDF("vec_id", "embedding")
    val all = embs.unionByName(planted)
    val cap = 100
    // minSimBp below any cosine → counts CANDIDATE pairs, not verified ones
    val cand = Ann.semDeDup(all, cap = cap, minSimBp = -20000L)
      .where(col("keep_id") >= 100000L).cache()
    val nPairs = cand.count()
    assert(nPairs > 0 && nPairs <= 1500L * cap,
      s"$nPairs mega-cluster pairs — expected O(n*cap), uncapped would be ${1500L * 1499 / 2}")
    // identical vectors pair at sim ~1.0: all but one doc per salt group
    // must be droppable (ceil(1500/cap) ~ 15 survivors + float slack)
    val droppable = cand.where(col("sim_bp") >= 9990L)
      .select("drop_id").distinct().count()
    assert(droppable >= 1500 - 30,
      s"only $droppable of 1500 planted dups droppable under cap=$cap")
    cand.unpersist()
  }

  test("AQE skew join splits the hot partition (skew=true in the final plan)") {
    // Salting (x137) is the QUERY-side skew fix; this pins the
    // RUNTIME-side one: with adaptive skew-join on, a shuffle join
    // whose hot key dwarfs the median partition is split in place —
    // the final plan's SortMergeJoin carries skew=true and the result
    // is unchanged. At 100 TB this is the knob that saves the
    // fact-fact join nobody pre-salted.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val left = spark.range(50000).select(lit(0L).as("k"), col("id").as("v"))
        .union(spark.range(2000).select((col("id") % 50 + 1).as("k"), col("id").as("v")))
      val right = spark.range(51).select(col("id").as("k"), col("id").as("w"))
      val j = left.join(right, "k")
      // execute THIS plan (count() would run its own QueryExecution and
      // leave j's adaptive plan un-finalized)
      assert(j.collect().length == 52000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the hot partition as skewed:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
