package graft

import graft.functions.Udfs
import graft.llm.Ann
import graft.sources.LogLines
import org.apache.spark.sql.functions._

class SourcesAndUdfsSpec extends SparkSpec {

  test("MinHashSketch is partitioning-invariant (mergeable sketch)") {
    val docs = Catalog.load(spark, sf0001, "documents")
    val sketch = udaf(new Udfs.MinHashSketch(16))
    val tok = docs.select(col("source"), explode(split(col("text"), " ")).as("w"))
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("source").agg(sketch(col("w")).as("sig")).orderBy("source")
        .collect().map(r => (r.getString(0), r.getSeq[Long](1))).toSeq
    // identical sketches from 32-way-partitioned and single-partition input
    // proves merge() is a true monoid over partial buffers
    assert(sig(tok.repartition(32)) == sig(tok.coalesce(1)))
  }

  test("TopK aggregator: partitioning-invariant and equal to the window rank") {
    val ev = Catalog.load(spark, sf0001, "events")
      .select(col("event_type"),
        expr("cast(round(value * 100) AS BIGINT)").as("cents"), col("event_id"))
    val topk = udaf(new Udfs.TopK(3))
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("event_type").agg(topk(col("cents"), col("event_id")).as("tk"))
        .select(col("event_type"), posexplode(col("tk")))
        .select(col("event_type"), col("pos"), col("col.score"), col("col.id"))
        .orderBy("event_type", "pos")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    val parts = run(ev.repartition(32))
    // merge() is a monoid: partitioning must not change the answer
    assert(parts == run(ev.coalesce(1)))
    // and the answer IS the window-rank top-3 (the x253 oracle's shape)
    val want = ev.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")
          .orderBy(col("cents").desc, col("event_id"))))
      .where(col("rk") <= 3)
      .select(col("event_type"), (col("rk") - 1).cast("int").as("pos"),
        col("cents"), col("event_id"))
      .orderBy("event_type", "pos")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(parts == want)
  }

  test("TopK buffer never exceeds its bound (groups larger than 4k)") {
    import spark.implicits._
    val big = (1L to 5000L).map(i => ("g", i % 97, i)).toDF("g", "score", "id")
    val topk = udaf(new Udfs.TopK(2))
    val out = big.groupBy("g").agg(topk(col("score"), col("id")).as("tk"))
      .select(posexplode(col("tk")))
      .collect().map(r => (r.getInt(0), r.getStruct(1).getLong(0), r.getStruct(1).getLong(1))).toSeq
    // top score is 96, smallest id with that score is 96; then 193
    assert(out == Seq((0, 96L, 96L), (1, 96L, 193L)), s"got $out")
  }

  test("CSV and JSONL round-trip events losslessly") {
    import graft.sources.Delimited
    val events = Catalog.load(spark, sf0001, "events")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("event_id").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
          r.getString(3), r.getDouble(4), r.getString(5))).toSeq
    val want = canon(events)
    Delimited.writeCsv(events, "/tmp/graft-ev-csv")
    assert(canon(Delimited.readCsv(spark, "/tmp/graft-ev-csv", events.schema)) == want)
    Delimited.writeJsonl(events, "/tmp/graft-ev-jsonl")
    assert(canon(Delimited.readJsonl(spark, "/tmp/graft-ev-jsonl", events.schema)) == want)
  }

  test("ORC round-trips events losslessly and pushes filters to the scan") {
    import graft.sources.Delimited
    val events = Catalog.load(spark, sf0001, "events")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("event_id").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
          r.getString(3), r.getDouble(4), r.getString(5))).toSeq
    Delimited.writeOrc(events, "/tmp/graft-ev-orc")
    val back = Delimited.readOrc(spark, "/tmp/graft-ev-orc")
    assert(canon(back) == canon(events))
    // pushdown parity with parquet: the predicate must reach the ORC
    // scan (stripe/row-group index pruning at scale), not a post-filter
    val filtered = back.where(col("event_type") === "purchase")
    val scan = filtered.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PushedFilters") && scan.contains("event_type"),
      s"expected event_type in ORC PushedFilters:\n$scan")
    assert(filtered.count() ==
      events.where(col("event_type") === "purchase").count())
  }

  // --- raw text log ingestion -----------------------------------------
  test("log lines round-trip: events -> text -> parsed columns") {
    val events = Catalog.load(spark, sf0001, "events")
    val rendered = LogLines.renderEvents(events)
    val parsed = LogLines.parse(rendered)
    assert(parsed.count() == events.count())
    assert(parsed.where(col("level").isNull).count() == 0, "all lines must parse")
    val errs = parsed.where(col("level") === "ERROR").count()
    val expect = events.where(col("event_type") === "error").count()
    assert(errs == expect)
    // the classic log histogram, straight off raw text
    val hist = parsed.groupBy("level").count().orderBy("level")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(hist.map(_._2).sum == events.count())
  }

  test("malformed lines survive with null fields, raw preserved") {
    import spark.implicits._
    val lines = Seq("not a log line", "2024-01-01 00:00:00.000 INFO [x] ok")
      .toDF("value")
    val parsed = LogLines.parse(lines).collect()
    assert(parsed.length == 2)
    val bad = parsed.find(_.getAs[String]("raw") == "not a log line").get
    assert(bad.isNullAt(bad.fieldIndex("level")))
    val ok = parsed.find(_.getAs[String]("raw").endsWith("ok")).get
    assert(ok.getAs[String]("component") == "x")
  }

  test("log file read from disk") {
    val events = Catalog.load(spark, sf0001, "events")
    val dir = java.nio.file.Files.createTempDirectory("graftlogs").toString
    LogLines.renderEvents(events).coalesce(1).write.mode("overwrite").text(dir)
    val back = LogLines.read(spark, dir)
    assert(back.count() == events.count())
    assert(back.where(col("ts").isNull).count() == 0)
  }

  // --- UDF surface -----------------------------------------------------
  test("registered scalar UDF + generator UDF run through SQL") {
    Udfs.register(spark)
    Catalog.ensure(spark, sf0001)
    val n = spark.sql(
      "SELECT subword_count(text) AS c FROM documents WHERE doc_id = 0")
      .collect().head.getInt(0)
    assert(n > 0)
    val grams = spark.sql(
      "SELECT explode(char_ngrams(text, 3)) AS g FROM documents WHERE doc_id = 0")
      .count()
    val len = Catalog.load(spark, sf0001, "documents")
      .where("doc_id = 0").select(length(col("text"))).collect().head.getInt(0)
    assert(grams == len - 2)
  }

  test("VectorAvg aggregator: mean of a constant set is the constant") {
    import spark.implicits._
    val vecs = Seq.fill(7)(Array(1f, 2f, 3f)).toDS()
    val avg = new Udfs.VectorAvg(3)
    val got = vecs.select(avg.toColumn).collect().head
    assert(got.toSeq == Seq(1f, 2f, 3f))
  }

  // --- IVF ANN ---------------------------------------------------------
  lazy val embs = Catalog.load(spark, sf0001, "embeddings")
  lazy val queryVec: Seq[Double] = embs.where("vec_id = 0")
    .select("embedding").collect().head.getSeq[Float](0).map(_.toDouble).toSeq

  test("ivf: every vector lands in exactly one list; lists are non-trivial") {
    val cs = Ann.ivfTrain(embs, nLists = 8, dim = 64, iters = 1)
    assert(cs.length == 8)
    val base = embs.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x AS double))").as("e"))
    val assigned = Ann.ivfAssign(base, cs)
    assert(assigned.count() == embs.count())
    assert(assigned.select("list").distinct().count() > 1)
  }

  test("ivf topk: full probe equals brute force; partial probe overlaps") {
    val cs = Ann.ivfTrain(embs.where("vec_id <> 0"), nLists = 8, dim = 64, iters = 1)
    val exact = Ann.bruteForceTopK(embs.where("vec_id <> 0"), queryVec, 10)
      .collect().map(_.getLong(0)).toSeq
    val full = Ann.ivfTopK(embs.where("vec_id <> 0"), queryVec, 10,
      nLists = 8, nProbe = 8, centroids = Some(cs))
      .collect().map(_.getLong(0)).toSeq
    assert(full == exact, "probing all lists must equal brute force")
    val partial = Ann.ivfTopK(embs.where("vec_id <> 0"), queryVec, 10,
      nLists = 8, nProbe = 3, centroids = Some(cs))
      .collect().map(_.getLong(0)).toSet
    assert((partial intersect exact.toSet).nonEmpty)
  }
}
