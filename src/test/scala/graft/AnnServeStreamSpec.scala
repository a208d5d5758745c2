package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ANN serving from the persisted index (§2.9 set, r16):
  * micro-batched query answering over the list-partitioned layout with
  * IndexStore-loaded centroids — full-probe answers must equal brute
  * force, pruned-probe answers must equal the inline IVF operator. */
class AnnServeStreamSpec extends SparkSpec {

  private def writeReplay(df: DataFrame, dir: String, n: Int): Unit = {
    val d = new java.io.File(dir)
    if (d.exists()) new scala.reflect.io.Directory(d).deleteRecursively()
    d.mkdirs()
    (0 until n).foreach { i =>
      val tmp = s"$dir-tmp$i"
      df.where(pmod(col("qid"), lit(n.toLong)) === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(dir, s"b$i.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      new scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }

  test("served answers: full probe == brute force, pruned probe == inline IVF, index loaded from disk") {
    val emb = Catalog.load(spark, sf0001, "embeddings")
    val corpusDir = "/tmp/graft-annserve-corpus"
    val idxDir = "/tmp/graft-annserve-index"
    val f = new java.io.File(idxDir)
    if (f.exists()) new scala.reflect.io.Directory(f).deleteRecursively()
    // train once, persist index + partitioned layout
    val cents = llm.Ann.ivfTrain(emb, nLists = 8, dim = 64)
    val idx = llm.Ann.PqIndex(8, 1, 1, 64, cents,
      Array(Array(new Array[Double](64)))) // centroids carrier for savePq
    llm.IndexStore.savePq(spark, idxDir, idx)
    sources.Layout.writeIvfPartitioned(emb, corpusDir, cents)
    // serve many: a later session reloads instead of retraining
    val loaded = llm.IndexStore.loadPq(spark, idxDir).centroids
    assert(loaded.map(_._1).toSeq == cents.map(_._1).toSeq &&
      loaded.map(_._2.toSeq).toSeq == cents.map(_._2.toSeq).toSeq)

    // queries: 12 corpus vectors replayed as 3 micro-batches
    val queries = emb.where(col("vec_id") < 12)
      .select(col("vec_id").as("qid"), col("embedding"))
    val replay = "/tmp/graft-annserve-replay"
    writeReplay(queries, replay, 3)
    def stream() = spark.readStream.schema(queries.schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet").parquet(replay)

    // FULL probe: every answer set must be exactly brute-force top-k
    val full = streaming.AnnServeStream.drain(spark, stream(), corpusDir,
      loaded, k = 5, nProbe = 8).groupBy(_._1)
    val qvecs = queries.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq)
    assert(full.size == 12, "every query answered exactly once")
    qvecs.foreach { case (qid, qv) =>
      val bf = llm.Ann.bruteForceTopK(emb, qv, 5).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = full(qid).sortBy(_._2).map(a => (a._3, a._4)).toSeq
      assert(got == bf, s"query $qid: full-probe stream answer must equal brute force")
    }

    // PRUNED probe: must equal the inline IVF operator on the same
    // centroids (same probe ranking, same tie rules)
    val pruned = streaming.AnnServeStream.drain(spark, stream(), corpusDir,
      loaded, k = 5, nProbe = 3).groupBy(_._1)
    qvecs.foreach { case (qid, qv) =>
      val inline = llm.Ann.ivfTopK(emb, qv, k = 5, nLists = 8, nProbe = 3,
        centroids = Some(loaded)).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = pruned(qid).sortBy(_._2).map(a => (a._3, a._4)).toSeq
      assert(got == inline, s"query $qid: pruned-probe stream answer must equal inline IVF")
    }
  }

  test("bulk LUT tier: exhaustive config == brute force, pruned config == inline pqTopK per query") {
    val emb = Catalog.load(spark, sf0001, "embeddings")
    val rawDir = "/tmp/graft-annserve-lut-raw"
    val encDir = "/tmp/graft-annserve-lut-enc"
    // train once (IVF reused into the PQ trainer — the serving rule),
    // lay out both the raw and the encoded corpus by list
    val cents = llm.Ann.ivfTrain(emb, nLists = 8, dim = 64)
    val idx = llm.Ann.pqTrain(emb, nLists = 8, dim = 64, m = 8, ksub = 16,
      centroids = Some(cents))
    sources.Layout.writeIvfPartitioned(emb, rawDir, cents)
    sources.Layout.writeIvfEncodedPartitioned(emb, encDir, idx)
    val queries = emb.where(col("vec_id") < 12)
      .select(col("vec_id").as("qid"), col("embedding"))
    val replay = "/tmp/graft-annserve-lut-replay"
    writeReplay(queries, replay, 3)
    def stream() = spark.readStream.schema(queries.schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "*.parquet").parquet(replay)
    val qvecs = queries.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq)

    // EXHAUSTIVE config (full probe, refine covering the corpus): the
    // approximate stage truncates nothing and the rerank is exact, so
    // the answers ARE brute force by construction — pinned
    val nCorpus = emb.count().toInt
    val full = streaming.AnnServeStream.drainLut(spark, stream(), rawDir,
      encDir, idx, k = 5, nProbe = 8, refine = nCorpus / 5 + 1).groupBy(_._1)
    assert(full.size == 12, "every query answered exactly once")
    qvecs.foreach { case (qid, qv) =>
      val bf = llm.Ann.bruteForceTopK(emb, qv, 5).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = full(qid).sortBy(_._2).map(a => (a._3, a._4)).toSeq
      assert(got == bf, s"query $qid: exhaustive LUT answer must equal brute force")
    }

    // PRUNED config: the batched tier is the SAME algorithm as the
    // inline x103 operator (same probe ranking, same LUT arithmetic,
    // same candidate/rerank tie rules) — per-query answers must be
    // equal, not merely high-recall
    val pruned = streaming.AnnServeStream.drainLut(spark, stream(), rawDir,
      encDir, idx, k = 5, nProbe = 3, refine = 10).groupBy(_._1)
    qvecs.foreach { case (qid, qv) =>
      val inline = llm.Ann.pqTopK(emb, qv, 5, nProbe = 3, refine = 10,
        idx = Some(idx)).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = pruned(qid).sortBy(_._2).map(a => (a._3, a._4)).toSeq
      assert(got == inline, s"query $qid: pruned LUT answer must equal inline pqTopK")
    }
  }

  test("the bulk LUT plan DPP-prunes the encoded scan and keeps the kernel in codegen") {
    val emb = Catalog.load(spark, sf0001, "embeddings")
    val rawDir = "/tmp/graft-annserve-lut-raw2"
    val encDir = "/tmp/graft-annserve-lut-enc2"
    val cents = llm.Ann.ivfTrain(emb, nLists = 8, dim = 64)
    val idx = llm.Ann.pqTrain(emb, nLists = 8, dim = 64, m = 8, ksub = 16,
      centroids = Some(cents))
    sources.Layout.writeIvfPartitioned(emb, rawDir, cents)
    sources.Layout.writeIvfEncodedPartitioned(emb, encDir, idx)
    val batch = emb.where(col("vec_id") === 3)
      .select(col("vec_id").as("qid"), col("embedding"))
    val ans = streaming.AnnServeStream.answerBatchLut(batch,
      spark.read.parquet(rawDir), spark.read.parquet(encDir), idx,
      k = 5, nProbe = 2)
    val plan = ans.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the list-partitioned scans:\n$plan")
    // the ADC kernel must sit inside whole-stage codegen, not fall back
    assert(plan.contains("pq_lut_score"), "LUT kernel missing from the plan")
    assert(ans.count() == 5)
  }

  test("the probed scan is partition-pruned, not a full corpus read") {
    val emb = Catalog.load(spark, sf0001, "embeddings")
    val corpusDir = "/tmp/graft-annserve-corpus2"
    val cents = llm.Ann.ivfTrain(emb, nLists = 8, dim = 64)
    sources.Layout.writeIvfPartitioned(emb, corpusDir, cents)
    import spark.implicits._
    val batch = emb.where(col("vec_id") === 3)
      .select(col("vec_id").as("qid"), col("embedding"))
    val ans = streaming.AnnServeStream.answerBatch(batch,
      spark.read.parquet(corpusDir), cents, k = 5, nProbe = 2)
    val plan = ans.queryExecution.executedPlan.toString
    // the corpus scan must carry a runtime pruning predicate on the
    // partition column — the join key is `list`, so DPP applies
    assert(plan.contains("dynamicpruning"),
      s"expected dynamic partition pruning on the list-partitioned scan:\n$plan")
    assert(ans.count() == 5)
  }
}
