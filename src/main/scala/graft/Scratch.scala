package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm._

/** Throwaway dev timing harness for llm operator internals. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Catalog.load(spark, dir, "documents")
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    if (args.contains("semdedup")) {
      // pair-count curve for SCALE.md §10: planted mega-cluster of
      // identical vectors, capped vs uncapped candidate pairs
      import spark.implicits._
      val embs = Catalog.load(spark, dir, "embeddings").select("vec_id", "embedding")
      val proto = embs.where("vec_id = 8").as[(Long, Array[Float])].head._2
      val m = 5000
      val planted = (0 until m).map(i => (1000000L + i, proto)).toDF("vec_id", "embedding")
      val all = embs.unionByName(planted).cache(); all.count()
      for (cap <- Seq(50, 100, 200, 400, Int.MaxValue)) {
        t(s"semdedup cap=$cap pairs")(
          llm.Ann.semDeDup(all, cap = cap, minSimBp = -20000L)
            .where(col("keep_id") >= 1000000L).count())
      }
      spark.stop(); return
    }
    t("shingleSets.count")(Dedup.shingleSets(docs).count())
    val sets = Dedup.shingleSets(docs)
    t("signature[64].agg")(sets
      .select(Dedup.minHashSignature(col("shs"), 64).as("sig"))
      .agg(sum(element_at(col("sig"), 1).cast("double"))).collect()(0))
    t("simHashes.agg")(Dedup.simHashes(docs).agg(sum(col("simhash").cast("double"))).collect()(0))
    t("simHashNearDups.count")(Dedup.simHashNearDups(docs).count())
    t("candidatePairs.count")(
      Dedup.candidatePairs(docs, 64, 4).count())
    t("minHashNearDups.count")(
      Dedup.minHashNearDups(docs, 64, 4, 5000L).count())
    t("fingerprints.count")(Fingerprint.fingerprints(docs).count())
    t("fp inv pairs")(
      {
        val fps = Fingerprint.fingerprints(docs).select(col("doc_id"), col("fps"))
        val inv = fps.select(col("doc_id"), explode(col("fps")).as("fp"))
        inv.as("x").join(inv.as("y"),
          col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id")).count()
      })
    t("containment.count")(Fingerprint.containment(docs, 5000L).count())
    t("multimodal decode+resize")({
      val m = graft.multimodal.Multimodal.demoMedia(spark, dir)
      val f = graft.multimodal.Multimodal.resize(
        graft.multimodal.Multimodal.decodeFeatures(m), 128)
      (f.count(), graft.multimodal.Multimodal.sampleFrames(m).count())
    })
    t("stream tumbling6h drain")({
      val s = graft.streaming.EventStream.readEvents(spark, dir)
      graft.streaming.EventStream.drainToMemory(spark,
        graft.streaming.EventStream.tumbling6h(s), "scratch_t6h", complete = true)
      spark.table("scratch_t6h").count()
    })
    spark.stop()
  }
}
