import org.apache.spark.sql.SparkSession

/** Dev harness: sweep IVFPQ (nProbe, m, ksub, refine) recall@10 at sf0.1.
  * Findings drive the pqTopK defaults and the LlmOpsSpec contract — see
  * SCALE.md §9.4 for the measured curve.
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val embs = graft.Catalog.load(spark, sf, "embeddings")
    val q = embs.where("vec_id = 0").select("embedding")
      .collect().head.getSeq[Float](0).map(_.toDouble).toSeq
    val corpus = embs.where("vec_id <> 0").cache()
    val exact = graft.llm.Ann.bruteForceTopK(corpus, q, 10)
      .collect().map(_.getLong(0)).toSet
    for ((m, ksub) <- Seq((8, 16), (8, 64), (16, 64), (16, 256))) {
      val idx = graft.llm.Ann.pqTrain(corpus, nLists = 16, dim = 64,
        m = m, ksub = ksub)
      for (np <- Seq(4, 8, 16); rf <- Seq(4, 10, 20)) {
        val pq = graft.llm.Ann.pqTopK(corpus, q, 10, nProbe = np, m = m,
          ksub = ksub, refine = rf, idx = Some(idx))
          .collect().map(_.getLong(0)).toSet
        println(s"m=$m ksub=$ksub nProbe=$np refine=$rf recall=${exact.intersect(pq).size}/10")
      }
    }
    // multiprobe LSH: recall + candidates-scanned vs probe budget,
    // against IVF at (roughly) equal candidate budget
    val total = corpus.count()
    for (np <- Seq(2, 4)) {
      val idx2 = graft.llm.Ann.ivfTrain(corpus, 16, 64)
      val probed = graft.llm.Ann.ivfAssign(
        corpus.select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.transform(
            org.apache.spark.sql.functions.col("embedding"),
            x => x.cast("double")).as("e")), idx2)
      val ivf = graft.llm.Ann.ivfTopK(corpus, q, 10, nLists = 16, nProbe = np,
        centroids = Some(idx2)).collect().map(_.getLong(0)).toSet
      println(s"ivf nProbe=$np recall=${exact.intersect(ivf).size}/10 cands~${np * total / 16}")
    }
    for (planes <- Seq(8, 10); mp <- Seq(16, 32, 64, 128)) {
      val mat = graft.llm.Ann.planes(planes, 64, 42L)
      val buckets = graft.llm.Ann.multiProbeBuckets(q, mat, mp)
      val b = graft.llm.Ann.bucketed(corpus, mat)
      val cands = b.where(org.apache.spark.sql.functions.col("bucket")
        .isin(buckets: _*)).count()
      val got = graft.llm.Ann.lshTopKMultiProbe(corpus, q, 10,
        numPlanes = planes, maxProbes = mp).collect().map(_.getLong(0)).toSet
      val r2 = graft.llm.Ann.lshTopK(corpus, q, 10, numPlanes = planes,
        probeRadius = 2).collect().map(_.getLong(0)).toSet
      println(s"mplsh planes=$planes probes=$mp cands=$cands recall=${exact.intersect(got).size}/10 (radius2 recall=${exact.intersect(r2).size}/10)")
    }
    spark.stop()
  }
}
