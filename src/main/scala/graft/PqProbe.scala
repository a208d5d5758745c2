import org.apache.spark.sql.SparkSession
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
    val corpus = embs.where("vec_id <> 0")
    val exact = graft.llm.Ann.bruteForceTopK(corpus, q, 10)
      .collect().map(_.getLong(0)).toSet
    val idx = graft.llm.Ann.pqTrain(corpus, nLists = 16, dim = 64, m = 8, ksub = 16)
    for (np <- Seq(4, 6, 8, 16)) {
      val ivf = graft.llm.Ann.ivfTopK(corpus, q, 10, nLists = 16, nProbe = np,
        centroids = Some(idx.centroids)).collect().map(_.getLong(0)).toSet
      val pq = graft.llm.Ann.pqTopK(corpus, q, 10, nProbe = np, refine = 4,
        idx = Some(idx)).collect().map(_.getLong(0)).toSet
      val pq10 = graft.llm.Ann.pqTopK(corpus, q, 10, nProbe = np, refine = 10,
        idx = Some(idx)).collect().map(_.getLong(0)).toSet
      println(s"nProbe=$np ivf-exact=${exact.intersect(ivf).size} pq-r4=${exact.intersect(pq).size} pq-r10=${exact.intersect(pq10).size}")
    }
    spark.stop()
  }
}
