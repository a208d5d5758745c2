package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (VERDICT r8 #5): under the EXACT bench config, split a
  * query's per-rep wall time into (a) DataFrame construction + analysis,
  * (b) optimize+plan (queryExecution.executedPlan force), and (c) pure
  * re-execution of the already-planned physical plan — to attribute the
  * above-floor residual of floor-class queries (q37, q29) to planning vs
  * execution. Not on any contract path. */
object QProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else Seq("q37_date_funcs", "q29_ntile", "q36_string_funcs", "q01_count")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Catalog.ensure(spark, sfDir)
    def ms(f: => Any): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6 }
    // A/B: SPARK_GRAFT_NO_DEFER=1 strips the DeferProjectionPastTopK rule
    // and times the raw SQL text (bypassing SparkEntry, whose Catalog
    // call would re-register the rule).
    val noDefer = sys.env.get("SPARK_GRAFT_NO_DEFER").contains("1")
    val sqlByName = Queries.all.map(q => q.name -> q.spark).toMap
    def build(n: String): org.apache.spark.sql.DataFrame =
      if (n.startsWith("sql=")) spark.sql(n.stripPrefix("sql="))
      else if (noDefer) spark.sql(sqlByName(n))
      else SparkEntry.queries(n)(spark, sfDir)
    if (noDefer) {
      spark.experimental.extraOptimizations = Seq.empty
      println("[qprobe] DeferProjectionPastTopK DISABLED")
    }
    (1 to 2).foreach(_ => names.foreach(n => build(n).collect()))
    println(f"${"query"}%-22s ${"build"}%7s ${"plan"}%7s ${"exec"}%7s ${"total"}%7s  (medians of 5, ms)")
    names.foreach { n =>
      val reps = (1 to 5).map { _ =>
        var df: org.apache.spark.sql.DataFrame = null
        val tBuild = ms { df = build(n) }
        val tPlan = ms { df.queryExecution.executedPlan }
        // SPARK_GRAFT_NOOP=1: drive doExecute (noop sink) instead of
        // executeCollect — isolates the terminal-collect machinery cost
        val tExec = ms {
          if (sys.env.get("SPARK_GRAFT_NOOP").contains("1"))
            df.write.mode("overwrite").format("noop").save()
          else df.collect()
        }
        (tBuild, tPlan, tExec)
      }.sortBy(r => r._1 + r._2 + r._3)
      val (b, p, e) = reps(2)
      println(f"$n%-22s $b%7.1f $p%7.1f $e%7.1f ${b + p + e}%7.1f")
    }
    spark.stop()
  }
}
