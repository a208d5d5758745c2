package graft

import org.apache.spark.sql.SparkSession

/** Dev probe (VERDICT r8 #5): under the EXACT bench config, split a
  * query's per-rep wall time into (a) DataFrame construction + analysis,
  * (b) optimize+plan (queryExecution.executedPlan force), and (c) pure
  * re-execution of the already-planned physical plan — to attribute the
  * above-floor residual of floor-class queries (q37, q29) to planning vs
  * execution. Not on any contract path.
  *
  * `multifile` arg (round 10, VERDICT r9 #6): every contract table is
  * ONE parquet row group, so a scan pins to one real task and the
  * floor-class queries pay a serial-scan floor the bench protocol
  * cannot see past (the bench inputs are shared with the driver and
  * stay untouched). This mode rewrites the same sf0.1 rows into a
  * 16-part-file layout under /tmp and re-probes the same queries, so
  * SCALE.md §25 can contrast 1-row-group vs parallel-scan timings —
  * the number a 1000-executor cluster (where inputs are always
  * many-split) would actually see.
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val multifile = args.contains("multifile")
    // `suite`: probe the FULL 46-query BASELINE suite instead of the
    // floor-class sample, so the multifile contrast yields the one
    // cluster-realistic number VERDICT r10 #5 asks for — suite total on
    // multi-split inputs (the bench protocol itself must stay on the
    // shared single-row-group files).
    val suite = args.contains("suite")
    val rest = args.filterNot(a => a == "multifile" || a == "suite")
    val sfDir = rest.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (suite) SparkEntry.queries.keys.toSeq.filter(_.startsWith("q")).sorted
                else if (rest.length > 1) rest.tail.toSeq
                else Seq("q37_date_funcs", "q29_ntile", "q38_math_funcs", "q01_count")
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
    def ms(f: => Any): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6 }
    // A/B: SPARK_GRAFT_NO_DEFER=1 strips the DeferProjectionPastTopK rule
    // and times the raw SQL text (bypassing SparkEntry, whose Catalog
    // call would re-register the rule).
    val noDefer = sys.env.get("SPARK_GRAFT_NO_DEFER").contains("1")
    val sqlByName = Queries.all.map(q => q.name -> q.spark).toMap

    def probe(dir: String, label: String): Unit = {
      Catalog.ensure(spark, dir)
      def build(n: String): org.apache.spark.sql.DataFrame =
        if (n.startsWith("sql=")) spark.sql(n.stripPrefix("sql="))
        else if (noDefer) spark.sql(sqlByName(n))
        else SparkEntry.queries(n)(spark, dir)
      if (noDefer) {
        spark.experimental.extraOptimizations = Seq.empty
        println("[qprobe] DeferProjectionPastTopK DISABLED")
      }
      (1 to 2).foreach(_ => names.foreach(n => build(n).collect()))
      println(s"[qprobe] layout: $label ($dir)")
      println(f"${"query"}%-22s ${"build"}%7s ${"plan"}%7s ${"exec"}%7s ${"total"}%7s  (medians of 5, ms)")
      var suiteTotal = 0.0
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
        suiteTotal += b + p + e
        println(f"$n%-22s $b%7.1f $p%7.1f $e%7.1f ${b + p + e}%7.1f")
      }
      println(f"[qprobe] suite_total ($label): $suiteTotal%.1f ms over ${names.size}%d queries")
    }

    probe(sfDir, "contract (1 row group per table)")

    if (multifile) {
      // SAME rows, 16 part files per table — multi-split scans, the
      // cluster-realistic layout. Bench inputs are never touched. The
      // dir key is collision-proof (Catalog.cacheKey: sanitized path +
      // md5-8 — ADVICE r10 #3, plus the follow-up that sanitization
      // alone can still collide two sources into rebuild thrash) and
      // the _DONE sentinel carries a per-data-file (name, size, mtime)
      // fingerprint of every source table (Catalog.fingerprint — flat
      // files AND Spark-written directory corpora) — a source whose
      // rows changed in place rebuilds instead of silently reusing the
      // stale rewrite; a run killed mid-rewrite rebuilds from scratch
      // (sentinel written last).
      val dir16 = "/tmp/graft_qprobe_16f_" + Catalog.cacheKey(sfDir)
      val fingerprint = Catalog.tables.map { t =>
        s"$t\n${Catalog.fingerprint(s"$sfDir/$t.parquet")}"
      }.mkString("\n")
      val fs = org.apache.hadoop.fs.FileSystem
        .get(spark.sparkContext.hadoopConfiguration)
      val done = new org.apache.hadoop.fs.Path(s"$dir16/_DONE")
      val fresh = fs.exists(done) && {
        val in = fs.open(done)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8) == fingerprint
        finally in.close()
      }
      if (!fresh) {
        Catalog.tables.foreach { t =>
          Catalog.load(spark, sfDir, t).repartition(16)
            .write.mode("overwrite").parquet(s"$dir16/$t.parquet")
        }
        val out = fs.create(done, true)
        try out.write(fingerprint.getBytes(
          java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }
      probe(dir16, s"16-file (parallel scan), same rows as $sfDir")
    }
    spark.stop()
  }
}
