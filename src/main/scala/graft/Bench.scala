package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the declared queries on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line
  * {"metric":...,"value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Protocol (BASELINE.md): warm SparkSession, full warm-up pass, then
  * median of 3 timed runs per query; timing wraps plan execution +
  * result fetch (collect), the same work the DuckDB baseline timed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // At sf0.1 every table fits in a handful of partitions; a small shuffle
    // fan-out avoids per-task scheduling overhead dominating. On a real
    // cluster this would be sized to data volume (AQE coalesces down).
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "4")
    // AQE is the engine's default (and the right call at cluster scale:
    // runtime coalescing, skew splits), but each adaptive execution
    // re-optimizes at every shuffle materialization — measured +0.5-0.7s
    // across the 46-query suite at sf0.1 where shuffles are single-digit
    // MB. The warm-suite BASELINE.md protocol measures steady-state
    // execution, so bench pins static plans. (suite: AQE on ≈1.9s,
    // off+shuffle4 ≈1.21s vs DuckDB 1.19s.)
    val adaptive = sys.env.getOrElse("SPARK_GRAFT_AQE", "false")
    // Single-file tables: without a smaller split size each scan is ONE
    // task regardless of cores — split small so parquet decode parallelizes
    // (row-group granularity bounds the effective fan-out).
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", adaptive)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // Ad-hoc overrides for tuning experiments: "k=v;k=v".
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Bench covers exactly the BASELINE.md suite (q01-q46); extension
    // operators (x47+) are correctness-gated via Verify but not part of
    // the baseline comparison. SPARK_GRAFT_BENCH_SET=x times the
    // extension inventory instead (artifact BENCH_r04_xops.json tracks
    // the LLM-pipeline operators' cost at sf0.1).
    val prefix = sys.env.getOrElse("SPARK_GRAFT_BENCH_SET", "q")
    val names = SparkEntry.queries.keys.toSeq.filter(_.startsWith(prefix)).sorted
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).collect()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // Warm-up ×2: JIT, codegen cache, parquet footers, broadcast
    // relations, AQE final plans (second pass runs fully warm, narrowing
    // run-to-run variance of the timed medians). Cache is cleared per
    // NAME (not per rep): the persist-heavy extension operators register
    // a cache entry per canonicalized plan, and letting ~100 of them
    // accumulate starves execution memory — the same phantom-regression
    // class Verify/Scratch hit (see Scratch's t() note). Within one
    // name's warm-up + 3 timed reps the cache stays, so reps measure the
    // operator's warm cost exactly as the r4 protocol did.
    names.foreach { n => once(n); spark.catalog.clearCache() }
    names.foreach { n => once(n); spark.catalog.clearCache() }
    val medians = names.map { n =>
      once(n) // re-populate this name's cache entries after the clear
      val ts = Seq(once(n), once(n), once(n)).sorted
      spark.catalog.clearCache()
      n -> ts(1)
    }
    val qs = medians.map { case (k, v) => s""""$k":${"%.4f".format(v)}""" }
      .mkString("{", ",", "}")
    val total = medians.map(_._2).sum
    println(s"""{"metric":"suite_total","value":${"%.4f".format(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
