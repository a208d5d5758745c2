package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: break per-query wall-clock into parse/analyze vs first
  * execution (optimize+plan+run) vs re-execution of the same DataFrame
  * (cached physical plan). Identifies whether the bench floor is planning
  * or execution overhead. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q01_count", "q05_histogram", "q16_multiway_join",
               "q31_sessionization", "q38_math_funcs", "q39_json_extract")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Catalog.ensure(spark, dir)

    def ms(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    println(f"${"query"}%-24s ${"plan"}%8s ${"exec1"}%8s ${"exec2"}%8s ${"exec3"}%8s")
    names.foreach { n =>
      var df: org.apache.spark.sql.DataFrame = null
      val tPlan = ms { df = SparkEntry.queries(n)(spark, dir) }
      val t1 = ms { df.collect() }
      val t2 = ms { df.collect() }
      val t3 = ms { df.collect() }
      println(f"$n%-24s $tPlan%8.1f $t1%8.1f $t2%8.1f $t3%8.1f")
    }
    spark.stop()
  }
}
