package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: run the flagship entry + selected queries, print row counts
  * and formatted physical plans (for shuffle/pushdown/codegen iteration).
  *
  * Usage: sbt "runMain graft.Explain [sfDir] [queryName ...]"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else Seq("q16_multiway_join")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = SparkEntry.entry(spark)
    println(s"[explain] entry rows=${e.count()}")

    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      println(s"\n==== $n rows=${df.count()} ====")
      println(df.queryExecution.optimizedPlan.treeString)
      df.explain("formatted")
    }
    spark.stop()
  }
}
