package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured-scale soak (SCALE.md §8): synthesizes a 10× copy of the sf0.1
  * corpus into /tmp using the production layouts (date-partitioned events,
  * bucketed+sorted facts), then measures the same query shapes at both
  * sizes and asserts the plan properties the 100 TB design relies on:
  *
  *  - partition pruning: a one-day filter reads 1/30th of the partitions;
  *  - bucketed fact-fact join: zero shuffle exchanges at 6M rows;
  *  - aggregation/window scaling: wall-clock grows sub-linearly vs the
  *    10× row growth (multi-file input parallelizes; the shipped corpus
  *    is a single row group pinned to one task).
  *
  * Usage: runMain graft.ScaleSoak [rebuild]
  */
object ScaleSoak {
  private val root = "/tmp/graft_sf1"

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scale-soak")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"

    if (args.contains("full")) {
      buildFull(spark, sf, "/tmp/graft_sf1x")
      spark.stop(); return
    }

    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val built = fs.exists(new org.apache.hadoop.fs.Path(s"$root/events"))
    if (!built || args.contains("rebuild")) build(spark, sf)

    val events1 = Catalog.load(spark, sf, "events")
    val events10 = sources.Layout.readDatePartitioned(spark, s"$root/events")
    val li10 = spark.table("li_big")
    val ord10 = spark.table("ord_big")
    val li1 = Catalog.load(spark, sf, "lineitem")
    val ord1 = Catalog.load(spark, sf, "orders")

    println(s"[soak] rows: events ${events1.count()} -> ${events10.count()}, " +
      s"lineitem ${li1.count()} -> ${li10.count()}, orders ${ord1.count()} -> ${ord10.count()}")

    def median3(f: => Long): (Double, Long) = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      (runs.map(_._1).sorted.apply(1), runs.head._2)
    }
    def bench(label: String, small: => Long, big: => Long,
              cols: (String, String) = ("sf0.1", "10x")): Unit = {
      val (ts, _) = median3(small)
      val (tb, _) = median3(big)
      println(f"[soak] $label%-24s ${cols._1} ${ts * 1000}%7.1f ms   ${cols._2} ${tb * 1000}%7.1f ms   ratio ${tb / ts}%5.2f")
    }

    // warm both inputs (footers, codegen)
    events1.groupBy("event_type").count().collect()
    events10.groupBy("event_type").count().collect()

    bench("histogram groupBy",
      { events1.groupBy("event_type").count().collect().length.toLong },
      { events10.groupBy("event_type").count().collect().length.toLong })

    bench("hourly series agg",
      { events1.groupBy(date_trunc("hour", col("ts"))).agg(count(lit(1)), sum("value")).collect().length.toLong },
      { events10.groupBy(date_trunc("hour", col("ts"))).agg(count(lit(1)), sum("value")).collect().length.toLong })

    bench("per-user running total",
      { events1.select(col("event_id"), sum("value").over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id")
            .orderBy("ts", "event_id").rowsBetween(Long.MinValue, 0)).as("rt"))
          .agg(count(lit(1))).collect()(0).getLong(0) },
      { events10.select(col("event_id"), sum("value").over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id")
            .orderBy("ts", "event_id").rowsBetween(Long.MinValue, 0)).as("rt"))
          .agg(count(lit(1))).collect()(0).getLong(0) })

    // Partition pruning: a one-day filter touches 1 of 30 dt partitions on
    // the 10× layout, vs a full scan + row filter on the single-file corpus.
    val minDate = events10.select(min("dt")).collect()(0).getDate(0)
    val oneDay = events10.where(col("dt") === lit(minDate))
    val pruned = oneDay.queryExecution.executedPlan.toString.contains("PartitionFilters")
    bench("one-day count",
      { events1.where(to_date(col("ts")) === lit(minDate)).count() },
      { oneDay.count() })
    println(s"[soak] partition pruning in 10x plan: $pruned")

    // Bucketed fact-fact join at 6M × 1.5M rows. Disable auto-broadcast:
    // at this size the dim side would broadcast (correctly hiding the
    // shuffle question); the point here is the co-located join path the
    // 100 TB deployment needs when BOTH sides are too big to broadcast.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val bucketJoin = li10.join(ord10, li10("l_orderkey") === ord10("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity"))
    val bucketPlan = bucketJoin.queryExecution.executedPlan.toString
    val plainJoin10 = sources.Layout.readDatePartitioned(spark, s"$root/li_plain")
      .join(sources.Layout.readDatePartitioned(spark, s"$root/ord_plain"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity"))
    val plainPlan = plainJoin10.queryExecution.executedPlan.toString
    def exchanges(p: String) = "Exchange hashpartitioning".r.findAllIn(p).length
    bench("fact join 10x (same data)",
      { plainJoin10.collect().length.toLong },
      { bucketJoin.collect().length.toLong },
      cols = ("unbucketed", "bucketed"))
    println(s"[soak] shuffle exchanges: bucketed=${exchanges(bucketPlan)} " +
      s"(SMJ=${bucketPlan.contains("SortMergeJoin")}) vs unbucketed=${exchanges(plainPlan)}")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")

    spark.stop()
  }

  /** Build a FULL 10× copy of every table as multi-file parquet (each
    * `<t>.parquet` is a directory of part files — the layout real
    * pipelines read), with referentially consistent key offsets, so the
    * complete query inventory can be verified by Verify + the DuckDB
    * oracle at a fourth scale point. Invoked via
    * `runMain graft.ScaleSoak full`. */
  def buildFull(spark: SparkSession, sf: String, out: String): Unit = {
    println(s"[soak] building full 10x corpus under $out")
    val stride = 10 * 1000 * 1000L
    // repartition BEFORE the 10x explode: the source tables are
    // single-row-group files, so without this the whole build (and every
    // later scan of the output) is one task — each output table must be
    // a genuinely multi-file parquet directory.
    def rep10(df: DataFrame): DataFrame =
      df.repartition(16).withColumn("rep", explode(sequence(lit(0), lit(9))))
    def shift(df: DataFrame, cols: String*): DataFrame =
      cols.foldLeft(rep10(df)) { (d, c) =>
        d.withColumn(c, col(c) + col("rep") * lit(stride))
      }.drop("rep")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    // dims unchanged (joins stay valid: replicated custkeys keep their
    // original nationkeys, lineitems their part/supp keys)
    Seq("region", "nation", "part", "supplier").foreach { t =>
      write(Catalog.load(spark, sf, t), t)
    }
    write(shift(Catalog.load(spark, sf, "customer"), "c_custkey"), "customer")
    write(shift(Catalog.load(spark, sf, "orders"), "o_orderkey", "o_custkey"), "orders")
    write(shift(Catalog.load(spark, sf, "lineitem"), "l_orderkey"), "lineitem")
    // events: µs-timestamp view materialized directly (Catalog detects
    // the TimestampType column and skips the ns conversion on read)
    write(rep10(Catalog.load(spark, sf, "events"))
      .withColumn("event_id", col("event_id") * 10 + col("rep"))
      .withColumn("user_id", col("user_id") + col("rep") * lit(10000L))
      .drop("rep"), "events")
    write(shift(Catalog.load(spark, sf, "documents"), "doc_id"), "documents")
    write(shift(Catalog.load(spark, sf, "embeddings"), "vec_id"), "embeddings")
  }

  /** Build the 10× corpus: replicate each sf0.1 row 10 times with disjoint
    * keys (new event/order ids, 10× the user population) so group counts
    * and join fan-outs scale the way real growth would. */
  private def build(spark: SparkSession, sf: String): Unit = {
    println("[soak] building 10x corpus under " + root)
    val events = Catalog.load(spark, sf, "events")
    val events10 = events
      .withColumn("rep", explode(sequence(lit(0), lit(9))))
      .withColumn("event_id", col("event_id") * 10 + col("rep"))
      .withColumn("user_id", col("user_id") + col("rep") * lit(10000L))
      .drop("rep")
    sources.Layout.writeEventsDatePartitioned(events10, s"$root/events")

    val keyStride = 10 * 1000 * 1000L
    val lineitem = Catalog.load(spark, sf, "lineitem")
    val li10 = lineitem
      .withColumn("rep", explode(sequence(lit(0), lit(9))))
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * lit(keyStride))
      .drop("rep")
    val orders = Catalog.load(spark, sf, "orders")
    val ord10 = orders
      .withColumn("rep", explode(sequence(lit(0), lit(9))))
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * lit(keyStride))
      .drop("rep")
    sources.Layout.writeBucketed(li10, "li_big", "l_orderkey", 16)
    sources.Layout.writeBucketed(ord10, "ord_big", "o_orderkey", 16)
    // Same 10× data unbucketed, for the exchange-count comparison.
    li10.write.mode("overwrite").parquet(s"$root/li_plain")
    ord10.write.mode("overwrite").parquet(s"$root/ord_plain")
  }
}
