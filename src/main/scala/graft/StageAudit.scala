package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-count audit of the BASELINE.md gate suite (VERDICT r13 #4).
  *
  * SCALE.md §36 established that the honest sf0.1 per-query cost is
  * approximately `stages × task-launch floor + real work`, but nobody
  * had COUNTED the stages. This main produces the per-query evidence
  * row: executed stage count, task count, summed executor run time
  * (the "real work" the cluster did), and fresh-plan wall time — the
  * inputs for BASELINE.md's floor-adjusted bound.
  *
  * Protocol: identical session config to [[Bench]] (AQE off,
  * shuffle=1 — the §37 protocol default, overridable via
  * SPARK_GRAFT_SHUFFLE for the matrix runs — 4 MB splits, plan cache
  * off), one warm pass, then
  * median-of-3 wall with stage/task/exec-time counters taken from the
  * LAST rep (plans are static with AQE off, so counts are identical
  * across reps — asserted for stages across the three reps).
  *
  * Counter integrity: the listener bus is asynchronous, so after each
  * rep the harness polls until the counters are quiescent (unchanged
  * for 300 ms) before reading them — a fixed sleep would be a race,
  * not a protocol.
  */
object StageAudit {

  private final class Counters extends SparkListener {
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val jobs = new AtomicInteger(0)
    val execMs = new AtomicLong(0L)
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(e.stageInfo.numTasks)
      val tm = e.stageInfo.taskMetrics
      if (tm != null) execMs.addAndGet(tm.executorRunTime)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      jobs.incrementAndGet()
    }
    def snapshot: (Int, Int, Int, Long) =
      (stages.get, tasks.get, jobs.get, execMs.get)
    def reset(): Unit = {
      stages.set(0); tasks.set(0); jobs.set(0); execMs.set(0)
    }
    /** Wait for the async listener bus to drain: counters unchanged for
      * 300 ms (cap 5 s — events for a finished job land far faster). */
    def quiesce(): Unit = {
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      var last = snapshot
      var stableSince = System.nanoTime()
      while (System.nanoTime() - stableSince < 300L * 1000 * 1000 &&
             System.nanoTime() < deadline) {
        Thread.sleep(25)
        val now = snapshot
        if (now != last) { last = now; stableSince = System.nanoTime() }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stage-audit")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Catalog.planCacheEnabled = false

    val counters = new Counters
    spark.sparkContext.addSparkListener(counters)

    val prefix = sys.env.getOrElse("SPARK_GRAFT_BENCH_SET", "q")
    val queries = SparkEntry.queries
    val names = queries.keys.toSeq.filter(_.startsWith(prefix)).sorted

    def once(name: String): Double = {
      val f = queries(name)
      val t0 = System.nanoTime()
      f(spark, sfDir).collect()
      (System.nanoTime() - t0) / 1e9
    }

    // warm pass (JIT, codegen cache, parquet footers)
    names.foreach { n => once(n); spark.catalog.clearCache() }

    // task-launch floor, same definition as Bench: median wall of a
    // 32-empty-task stage on the warm session
    def floorOnce(): Double = {
      val t0 = System.nanoTime()
      spark.sparkContext.parallelize(0 until 32, 32).count()
      (System.nanoTime() - t0) / 1e9
    }
    floorOnce()
    val floorMs = Seq.fill(5)(floorOnce()).sorted.apply(2) * 1000.0

    val rows = names.map { n =>
      val stageCounts = scala.collection.mutable.ArrayBuffer.empty[Int]
      var lastSnap = (0, 0, 0, 0L)
      val walls = (1 to 3).map { _ =>
        counters.quiesce(); counters.reset()
        val w = once(n)
        counters.quiesce()
        lastSnap = counters.snapshot
        stageCounts += lastSnap._1
        spark.catalog.clearCache()
        w
      }.sorted
      if (stageCounts.distinct.size != 1)
        System.err.println(
          s"[audit] $n stage count varied across reps: $stageCounts")
      val (st, tk, jb, ex) = lastSnap
      val wallMs = walls(1) * 1000.0
      System.err.println(f"[audit] $n%-28s stages=$st%3d jobs=$jb%2d " +
        f"tasks=$tk%4d execMs=$ex%6d wall=$wallMs%8.1f ms " +
        f"floorShare=${st * floorMs / wallMs}%5.2f")
      (n, st, jb, tk, ex, wallMs)
    }

    val totalWall = rows.map(_._6).sum / 1000.0
    val totalStages = rows.map(_._2).sum
    val qs = rows.map { case (n, st, jb, tk, ex, w) =>
      s""""$n":{"stages":$st,"jobs":$jb,"tasks":$tk,"exec_ms":$ex,"wall_ms":${"%.1f".format(w)}}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"stage_audit","value":${"%.4f".format(totalWall)},"unit":"sec","total_stages":$totalStages,"floor_ms":${"%.1f".format(floorMs)},"queries":$qs,"sf":"${JsonOut.esc(sfDir)}","shuffle":$shuffle}""")
    spark.stop()
  }
}
