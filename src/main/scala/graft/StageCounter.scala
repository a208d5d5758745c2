package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Executed-stage counter + per-stage-cost probe shared by the timed
  * mains ([[Bench]], [[StageAudit]]'s richer variant predates it).
  *
  * Why stages are the unit: SCALE.md §36/§37 established that the
  * honest per-query cost at bench scale is `real work + stages ×
  * per-stage constant`, so the floor-adjusted gate bound in BASELINE.md
  * needs BOTH terms co-measured in the same artifact — the executed
  * stage count of the suite and the per-stage scheduling constant of
  * THIS container at THIS hour (it drifts ±30% between rounds, like the
  * paired DuckDB control it complements).
  *
  * The probe deliberately measures a 2-stage zero-data SQL query
  * rather than the single no-op RDD stage the older `floor_ms`
  * reports: a real suite stage pays Catalyst planning, codegen lookup,
  * job submission, shuffle write/read setup, and result fetch that the
  * bare task-launch floor misses (measured: floor_ms 13.8–21.2 ms
  * across r14 runs vs 24–33 ms effective per-stage overhead in
  * STAGE_AUDIT_r14.json). `floor_ms` stays in the artifact as the
  * historical series; `stage_ms` is the gate's constant.
  */
final class StageCounter extends SparkListener {
  private val stages = new AtomicInteger(0)
  private val tasks = new AtomicLong(0L)
  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    stages.incrementAndGet()
    tasks.addAndGet(e.stageInfo.numTasks.toLong)
  }
  def snapshot: (Int, Long) = (stages.get, tasks.get)
  /** Listener bus is async: wait until the counters are unchanged for
    * `stableMs` (cap 5 s) before trusting a read — a fixed sleep would
    * be a race, not a protocol. */
  def quiesce(stableMs: Long = 300L): (Int, Long) = {
    val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
    var last = snapshot
    var stableSince = System.nanoTime()
    while (System.nanoTime() - stableSince < stableMs * 1000 * 1000 &&
           System.nanoTime() < deadline) {
      Thread.sleep(20)
      val now = snapshot
      if (now != last) { last = now; stableSince = System.nanoTime() }
    }
    snapshot
  }
}

object StageCounter {

  /** Median wall of a ZERO-DATA two-stage SQL query, divided by 2: the
    * per-stage cost of the engine's own machinery — Catalyst
    * analysis/optimization, codegen lookup, job submission, an 8-task
    * scan stage into a 1-task exchange (the suite's dominant shape at
    * shuffle=1), and result collection — with no data to hide it.
    *
    * Probe-shape calibration against STAGE_AUDIT_r14.json's measured
    * effective overhead ((wall − exec)/stages, median 33 ms, bench
    * protocol ~24 ms): a bare-RDD 32-task shuffle no-op measured 43 ms
    * warm (over — fan-out the suite doesn't have), a bare-RDD 8-task
    * one 17 ms (under — no SQL planning/codegen/collect in the loop).
    * The SQL probe prices everything a real suite query pays per
    * stage except its data. 7 reps after one warm rep, each rep
    * individually quiesced for its stage count; the whole measurement
    * costs ~1.5 s, once per bench run, outside every timed window. */
  def stageMs(spark: org.apache.spark.sql.SparkSession,
              reps: Int = 7): Double = {
    // spark.sql, not the DataFrame API: every suite query pays the SQL
    // parse+analyze path, so the probe must too. range(0,8,1,8) pins
    // the scan to 8 tasks (bare `range(8)` would fan to
    // defaultParallelism).
    val probeSql =
      """SELECT k, count(*) AS n FROM
        |(SELECT id % 4 AS k FROM range(0, 8, 1, 8)) GROUP BY k""".stripMargin
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.sql(probeSql).collect()
      (System.nanoTime() - t0) / 1e9
    }
    // The divisor is MEASURED, not assumed: the probe is designed as a
    // 2-stage query (scan → exchange), but under AQE or a changed
    // shuffle config its executed-stage count can differ, silently
    // mispricing stage_ms and hence the gate bound (ADVICE r14 #3).
    // Count the probe's own stages with the same listener the suite
    // uses. PER-REP deltas, each rep quiesced individually, and ALL
    // reps must agree (ADVICE r15 #3): the old aggregate
    // delta-divisible-by-reps check was blind to a concurrent job on
    // the shared SparkContext whose stage count happened to divide by
    // reps — a per-rep foreign stage would now have to land inside
    // EVERY rep's quiesced window with the same count to pass
    // unnoticed. Any disagreement or zero delta falls back to the
    // design constant 2, loudly. The per-rep quiesce costs ~150 ms
    // each (~1.3 s total) — once per bench run, outside every timed
    // window.
    val probeCounter = new StageCounter
    spark.sparkContext.addSparkListener(probeCounter)
    try {
      once() // warm the probe's own codegen
      val repStats = Seq.fill(reps) {
        probeCounter.quiesce(150)
        val s0 = probeCounter.snapshot._1
        val t = once()
        val d = probeCounter.quiesce(150)._1 - s0
        (t, d)
      }
      val ts = repStats.map(_._1).sorted
      val counts = repStats.map(_._2).distinct
      val perRep =
        if (counts.length == 1 && counts.head > 0) counts.head
        else {
          System.err.println(
            s"[stage-probe] per-rep stage counts disagree (${repStats.map(_._2).mkString(",")}) — concurrent jobs in flight? falling back to design count 2")
          2
        }
      if (perRep != 2)
        System.err.println(
          s"[stage-probe] probe executed $perRep stages/rep (design: 2) — stage_ms normalized by the measured count")
      ts(ts.length / 2) / perRep * 1000.0
    } finally spark.sparkContext.removeSparkListener(probeCounter)
  }
}
