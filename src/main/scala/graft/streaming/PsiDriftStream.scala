package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming PSI drift monitor: the incremental form of x313's
  * temporal Population Stability Index, for serving pipelines that
  * must flag input-distribution drift as events ARRIVE rather than
  * re-scanning the window per report.
  *
  * Shape: the reference histogram is a BATCH frame computed once from
  * the frozen baseline window (x313's first half); the event stream
  * folds into a stateful per-(event_type, bin) count — the ONLY
  * stateful operator, and its state is types × 10 fixed bins, so it
  * is index-sized at any stream volume (the agg is map-side
  * combinable; a 1000-executor drain ships 10-row partials per type).
  * PSI itself is a batch pass over the drained histogram joined to
  * the reference — x313's arithmetic verbatim (10 fixed value bins,
  * +1 Laplace smoothing over the bins observed on either side, the
  * 0.2 micro-PSI drift flag), so stream-replay == batch is an exact
  * integer parity on the counts and a micro-PSI equality on the
  * score, spec-held in PsiDriftStreamSpec.
  *
  * At 100 TB: the reference is broadcast-sized by construction; the
  * running histogram never grows with the stream; emission is
  * per-micro-batch in update/complete mode. Cumulative-window vs
  * sliding-window monitoring is a caller choice — feed the stream
  * through a watermarked window(ts, ...) group first for the sliding
  * form; the PSI pass is unchanged.
  */
object PsiDriftStream {

  /** x313's fixed binning: floor(value/100) clamped to [0, 9]. */
  def bin(value: Column): Column =
    least(lit(9L), greatest(lit(0L), floor(value / lit(100e0)).cast("long")))

  /** Batch side: the frozen baseline's (event_type, bin) histogram. */
  def referenceHist(events: DataFrame): DataFrame =
    events.select(col("event_type"), bin(col("value")).as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("ref_n"))

  /** Streaming side: the running (event_type, bin) histogram —
    * types × 10 rows of state, total. Drain in complete mode (the
    * state IS the output) or update mode (monotone counts). */
  def currentHist(stream: DataFrame): DataFrame =
    stream.select(col("event_type"), bin(col("value")).as("bin"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("cur_n"))

  /** PSI per event type over the drained current histogram vs the
    * reference — x313's formula verbatim: bin universe = bins observed
    * on EITHER side, +1 Laplace on every cell in that universe,
    * PSI = Σ (p−q)·ln(p/q), drift flag at rounded micro-PSI > 200000.
    * Output: (event_type, psi, psi_x1e6, drifted). */
  def psi(current: DataFrame, reference: DataFrame): DataFrame = {
    val u = reference.select(col("event_type"), col("bin"), col("ref_n"))
      .join(current.select(col("event_type"), col("bin"), col("cur_n")),
        Seq("event_type", "bin"), "full_outer")
      .na.fill(0L, Seq("ref_n", "cur_n"))
      .withColumn("a_n", col("ref_n") + lit(1L))
      .withColumn("b_n", col("cur_n") + lit(1L))
    val t = u.groupBy("event_type")
      .agg(sum("a_n").as("at"), sum("b_n").as("bt"))
    val p = col("a_n") * lit(1e0) / col("at")
    val q = col("b_n") * lit(1e0) / col("bt")
    u.join(t, "event_type")
      .groupBy("event_type")
      .agg(sum((p - q) * log(p / q)).as("raw"))
      .select(col("event_type"),
        (round(col("raw"), 4) + lit(0e0)).as("psi"),
        round(col("raw") * lit(1000000L)).cast("long").as("psi_x1e6"),
        when(round(col("raw") * lit(1000000L)) > 200000L, lit(1L))
          .otherwise(lit(0L)).as("drifted"))
  }
}
