package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured Streaming ingestion of the `events` table (file-source
  * replay) with the event-time operators a log pipeline needs: tumbling /
  * sliding windows, session windows, watermarked dedup.
  *
  * Correctness contract (SURVEY.md §2.9): streaming output on a fully
  * replayed bounded source must equal the batch answers — asserted by
  * StreamingSpec against q45 (tumbling) and q31 (sessionization).
  *
  * Scale notes: state lives in the executor StateStore keyed by the
  * window/group key, checkpointed per micro-batch; watermarks bound state
  * size. On a real deployment the source would be a date-partitioned
  * directory or Kafka; `Trigger.AvailableNow` here drains the bounded
  * replay deterministically.
  */
object EventStream {

  /** Parquet physical schema of events for a given ts vintage — the
    * corpus has shipped ts as TIMESTAMP(NANOS) (readable only as long
    * under nanosAsLong) and as µs TIMESTAMP_NTZ (the round-7
    * regeneration). A streaming source needs the schema up front, so
    * peek at the footer with a batch read and declare accordingly. */
  private def rawSchema(tsType: org.apache.spark.sql.types.DataType): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

  /** Streaming events with ts normalized to the session timestamp type
    * (same view the batch Catalog exposes), whatever the file vintage. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val physical = spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType
    // file source monitors a DIRECTORY; the corpus stores one file per
    // table in the sf dir, so filter the listing down to the events file
    val raw = spark.readStream
      .schema(rawSchema(physical))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    if (physical == LongType) // ns vintage: floor ns→µs like DuckDB
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else // µs NTZ (or already session-typed): re-tag under the UTC session
      raw.withColumn("ts", col("ts").cast("timestamp"))
  }

  /** Deterministic synthetic event from an ordinal `value` column —
    * shared by the unbounded rate source and its batch parity
    * recomputation, so "same ordinals in" must mean "same windows out"
    * regardless of which source delivered them. Event time advances one
    * minute per ordinal from a fixed epoch; the wall-clock rate
    * timestamp is deliberately ignored (it can never be replayed). */
  def synthEvents(ordinals: DataFrame): DataFrame =
    ordinals.select(
      col("value").as("event_id"),
      expr("timestamp_micros(1704067200000000 + value * 60000000)").as("ts"),
      (col("value") % 97).as("user_id"),
      element_at(lit(Array("click", "view", "purchase")),
        (col("value") % 3 + 1).cast("int")).as("event_type"),
      (col("value") % 1000).cast("double").as("value"))

  /** UNBOUNDED source tier (the path a bounded file replay never
    * exercises): the rate source emits ordinals forever, so the query
    * has no end-of-input — windows are finalized purely by watermark
    * advance and the query is stopped, not drained. StreamingSpec
    * asserts every window emitted before the stop matches the batch
    * recomputation over the same ordinals. On a real deployment the
    * message bus slots in here: same unbounded contract, same
    * watermark-driven finalization. */
  def rateEvents(spark: SparkSession, rowsPerSecond: Int = 2000): DataFrame =
    synthEvents(spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(col("value")))

  /** Tumbling 6-hour window: count + sum(value) (streaming analog of q45). */
  def tumbling6h(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "6 hours"))
      .agg(count(lit(1)).as("c"), sum(col("value")).as("s"))
      .select(col("window.start").as("w_start"), col("c"), col("s"))

  /** First half of windowed trending top-k: final counts per (6h
    * window, event_type), emitted in APPEND mode once the watermark
    * closes the window — each (window, type) row arrives exactly once
    * with its final count. Rank is not an incremental aggregate, so the
    * ranking half ([[rankTopK]]) runs over the closed-window rows at
    * sink time (foreachBatch / the drained table) — the documented
    * streaming-top-k shape: state stays a bounded windowed agg, ranking
    * touches only dimension-sized final counts. */
  def trendingCounts6h(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .select(col("window.start").as("w_start"), col("event_type"), col("c"))

  /** Ranking half of trending top-k — apply to closed-window count rows
    * (append-mode output, where every window is complete on arrival):
    * per-window rank by count desc, type tie-break, keep the top k. */
  def rankTopK(closedCounts: DataFrame, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    closedCounts
      .withColumn("rk", row_number().over(
        Window.partitionBy("w_start").orderBy(col("c").desc, col("event_type"))))
      .where(col("rk") <= k)
      .select(col("w_start"), col("rk"), col("event_type"), col("c"))
  }

  /** Streaming error-budget burn — x294's SRE alerting identity at 6h
    * window granularity: per closed window, error/total counts, the
    * error rate in exact integer basis points, and the fast-burn alert
    * (rate > 14.4× a 1% budget ⇔ err·1000 > 144·tot, a pure integer
    * comparison — no float crosses the state store). The windowed agg
    * is the ONLY state (bounded by the watermark); the flag is a
    * stateless projection over final counts, so append mode emits each
    * window exactly once with its verdict. Parity vs the batch x294
    * frame in StreamingSpec; benched in BenchStream. */
  def burnRate6h(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "6 hours"))
      .agg(count(lit(1)).as("tot"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("err"))
      .select(col("window.start").as("w_start"), col("err"), col("tot"),
        // integer `div`, not float `/`+floor: long/long is DoubleType in
        // Spark, which breaks the "exact integer basis points" contract
        // once err*10000 passes 2^53 (a 6h window at corpus scale)
        expr("err * 10000L div tot").cast("long").as("rate_bp"),
        when(col("err") * lit(1000L) > col("tot") * lit(144L), 1L)
          .otherwise(0L).as("alert_fast"))

  /** Sliding 6h/3h window counts. */
  def sliding6h3h(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "6 hours", "3 hours"))
      .agg(count(lit(1)).as("c"))
      .select(col("window.start").as("w_start"), col("c"))

  /** 30-minute-gap session windows per user (streaming analog of q31's
    * lag-based sessionization): one row per (user, session) with its
    * event count. */
  def sessions30m(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("s_start"), col("n"))

  /** Stream-stream interval join: each purchase matched to the same
    * user's clicks within the preceding hour. Watermarks on both sides
    * let Spark expire click state once the purchase-side watermark passes
    * `p_ts - 1h` — state stays bounded on an unbounded stream, which is
    * what distinguishes this from a batch band join (q22) or as-of
    * (q23/x57: latest-click-only). Inner join → append mode. */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "10 minutes")
    purchases.join(clicks, expr(
        "p_user = c_user AND c_ts <= p_ts AND c_ts >= p_ts - INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("click_id"))
  }

  /** Watermarked exact dedup on event_id. */
  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Custom keyed state via mapGroupsWithState: running event count and
    * value sum per user, one update row per user per micro-batch. The
    * state is a (count, sum) pair in the executor StateStore — the shape
    * any bespoke streaming accumulator takes when windows/aggs can't
    * express it. */
  def runningPerUser(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.select(col("user_id"), col("value")).as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Double), (Long, Long, Double)](
        GroupStateTimeout.NoTimeout) { (user, rows, state) =>
        var (n, s) = state.getOption.getOrElse((0L, 0.0))
        rows.foreach { r => n += 1; s += r._2 }
        state.update((n, s))
        (user, n, s)
      }
      .toDF("user_id", "n", "s")
  }

  /** Sessionization via flatMapGroupsWithState — the third independent
    * implementation of the 30-minute-gap semantics (after q31's SQL
    * windows and sessions30m's session_window), emitting one row per
    * CLOSED session per micro-batch and carrying the open session tail in
    * keyed state across batches. All three must agree on a full replay. */
  def sessionsViaFlatMap(events: DataFrame, gapMs: Long = 1800000L): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    // state: (lastTs µs, openSessionCount)
    events.select(col("user_id"), unix_millis(col("ts")).as("tms"),
        col("event_id")).as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (user, rows, state) =>
        // batch rows arrive unordered within the group; sort by (ts, id)
        val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
        var (lastTs, openN) = state.getOption.getOrElse((Long.MinValue, 0L))
        val closed = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        sorted.foreach { case (_, tms, _) =>
          if (openN > 0 && tms - lastTs > gapMs) {
            closed += ((user, openN)); openN = 0
          }
          openN += 1; lastTs = tms
        }
        state.update((lastTs, openN))
        closed.iterator
      }
      .toDF("user_id", "n")
  }

  /** Streaming funnel — x138's semantics as keyed state: per user,
    * t1 = first 'view' ts, t2 = first 'click' STRICTLY after t1, t3 =
    * first 'purchase' strictly after t2. The batch form computes three
    * global minima with chained joins; on a time-ordered replay the
    * greedy state machine lands on exactly the same triple, because each
    * stage's first qualifying event in arrival order IS its minimum —
    * parity is spec-checked over a 3-micro-batch replay with stage
    * transitions straddling batch boundaries (FunnelStreamSpec). State
    * per user is three µs timestamps — O(1), unconditionally bounded, no
    * eviction policy needed (the 100 TB-friendly property: state size
    * scales with users, not events). Emits the user's current funnel row
    * each micro-batch (update mode); timestamps use Long.MinValue as the
    * not-reached sentinel. */
  def funnel(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val U = Long.MinValue
    events.select(col("user_id"), unix_micros(col("ts")).as("tus"),
        col("event_type"), col("event_id"))
      .as[(Long, Long, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long, Long), (Long, Long, Long, Long, Int)](
        GroupStateTimeout.NoTimeout) { (user, rows, state) =>
        var (t1, t2, t3) = state.getOption.getOrElse((U, U, U))
        // batch rows arrive unordered within the group; sort by (ts, id)
        rows.toSeq.sortBy(r => (r._2, r._4)).foreach { case (_, ts, et, _) =>
          if (et == "view" && t1 == U) t1 = ts
          else if (et == "click" && t1 != U && ts > t1 && t2 == U) t2 = ts
          else if (et == "purchase" && t2 != U && ts > t2 && t3 == U) t3 = ts
        }
        state.update((t1, t2, t3))
        (user, t1, t2, t3,
          if (t3 != U) 3 else if (t2 != U) 2 else if (t1 != U) 1 else 0)
      }
      .toDF("user_id", "t1us", "t2us", "t3us", "depth")
  }

  // NOTE on bounded replays of sessionsViaFlatMap: open sessions stay in
  // state (correct for an unbounded stream). To flush them on a bounded
  // source, append one synthetic far-future event per user to the replay
  // input — each open real session then closes, and the synthetic events
  // themselves form the new open session that never emits. An event-time
  // timeout can NOT replace this: the final watermark lags the last real
  // event by the delay, so the freshest sessions never time out on a
  // bounded source. [[flushOpenSessions]] implements the workaround.

  /** Materialize `events` (batch view, µs timestamps) plus one synthetic
    * far-future event per user under `replayDir`, and return the replay
    * as a stream. Synthetic rows get unique negative event_ids, a ts one
    * year past the corpus maximum (beyond any session gap), and
    * `flushType` as event_type so downstream consumers can recognize
    * them. Bounded-replay tooling: the write is a one-file snapshot of a
    * test/backfill corpus, not a production path. */
  def withFlushEvents(events: DataFrame, replayDir: String,
                      flushType: String = "__flush"): DataFrame = {
    val spark = events.sparkSession
    val maxTs = events.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    require(maxTs != null,
      "withFlushEvents: empty events input — no max ts to anchor the flush rows")
    val flushTs = new java.sql.Timestamp(maxTs.getTime + 366L * 86400000L)
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    val flush = events.select(col("user_id")).distinct()
      .select(
        (-col("user_id") - 1).as("event_id"),
        lit(flushTs).as("ts"),
        col("user_id"),
        lit(flushType).as("event_type"),
        lit(0.0).as("value"),
        lit(null).cast("string").as("props"))
    val augmented = events.select(cols.map(col): _*).unionByName(flush)
    val schema = augmented.schema
    augmented.write.mode("overwrite").parquet(s"$replayDir/events.parquet")
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet")
      .parquet(s"$replayDir/events.parquet")
  }

  /** [[sessionsViaFlatMap]] over a flush-augmented bounded replay: every
    * real session (open tails included) is emitted exactly once; the
    * synthetic flush events form the one never-emitted open session per
    * user. Output counts therefore match the batch sessionization (q31)
    * on any bounded corpus — spec-checked in StreamingSpec. */
  def flushOpenSessions(events: DataFrame, replayDir: String,
                        gapMs: Long = 1800000L): DataFrame =
    sessionsViaFlatMap(withFlushEvents(events, replayDir), gapMs)

  /** Exactly-once durable sink: foreachBatch writes each micro-batch to
    * `outDir/batch_id=<id>/` with overwrite, checkpointed at
    * `checkpointDir`.
    *
    * Why this is exactly-once (the property memory-sink drains never
    * demonstrated): the file source plans each micro-batch's file set
    * into the checkpoint's offset log BEFORE running it, and only writes
    * the commit marker AFTER the sink completes. A crash between the two
    * replays the SAME batch id with the SAME input files on restart, and
    * the batch-id-keyed overwrite makes that replay idempotent — no
    * duplicates, no loss, regardless of where the failure lands.
    * StreamingSpec proves it by deleting the last commit marker (the
    * worst-case crash point: output written, commit lost) and
    * restarting. */
  def sinkExactlyOnce(df: DataFrame, outDir: String,
                      checkpointDir: String): Unit = {
    val q = df.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, id: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$id")
      }
      .start()
    q.awaitTermination()
  }

  /** Drain a bounded streaming DF into an in-memory table; returns the
    * table name. Complete mode for aggregations, append otherwise. */
  def drainToMemory(spark: SparkSession, df: DataFrame, name: String,
                    complete: Boolean): String =
    drainToMemory(spark, df, name, if (complete) "complete" else "append")

  /** Same, with an explicit output mode ("update" for mapGroupsWithState). */
  def drainToMemory(spark: SparkSession, df: DataFrame, name: String,
                    mode: String): String = {
    drainToMemoryWithQuery(spark, df, name, mode)
    name
  }

  /** Same, returning the terminated query handle — `lastProgress` stays
    * readable after termination, which is how StreamingSpec asserts
    * state-store provider + bounded state metrics (RocksDB case). */
  def drainToMemoryWithQuery(spark: SparkSession, df: DataFrame, name: String,
                             mode: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }
}
