package graft

import graft.streaming.EventStream
import org.apache.spark.sql.functions._

/** Stream-batch parity (SURVEY.md §5.2 t1): a fully-replayed bounded
  * stream must produce exactly the batch answers. */
class StreamingSpec extends SparkSpec {

  test("tumbling 6h stream == batch q45") {
    val stream = EventStream.readEvents(spark, sf0001)
    EventStream.drainToMemory(spark, EventStream.tumbling6h(stream),
      "t6h", complete = true)
    val got = spark.table("t6h")
      .select(
        (unix_millis(col("w_start")) / 21600000L).cast("long").as("w"),
        col("c"), round(col("s"), 4).as("s"))
      .orderBy("w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = SparkEntry.queries("q45_tumbling_window")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
  }

  test("trending top-3 stream == batch windowed rank") {
    val stream = EventStream.readEvents(spark, sf0001)
    EventStream.drainToMemory(spark,
      EventStream.trendingCounts6h(stream), "trend", complete = true)
    val got = EventStream.rankTopK(spark.table("trend"), 3)
      .select((unix_millis(col("w_start")) / 21600000L).cast("long").as("w"),
        col("rk"), col("event_type"), col("c"))
      .orderBy("w", "rk")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSeq
    // batch recomputation of the same contract: tumbling 6h x type
    // counts, per-window top-3 by (count desc, type)
    val want = Catalog.load(spark, sf0001, "events")
      .groupBy((unix_millis(col("ts")) / 21600000L).cast("long").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("w")
          .orderBy(col("c").desc, col("event_type"))))
      .where(col("rk") <= 3)
      .orderBy("w", "rk")
      .select("w", "rk", "event_type", "c")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(got.nonEmpty && got.groupBy(_._1).forall(_._2.size <= 3))
  }

  test("error-budget burn stream == batch 6h frame (integer-exact flags)") {
    val stream = EventStream.readEvents(spark, sf0001)
    EventStream.drainToMemory(spark, EventStream.burnRate6h(stream),
      "burn", complete = true)
    val got = spark.table("burn")
      .select((unix_millis(col("w_start")) / 21600000L).cast("long").as("w"),
        col("err"), col("tot"), col("rate_bp"), col("alert_fast"))
      .orderBy("w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val want = Catalog.load(spark, sf0001, "events")
      .groupBy((unix_millis(col("ts")) / 21600000L).cast("long").as("w"))
      .agg(sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("err"),
        count(lit(1)).as("tot"))
      .select(col("w"), col("err"), col("tot"),
        floor(col("err") * lit(10000L) / col("tot")).cast("long").as("rate_bp"),
        when(col("err") * lit(1000L) > col("tot") * lit(144L), 1L)
          .otherwise(0L).as("alert_fast"))
      .orderBy("w")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("count-min sketch over a stream == exact batch counts (mergeable = streaming-safe)") {
    // The mergeable-summary claim cashed out in streaming: a CMS
    // aggregated across micro-batches (partial grids merged by the
    // same element-wise add the batch shuffle uses) must land on the
    // identical exact counts in the identity-injective regime — the
    // property that lets a 1000-executor fleet AND a stream share one
    // sketch implementation.
    val depth = 2; val width = 4096
    val cms = udaf(new graft.functions.CountMinSketch(depth, width))
    val stream = EventStream.readEvents(spark, sf0001)
    EventStream.drainToMemory(spark,
      stream.agg(cms(col("user_id")).as("sk")), "cms_stream", complete = true)
    val grid = spark.table("cms_stream").head().getSeq[Long](0).toArray
    val exact = Catalog.load(spark, sf0001, "events")
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (u, c) =>
      assert(graft.functions.CountMinSketch.probe(grid, depth, width, u) == c,
        s"user $u: stream CMS diverged from exact count")
    }
  }

  test("session windows stream == batch q31 sessionization") {
    val stream = EventStream.readEvents(spark, sf0001)
    EventStream.drainToMemory(spark, EventStream.sessions30m(stream),
      "sess", complete = true)
    // second-level aggregation (sessions per user, avg length) done in
    // batch over the drained state — multiple chained stream aggs are not
    // a streaming-expressible shape
    val got = spark.table("sess")
      .groupBy("user_id")
      .agg(count(lit(1)).as("sessions"), round(avg(col("n")), 4).as("avg_len"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = SparkEntry.queries("q31_sessionization")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
  }

  test("flushOpenSessions == batch q31 (3rd impl); unflushed leaves one open/user") {
    import org.apache.spark.sql.functions._
    val events = Catalog.load(spark, sf0001, "events")
    val dir = "/tmp/graft-flatmap-replay"
    EventStream.drainToMemory(spark,
      EventStream.flushOpenSessions(events, dir), "fmsess", complete = false)
    val got = spark.table("fmsess").groupBy("user_id")
      .agg(count(lit(1)).as("sessions"), round(avg(col("n")), 4).as("avg_len"))
      .orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = SparkEntry.queries("q31_sessionization")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
    // contrast: WITHOUT the flush, each user's final session stays open in
    // keyed state — exactly one emitted session per user is missing
    EventStream.drainToMemory(spark,
      EventStream.sessionsViaFlatMap(EventStream.readEvents(spark, sf0001)),
      "fmsess_raw", complete = false)
    val emittedRaw = spark.table("fmsess_raw").count()
    val totalSessions = want.map(_._2).sum
    val nUsers = want.size
    assert(emittedRaw == totalSessions - nUsers,
      s"unflushed replay must hold exactly one open session per user: " +
        s"emitted $emittedRaw vs $totalSessions total - $nUsers users")
  }

  test("sliding windows cover each event twice") {
    val stream = EventStream.readEvents(spark, sf0001)
    EventStream.drainToMemory(spark, EventStream.sliding6h3h(stream),
      "s63", complete = true)
    val total = spark.table("s63").agg(sum("c")).collect().head.getLong(0)
    val events = Catalog.load(spark, sf0001, "events").count()
    assert(total == 2 * events, "6h window sliding by 3h sees each event in exactly 2 windows")
  }

  test("stream-stream interval join == batch interval join") {
    val stream = EventStream.readEvents(spark, sf0001)
    EventStream.drainToMemory(spark, EventStream.clickPurchaseJoin(stream),
      "ssj", complete = false)
    val got = spark.table("ssj").orderBy("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val events = Catalog.load(spark, sf0001, "events")
    val clicks = events.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
    val want = events.where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .join(clicks, expr(
        "p_user = c_user AND c_ts <= p_ts AND c_ts >= p_ts - INTERVAL 1 HOUR"))
      .select("purchase_id", "click_id").orderBy("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.nonEmpty && got == want)
  }

  test("exactly-once parquet sink survives a lost commit (crash replay)") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.types._
    val base = "/tmp/graft-eos"
    val src = s"$base/src"; val out = s"$base/out"; val cp = s"$base/cp"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    val ev = Catalog.load(spark, sf0001, "events")
      .select("event_id", "user_id", "value")
    // 6 source files → 3 micro-batches at maxFilesPerTrigger=2
    ev.repartition(6, col("event_id")).write.parquet(src)
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("user_id", LongType), StructField("value", DoubleType)))
    def stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "2").parquet(src)
    EventStream.sinkExactlyOnce(stream, out, cp)
    val batchDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).sorted
    assert(batchDirs.length == 3, s"expected 3 micro-batches, got ${batchDirs.toSeq}")
    // crash at the worst point: batch 2's output is on disk but its
    // commit marker is lost → restart MUST replay batch 2 idempotently
    val lastCommit = Paths.get(s"$cp/commits/2")
    assert(Files.exists(lastCommit), "commit marker for batch 2 must exist")
    Files.delete(lastCommit)
    // the local FS writes a checksum sidecar; leaving it behind makes the
    // replayed commit's rename look like a concurrent writer
    Files.deleteIfExists(Paths.get(s"$cp/commits/.2.crc"))
    EventStream.sinkExactlyOnce(stream, out, cp)
    // no duplicates, no loss: sink output set-equals the batch table
    val got = spark.read.parquet(out)
      .groupBy("event_id").agg(count(lit(1)).as("k"))
    assert(got.where(col("k") > 1).count() == 0, "replay must not duplicate rows")
    assert(got.count() == ev.count(), "replay must not lose rows")
    // and the replay reused batch id 2, not a new directory
    val after = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).sorted
    assert(after.toSeq == batchDirs.toSeq)
  }

  test("unbounded rate source: watermark-finalized windows match batch") {
    // No end-of-input here: windows close only because the watermark
    // advances, and the query is STOPPED mid-stream — the correctness
    // contract is that every window emitted before the stop equals the
    // batch recomputation over the same deterministic ordinals.
    val q = EventStream.tumbling6h(EventStream.rateEvents(spark, 2000))
      .writeStream.format("memory").queryName("rate_t6h")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 90000
      while (spark.table("rate_t6h").count() < 3 &&
             System.currentTimeMillis() < deadline) Thread.sleep(500)
    } finally q.stop()
    val got = spark.table("rate_t6h")
      .select(col("w_start"), col("c"), col("s").cast("long").as("s"))
      .collect().map(_.toSeq).toSet
    assert(got.size >= 3, s"only ${got.size} windows finalized before stop")
    // batch parity over enough ordinals to cover every emitted window
    // (360 one-minute ordinals per 6h window, + slack)
    val maxStart = spark.table("rate_t6h")
      .agg(max(unix_timestamp(col("w_start")))).head().getLong(0)
    val nOrd = (maxStart - 1704067200L) / 60 + 720
    val batch = EventStream.synthEvents(spark.range(0, nOrd).toDF("value"))
      .groupBy(window(col("ts"), "6 hours"))
      .agg(count(lit(1)).as("c"), sum(col("value")).cast("long").as("s"))
      .select(col("window.start").as("w_start"), col("c"), col("s"))
      .collect().map(_.toSeq).toSet
    assert(got.subsetOf(batch),
      s"streamed windows must equal batch: extra=${got -- batch}")
  }

  test("RocksDB state store: same answers, bounded state, provider active") {
    // The 100 TB streaming claim needs state that spills off-heap: run
    // the watermarked-dedup replay on RocksDBStateStoreProvider (bundled
    // rocksdbjni, no extra deps) and assert (a) results are identical to
    // the default HDFS-backed provider, (b) the provider actually
    // engaged (rocksdb custom metrics present), (c) state rows stay
    // bounded by the keyspace across the replay.
    val prov = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(prov)
    spark.conf.set(prov,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = EventStream.readEvents(spark, sf0001)
      val q = EventStream.drainToMemoryWithQuery(spark,
        EventStream.dedup(stream), "dd_rocks", "append")
      val n = spark.table("dd_rocks").count()
      val distinct = Catalog.load(spark, sf0001, "events")
        .select("event_id").distinct().count()
      assert(n == distinct, "rocksdb-backed dedup must equal the batch distinct")
      val ops = q.lastProgress.stateOperators
      assert(ops.nonEmpty)
      val metrics = ops.flatMap(_.customMetrics.keySet().toArray()).map(_.toString)
      assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
        s"rocksdb provider must report its metrics, got: ${metrics.take(8).toSeq}")
      val stateRows = ops.map(_.numRowsTotal).sum
      assert(stateRows > 0 && stateRows <= distinct,
        s"state rows $stateRows must stay bounded by the $distinct-key space")
    } finally {
      before match {
        case Some(v) => spark.conf.set(prov, v)
        case None => spark.conf.unset(prov)
      }
    }
  }

  test("watermarked dedup drops a replayed duplicate batch") {
    val stream = EventStream.readEvents(spark, sf0001)
    EventStream.drainToMemory(spark, EventStream.dedup(stream),
      "dd", complete = false)
    val n = spark.table("dd").count()
    val distinct = Catalog.load(spark, sf0001, "events")
      .select("event_id").distinct().count()
    assert(n == distinct)
  }

  test("stateful restart from checkpoint: state resumes, nothing reprocessed") {
    // The operational streaming contract at 100 TB: a stopped query
    // restarted against the SAME checkpoint must (a) recover keyed
    // state (counts continue, not restart at zero) and (b) consume
    // only unseen input. Run 1 sees a third of the events; more files
    // land while the query is down; run 2 picks up from the offsets
    // log. Proof of (a): final per-user maxima equal the full-corpus
    // batch counts though run 2 never saw run 1's rows. Proof of (b):
    // the two runs' numInputRows sum to n exactly — each event
    // processed once ACROSS QUERY RESTARTS.
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    val replay = "/tmp/graft-restart-replay"
    val ckpt = "/tmp/graft-restart-ckpt"
    val out = "/tmp/graft-restart-out"
    Seq(replay, ckpt, out).foreach { d =>
      val f = new java.io.File(d)
      if (f.exists()) new scala.reflect.io.Directory(f).deleteRecursively()
    }
    new java.io.File(replay).mkdirs()
    val events = Catalog.load(spark, sf0001, "events")
    val n = events.count()
    def writeSlice(i: Int): Unit = {
      val tmp = s"$replay-tmp$i"
      events.where(pmod(col("event_id"), lit(3)) === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(replay, s"e$i.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    def run(): Long = {
      val stream = spark.readStream.schema(events.schema)
        .option("pathGlobFilter", "*.parquet").parquet(replay)
      val q = EventStream.runningPerUser(stream).writeStream
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, id: Long) =>
          b.write.mode("overwrite").parquet(s"$out/batch_id=$id")
        }
        .start()
      q.awaitTermination()
      q.recentProgress.map(_.numInputRows).sum
    }
    writeSlice(0)
    val in1 = run()
    writeSlice(1); writeSlice(2)
    val in2 = run()
    assert(in1 + in2 == n, s"each event exactly once across restarts: $in1 + $in2 != $n")
    assert(in1 > 0 && in2 > 0 && in2 < n, s"run 2 must see only new files: $in2")
    val got = spark.read.parquet(out).groupBy("user_id")
      .agg(max("n").as("n")).orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = events.groupBy("user_id").count().orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want, "restored state must continue run-1 counts")
  }

  test("streaming CDC apply: replayed change stream lands the fold of all changes") {
    // x169's MERGE semantics driven from a change STREAM: three
    // micro-batches with updates, an intra-batch latest-wins conflict,
    // a tombstone, and a post-delete re-insert. The final table must
    // equal the sequential fold of all changes — and version N-1 stays
    // readable while N is being written (copy-on-write commit loop).
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val replay = "/tmp/graft-cdc-replay"
    val ckpt = "/tmp/graft-cdc-ckpt"
    val table = "/tmp/graft-cdc-table"
    Seq(replay, ckpt, table).foreach { d =>
      val f = new java.io.File(d)
      if (f.exists()) new scala.reflect.io.Directory(f).deleteRecursively()
    }
    new java.io.File(replay).mkdirs()
    import spark.implicits._
    // (key, price, status, seq, deleted) — one parquet file per batch
    val batches = Seq(
      // b0: inserts; key 2 has an intra-batch conflict, seq 4 must win
      Seq((1L, 10.0, "N", 1L, false), (2L, 20.0, "N", 2L, false),
          (3L, 30.0, "N", 3L, false), (2L, 25.0, "U", 4L, false)),
      // b1: update key 1, delete key 3
      Seq((1L, 11.0, "U", 5L, false), (3L, 0.0, "X", 6L, true)),
      // b2: re-insert key 3, update key 2
      Seq((3L, 33.0, "R", 7L, false), (2L, 26.0, "U", 8L, false)))
    def writeBatch(i: Int): Unit = {
      val tmp = s"$replay-tmp$i"
      batches(i).toDF("k", "price", "status", "seq", "deleted")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, Paths.get(replay, s"b$i.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val schema = batches(0).toDF("k", "price", "status", "seq", "deleted").schema
    def run(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", "1") // one change-batch per micro-batch
        .parquet(replay)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          graft.streaming.CdcStream.applyBatch(spark, table, b, "k"); ()
        }
        .start()
      q.awaitTermination()
    }
    writeBatch(0); writeBatch(1); writeBatch(2)
    run()
    val got = graft.streaming.CdcStream.latest(spark, table).get
      .orderBy("k").collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq
    assert(got === Seq((1L, 11.0, "U"), (2L, 26.0, "U"), (3L, 33.0, "R")),
      s"fold of all changes: $got")
    // COW trail: three committed versions, all still readable;
    // v1 (post-delete) must not contain key 3
    val v1 = graft.streaming.CdcStream.readVersion(spark, table, 1)
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(v1 === Seq(1L, 2L), s"v1 must reflect the tombstone: $v1")

    // Bucket pruning: batch 2 changed keys {2, 3}; every bucket NOT
    // holding a changed key must be carried into v2 as a reference to
    // the SAME directory v1 mapped it to, its files untouched on disk
    // (byte-identical, not rewritten) — the 100 TB contract: merge
    // cost scales with the batch's buckets, not the table.
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    def bucketOf(k: Long): Int = Seq(k).toDF("k")
      .select(pmod(xxhash64(col("k")), lit(16L)).cast("int"))
      .collect().head.getInt(0)
    val changedV2 = Set(bucketOf(2L), bucketOf(3L))
    val m1 = graft.streaming.CdcStream.bucketDirs(spark, table, 1)
    val m2 = graft.streaming.CdcStream.bucketDirs(spark, table, 2)
    val untouched = m1.keySet -- changedV2
    assert(untouched.nonEmpty, s"test needs an untouched bucket: $m1 / $changedV2")
    untouched.foreach { b =>
      assert(m2(b) == m1(b), s"untouched bucket $b must be carried by reference")
    }
    // changed buckets must point at NEW v2 directories (data dirs are
    // uniquely named per attempt — data/v2-<uuid> — so racers/replayers
    // can never clobber committed files; ADVICE r6)
    changedV2.filter(m2.contains).foreach { b =>
      assert(m2(b) != m1.getOrElse(b, ""), s"changed bucket $b must be rewritten")
      assert(m2(b).contains("/data/v2-"), s"changed bucket $b dir: ${m2(b)}")
    }
    // and the untouched files really were not rewritten: still under a
    // pre-v2 data dir, with v2's data dir containing ONLY changed buckets
    untouched.foreach { b =>
      assert(!m2(b).contains("/data/v2-"), s"untouched bucket $b rewritten: ${m2(b)}")
    }
    val v2dir = new java.io.File(s"$table/data").listFiles()
      .filter(d => d.isDirectory && d.getName.startsWith("v2-"))
    assert(v2dir.length == 1, s"one v2 data dir: ${v2dir.map(_.getName).toSeq}")
    val v2buckets = v2dir.head.listFiles()
      .filter(_.getName.startsWith("b=")).map(_.getName.drop(2).toInt).toSet
    assert(v2buckets.subsetOf(changedV2),
      s"v2 wrote only changed buckets: $v2buckets vs $changedV2")

    // Commit atomicity: a version directory without its manifest (what
    // a crash mid-commit leaves before the atomic rename) is invisible
    // — latest() must keep serving v2 (ADVICE r5 #1).
    new java.io.File(s"$table/v99").mkdirs()
    val afterJunk = graft.streaming.CdcStream.latest(spark, table).get
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(afterJunk === Seq(1L, 2L, 3L),
      s"manifest-less version dir must be ignored: $afterJunk")
  }

  test("CDC vacuum: retention bounds disk, latest versions byte-identical, orphans swept") {
    // VERDICT r6 #1: N commits + vacuum(keepLast=2) → old versions
    // unreadable, surviving two byte-identical to pre-vacuum, crashed-
    // commit temp dirs and orphan data dirs reclaimed, file count bounded.
    import graft.streaming.CdcStream
    import spark.implicits._
    val table = "/tmp/graft-cdc-vacuum"
    val t = new java.io.File(table)
    if (t.exists()) new scala.reflect.io.Directory(t).deleteRecursively()
    def batch(seq: Long, ks: Seq[Long]) = ks.map(k =>
      (k, k * 1.0 + seq, s"s$seq", seq, false))
      .toDF("k", "price", "status", "seq", "deleted")
    // 5 commits over a rotating key set: every commit rewrites some
    // buckets and carries others
    (0L until 5L).foreach { i =>
      CdcStream.applyBatch(spark, table, batch(i, Seq(i, i + 7, i + 13)), "k")
    }
    assert(CdcStream.versions(spark, table) == Seq(0L, 1L, 2L, 3L, 4L))
    // plant crash debris: an un-renamed commit attempt and an orphan
    // data dir no manifest references
    new java.io.File(s"$table/.tmp-v9-crashed").mkdirs()
    val orphan = new java.io.File(s"$table/data/v9-orphan00/b=0")
    orphan.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(orphan.getPath, "junk.parquet"), Array[Byte](1, 2, 3))

    def allFiles(d: java.io.File): Seq[java.io.File] =
      if (d.isDirectory) d.listFiles().toSeq.flatMap(allFiles) else Seq(d)
    def snapshot(n: Long) = CdcStream.readVersion(spark, table, n)
      .orderBy("k").collect().map(_.toSeq).toSeq
    val pre3 = snapshot(3L); val pre4 = snapshot(4L)
    // the files the surviving manifests reference, with sizes — vacuum
    // must leave every one untouched on disk
    val refFiles = Seq(3L, 4L).flatMap(n =>
      CdcStream.bucketDirs(spark, table, n).values).distinct
      .flatMap(d => allFiles(new java.io.File(new java.net.URI(d).getPath)))
      .map(f => f.getPath -> f.length()).toMap

    // graceMs = 0: this test PLANTS fresh debris and wants it swept —
    // the graceful default (which protects an in-flight writer's
    // uncommitted dir) is pinned by its own test below
    val stats = CdcStream.vacuum(spark, table, keepLast = 2, graceMs = 0L)
    assert(stats.manifestsDropped == 3, s"$stats")
    assert(stats.tmpDirsDeleted == 1, s"$stats")
    assert(stats.bucketDirsDeleted > 0, s"$stats")

    assert(CdcStream.versions(spark, table) == Seq(3L, 4L))
    intercept[Exception] { CdcStream.readVersion(spark, table, 1L).collect() }
    // survivors byte-identical: same rows AND same physical files/sizes
    assert(snapshot(3L) == pre3 && snapshot(4L) == pre4)
    refFiles.foreach { case (p, len) =>
      val f = new java.io.File(p)
      assert(f.exists() && f.length() == len, s"referenced file touched: $p")
    }
    // orphans gone
    assert(!new java.io.File(s"$table/.tmp-v9-crashed").exists())
    assert(!new java.io.File(s"$table/data/v9-orphan00").exists())
    // disk bound: every remaining data file is referenced by a survivor
    val remaining = allFiles(new java.io.File(s"$table/data"))
      .filter(_.getName.endsWith(".parquet"))
    val refDirs = Seq(3L, 4L).flatMap(n =>
      CdcStream.bucketDirs(spark, table, n).values).distinct
      .map(d => new java.net.URI(d).getPath)
    remaining.foreach { f =>
      assert(refDirs.exists(f.getPath.startsWith),
        s"unreferenced data file survived vacuum: $f")
    }
  }

  test("CDC vacuum under a concurrent reader: expired version fails cleanly, never stale") {
    // VERDICT r7 #4: define and pin what a reader holding version v sees
    // while vacuum (keepLast excludes v) runs. Contract: FAIL, never
    // stale/partial data. Three legs:
    //  (1) a DataFrame handle on v0 obtained BEFORE vacuum throws at
    //      execution (missing input file), because its pinned file
    //      listing now points at deleted bucket dirs;
    //  (2) readVersion(v0) AFTER vacuum fails eagerly with a message
    //      naming the surviving versions;
    //  (3) a pre-vacuum handle on a KEPT version collects byte-identical
    //      results after the vacuum — retention never touches survivors.
    import graft.streaming.CdcStream
    import spark.implicits._
    val table = "/tmp/graft-cdc-vacuum-reader"
    val t = new java.io.File(table)
    if (t.exists()) new scala.reflect.io.Directory(t).deleteRecursively()
    def batch(seq: Long, ks: Seq[Long]) = ks.map(k =>
      (k, k * 1.0 + seq, s"s$seq", seq, false))
      .toDF("k", "price", "status", "seq", "deleted")
    (0L until 3L).foreach { i =>
      CdcStream.applyBatch(spark, table, batch(i, Seq(i, i + 7, i + 13)), "k")
    }
    // leg (1)'s premise requires the default missing-file strictness:
    // ignoreMissingFiles=true would make Spark skip vanished files and
    // return PARTIAL data — the exact failure mode the contract forbids
    assert(spark.conf.get("spark.sql.files.ignoreMissingFiles") == "false",
      "contract leg (1) requires the strict default")
    val expiredHandle = CdcStream.readVersion(spark, table, 0L)
    val keptHandle = CdcStream.readVersion(spark, table, 2L)
    val keptPre = keptHandle.orderBy("k").collect().map(_.toSeq).toSeq
    val expiredPre = expiredHandle.count() // readable before the vacuum

    val stats = CdcStream.vacuum(spark, table, keepLast = 1)
    assert(stats.manifestsDropped == 2 && stats.bucketDirsDeleted > 0,
      s"premise: vacuum must actually delete v0-era bucket dirs ($stats)")

    // (1) pre-vacuum handle on the expired version: clean failure at
    // execution, with the missing file named in the error chain
    val err = intercept[Exception] { expiredHandle.count() }
    def chain(e: Throwable): Seq[Throwable] =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(err).exists(c =>
      c.isInstanceOf[java.io.FileNotFoundException] ||
        c.getMessage != null && c.getMessage.contains("does not exist")),
      s"expected a missing-input failure, got: $err")
    assert(expiredPre > 0, "sanity: the version was readable pre-vacuum")

    // (2) post-vacuum readVersion: eager, named failure
    val gone = intercept[NoSuchElementException] {
      CdcStream.readVersion(spark, table, 0L)
    }
    assert(gone.getMessage.contains("v0") && gone.getMessage.contains("v2") &&
      gone.getMessage.contains("vacuum"), gone.getMessage)

    // (3) the kept version's pre-vacuum handle is untouched
    assert(keptHandle.orderBy("k").collect().map(_.toSeq).toSeq == keptPre,
      "survivor handle must read byte-identical rows after vacuum")
  }

  test("CDC vacuum: in-flight write phase outliving the grace survives; stale debris still swept") {
    // ADVICE r12 #3 / VERDICT r12 #8: an applyBatch whose WRITE PHASE is
    // longer than graceMs holds only `_temporary` under its unique
    // data/v* dir. The dir inode's mtime is its creation time — once
    // past the grace it looked like crash debris, and the r11 fix
    // (age the dir inode) still reclaimed it mid-write, just past the
    // grace horizon. Liveness now comes from the NEWEST mtime anywhere
    // under the dir: a live writer's task files keep progressing.
    import graft.streaming.CdcStream
    import spark.implicits._
    val table = "/tmp/graft-cdc-vacuum-inflight"
    val t = new java.io.File(table)
    if (t.exists()) new scala.reflect.io.Directory(t).deleteRecursively()
    CdcStream.applyBatch(spark, table,
      Seq((1L, 1.0, "a", 1L, false))
        .toDF("k", "price", "status", "seq", "deleted"), "k")
    // simulate the in-flight batch: unique uncommitted dir, only
    // _temporary under it; every DIR inode aged an hour (creation), the
    // task file fresh (the write is still progressing right now)
    val inflight = new java.io.File(s"$table/data/v1-deadbeef")
    val task = new java.io.File(inflight, "_temporary/0/attempt_0/part-00000")
    assert(task.getParentFile.mkdirs())
    java.nio.file.Files.write(task.toPath, "partial".getBytes)
    val old = System.currentTimeMillis() - 3600L * 1000
    Seq(inflight, new java.io.File(inflight, "_temporary"),
        new java.io.File(inflight, "_temporary/0"),
        new java.io.File(inflight, "_temporary/0/attempt_0"))
      .foreach(d => assert(d.setLastModified(old)))
    CdcStream.vacuum(spark, table, keepLast = 1, graceMs = 15L * 60 * 1000)
    assert(inflight.exists(),
      "in-flight dir with fresh _temporary contents must survive vacuum")
    // the crashed-writer variant of the SAME tree — whole tree stale —
    // is still reclaimed (the r11 crash-debris guarantee is not lost)
    assert(task.setLastModified(old))
    val swept = CdcStream.vacuum(spark, table, keepLast = 1,
      graceMs = 15L * 60 * 1000)
    assert(!inflight.exists(), "fully-stale debris must still be swept")
    assert(swept.dataDirsDeleted >= 1, s"sweep must be counted: $swept")
  }

  test("CDC txn replay is a no-op; pre-write version check fails fast") {
    import graft.streaming.CdcStream
    import spark.implicits._
    val table = "/tmp/graft-cdc-txn"
    val t = new java.io.File(table)
    if (t.exists()) new scala.reflect.io.Directory(t).deleteRecursively()
    val b0 = Seq((1L, 1.0, "a", 1L, false), (2L, 2.0, "b", 2L, false))
      .toDF("k", "price", "status", "seq", "deleted")
    val v0 = CdcStream.applyBatch(spark, table, b0, "k", txnId = Some("batch-0"))
    assert(v0 == 0L)
    // crash-after-commit replay: same txn id → same version, no new commit
    val replayed = CdcStream.applyBatch(spark, table, b0, "k", txnId = Some("batch-0"))
    assert(replayed == 0L)
    assert(CdcStream.versions(spark, table) == Seq(0L))
    // a mid-rename / foreign v1 dir blocks BEFORE any data is written
    new java.io.File(s"$table/v1").mkdirs()
    val preData = new java.io.File(s"$table/data").listFiles().map(_.getName).toSet
    intercept[IllegalStateException] {
      CdcStream.applyBatch(spark, table, b0, "k", txnId = Some("batch-1"))
    }
    val postData = new java.io.File(s"$table/data").listFiles().map(_.getName).toSet
    assert(postData == preData, "failed attempt must not have written data dirs")
  }

  test("CDC latest-wins holds ACROSS batches: a late batch with an older seq is a no-op") {
    // The transport CAN reorder across micro-batches — measured, not
    // hypothetical: the streaming file source replays a multi-file
    // backlog in no guaranteed order (the 100× rehearsal's range files
    // arrive shuffled). seq is persisted with every row and tombstones
    // are RETAINED as flagged rows, so this replay cannot regress the
    // table on any of the three legs: a stale upsert, a stale
    // tombstone, and a stale re-insert AFTER a newer delete (the leg
    // only tombstone retention can protect — without it the delete
    // removes the row and its seq, leaving nothing to compare against).
    import graft.streaming.CdcStream
    import spark.implicits._
    val table = "/tmp/graft-cdc-ooo"
    val t = new java.io.File(table)
    if (t.exists()) new scala.reflect.io.Directory(t).deleteRecursively()
    def df(rows: (Long, Double, String, Long, Boolean)*) =
      rows.toDF("k", "price", "status", "seq", "deleted")
    // batch N: key 1 at seq 10, key 2 at seq 20, key 3 deleted at seq 30
    CdcStream.applyBatch(spark, table,
      df((1L, 10.0, "new", 10L, false), (2L, 20.0, "new", 20L, false),
         (3L, 30.0, "new", 29L, false)), "k")
    CdcStream.applyBatch(spark, table, df((3L, 0.0, "del", 30L, true)), "k")
    // batch N+1 arrives LATE carrying older changes: a stale upsert for
    // key 1 (seq 5 < 10), a stale TOMBSTONE for key 2 (seq 15 < 20),
    // and a fresh update for key 2 is absent — plus a genuinely newer
    // update for key 1 at seq 11 in the batch after, proving the table
    // still moves forward
    CdcStream.applyBatch(spark, table,
      df((1L, 5.0, "stale", 5L, false), (2L, 0.0, "stale-del", 15L, true)), "k")
    val after = CdcStream.latest(spark, table).get.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3))).toSeq
    assert(after === Seq((1L, 10.0, "new", 10L), (2L, 20.0, "new", 20L)),
      s"stale batch must not regress any key or resurrect a delete: $after")
    CdcStream.applyBatch(spark, table, df((1L, 11.0, "fwd", 11L, false)), "k")
    val fwd = CdcStream.latest(spark, table).get.where("k = 1").collect()
      .map(r => (r.getDouble(1), r.getLong(3))).toSeq
    assert(fwd === Seq((11.0, 11L)), s"newer changes still apply: $fwd")
    // leg 3: key 3 was deleted at seq 30; a late batch replaying its
    // OLD state (seq 29) must not resurrect it — the retained tombstone
    // outranks the stale re-insert
    CdcStream.applyBatch(spark, table, df((3L, 30.0, "stale-reinsert", 29L, false)), "k")
    assert(CdcStream.latest(spark, table).get.where("k = 3").isEmpty,
      "a stale re-insert must not resurrect a newer delete")
    // ...while a genuinely newer re-insert does bring it back
    CdcStream.applyBatch(spark, table, df((3L, 31.0, "reborn", 31L, false)), "k")
    val reborn = CdcStream.latest(spark, table).get.where("k = 3").collect()
      .map(r => (r.getDouble(1), r.getString(2))).toSeq
    assert(reborn === Seq((31.0, "reborn")), s"newer re-insert applies: $reborn")
  }

  test("CDC rejects schema drift and reserved column names by name") {
    import graft.streaming.CdcStream
    import spark.implicits._
    val table = "/tmp/graft-cdc-schema"
    val t = new java.io.File(table)
    if (t.exists()) new scala.reflect.io.Directory(t).deleteRecursively()
    CdcStream.applyBatch(spark, table,
      Seq((1L, 1.0, "a", 1L, false)).toDF("k", "price", "status", "seq", "deleted"),
      "k")
    // a batch MISSING a payload column would silently narrow the table
    // schema and null that column across every carried bucket — the
    // silent direction, so it must fail loudly, naming the column
    val narrow = intercept[IllegalArgumentException] {
      CdcStream.applyBatch(spark, table,
        Seq((1L, 2.0, 2L, false)).toDF("k", "price", "seq", "deleted"), "k")
    }
    assert(narrow.getMessage.contains("status"), narrow.getMessage)
    // the physical partition column: a payload column named "b" would
    // be clobbered by the bucket id and read back NULL
    val clash = intercept[IllegalArgumentException] {
      CdcStream.applyBatch(spark, table,
        Seq((1L, 1.0, "x", 1L, false)).toDF("k", "price", "b", "seq", "deleted"),
        "k")
    }
    assert(clash.getMessage.contains("'b'") || clash.getMessage.contains(" b "),
      clash.getMessage)
    val okAfter = CdcStream.latest(spark, table).get.count()
    assert(okAfter == 1L, "rejected batches must leave the table untouched")
  }

  test("CDC tombstone compaction purges only below the horizon, bit-identical visible rows") {
    import graft.streaming.CdcStream
    import spark.implicits._
    val table = "/tmp/graft-cdc-compact"
    val t = new java.io.File(table)
    if (t.exists()) new scala.reflect.io.Directory(t).deleteRecursively()
    def df(rows: (Long, Double, String, Long, Boolean)*) =
      rows.toDF("k", "price", "status", "seq", "deleted")
    // live keys 1,2; key 3 deleted at seq 30 (OLD, purgeable), key 4
    // deleted at seq 90 (inside the horizon, must be retained)
    CdcStream.applyBatch(spark, table,
      df((1L, 10.0, "a", 10L, false), (2L, 20.0, "a", 20L, false),
         (3L, 30.0, "a", 29L, false), (4L, 40.0, "a", 40L, false)), "k")
    CdcStream.applyBatch(spark, table,
      df((3L, 0.0, "d", 30L, true), (4L, 0.0, "d", 90L, true)), "k")
    val preVisible = CdcStream.latest(spark, table).get
      .orderBy("k").collect().map(_.toSeq).toSeq

    val v = CdcStream.compactTombstones(spark, table, "k", belowSeq = 50L)
    assert(v == 2L, s"compaction commits a new version: v$v")
    // visible rows bit-identical
    val postVisible = CdcStream.latest(spark, table).get
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(postVisible === preVisible)
    // the purged tombstone is physically gone, the in-horizon one kept:
    // read the new version's bucket files RAW (bypassing the visible
    // filter) and count __dead rows by key
    val rawDirs = CdcStream.bucketDirs(spark, table, v).values.toSeq.distinct
    val raw = spark.read.parquet(rawDirs: _*)
    val deadKeys = raw.where(col("__dead")).select("k").collect()
      .map(_.getLong(0)).toSet
    assert(deadKeys === Set(4L),
      s"seq<50 tombstone purged, seq 90 retained: $deadKeys")
    // the horizon contract both ways: a stale change for the RETAINED
    // tombstone's key still loses; one for the PURGED key re-inserts
    CdcStream.applyBatch(spark, table,
      df((4L, 41.0, "stale", 50L, false), (3L, 31.0, "stale", 29L, false)), "k")
    val after = CdcStream.latest(spark, table).get
      .orderBy("k").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!after.contains(4L), "in-horizon tombstone still outranks stale changes")
    assert(after(3L) == 31.0,
      "purged-horizon key re-inserts — the documented horizon contract")
    // no-op when nothing is purgeable: same version back, no new commit
    val vLast = CdcStream.versions(spark, table).last
    val v2 = CdcStream.compactTombstones(spark, table, "k", belowSeq = 10L)
    assert(v2 == vLast)
    assert(CdcStream.versions(spark, table).last == vLast,
      "a purge with no purgeable tombstones must not commit a version")
  }

  test("CDC graceful vacuum spares a fresh uncommitted data dir, reclaims expired ones") {
    // The writer-vs-vacuum race: an in-flight applyBatch's written-but-
    // uncommitted dir looks exactly like crash debris. With the default
    // grace it must SURVIVE (else the writer commits a manifest pointing
    // at deleted files — a corrupt version); dirs referenced by a
    // manifest the vacuum drops are known-dead and reclaim immediately.
    import graft.streaming.CdcStream
    import spark.implicits._
    val table = "/tmp/graft-cdc-grace"
    val t = new java.io.File(table)
    if (t.exists()) new scala.reflect.io.Directory(t).deleteRecursively()
    def batch(seq: Long, ks: Seq[Long]) = ks.map(k =>
      (k, k * 1.0, s"s$seq", seq, false))
      .toDF("k", "price", "status", "seq", "deleted")
    // key 0 is rewritten by EVERY commit, so its v0-/v1-era bucket
    // copies become dead the moment those manifests drop — the
    // immediate-reclaim leg needs at least one such bucket
    (0L until 3L).foreach { i =>
      CdcStream.applyBatch(spark, table, batch(i, Seq(0L, i + 10)), "k")
    }
    // simulate the in-flight writer: a fresh never-referenced data dir
    // and a fresh commit attempt, both mtime=now
    val inflight = new java.io.File(s"$table/data/v3-inflight0/b=0")
    inflight.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(inflight.getPath, "part-w.parquet"), Array[Byte](1))
    new java.io.File(s"$table/.tmp-v3-racing").mkdirs()
    // ADVICE r11 #1: EARLIER in the write phase the in-flight dir has
    // no b= child yet — only Spark's _temporary staging dir. The
    // zero-bucket dir must not be vacuously "all buckets dead" (0==0)
    // and reclaimed regardless of age.
    val inflightEarly =
      new java.io.File(s"$table/data/v4-inflight1/_temporary/0")
    inflightEarly.mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(
      inflightEarly.getPath, "part-w.parquet.inprogress"), Array[Byte](1))
    // contrast leg: an AGED empty version dir IS crash debris and goes
    val agedEmpty = new java.io.File(s"$table/data/v5-crashed2")
    agedEmpty.mkdirs()
    agedEmpty.setLastModified(System.currentTimeMillis() - 24L * 3600 * 1000)

    val stats = CdcStream.vacuum(spark, table, keepLast = 1) // default grace
    assert(stats.manifestsDropped == 2, s"$stats")
    assert(new java.io.File(s"$table/data/v3-inflight0/b=0/part-w.parquet").exists(),
      "fresh uncommitted data dir must survive a graceful vacuum")
    assert(new java.io.File(s"$table/.tmp-v3-racing").exists(),
      "fresh commit attempt must survive a graceful vacuum")
    assert(inflightEarly.exists(),
      "a fresh zero-bucket (write-phase) dir must survive a graceful vacuum")
    assert(!agedEmpty.exists(),
      "an empty version dir aged past the grace is crash debris and must go")
    // expired-manifest dirs went despite being fresh by mtime? No —
    // they are old only in manifest terms; assert reclaim happened for
    // at least the buckets only v0/v1 referenced
    assert(stats.bucketDirsDeleted > 0,
      s"dropped-manifest dirs reclaim immediately, no grace: $stats")
    // and the kept version still reads
    assert(CdcStream.latest(spark, table).get.count() > 0)
  }
}
