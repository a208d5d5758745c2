package graft

import graft.sources.Layout
import graft.streaming.EventStream
import org.apache.spark.sql.functions._

/** Proves the SCALE.md layout claims on real (small) data: partition
  * pruning reaches the scan, bucketed joins skip the exchange, and the
  * stateful stream accumulator matches batch. */
class LayoutSpec extends SparkSpec {

  lazy val events = Catalog.load(spark, sf0001, "events")

  test("date-partitioned events: static partition pruning in the plan") {
    val path = "/tmp/graft-layout/events_dt"
    Layout.writeEventsDatePartitioned(events, path)
    val back = Layout.readDatePartitioned(spark, path)
    assert(back.count() == events.count())
    val plan = back.where(col("dt") === "2024-01-05")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("dt"), plan)
    // pruned read touches exactly one day's rows
    val day = back.where(col("dt") === "2024-01-05").count()
    val full = events.where(to_date(col("ts")) === "2024-01-05").count()
    assert(day == full && day > 0)
  }

  test("dim-filtered join on partitioned fact triggers dynamic pruning") {
    val path = "/tmp/graft-layout/events_dt"
    Layout.writeEventsDatePartitioned(events, path)
    val fact = Layout.readDatePartitioned(spark, path)
    import spark.implicits._
    val dim = Seq(("2024-01-03", "a"), ("2024-01-04", "b"))
      .toDF("dt_key", "tag")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    val joined = fact.join(dim, fact("dt") === to_date(dim("dt_key")) && dim("tag") === "a")
    val plan = joined.queryExecution.executedPlan.toString
    val rows = joined.count()
    val expect = events.where(to_date(col("ts")) === "2024-01-03").count()
    assert(rows == expect)
    assert(plan.toLowerCase.contains("dynamicpruning") ||
      plan.contains("PartitionFilters"), plan)
  }

  test("bucketed fact-fact join plans without an exchange") {
    val li = Catalog.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = Catalog.load(spark, sf0001, "orders")
      .select("o_orderkey", "o_totalprice")
    Layout.writeBucketed(li, "li_b", "l_orderkey", 4)
    Layout.writeBucketed(ord, "ord_b", "o_orderkey", 4)
    val j = spark.table("li_b").join(spark.table("ord_b"),
      col("l_orderkey") === col("o_orderkey"))
    // co-located bucketed join: no shuffle exchange on either side
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(j.count() == li.join(ord, col("l_orderkey") === col("o_orderkey")).count())
  }

  test("bucketed+sorted layout: merge join with no Sort and no Exchange") {
    // SCALE.md §2's strongest layout claim: because writeBucketed gives
    // each bucket exactly one sorted file, the scan advertises the sort
    // and the fact-fact SortMergeJoin needs neither a shuffle NOR a sort
    // on either side — the join cost at 100 TB is a pure streamed merge.
    val li = Catalog.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_quantity")
    val ord = Catalog.load(spark, sf0001, "orders")
      .select("o_orderkey", "o_totalprice")
    Layout.writeBucketed(li, "li_bs", "l_orderkey", 4)
    Layout.writeBucketed(ord, "ord_bs", "o_orderkey", 4)
    val bar = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // Spark >= 3.0 only advertises per-bucket sort order behind this
    // flag (sound ONLY with one file per bucket, which writeBucketed
    // guarantees via its aligned pre-write repartition)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      val j = spark.table("li_bs").join(spark.table("ord_bs"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(!plan.contains("Sort ["),
        s"bucketed+sorted scan must advertise ordering (no Sort node):\n$plan")
      assert(j.count() ==
        li.join(ord, col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bar)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    }
  }

  test("x178 snapshot diff over bucketed snapshots: exchange-free, result-identical") {
    // x178's scaladoc claims the diff's full-outer join runs exchange-free
    // when both snapshots share the §6 bucketed layout — make it an
    // assertion (VERDICT r6 #7), same pattern as the fact-fact pin above.
    val ord = Catalog.load(spark, sf0001, "orders")
    val vOld = ord.where(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey").as("k"),
        floor(col("o_totalprice") * 100).cast("long").as("pc"))
    val vNew = ord.where(col("o_orderkey") % 11 =!= 0)
      .select(col("o_orderkey").as("k"),
        (floor(col("o_totalprice") * 100).cast("long") +
          when(col("o_orderkey") % 5 === 0, 500L).otherwise(0L)).as("pc"))
    Layout.writeBucketed(vOld, "snap_old", "k", 4)
    Layout.writeBucketed(vNew, "snap_new", "k", 4)
    val o = spark.table("snap_old").select(col("k").as("ok"), col("pc").as("old_pc"))
    val n = spark.table("snap_new").select(col("k").as("nk"), col("pc").as("new_pc"))
    val diff = o.join(n, col("ok") === col("nk"), "full_outer")
      .where(col("ok").isNull || col("nk").isNull || col("old_pc") =!= col("new_pc"))
      .select(coalesce(col("ok"), col("nk")).as("k"),
        when(col("ok").isNull, "added").when(col("nk").isNull, "removed")
          .otherwise("changed").as("change"),
        col("old_pc"), col("new_pc"))
    val plan = diff.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed snapshot diff must not shuffle either snapshot:\n$plan")
    val got = diff.orderBy("k").collect().map(_.toSeq).toSeq
    val want = Catalog.sql(spark, sf0001, Queries.sparkSql("x178_snapshot_diff"))
      .collect().map(_.toSeq).toSeq
    assert(got.nonEmpty && got == want,
      "bucketed diff must be row-identical to the declared x178 entry")
  }

  test("ANN-partitioned layouts: probes prune partitions, results match inline") {
    import graft.llm.Ann
    val embs = Catalog.load(spark, sf0001, "embeddings")
    val q = embs.where(col("vec_id") === 0).select("embedding")
      .collect().head.getSeq[Float](0).map(_.toDouble).toSeq
    val corpus = embs.where(col("vec_id") =!= 0)

    // LSH-bucket partitioned
    val lshPath = "/tmp/graft-layout/emb_lsh"
    Layout.writeLshPartitioned(corpus, lshPath, Ann.planes(8, 64, 42L))
    val part = Ann.lshTopKPartitioned(spark, lshPath, q, 10,
      numPlanes = 8, maxProbes = 32)
    val plan = part.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"probe must prune bucket partitions:\n$plan")
    val inline = Ann.lshTopKMultiProbe(corpus, q, 10,
      numPlanes = 8, maxProbes = 32).collect().map(_.getLong(0)).toSeq
    assert(part.collect().map(_.getLong(0)).toSeq == inline,
      "partitioned probe must equal the inline multiprobe operator")

    // IVF-list partitioned
    val ivfPath = "/tmp/graft-layout/emb_ivf"
    val cs = Ann.ivfTrain(corpus, nLists = 16, dim = 64)
    Layout.writeIvfPartitioned(corpus, ivfPath, cs)
    val ivfPart = Ann.ivfTopKPartitioned(spark, ivfPath, q, 10, cs, nProbe = 4)
    val ivfPlan = ivfPart.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*list".r.findFirstIn(ivfPlan).isDefined,
      s"probe must prune list partitions:\n$ivfPlan")
    val ivfInline = Ann.ivfTopK(corpus, q, 10, nLists = 16, nProbe = 4,
      centroids = Some(cs)).collect().map(_.getLong(0)).toSeq
    assert(ivfPart.collect().map(_.getLong(0)).toSeq == ivfInline,
      "partitioned IVF probe must equal the inline operator")
  }

  test("stateful stream (mapGroupsWithState) final counts match batch") {
    val stream = EventStream.readEvents(spark, sf0001)
    EventStream.drainToMemory(spark,
      EventStream.runningPerUser(stream), "runpu", mode = "update")
    // last update per user = totals (AvailableNow may emit several
    // intermediate updates; take the max count per user)
    val got = spark.table("runpu").groupBy("user_id")
      .agg(max("n").as("n")).orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = events.groupBy("user_id").count().orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
  }

  test("compact: small-file directory rewritten to target-size files, content intact") {
    val orders = Catalog.load(spark, sf0001, "orders")
    val shattered = "/tmp/graft-layout/orders_small"
    val compacted = "/tmp/graft-layout/orders_compact"
    // simulate an over-parallel writer: 40 tiny files
    orders.repartition(40).write.mode("overwrite").parquet(shattered)
    // target sized to land a handful of files (directory is ~100s of KB)
    val (before, after) = Layout.compact(spark, shattered, compacted, 64 * 1024L)
    assert(before == 40, s"expected 40 input files, got $before")
    assert(after < before && after >= 1, s"before=$before after=$after")
    // lossless: same multiset of rows
    val a = spark.read.parquet(compacted)
    assert(a.count() == orders.count())
    assert(a.exceptAll(orders).isEmpty && orders.exceptAll(a).isEmpty)
  }

  test("skip index: range query reads only intersecting files, equals full scan") {
    val orders = Catalog.load(spark, sf0001, "orders")
    val path = "/tmp/graft-layout/orders_ranged"
    // range-clustered layout: 10 files with disjoint o_orderkey ranges
    orders.repartitionByRange(10, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.mode("overwrite").parquet(path)
    val idx = graft.sources.SkipIndex
      .build(spark, path, Seq("o_orderkey")).cache()
    assert(idx.count() == 10)
    val (lo, hi) = (lit(100L), lit(300L))
    val cand = graft.sources.SkipIndex.candidateFiles(idx, "o_orderkey", lo, hi)
    assert(cand.nonEmpty && cand.size < 10,
      s"zone map should prune most of 10 range-disjoint files, kept ${cand.size}")
    val got = graft.sources.SkipIndex
      .readRange(spark, idx, "o_orderkey", lo, hi)
      .select("o_orderkey", "o_custkey").orderBy("o_orderkey", "o_custkey")
    val want = spark.read.parquet(path)
      .where(col("o_orderkey").between(lo, hi))
      .select("o_orderkey", "o_custkey").orderBy("o_orderkey", "o_custkey")
    assert(got.collect().toSeq == want.collect().toSeq && want.count() > 0)
    // a disjoint range prunes everything
    val none = graft.sources.SkipIndex
      .candidateFiles(idx, "o_orderkey", lit(-500L), lit(-1L))
    assert(none.isEmpty)
    idx.unpersist()
  }

  test("skip index: incremental update == rebuild after append/remove, idempotent") {
    import java.nio.file.{Files, Paths}
    val orders = Catalog.load(spark, sf0001, "orders")
    val path = "/tmp/graft-layout/orders_incr"
    orders.where(col("o_orderkey") < 1000)
      .repartitionByRange(5, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.mode("overwrite").parquet(path)
    val idx0 = graft.sources.SkipIndex.build(spark, path, Seq("o_orderkey"))
      .localCheckpoint(true) // pin rows: the directory mutates below
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("file").collect().map(_.toSeq).toSeq
    // no change => update is the identity, AND re-stats ZERO files: the
    // diff is asserted empty through the same canonicalizer update uses,
    // so a listing-vs-input_file_name URI-form divergence (which would
    // silently degrade update to full-rebuild COST while keeping output
    // equality) fails here instead of hiding (ADVICE r7 #2)
    assert(graft.sources.SkipIndex.freshFiles(spark, idx0, path).isEmpty,
      "no-change update must not re-stat any file")
    assert(canon(graft.sources.SkipIndex.update(spark, idx0, path, Seq("o_orderkey")))
      == canon(idx0))
    // append a batch as ONE new file, drop one indexed file (compaction)
    val victim = idx0.select("file").orderBy("file").head().getString(0)
    Files.delete(Paths.get(new java.net.URI(victim)))
    orders.where(col("o_orderkey") >= 1000)
      .coalesce(1).write.mode("append").parquet(path)
    val updated = graft.sources.SkipIndex.update(spark, idx0, path, Seq("o_orderkey"))
    val rebuilt = graft.sources.SkipIndex.build(spark, path, Seq("o_orderkey"))
    assert(canon(updated) == canon(rebuilt),
      "incremental update must equal a full rebuild after append+remove")
    assert(updated.where(col("file") === victim).isEmpty,
      "stale row for the removed file must be dropped")
    // and the updated index still serves correct pruned reads
    val got = graft.sources.SkipIndex
      .readRange(spark, updated.localCheckpoint(true), "o_orderkey", lit(1200L), lit(1400L))
      .select("o_orderkey").orderBy("o_orderkey").collect().map(_.getLong(0)).toSeq
    val want = spark.read.parquet(path)
      .where(col("o_orderkey").between(1200L, 1400L))
      .select("o_orderkey").orderBy("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(got == want && want.nonEmpty)
  }

  test("skip index: bounded driver list, schema-safe empty branches") {
    val orders = Catalog.load(spark, sf0001, "orders")
    val path = "/tmp/graft-layout/orders_ranged2"
    orders.repartitionByRange(10, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.mode("overwrite").parquet(path)
    val idx = graft.sources.SkipIndex
      .build(spark, path, Seq("o_orderkey")).cache()
    val (lo, hi) = (lit(100L), lit(300L))
    val want = spark.read.parquet(path)
      .where(col("o_orderkey").between(lo, hi))
      .select("o_orderkey", "o_custkey").orderBy("o_orderkey", "o_custkey")
      .collect().toSeq

    // pruning stays distributed: candidates() is a filter on the
    // manifest DataFrame, composable without any driver materialization
    val nCand = graft.sources.SkipIndex
      .candidates(idx, "o_orderkey", lo, hi).count()
    assert(nCand > 0 && nCand < 10)

    // cap exceeded => full-scan fallback with the predicate pushed —
    // the driver never holds more than maxDriverFiles paths, and the
    // result is still exact
    val capped = graft.sources.SkipIndex
      .readRange(spark, idx, "o_orderkey", lo, hi, maxDriverFiles = 1)
      .select("o_orderkey", "o_custkey").orderBy("o_orderkey", "o_custkey")
      .collect().toSeq
    assert(capped == want && want.nonEmpty)

    // empty candidate set => empty frame that still carries the table
    // schema (derived from the recorded root, not an arbitrary file)
    val none = graft.sources.SkipIndex
      .readRange(spark, idx, "o_orderkey", lit(-500L), lit(-1L))
    assert(none.count() == 0)
    assert(none.columns.contains("o_orderkey") && none.columns.contains("o_custkey"))

    // empty index (nothing indexed) => empty frame, no crash
    val emptyIdx = idx.where(lit(false))
    assert(graft.sources.SkipIndex
      .readRange(spark, emptyIdx, "o_orderkey", lit(0L), lit(1L)).count() == 0)
    idx.unpersist()
  }

  test("z-order layout: skip index prunes on BOTH columns; linear only on one") {
    val orders = Catalog.load(spark, sf0001, "orders")
    val linear = "/tmp/graft-layout/orders_linear"
    val zpath = "/tmp/graft-layout/orders_zorder"
    val nFiles = 16
    // linear: clustered on o_orderkey only
    orders.repartitionByRange(nFiles, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.mode("overwrite").parquet(linear)
    Layout.writeZOrdered(orders, zpath, "o_orderkey", "o_custkey", nFiles)

    // losslessness first
    val z = spark.read.parquet(zpath)
    assert(z.count() == orders.count())
    assert(z.exceptAll(orders).isEmpty && orders.exceptAll(z).isEmpty)

    val idxLin = graft.sources.SkipIndex
      .build(spark, linear, Seq("o_orderkey", "o_custkey")).cache()
    val idxZ = graft.sources.SkipIndex
      .build(spark, zpath, Seq("o_orderkey", "o_custkey")).cache()
    val total = idxZ.count()
    assert(total == nFiles.toLong && idxLin.count() == nFiles.toLong)

    // narrow range on the SECONDARY column (~2% of the custkey domain):
    // the linear layout interleaves custkeys across every file — no
    // pruning; z-order keeps ~sqrt locality on both dims.
    val (lo, hi) = (lit(40L), lit(42L))
    val linCand = graft.sources.SkipIndex.candidateFiles(idxLin, "o_custkey", lo, hi)
    val zCand = graft.sources.SkipIndex.candidateFiles(idxZ, "o_custkey", lo, hi)
    assert(linCand.size == nFiles,
      s"linear layout should NOT prune on the secondary column, kept ${linCand.size}")
    assert(zCand.size <= nFiles / 2,
      s"z-order should prune most files on the secondary column, kept ${zCand.size}/$nFiles")

    // the primary column must still prune under z-order
    val zPrim = graft.sources.SkipIndex
      .candidateFiles(idxZ, "o_orderkey", lit(100L), lit(300L))
    assert(zPrim.size < nFiles,
      s"z-order should still prune on the primary column, kept ${zPrim.size}/$nFiles")

    // and the pruned read is exact
    val got = graft.sources.SkipIndex.readRange(spark, idxZ, "o_custkey", lo, hi)
      .select("o_orderkey", "o_custkey").orderBy("o_orderkey", "o_custkey")
    val want = orders.where(col("o_custkey").between(lo, hi))
      .select("o_orderkey", "o_custkey").orderBy("o_orderkey", "o_custkey")
    assert(got.collect().toSeq == want.collect().toSeq && want.count() > 0)
    idxLin.unpersist(); idxZ.unpersist()
  }
}
