package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm._

/** Throwaway dev timing harness for llm operator internals. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[16]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "16"))
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Catalog.load(spark, dir, "documents")
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
      // same hygiene as Verify: operators persist shared extractions and
      // never unpersist (correct within one query's lifetime); letting
      // them accumulate across the battery starves execution memory and
      // produced phantom 20× "regressions" (a 137 s minHashNearDups that
      // times at 5-7 s in a fresh JVM)
      spark.catalog.clearCache()
    }
    if (args.contains("minhash")) {
      // isolated production-vs-portable MinHash timing, both orders
      if (args.contains("rev")) {
        t("portable first")(Dedup.minHashNearDupsPortable(docs).count())
        t("production second")(Dedup.minHashNearDups(docs, 64, 4, 5000L).count())
      } else {
        t("production first")(Dedup.minHashNearDups(docs, 64, 4, 5000L).count())
        t("portable second")(Dedup.minHashNearDupsPortable(docs).count())
      }
      spark.stop(); return
    }
    if (args.contains("subdedup")) {
      // x339 10×-residual decomposition (VERDICT r14 #3): where does
      // the native's wall go — window ownership (shared with the
      // declared form) or the rebuild? Each timing is a fresh plan.
      import org.apache.spark.sql.expressions.Window
      val window = 8
      val tt = docs
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .where(size(col("w")) >= window)
      def winsOf() = tt
        .select(col("doc_id"), col("w"),
          explode(sequence(lit(1), size(col("w")) - (window - 1))).as("i"))
        .select(col("doc_id"), col("i"),
          md5(concat_ws(" ", slice(col("w"), col("i"), lit(window)))).as("h"))
      t("wins census")(winsOf().count())
      def ownOf() = winsOf().groupBy("h")
        .agg(min("doc_id").as("keeper"), countDistinct("doc_id").as("nd"))
        .where(col("nd") >= 2).select("h", "keeper")
      t("ownership agg")(ownOf().count())
      def mergedOf() = {
        val dup = winsOf().join(ownOf(), "h")
          .where(col("doc_id") > col("keeper"))
          .select(col("doc_id"), col("i").as("s"), (col("i") + window).as("e"))
        val byDoc = Window.partitionBy("doc_id").orderBy("s")
        dup
          .withColumn("pe", max("e").over(
            byDoc.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("g", sum(when(col("pe").isNull || col("s") > col("pe"), 1)
            .otherwise(0)).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("doc_id", "g")
          .agg(min("s").as("s"), max("e").as("e"))
      }
      t("islands (dup+merge)")(mergedOf().count())
      t("full native top15")(SubstringDedup.cleanedDocs(docs, window)
        .orderBy(desc("n_removed"), col("doc_id")).limit(15).collect().length)
      t("declared x332 top15")(
        SparkEntry.queries("x332_substring_dedup_apply")(spark, dir)
          .collect().length)
      // paired ALTERNATING reps: this container's wall drifts several ×
      // within minutes (r15 measured 7× swings on identical plans), so
      // an A-then-B comparison mostly measures the drift — interleave
      // the two forms and compare medians so every drift regime prices
      // both.
      Catalog.planCacheEnabled = false
      def rep(f: => Any): Double = {
        val t0 = System.nanoTime(); f; spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      val (na, de) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
      (1 to 5).foreach { i =>
        de += rep(SparkEntry.queries("x332_substring_dedup_apply")(spark, dir)
          .collect())
        na += rep(SubstringDedup.cleanedDocs(docs, window)
          .orderBy(desc("n_removed"), col("doc_id")).limit(15).collect())
      }
      def medOf(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
      println(f"[scratch] paired x5: declared med ${medOf(de.result())}%6.2f s " +
        f"${de.result().map(x => f"$x%.2f").mkString("[", " ", "]")}  " +
        f"native med ${medOf(na.result())}%6.2f s " +
        f"${na.result().map(x => f"$x%.2f").mkString("[", " ", "]")}")
      spark.stop(); return
    }
    if (args.contains("indexrace")) {
      // IndexStore concurrency/failure drill (VERDICT r16 #5): the
      // save/load/collision/vacuum cycle with TWO RACING WRITERS per
      // round — same kind, same params, barrier-aligned save() entry so
      // both writers compute the same target version as often as the
      // scheduler allows. Run under multi-JVM executors via
      //   spark-submit --master local-cluster[2,16,4096] \
      //     --conf spark.executor.memory=4g ... Scratch <dir> indexrace
      // Invariants asserted every round: 1 or 2 commits (2 when the
      // loser's versions() re-read happened after the winner landed),
      // distinct version numbers, every loser throws the
      // concurrent-commit IllegalStateException, zero .tmp-* anywhere
      // (root or nested), history contiguous and bit-readable. Then a
      // planted crash-orphan pair (root + nested) is vacuumed.
      val table = "/tmp/graft-indexrace"
      val tf = new java.io.File(table)
      if (tf.exists()) new scala.reflect.io.Directory(tf).deleteRecursively()
      val mat = Ann.planes(8, 64, seed = 1L)
      def allTmps(f: java.io.File): Seq[String] =
        Option(f.listFiles()).toSeq.flatten.flatMap { c =>
          (if (c.getName.startsWith(".tmp")) Seq(c.getPath) else Nil) ++
            (if (c.isDirectory) allTmps(c) else Nil)
        }
      var commits = 0
      var collisions = 0
      val rounds = 10
      (1 to rounds).foreach { r =>
        val barrier = new java.util.concurrent.CyclicBarrier(2)
        val results =
          new java.util.concurrent.ConcurrentLinkedQueue[Either[Throwable, Long]]()
        val ths = (1 to 2).map { _ =>
          val th = new Thread(() => {
            barrier.await()
            try results.add(Right(IndexStore.saveLsh(spark, table, mat, 1L)))
            catch { case e: Throwable => results.add(Left(e)) }
          })
          th.start(); th
        }
        ths.foreach(_.join())
        val rs = results.toArray(Array.empty[Either[Throwable, Long]]).toSeq
        val wins = rs.collect { case Right(v) => v }
        val losses = rs.collect { case Left(e) => e }
        assert(rs.size == 2 && wins.nonEmpty,
          s"round $r: expected >=1 commit of 2 writers, got $rs")
        assert(wins.distinct.size == wins.size,
          s"round $r: two writers claimed the SAME version: $wins")
        losses.foreach { e =>
          assert(e.isInstanceOf[IllegalStateException] &&
            e.getMessage.contains("concurrent commit"),
            s"round $r: loser must fail with the concurrent-commit error, got $e")
        }
        val tmps = allTmps(tf)
        assert(tmps.isEmpty, s"round $r: unreclaimed temps $tmps")
        commits += wins.size
        collisions += losses.size
      }
      val vs = IndexStore.versions(spark, table)
      assert(vs == (0L until commits.toLong),
        s"history must be contiguous 0..${commits - 1}, got $vs")
      vs.foreach { v =>
        assert(IndexStore.loadLsh(spark, table, Some(v)).map(_.toSeq).toSeq ==
          mat.map(_.toSeq).toSeq, s"v$v must read back bit-equal")
      }
      // crash-orphan reclamation: plant a root-level and a nested temp
      // (the two shapes a dead loser leaves), vacuum, re-read
      new java.io.File(s"$table/.tmp-crash/planes").mkdirs()
      new java.io.File(s"$table/v${vs.last}/.tmp-crash2/planes").mkdirs()
      val (nv, no) = IndexStore.vacuum(spark, table, keepLast = 2)
      assert(no == 2, s"vacuum must reclaim both planted orphans, got $no")
      assert(nv == vs.size - 2, s"vacuum kept-last accounting off: $nv")
      assert(IndexStore.loadLsh(spark, table).map(_.toSeq).toSeq ==
        mat.map(_.toSeq).toSeq, "post-vacuum latest must read bit-equal")
      println(s"[scratch] indexrace: rounds=$rounds commits=$commits " +
        s"collisions=$collisions versions_final=${IndexStore.versions(spark, table)} " +
        s"master=${spark.sparkContext.master}")
      spark.stop(); return
    }
    if (args.contains("anncosine")) {
      // r17 (VERDICT r16 #4): HOF vs native cosine on the migrated Ann
      // consumers — brute-force top-k (corpus-sized scoring) and the
      // cosineNearDups verify stage. Paired ALTERNATING reps, fresh
      // plans (§41.2 protocol: the container wall drifts several ×
      // within minutes). The HOF twins are reconstructed inline — the
      // production paths now run the native kernel.
      Catalog.planCacheEnabled = false
      val emb = Catalog.load(spark, dir, "embeddings")
      val q = emb.where(col("vec_id") === 0).head()
        .getSeq[Float](1).map(_.toDouble).toSeq
      val corpus = emb.where(col("vec_id") =!= 0)
      val ql = lit(q.toArray)
      def hofTopK() = corpus
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
        .withColumn("sim", Ann.cosine(col("e"), ql))
        .select(col("vec_id"), col("sim"))
        .orderBy(desc("sim"), col("vec_id")).limit(10)
      def natTopK() = Ann.bruteForceTopK(corpus, q, 10)
      // answers must be bit-equal (CosineSim's arithmetic contract)
      val (ah, an) = (hofTopK().collect().toSeq.map(r => (r.getLong(0), r.getDouble(1))),
        natTopK().collect().toSeq.map(r => (r.getLong(0), r.getDouble(1))))
      assert(ah == an, s"HOF and native top-k diverged:\n$ah\n$an")
      spark.catalog.clearCache()
      def rep(f: => Any): Double = {
        val t0 = System.nanoTime(); f; spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      def medOf(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
      val (nb, hb) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
      (1 to 5).foreach { _ =>
        hb += rep(hofTopK().collect())
        nb += rep(natTopK().collect())
      }
      println(f"[scratch] bruteforce paired x5: hof med ${medOf(hb.result())}%6.2f s " +
        f"${hb.result().map(x => f"$x%.2f").mkString("[", " ", "]")}  " +
        f"native med ${medOf(nb.result())}%6.2f s " +
        f"${nb.result().map(x => f"$x%.2f").mkString("[", " ", "]")}")
      if (!args.contains("nodups")) {
        // cosineNearDups' verify stage: the inline HOF twin repeats the
        // production candidate generation, differing only in the kernel
        val mat = Ann.planes(12, 64, 42L)
        val b = Ann.bucketed(emb, mat)
        val masks = 0L +: (0 until 12).map(p => 1L << p)
        def hofDups() = {
          val probed = b.withColumn("pb",
            explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)))
          probed.as("x").join(b.as("y"),
              col("x.pb") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
            .select(col("x.vec_id").as("a"), col("x.e").as("ea"),
              col("y.vec_id").as("b"), col("y.e").as("eb"))
            .dropDuplicates("a", "b")
            .withColumn("sim_bp",
              floor(Ann.cosine(col("ea"), col("eb")) * 10000.0).cast("long"))
            .where(col("sim_bp") >= 9000L)
            .select(col("a"), col("b"), col("sim_bp"))
            .orderBy(desc("sim_bp"), col("a"), col("b"))
        }
        def natDups() = Ann.cosineNearDups(emb)
        assert(hofDups().collect().toSeq.map(_.toSeq) ==
          natDups().collect().toSeq.map(_.toSeq), "near-dup twins diverged")
        spark.catalog.clearCache()
        val (nd, hd) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
        (1 to 5).foreach { _ =>
          hd += rep(hofDups().collect())
          nd += rep(natDups().collect())
        }
        println(f"[scratch] neardups paired x5: hof med ${medOf(hd.result())}%6.2f s " +
          f"${hd.result().map(x => f"$x%.2f").mkString("[", " ", "]")}  " +
          f"native med ${medOf(nd.result())}%6.2f s " +
          f"${nd.result().map(x => f"$x%.2f").mkString("[", " ", "]")}")
      }
      spark.stop(); return
    }
    if (args.contains("holt")) {
      // x274 declared recursive-CTE vs x352 native fold (r16 heavy-tail
      // adjudication): paired ALTERNATING reps, fresh plans — the §41.2
      // protocol, because the container's wall drifts several × within
      // minutes and an A-then-B run would mostly measure that.
      Catalog.planCacheEnabled = false
      def rep(f: => Any): Double = {
        val t0 = System.nanoTime(); f; spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      val (na, de) = (Seq.newBuilder[Double], Seq.newBuilder[Double])
      (1 to 5).foreach { _ =>
        de += rep(SparkEntry.queries("x274_holt_linear")(spark, dir).collect())
        na += rep(SparkEntry.queries("x352_holt_native")(spark, dir).collect())
      }
      def medOf(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
      println(f"[scratch] holt paired x5: declared med ${medOf(de.result())}%6.2f s " +
        f"${de.result().map(x => f"$x%.2f").mkString("[", " ", "]")}  " +
        f"native med ${medOf(na.result())}%6.2f s " +
        f"${na.result().map(x => f"$x%.2f").mkString("[", " ", "]")}")
      spark.stop(); return
    }

    if (args.contains("bandplan")) {
      // print the banding-join physical plan over `dir` (no execution
      // of the join itself) — used to diagnose the 100× rehearsal OOM
      val sets = Dedup.shingleSets(docs, 3)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      println(s"[scratch] sets rows=${sets.count()}")
      val cands = Dedup.candidatePairsFromSig(sets,
        Dedup.affineMinHashSignature(col("shs"), Dedup.portablePerms(64)),
        numBands = 16, rowsPerBand = 4)
      println(cands.queryExecution.executedPlan.toString.take(6000))
      spark.stop(); return
    }
    if (args.contains("bandjoin")) {
      // the banding join ALONE on a fresh JVM — separates "intrinsic
      // stage footprint" from "leaked consumers from earlier phases"
      // when diagnosing the 100× rehearsal OOM
      val sets = Dedup.shingleSets(docs, 3)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      println(s"[scratch] sets rows=${sets.count()}")
      t("banding join") {
        Dedup.candidatePairsFromSig(sets,
          Dedup.affineMinHashSignature(col("shs"), Dedup.portablePerms(64)),
          numBands = 16, rowsPerBand = 4).count()
      }
      spark.stop(); return
    }
    if (args.contains("bandab")) {
      // A/B the reduce-side candidate dedup against the old map-side
      // shape in ONE JVM, alternating reps — quantifies what the 100×
      // OOM fix costs at sf0.1 where the partial agg was harmless
      val sets = Dedup.shingleSets(docs, 3)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sets.count()
      val sig = Dedup.affineMinHashSignature(col("shs"), Dedup.portablePerms(64))
      def newShape() = Dedup.candidatePairsFromSig(sets, sig, 16, 4).count()
      def oldShape() = {
        val s2 = sets.withColumn("sig", sig)
        val bands = s2.select(col("doc_id"),
          explode(graft.llm.Cols.bind(col("sig")) { g =>
            transform(sequence(lit(0), lit(15)),
              b => struct(b.as("band"),
                xxhash64(b, slice(g, b * 4 + 1, lit(4))).as("key")))
          }).as("bk"))
          .select(col("doc_id"), col("bk.band"), col("bk.key"))
        bands.as("x").join(bands.as("y"),
            col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
          .distinct().count()
      }
      newShape(); oldShape() // warm both
      (1 to 3).foreach { i =>
        t(s"new (reduce-side) $i")(newShape())
        t(s"old (map-side) $i")(oldShape())
      }
      spark.stop(); return
    }
    if (args.contains("bandstats")) {
      // Σ C(bucket, 2) over the (band, key) buckets — the banding
      // join's exact output row count (pre-distinct), computed with one
      // aggregate and NO join: sizing evidence for the 100× rehearsal
      val sets = Dedup.shingleSets(docs, 3)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      println(s"[scratch] sets rows=${sets.count()}")
      val sig = Dedup.affineMinHashSignature(col("shs"), Dedup.portablePerms(64))
      val bands = sets.withColumn("sig", sig).select(col("doc_id"),
        explode(graft.llm.Cols.bind(col("sig")) { g =>
          transform(sequence(lit(0), lit(15)),
            b => struct(b.as("band"),
              xxhash64(b, slice(g, b * 4 + 1, lit(4))).as("key")))
        }).as("bk"))
        .select(col("bk.band"), col("bk.key"))
      val st = bands.groupBy("band", "key").agg(count(lit(1)).as("n"))
        .agg(sum(expr("n*(n-1)/2")).as("pairs"), max("n").as("maxBucket"),
          count(lit(1)).as("buckets")).head()
      println(s"[scratch] band buckets=${st.getLong(2)} maxBucket=${st.getLong(1)} joinRows=${st.get(0)}")
      spark.stop(); return
    }
    if (args.contains("sigkernel")) {
      // signature-kernel A/B for the Dedup.minHashSignature comment: the
      // retired per-slot form (64 string hashes per shingle) vs the
      // single-hash + affine form now shipped. Same shingle input, same
      // reduction, fresh JVM, alternating order over 3 reps.
      val sets = Dedup.shingleSets(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sets.count()
      def perSlot(shs: org.apache.spark.sql.Column, n: Int) =
        Cols.bind(shs) { a =>
          transform(sequence(lit(0), lit(n - 1)),
            i => array_min(transform(a, s => xxhash64(s, i))))
        }
      def run(label: String, sig: org.apache.spark.sql.Column): Unit =
        t(label)(sets.select(sig.as("sig"))
          .agg(sum(element_at(col("sig"), 1).cast("double"))).collect()(0))
      for (rep <- 1 to 3) {
        run(s"affine   sig64 rep$rep", Dedup.minHashSignature(col("shs"), 64))
        run(s"per-slot sig64 rep$rep", perSlot(col("shs"), 64))
      }
      spark.stop(); return
    }
    if (args.contains("floor")) {
      // decompose the q29/q37 bench-floor outliers (VERDICT r5 #6):
      // scan cost vs window/sort cost vs collect cost, each timed twice
      // (second number is the warm one)
      Catalog.ensure(spark, dir)
      val orders = Catalog.load(spark, dir, "orders")
      val cust = Catalog.load(spark, dir, "customer")
      def twice(label: String)(f: => Any): Unit = { t(label)(f); t(label + " (warm)")(f) }
      twice("orders count")(orders.count())
      twice("orders topk100 2cols")(
        orders.select("o_orderkey", "o_orderdate").orderBy("o_orderkey")
          .limit(100).collect().length)
      twice("q37 full")(spark.sql(Queries.sparkSql("q37_date_funcs")).collect().length)
      twice("customer count")(cust.count())
      twice("customer collect 2cols")(
        cust.select("c_custkey", "c_acctbal").collect().length)
      twice("q29 window only (no final sort)")(
        spark.sql("""SELECT c_custkey, ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quart,
                    |round(percent_rank() OVER (ORDER BY c_acctbal, c_custkey),4) AS pr
                    |FROM customer""".stripMargin).collect().length)
      twice("q29 full")(spark.sql(Queries.sparkSql("q29_ntile")).collect().length)
      spark.stop(); return
    }
    if (args.contains("q37")) {
      // VERDICT r6 #5: fresh warm median-of-5 of q37 (67.6 ms in the r6
      // bench vs 47.6 in r5 on an unchanged minimal plan). Bench-protocol
      // conditions: one warm-up rep, then 5 timed reps, median reported.
      Catalog.ensure(spark, dir)
      val sql = Queries.sparkSql("q37_date_funcs")
      spark.sql(sql).collect() // warm-up: codegen + footer cache
      val reps = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(sql).collect()
        (System.nanoTime() - t0) / 1e6
      }.sorted
      println(f"[scratch] q37 median-of-5 ${reps(2)}%8.1f ms  (all: ${reps.map(r => f"$r%.1f").mkString(", ")})")
      spark.stop(); return
    }
    if (args.contains("skipindex")) {
      // the 100 TB pruning-path cost: a synthetic 1M-file manifest (the
      // file-count class a 100 TB table owns at ~100 MB/file), pruned
      // with the distributed filter + bounded driver collect of
      // SkipIndex.readRange. Measures what SCALE.md §15 records.
      def manifest(n: Long) = spark.range(n).select(
        concat(lit("file:/tmp/t/part-"), col("id")).as("file"),
        lit("file:/tmp/t").as("root"), lit(1000L).as("n_rows"),
        (col("id") * 1000L).as("k_min"),
        (col("id") * 1000L + lit(999L)).as("k_max"))
      val man = manifest(1000000L)
      t("prune filter count (1M rows)")(
        graft.sources.SkipIndex.candidates(man, "k",
          lit(0L), lit(999999L)).count())
      t("bounded collect 1k paths/1M")(
        graft.sources.SkipIndex.candidates(man, "k",
          lit(0L), lit(999999L)).select("file").limit(65537).collect().length)
      t("bounded collect 65k paths/1M")(
        graft.sources.SkipIndex.candidates(man, "k",
          lit(0L), lit(65535999L)).select("file").limit(65537).collect().length)
      t("prune filter count (10M rows)")(
        graft.sources.SkipIndex.candidates(manifest(10000000L), "k",
          lit(0L), lit(999999L)).count())
      spark.stop(); return
    }
    if (args.contains("spancells")) {
      // maxSpanCells A/B (round 10): degenerate long intervals (spans up
      // to ~2000 cells) against a dense short side — uncapped one-stage
      // explode vs the two-stage chunked explode at several chunk sizes.
      import spark.implicits._
      val r = new scala.util.Random(7)
      // the pathological shape maxSpanCells exists for: a handful of
      // whale intervals (≈2M cells each at bucket=100) among normal
      // ones — uncapped, each whale's cell explode runs inside ONE map
      // task; capped, the chunk pre-explode + reshuffle spreads it
      val whales = Seq.tabulate(4)(i =>
        (100000L + i, (i * 1000L), (i * 1000L) + 200000000L))
      val normals = Seq.tabulate(2000) { i =>
        val s = r.nextInt(200000000).toLong; (i.toLong, s, s + 1 + r.nextInt(5000))
      }
      val longs = (whales ++ normals).toDF("akey", "as0", "ae").repartition(16)
      val shorts = Seq.tabulate(4000) { j =>
        val s = r.nextInt(200000000).toLong; (j.toLong, s, s + 1 + r.nextInt(500))
      }.toDF("bkey", "bs0", "be")
      Seq(0, 4096, 65536).foreach { m =>
        t(s"overlap maxSpanCells=$m")(
          operators.IntervalJoin.overlap(
            longs, "as0", "ae", "akey", shorts, "bs0", "be", "bkey",
            bucket = 100L, maxSpanCells = m).count())
      }
      // round-11 re-measure: the shape where the r10 knob HURT —
      // uniformly-long intervals (~2k cells each, no whales). Since the
      // whale-only routing (ADVICE r10 #5) rows with span < m bypass
      // the chunk explode + reshuffle entirely, so m=4096 should now
      // price like uncapped instead of 3x it.
      val uniform = Seq.tabulate(2000) { i =>
        val s = r.nextInt(200000000).toLong; (i.toLong, s, s + 150000L + r.nextInt(100000))
      }.toDF("akey", "as0", "ae").repartition(16)
      Seq(0, 4096).foreach { m =>
        t(s"uniform-long maxSpanCells=$m")(
          operators.IntervalJoin.overlap(
            uniform, "as0", "ae", "akey", shorts, "bs0", "be", "bkey",
            bucket = 100L, maxSpanCells = m).count())
      }
      spark.stop(); return
    }
    if (args.contains("winnow")) {
      // where x55's cost lives: native vs HOF extraction, then the
      // inverted-index self-join + pair count on the same fingerprints
      t("extract native md5 (cold)")(Fingerprint.fingerprintsPortable(docs)
        .select(sum(size(col("fps")))).head())
      t("extract HOF md5 (cold)")(Fingerprint.fingerprintsPortableHof(docs)
        .select(sum(size(col("fps")))).head())
      t("extract native md5 (warm)")(Fingerprint.fingerprintsPortable(docs)
        .select(sum(size(col("fps")))).head())
      t("extract HOF md5 (warm)")(Fingerprint.fingerprintsPortableHof(docs)
        .select(sum(size(col("fps")))).head())
      t("inv self-join + paircount")({
        val fps = Fingerprint.fingerprintsPortable(docs)
          .select(col("doc_id"), col("fps")).persist()
        val inv = fps.select(col("doc_id"), explode(col("fps")).as("fp"))
        val n = inv.as("x").join(inv.as("y"),
            col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
          .groupBy(col("x.doc_id"), col("y.doc_id"))
          .agg(count(lit(1))).count()
        fps.unpersist(); n
      })
      t("containmentPortable full")(
        Fingerprint.containmentPortable(docs, 5000L).count())
      t("df distribution")({
        val inv = Fingerprint.fingerprintsPortable(docs)
          .select(col("doc_id"), explode(col("fps")).as("fp"))
        val df = inv.groupBy("fp").agg(count(lit(1)).as("df"))
        df.select(
          count(lit(1)).as("distinct_fps"),
          max("df").as("max_df"),
          sum(expr("df*(df-1)/2")).as("sum_pairs"),
          sum(expr("CASE WHEN df >= 100 THEN df*(df-1)/2 ELSE 0 END")).as("pairs_df100"),
          sum(expr("CASE WHEN df >= 1000 THEN df*(df-1)/2 ELSE 0 END")).as("pairs_df1000"),
          sum(expr("CASE WHEN df = 1 THEN 1 ELSE 0 END")).as("singletons"))
          .head()
      })
      spark.stop(); return
    }
    if (args.contains("winnowdiverse")) {
      // The §30 gate claim, measured instead of reasoned: a 10× corpus
      // whose replicas are TEXT-MUTATED (every 'e' substituted with a
      // replica-distinct consonant, so most k-grams differ across
      // replicas while within-replica boilerplate structure survives)
      // grows the fingerprint dictionary ~an order of magnitude. The
      // gate must re-decide from the measured stats — whichever kernel
      // it picks is correct by the spec-held equality; what this mode
      // records is WHICH one, the stats that drove it, and the honest
      // cost. (Contrast: the exact-replica 10× corpus keeps F at 6 579
      // and stays dense at 17 s.)
      val subs = "bcdfghjklm"
      val diverse = (0 until 10).map { r =>
        docs.select(
          (col("doc_id") + lit(r * 1000000L)).as("doc_id"),
          translate(col("text"), "e", subs(r).toString).as("text"))
      }.reduce(_ unionByName _).repartition(32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      println(s"[scratch] diverse 10x docs: ${diverse.count()}")
      val inv = Fingerprint.fingerprintsPortable(diverse)
        .select(col("doc_id"), explode(col("fps")).as("fp"))
      val st = inv.groupBy("fp").agg(count(lit(1)).as("df"))
        .agg(count(lit(1)).as("F"), sum(expr("df*(df-1)")).as("p2"),
          max("df").as("maxdf")).head()
      println(f"[scratch] diverse 10x stats: F=${st.getLong(0)}%,d " +
        f"sumPairs=${st.getLong(1) / 2}%,d maxDf=${st.getLong(2)}%,d")
      spark.catalog.clearCache()
      println(s"[scratch] diverse 10x gate picks dense: " +
        Fingerprint.wouldUseDensePortable(diverse, 5000L))
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = Fingerprint.containmentPortable(diverse, minContainBp = 5000L).count()
      println(f"[scratch] diverse 10x containment (single pass): " +
        f"${(System.nanoTime() - t0) / 1e9}%8.1f s  $n%,d pairs")
      diverse.unpersist()
      spark.stop(); return
    }
    if (args.contains("planshare")) {
      // split fresh-plan query cost into Catalyst (analyze+optimize+
      // physical planning, driver-side) vs execution — the honest-bench
      // follow-up (SCALE.md §36): what IS the per-rep planning floor?
      Catalog.ensure(spark, dir)
      Seq("q39_json_extract", "q25_ranking", "q16_multiway_join",
          "q02_project_filter", "q01_count").foreach { name =>
        val sql = Queries.sparkSql(name)
        spark.sql(sql).collect() // warm: codegen, footers
        def planOnce(): Double = {
          val t0 = System.nanoTime()
          spark.sql(sql).queryExecution.executedPlan // forces planning
          (System.nanoTime() - t0) / 1e9
        }
        def fullOnce(): Double = {
          val t0 = System.nanoTime()
          spark.sql(sql).collect()
          (System.nanoTime() - t0) / 1e9
        }
        val p = Seq.fill(3)(planOnce()).sorted.apply(1)
        val f = Seq.fill(3)(fullOnce()).sorted.apply(1)
        println(f"[scratch] $name%-22s plan ${p * 1000}%7.1f ms   full ${f * 1000}%7.1f ms   plan share ${p / f * 100}%5.1f%%")
      }
      spark.stop(); return
    }
    if (args.contains("x111parts")) {
      // decompose x111's cost after the CC fast path: pair SQL alone,
      // the probe+union-find, the full entry
      Catalog.ensure(spark, dir)
      val pairsSql = Queries.sparkSql("x74_minhash_sql")
      def pairs() = spark.sql(pairsSql).select(col("a"), col("b"))
      t("pairs sql count")(pairs().count())
      t("pairs sql count 2")(pairs().count())
      t("cc run (fast path)")(operators.ConnectedComponents.run(pairs()).count())
      t("cc run 2")(operators.ConnectedComponents.run(pairs()).count())
      t("withSizes")(operators.ConnectedComponents.withSizes(pairs()).count())
      t("x111 full")(SparkEntry.queries("x111_neardup_clusters")(spark, dir).collect().length)
      t("x111 full 2")(SparkEntry.queries("x111_neardup_clusters")(spark, dir).collect().length)
      spark.stop(); return
    }
    if (args.contains("ccreuse")) {
      // Does exchange reuse dedup ConnectedComponents' within-round
      // double reference of `prop` (the round-11 HITS lesson: RaiseError
      // blocked reuse there; CC has no assert, so reuse SHOULD fire)?
      // Reproduce one round's plan shape and inspect the executed plan.
      import spark.implicits._
      val e = Seq((1L, 2L), (2L, 3L), (4L, 5L), (5L, 6L), (6L, 7L)).toDF("s", "d")
      val und = e.union(e.select(col("d"), col("s"))).localCheckpoint(true)
      val labels = und.select(col("s").as("id")).distinct()
        .withColumn("label", col("id")).localCheckpoint(true)
      val nbr = und.join(labels, und("s") === labels("id"))
        .select(und("d").as("id"), labels("label"))
      val prop = labels.select(col("id"), col("label")).union(nbr)
        .groupBy("id").agg(min("label").as("label"))
      val byId = prop.select(col("id").as("jid"), col("label").as("jlabel"))
      val next = prop.join(byId, prop("label") === byId("jid"), "left")
        .select(prop("id"),
          least(prop("label"), coalesce(col("jlabel"), prop("label"))).as("label"))
      next.collect()
      val plan = next.queryExecution.executedPlan.toString
      val reused = Seq("ReusedExchange", "ReusedQueryStage", "TableCacheQueryStage")
        .map(k => k -> k.r.findAllIn(plan).size)
      println(s"[scratch] cc round reuse markers: $reused")
      val aggs = "HashAggregate".r.findAllIn(plan).size
      println(s"[scratch] cc round HashAggregate nodes: $aggs (4 = prop's 2-phase agg built once+reused; 8 = built twice)")
      spark.stop(); return
    }
    if (args.contains("semdedup")) {
      // pair-count curve for SCALE.md §10: planted mega-cluster of
      // identical vectors, capped vs uncapped candidate pairs
      import spark.implicits._
      val embs = Catalog.load(spark, dir, "embeddings").select("vec_id", "embedding")
      val proto = embs.where("vec_id = 8").as[(Long, Array[Float])].head()._2
      val m = 5000
      val planted = (0 until m).map(i => (1000000L + i, proto)).toDF("vec_id", "embedding")
      val all = embs.unionByName(planted).cache(); all.count()
      for (cap <- Seq(50, 100, 200, 400, Int.MaxValue)) {
        t(s"semdedup cap=$cap pairs")(
          llm.Ann.semDeDup(all, cap = cap, minSimBp = -20000L)
            .where(col("keep_id") >= 1000000L).count())
      }
      spark.stop(); return
    }
    if (args.contains("hits")) {
      // x327 shape A/B: nested-plan (exchange-reuse) vs per-round
      // localCheckpoint truncation — same results by construction
      val edges = Extensions.nationTradeEdges(spark, dir)
      val nodes = Catalog.load(spark, dir, "nation")
        .select(col("n_nationkey").as("node"))
      // Nested (un-truncated) variants are deliberately absent from the
      // operator: each HITS half-step references its frame twice, so a
      // nested span of k half-steps recomputes 2^k× (measured: one
      // nested round 4.7 s vs 2.4 s truncated; fully nested 7-15 s at
      // iters=2, DIED at iters=6 — exchange reuse does not dedup the
      // replicated agg subtrees). This timing pins the shipped
      // per-half-step truncation at two iteration depths.
      (1 to 3).foreach { _ =>
        t("hits iters=2")(
          graft.operators.Graph.hits(edges, nodes, iters = 2).count())
      }
      t("hits iters=6")(
        graft.operators.Graph.hits(edges, nodes, iters = 6).count())
      spark.stop(); return
    }
    t("shingleSets.count")(Dedup.shingleSets(docs).count())
    val sets = Dedup.shingleSets(docs)
    t("signature[64].agg")(sets
      .select(Dedup.minHashSignature(col("shs"), 64).as("sig"))
      .agg(sum(element_at(col("sig"), 1).cast("double"))).collect()(0))
    t("simHashes.agg")(Dedup.simHashes(docs).agg(sum(col("simhash").cast("double"))).collect()(0))
    t("simHashNearDups.count")(Dedup.simHashNearDups(docs).count())
    t("candidatePairs.count")(
      Dedup.candidatePairs(docs, 64, 4).count())
    t("minHashNearDups.count")(
      Dedup.minHashNearDups(docs, 64, 4, 5000L).count())
    t("minHashNearDupsPortable")(Dedup.minHashNearDupsPortable(docs).count())
    t("simHashNearDupsPortable")(Dedup.simHashNearDupsPortable(docs).count())
    t("containmentPortable")(Fingerprint.containmentPortable(docs, 5000L).count())
    t("fingerprints.count")(Fingerprint.fingerprints(docs).count())
    t("fp inv pairs")(
      {
        val fps = Fingerprint.fingerprints(docs).select(col("doc_id"), col("fps"))
        val inv = fps.select(col("doc_id"), explode(col("fps")).as("fp"))
        inv.as("x").join(inv.as("y"),
          col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id")).count()
      })
    t("containment.count")(Fingerprint.containment(docs, 5000L).count())
    t("multimodal decode+resize")({
      val m = graft.multimodal.Multimodal.demoMedia(spark, dir)
      val f = graft.multimodal.Multimodal.resize(
        graft.multimodal.Multimodal.decodeFeatures(m), 128)
      (f.count(), graft.multimodal.Multimodal.sampleFrames(m).count())
    })
    t("stream tumbling6h drain")({
      val s = graft.streaming.EventStream.readEvents(spark, dir)
      graft.streaming.EventStream.drainToMemory(spark,
        graft.streaming.EventStream.tumbling6h(s), "scratch_t6h", complete = true)
      spark.table("scratch_t6h").count()
    })
    spark.stop()
  }
}
