package graft

import org.apache.spark.sql.functions._

/** The persisted index surface (VERDICT r15 #5): save → load →
  * identical serving results vs the in-session index, for every index
  * kind, plus the commit discipline (versioning, half-commit
  * invisibility) and the train-once/serve-many entries
  * (KMeans.resume, MiniBatchKMeans.seed). */
class IndexStoreSpec extends SparkSpec {

  private def freshDir(name: String): String = {
    val d = s"/tmp/graft-indexstore-$name"
    val f = new java.io.File(d)
    if (f.exists()) new scala.reflect.io.Directory(f).deleteRecursively()
    d
  }

  test("ivfpq: save -> load round-trips bit-exactly and serves identical top-k") {
    val emb = Catalog.load(spark, sf0001, "embeddings")
    val dir = freshDir("pq")
    val idx = llm.Ann.pqTrain(emb, nLists = 8, dim = 64, m = 8, ksub = 16)
    val v = llm.IndexStore.savePq(spark, dir, idx)
    assert(v == 0L)
    val loaded = llm.IndexStore.loadPq(spark, dir)
    // bit-exact round trip: parquet doubles are IEEE-exact
    assert(loaded.nLists == idx.nLists && loaded.m == idx.m &&
      loaded.ksub == idx.ksub && loaded.dsub == idx.dsub)
    assert(loaded.centroids.map(_._1).toSeq == idx.centroids.map(_._1).toSeq)
    assert(loaded.centroids.map(_._2.toSeq).toSeq ==
      idx.centroids.map(_._2.toSeq).toSeq)
    assert(loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      idx.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    // the thing that matters: a session serving from the LOADED index
    // returns exactly what the training session returned
    val q = emb.where(col("vec_id") === 0).head()
      .getSeq[Float](1).map(_.toDouble).toSeq
    val corpus = emb.where(col("vec_id") =!= 0)
    def topk(ix: llm.Ann.PqIndex) =
      llm.Ann.pqTopK(corpus, q, k = 10, nLists = 8, nProbe = 3, m = 8,
        ksub = 16, idx = Some(ix))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(topk(loaded) == topk(idx))
  }

  test("commit discipline: versions append, half-commits are invisible, kinds are checked") {
    val emb = Catalog.load(spark, sf0001, "embeddings")
    val dir = freshDir("versions")
    val mat = llm.Ann.planes(8, 64, seed = 42L)
    assert(llm.IndexStore.versions(spark, dir).isEmpty)
    assert(llm.IndexStore.saveLsh(spark, dir, mat, 42L) == 0L)
    val mat2 = llm.Ann.planes(8, 64, seed = 43L)
    assert(llm.IndexStore.saveLsh(spark, dir, mat2, 43L) == 1L)
    assert(llm.IndexStore.versions(spark, dir) == Seq(0L, 1L))
    // latest wins by default; time travel by version
    assert(llm.IndexStore.loadLsh(spark, dir).map(_.toSeq).toSeq ==
      mat2.map(_.toSeq).toSeq)
    assert(llm.IndexStore.loadLsh(spark, dir, Some(0L)).map(_.toSeq).toSeq ==
      mat.map(_.toSeq).toSeq)
    assert(llm.IndexStore.readManifest(spark, dir, 1L).params("seed") == "43")
    // a v-directory without a landed manifest is NOT a commit: readers
    // must skip it (crash-mid-write shape)
    new java.io.File(s"$dir/v2/planes").mkdirs()
    assert(llm.IndexStore.versions(spark, dir) == Seq(0L, 1L))
    // an orphaned temp dir is invisible too
    new java.io.File(s"$dir/.tmp-dead").mkdirs()
    assert(llm.IndexStore.versions(spark, dir) == Seq(0L, 1L))
    // kind mismatch is loud, not a misparse
    intercept[IllegalArgumentException] {
      llm.IndexStore.loadCentroids(spark, dir)
    }
  }

  test("vacuum reclaims old versions and orphaned temps, never the kept history") {
    val dir = freshDir("vacuum")
    val mats = (1L to 3L).map(s => s -> llm.Ann.planes(4, 8, seed = s))
    mats.foreach { case (s, m) => llm.IndexStore.saveLsh(spark, dir, m, s) }
    new java.io.File(s"$dir/.tmp-orphan/planes").mkdirs()
    val (nv, no) = llm.IndexStore.vacuum(spark, dir, keepLast = 1)
    assert((nv, no) == ((2, 1)), s"got ($nv, $no)")
    assert(llm.IndexStore.versions(spark, dir) == Seq(2L))
    // the kept version still loads, bit-equal
    assert(llm.IndexStore.loadLsh(spark, dir).map(_.toSeq).toSeq ==
      mats.last._2.map(_.toSeq).toSeq)
    // a vacuumed version is gone loudly, not misread
    intercept[IllegalArgumentException] {
      llm.IndexStore.loadLsh(spark, dir, Some(0L))
    }
    // idempotent; and the version counter keeps appending after vacuum
    assert(llm.IndexStore.vacuum(spark, dir, keepLast = 1) == ((0, 0)))
    assert(llm.IndexStore.saveLsh(spark, dir, mats.head._2, 9L) == 3L)
  }

  test("a colliding foreign v-dir blocks the commit loudly, never silently corrupts") {
    // the tmp+atomic-rename protocol cannot itself produce a v<N>
    // without a manifest; if one exists anyway (external interference,
    // partial copy), the next save targeting that number must FAIL
    // with the concurrent-commit error — and clean its temp up — not
    // merge into or overwrite the foreign directory
    val dir = freshDir("collide")
    val mat = llm.Ann.planes(4, 8, seed = 1L)
    assert(llm.IndexStore.saveLsh(spark, dir, mat, 1L) == 0L)
    new java.io.File(s"$dir/v1/junk").mkdirs()
    intercept[IllegalStateException] {
      llm.IndexStore.saveLsh(spark, dir, mat, 2L)
    }
    // cleaned up EVERYWHERE: a lost rename-into-existing-dir race nests
    // the loser's temp inside the destination — the failure path must
    // reclaim the nested copy too, not just the root-level one
    // (ADVICE r16 #3)
    def allTmps(f: java.io.File): Seq[String] =
      Option(f.listFiles()).toSeq.flatten.flatMap { c =>
        (if (c.getName.startsWith(".tmp")) Seq(c.getPath) else Nil) ++
          (if (c.isDirectory) allTmps(c) else Nil)
      }
    val leftovers = allTmps(new java.io.File(dir))
    assert(leftovers.isEmpty, s"temp dirs must be cleaned up: $leftovers")
    // the committed history is untouched and still reads
    assert(llm.IndexStore.versions(spark, dir) == Seq(0L))
    assert(llm.IndexStore.loadLsh(spark, dir).map(_.toSeq).toSeq ==
      mat.map(_.toSeq).toSeq)
  }

  test("racing same-params writers produce byte-distinct manifests; nested lost-race temps are vacuumed") {
    // the common retrain race: two writers saving the SAME kind with
    // the SAME params. A manifest built only from logical content would
    // be byte-identical for both, letting the loser's landed-content
    // check pass against the winner's commit (ADVICE r16 #1). The
    // writer nonce makes every commit byte-unique.
    val dir = freshDir("nonce")
    val mat = llm.Ann.planes(4, 8, seed = 5L)
    assert(llm.IndexStore.saveLsh(spark, dir, mat, 5L) == 0L)
    assert(llm.IndexStore.saveLsh(spark, dir, mat, 5L) == 1L)
    def manifestBytes(n: Long): String = {
      val src = scala.io.Source.fromFile(s"$dir/v$n/manifest.tsv", "UTF-8")
      try src.mkString finally src.close()
    }
    assert(manifestBytes(0L) != manifestBytes(1L),
      "identical kind/params/components must still commit byte-distinct manifests")
    // the nonce is ignored by the parser: both parse to the same manifest
    val m0 = llm.IndexStore.readManifest(spark, dir, 0L)
    val m1 = llm.IndexStore.readManifest(spark, dir, 1L)
    assert(m0 == m1)
    assert(m0.params("seed") == "5")
    // a lost-race temp nested INSIDE a committed version (the state a
    // crashed loser leaves when its finally-cleanup never ran): invisible
    // to readers, reclaimed by vacuum without touching the commit
    new java.io.File(s"$dir/v1/.tmp-zombie/planes").mkdirs()
    assert(llm.IndexStore.loadLsh(spark, dir).map(_.toSeq).toSeq ==
      mat.map(_.toSeq).toSeq)
    val (nv, no) = llm.IndexStore.vacuum(spark, dir, keepLast = 2)
    assert((nv, no) == ((0, 1)), s"got ($nv, $no)")
    assert(!new java.io.File(s"$dir/v1/.tmp-zombie").exists())
    assert(llm.IndexStore.loadLsh(spark, dir).map(_.toSeq).toSeq ==
      mat.map(_.toSeq).toSeq)
  }

  test("kmeans: train(1) -> save -> load -> resume(2) reproduces train(3)'s later rounds bit-for-bit") {
    val emb = Catalog.load(spark, sf0001, "embeddings")
    val dir = freshDir("kmeans")
    def census(t: llm.KMeans.Train) = t.summary.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val t3 = llm.KMeans.train(emb, k = 8, dims = 64, maxIters = 3,
      stopWhenStable = false)
    val t1 = llm.KMeans.train(emb, k = 8, dims = 64, maxIters = 1,
      stopWhenStable = false)
    llm.IndexStore.saveCentroids(spark, dir, t1.centroids)
    val loaded = llm.IndexStore.loadCentroids(spark, dir)
    assert(loaded == t1.centroids, "centroid table must round-trip bit-exactly")
    val t23 = llm.KMeans.resume(emb, loaded, k = 8, dims = 64, maxIters = 2,
      stopWhenStable = false)
    // resume's rounds 1..2 ARE train(3)'s rounds 2..3
    assert(census(t23).map { case (rk, c, n, in) => (rk + 1, c, n, in) } ==
      census(t3).filter(_._1 >= 2L))
    assert(t23.rounds.map(r => (r.round + 1, r.moved, r.inertia)) ==
      t3.rounds.filter(_.round >= 2).map(r => (r.round, r.moved, r.inertia)))
    assert(t23.centroids == t3.centroids,
      "the resumed loop must land on train(3)'s exact final centroids")
    val a23 = t23.assignments.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val a3 = t3.assignments.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(a23 == a3)
  }

  test("streaming twin: seeding from the saved table == first-batch seeding, fold-for-fold") {
    import spark.implicits._
    val vecs = Catalog.load(spark, sf0001, "embeddings")
      .select("vec_id", "embedding")
    // the saved table == the centroids first-batch seeding would extract
    val savedCent = llm.KMeans.quantizedLong(
        vecs.where(col("vec_id") < 8), 64)
      .select(col("vec_id").as("cid"), col("dim"), col("val"))
      .as[(Long, Int, Long)].collect().sortBy(c => (c._1, c._2)).toSeq
    val dir = freshDir("stream-seed")
    llm.IndexStore.saveCentroids(spark, dir, savedCent)
    val loaded = llm.IndexStore.loadCentroids(spark, dir)

    val first = new streaming.MiniBatchKMeans(8, 64)
    first.applyBatch(spark, vecs, 0L)
    val seeded = new streaming.MiniBatchKMeans(8, 64)
    seeded.seed(loaded)
    // with seeds pre-loaded, the seed rows are NOT in the batch
    seeded.applyBatch(spark, vecs.where(col("vec_id") >= 8), 0L)
    assert(seeded.centroids == first.centroids,
      "a table-seeded model must fold to first-batch seeding's exact state")
    assert(seeded.stats.map(s => (s.n, s.inertia)) ==
      first.stats.map(s => (s.n, s.inertia)))
    // seeding after a fold is a contract violation, loudly
    intercept[IllegalArgumentException] { seeded.seed(loaded) }
    // and the drain() surface accepts the same table
    val dirR = "/tmp/graft-indexstore-drain-replay"
    val f = new java.io.File(dirR)
    if (f.exists()) new scala.reflect.io.Directory(f).deleteRecursively()
    vecs.where(col("vec_id") >= 8).coalesce(1)
      .write.mode("overwrite").parquet(dirR)
    val drained = streaming.KMeansStream.drain(spark,
      spark.readStream.schema(vecs.schema)
        .option("pathGlobFilter", "*.parquet").parquet(dirR),
      seeds = Some(loaded))
    assert(drained.centroids == first.centroids)
  }
}
