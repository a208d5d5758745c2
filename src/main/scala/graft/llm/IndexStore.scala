package graft.llm

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned, reloadable index tables (VERDICT r15 #5): the
  * train-once/serve-many surface. Before this, every session retrained
  * its IVF centroids, PQ codebooks, LSH planes, and k-means centroids
  * from the corpus — fine at spec scale, wrong at 100 TB where index
  * TRAINING is the expensive pass and SERVING sessions (and the
  * streaming twins) should load the committed artifact instead.
  *
  * Physical layout (CdcStream's manifest discipline, simplified for
  * append-only versioned snapshots — no bucket reuse, so a version is
  * fully self-contained):
  *
  *   <path>/v<N>/manifest.tsv        # the commit: kind, params, components
  *   <path>/v<N>/<component>/part-….parquet
  *
  * Commit protocol: every file is written under a hidden
  * `.tmp-<uuid>` directory first — a name no reader matches and no
  * previous commit could have used — then ONE atomic rename lands
  * `v<N>` whole. Readers accept a `v<N>` directory only if it contains
  * its manifest, so a crash mid-write leaves an unreferenced temp
  * orphan, never a readable half-commit. After the rename the landed
  * manifest is read back RAW and verified byte-identical to what this
  * writer built. The manifest carries a `writer` nonce line (the tmp
  * dir's UUID), so two writers racing the same version number produce
  * byte-DISTINCT manifests even when kind/params/components are
  * identical — the common same-retrain race that a body built only
  * from logical content could not distinguish (ADVICE r16 #1; the
  * CdcStream original is safe only because its manifest references
  * writer-unique data dirs). Readers skip the nonce line when parsing.
  * A lost rename-into-existing-dir race can nest the loser's temp
  * INSIDE the winner's committed version (HDFS/local rename
  * semantics); the failure path and [[vacuum]] both reclaim that
  * nested orphan (ADVICE r16 #3).
  *
  * Index tables are driver-sized by the engine's standing ceiling
  * (centroids k×dims, codebooks m×ksub×dsub, planes numPlanes×dim — the
  * "index-sized metadata may ride the driver, corpus data never does"
  * rule), so components are written `coalesce(1)`: one file per
  * component, trivially broadcast on load.
  */
object IndexStore {

  private val ManifestFile = "manifest.tsv"

  final case class Manifest(kind: String, params: Map[String, String],
                            components: Seq[String])

  /** Path-scheme-aware filesystem: an index at s3a:// or hdfs:// must
    * be listed/renamed on ITS filesystem, not the default one
    * (ADVICE r16 #2 — FileSystem.get(conf) resolves defaultFS and
    * ignores the path's scheme; CdcStream's own helper has it right). */
  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed versions, ascending. A v<N> directory is a commit iff
    * the atomic rename landed its manifest — directory presence alone
    * is NOT commit evidence (the CdcStream/ADVICE r5 rule). */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark, path)
    val root = new Path(path)
    if (!f.exists(root)) return Nil
    f.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+"))
      .filter(s => f.exists(new Path(s.getPath, ManifestFile)))
      .map(_.getPath.getName.drop(1).toLong).sorted
  }

  private def manifestBody(kind: String, params: Map[String, String],
                           components: Seq[String], writer: String): String =
    (Seq(s"kind\t$kind", s"writer\t$writer") ++
      params.toSeq.sortBy(_._1).map { case (k, v) => s"param\t$k\t$v" } ++
      components.map(c => s"component\t$c")).mkString("", "\n", "\n")

  /** Raw manifest bytes of a landed version — the commit-verification
    * read. Byte comparison (not a parse/rebuild round trip) is what
    * makes the writer nonce effective: a reconstructed body would drop
    * the nonce and collapse same-params racers back to equality. */
  private def readRawManifest(f: org.apache.hadoop.fs.FileSystem,
                              dir: Path): String = {
    val in = f.open(new Path(dir, ManifestFile))
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  def readManifest(spark: SparkSession, path: String, n: Long): Manifest = {
    val f = fs(spark, path)
    val body = readRawManifest(f, new Path(s"$path/v$n"))
    val lines = body.split("\n").filter(_.nonEmpty).map(_.split("\t", 3))
    Manifest(
      lines.collectFirst { case Array("kind", k) => k }
        .getOrElse(sys.error(s"$path/v$n: manifest carries no kind")),
      lines.collect { case Array("param", k, v) => k -> v }.toMap,
      lines.collect { case Array("component", c) => c }.toSeq)
  }

  /** Atomic generic save; the typed wrappers below are the API. Returns
    * the committed version number. */
  def save(spark: SparkSession, path: String, kind: String,
           params: Map[String, String],
           components: Seq[(String, DataFrame)]): Long = {
    val f = fs(spark, path)
    val n = versions(spark, path).lastOption.getOrElse(-1L) + 1L
    val tmp = new Path(path, s".tmp-${java.util.UUID.randomUUID}")
    // writer nonce = the tmp dir's UUID: already writer-unique, already
    // minted — racing same-params commits differ by at least this line
    val body = manifestBody(kind, params, components.map(_._1),
      tmp.getName.stripPrefix(".tmp-"))
    val dest = new Path(path, s"v$n")
    try {
      components.foreach { case (name, df) =>
        df.coalesce(1).write.mode("errorifexists")
          .parquet(new Path(tmp, name).toString)
      }
      val out = f.create(new Path(tmp, ManifestFile), false)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      val renamed = f.rename(tmp, dest)
      // verify by RAW CONTENT, not by the rename's return value alone:
      // on a racing commit some filesystems move the source INTO the
      // existing destination instead of failing, and the winner's
      // manifest differs from this writer's by the nonce at minimum
      val landed =
        try readRawManifest(f, dest) == body
        catch { case scala.util.control.NonFatal(_) => false }
      if (!renamed || !landed)
        throw new IllegalStateException(
          s"concurrent commit of v$n in $path — this writer's version was not committed")
      n
    } finally {
      if (f.exists(tmp)) f.delete(tmp, true)
      // a lost rename-into-existing-dir race leaves this writer's temp
      // NESTED inside the winner's committed version — reclaim it from
      // there too, and only it (tmp names are writer-unique, so this
      // can never touch the winner's data)
      val nested = new Path(dest, tmp.getName)
      if (f.exists(nested)) f.delete(nested, true)
    }
  }

  /** Reclaim history: delete committed versions older than the newest
    * `keepLast`, plus any orphaned `.tmp-*` directories a crashed
    * writer left behind (the CdcStream.vacuum discipline — an orphan
    * is invisible to readers but not to the bill). Never touches the
    * newest `keepLast` commits. Returns (versionsDeleted, orphansDeleted). */
  def vacuum(spark: SparkSession, path: String, keepLast: Int = 2): (Int, Int) = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val f = fs(spark, path)
    val root = new Path(path)
    if (!f.exists(root)) return (0, 0)
    val vs = versions(spark, path)
    val drop = vs.dropRight(keepLast)
    drop.foreach(n => f.delete(new Path(path, s"v$n"), true))
    def tmps(dir: Path): Seq[Path] = f.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".tmp-"))
      .map(_.getPath)
    // root-level crash orphans, plus lost-race temps nested one level
    // inside the KEPT versions (the only place a rename-into-existing
    // race can deposit one); readers never match `.tmp-*` components,
    // so deleting them cannot change what any version serves
    val orphans = tmps(root) ++
      vs.takeRight(keepLast).flatMap(n => tmps(new Path(path, s"v$n")))
    orphans.foreach(p => f.delete(p, true))
    (drop.size, orphans.size)
  }

  private def resolve(spark: SparkSession, path: String, kind: String,
                      version: Option[Long]): Long = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"$path holds no committed index versions")
    val n = version.getOrElse(vs.last)
    require(vs.contains(n), s"$path has no committed v$n (have ${vs.mkString(",")})")
    val m = readManifest(spark, path, n)
    require(m.kind == kind, s"$path/v$n is a '${m.kind}' index, expected '$kind'")
    n
  }

  // ---- k-means / streaming-twin centroid table -----------------------

  /** Persist a trained centroid table (cid, dim, val) — the
    * [[KMeans.Train.centroids]] artifact. [[KMeans.resume]] and
    * [[graft.streaming.MiniBatchKMeans.seed]] consume the reload. */
  def saveCentroids(spark: SparkSession, path: String,
                    cent: Seq[(Long, Int, Long)]): Long = {
    import spark.implicits._
    val k = cent.map(_._1).distinct.size
    val dims = if (k == 0) 0 else cent.size / k
    save(spark, path, "kmeans-centroids",
      Map("k" -> k.toString, "dims" -> dims.toString),
      Seq("centroids" -> cent.toDF("cid", "dim", "val")))
  }

  def loadCentroids(spark: SparkSession, path: String,
                    version: Option[Long] = None): Seq[(Long, Int, Long)] = {
    import spark.implicits._
    val n = resolve(spark, path, "kmeans-centroids", version)
    spark.read.parquet(s"$path/v$n/centroids")
      .select(col("cid"), col("dim"), col("val"))
      .as[(Long, Int, Long)].collect().sortBy(c => (c._1, c._2)).toSeq
  }

  // ---- IVF + PQ (Ann.PqIndex) -----------------------------------------

  /** Persist a trained [[Ann.PqIndex]]: IVF centroids + per-subspace
    * codebooks as parquet doubles (IEEE round-trip is bit-exact, so a
    * reloaded index reproduces identical top-k — IndexStoreSpec pins
    * it). */
  def savePq(spark: SparkSession, path: String, idx: Ann.PqIndex): Long = {
    import spark.implicits._
    val cents = idx.centroids.toSeq.toDF("list", "c")
    val cbs = (for {
      mi <- idx.codebooks.indices
      j <- idx.codebooks(mi).indices
    } yield (mi, j, idx.codebooks(mi)(j))).toDF("mi", "j", "cw")
    save(spark, path, "ivfpq",
      Map("nLists" -> idx.nLists.toString, "m" -> idx.m.toString,
        "ksub" -> idx.ksub.toString, "dsub" -> idx.dsub.toString),
      Seq("centroids" -> cents, "codebooks" -> cbs))
  }

  def loadPq(spark: SparkSession, path: String,
             version: Option[Long] = None): Ann.PqIndex = {
    import spark.implicits._
    val n = resolve(spark, path, "ivfpq", version)
    val man = readManifest(spark, path, n)
    val m = man.params("m").toInt
    val ksub = man.params("ksub").toInt
    val cents = spark.read.parquet(s"$path/v$n/centroids")
      .select(col("list"), col("c"))
      .as[(Int, Array[Double])].collect().sortBy(_._1)
    val cbRows = spark.read.parquet(s"$path/v$n/codebooks")
      .select(col("mi"), col("j"), col("cw"))
      .as[(Int, Int, Array[Double])].collect()
    val codebooks = Array.tabulate(m) { mi =>
      val rows = cbRows.filter(_._1 == mi).sortBy(_._2)
      require(rows.length == ksub,
        s"$path/v$n: codebook $mi carries ${rows.length} codewords, manifest says $ksub")
      rows.map(_._3)
    }
    Ann.PqIndex(man.params("nLists").toInt, m, ksub,
      man.params("dsub").toInt, cents, codebooks)
  }

  // ---- LSH hyperplanes -------------------------------------------------

  /** Persist an LSH plane matrix with its generating params. Planes are
    * seed-derived and could be regenerated — persisting them VERSIONS
    * them: a bucket-partitioned layout written under v0's planes must
    * be probed with v0's planes forever, even after a default seed or
    * RNG change. */
  def saveLsh(spark: SparkSession, path: String,
              planeMat: Array[Array[Double]], seed: Long): Long = {
    import spark.implicits._
    val rows = planeMat.zipWithIndex.map { case (p, i) => (i, p) }.toSeq
    save(spark, path, "lsh-planes",
      Map("numPlanes" -> planeMat.length.toString,
        "dim" -> planeMat.headOption.map(_.length).getOrElse(0).toString,
        "seed" -> seed.toString),
      Seq("planes" -> rows.toDF("i", "p")))
  }

  def loadLsh(spark: SparkSession, path: String,
              version: Option[Long] = None): Array[Array[Double]] = {
    import spark.implicits._
    val n = resolve(spark, path, "lsh-planes", version)
    spark.read.parquet(s"$path/v$n/planes")
      .select(col("i"), col("p"))
      .as[(Int, Array[Double])].collect().sortBy(_._1).map(_._2)
  }
}
