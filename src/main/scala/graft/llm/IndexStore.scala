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
  * manifest is read back and verified byte-identical to what this
  * writer built: two concurrent writers racing to the same version
  * number are detected by content, with the winner's commit untouched
  * (the CdcStream.commit argument, reused verbatim).
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

  private def fs(spark: SparkSession) =
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)

  /** Committed versions, ascending. A v<N> directory is a commit iff
    * the atomic rename landed its manifest — directory presence alone
    * is NOT commit evidence (the CdcStream/ADVICE r5 rule). */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val f = fs(spark)
    val root = new Path(path)
    if (!f.exists(root)) return Nil
    f.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+"))
      .filter(s => f.exists(new Path(s.getPath, ManifestFile)))
      .map(_.getPath.getName.drop(1).toLong).sorted
  }

  private def manifestBody(kind: String, params: Map[String, String],
                           components: Seq[String]): String =
    (Seq(s"kind\t$kind") ++
      params.toSeq.sortBy(_._1).map { case (k, v) => s"param\t$k\t$v" } ++
      components.map(c => s"component\t$c")).mkString("", "\n", "\n")

  def readManifest(spark: SparkSession, path: String, n: Long): Manifest = {
    val f = fs(spark)
    val in = f.open(new Path(s"$path/v$n", ManifestFile))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
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
    val f = fs(spark)
    val n = versions(spark, path).lastOption.getOrElse(-1L) + 1L
    val tmp = new Path(path, s".tmp-${java.util.UUID.randomUUID}")
    val body = manifestBody(kind, params, components.map(_._1))
    try {
      components.foreach { case (name, df) =>
        df.coalesce(1).write.mode("errorifexists")
          .parquet(new Path(tmp, name).toString)
      }
      val out = f.create(new Path(tmp, ManifestFile), false)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      val dest = new Path(path, s"v$n")
      val renamed = f.rename(tmp, dest)
      // verify by CONTENT, not by the rename's return value alone: on a
      // racing commit some filesystems move the source INTO the existing
      // destination instead of failing
      val landed =
        try {
          val m = readManifest(spark, path, n)
          manifestBody(m.kind, m.params, m.components) == body
        } catch { case scala.util.control.NonFatal(_) => false }
      if (!renamed || !landed)
        throw new IllegalStateException(
          s"concurrent commit of v$n in $path — this writer's version was not committed")
      n
    } finally if (f.exists(tmp)) f.delete(tmp, true)
  }

  /** Reclaim history: delete committed versions older than the newest
    * `keepLast`, plus any orphaned `.tmp-*` directories a crashed
    * writer left behind (the CdcStream.vacuum discipline — an orphan
    * is invisible to readers but not to the bill). Never touches the
    * newest `keepLast` commits. Returns (versionsDeleted, orphansDeleted). */
  def vacuum(spark: SparkSession, path: String, keepLast: Int = 2): (Int, Int) = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val f = fs(spark)
    val root = new Path(path)
    if (!f.exists(root)) return (0, 0)
    val vs = versions(spark, path)
    val drop = vs.dropRight(keepLast)
    drop.foreach(n => f.delete(new Path(path, s"v$n"), true))
    val orphans = f.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".tmp-"))
    orphans.foreach(s => f.delete(s.getPath, true))
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
