package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout writers implementing the SCALE.md §2 design: the sink
  * side of the engine. The corpus ships unpartitioned single files (fine
  * for the oracle gate); these produce the layouts the 100 TB deployment
  * reads:
  *  - events → date-partitioned parquet (`dt=YYYY-MM-DD/`): time-bucketed
  *    queries prune partitions statically, and a dim-filtered join prunes
  *    them dynamically (DPP).
  *  - facts → bucketed + sorted tables on the join key: co-located joins
  *    with no exchange.
  */
object Layout {

  /** Write events date-partitioned. `dt` becomes a partition column. */
  def writeEventsDatePartitioned(events: DataFrame, path: String): Unit =
    events.withColumn("dt", to_date(col("ts")))
      .write.partitionBy("dt").mode("overwrite").parquet(path)

  def readDatePartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Write embeddings partitioned by LSH bucket (SCALE.md §2): the
    * signature is computed ONCE at ingest and becomes a directory key,
    * so an ANN probe (`Ann.lshTopKPartitioned`) is a partition-pruned
    * scan — cost scales with probes touched, not corpus size. */
  def writeLshPartitioned(embeddings: DataFrame, path: String,
                          planeMat: Array[Array[Double]]): Unit =
    embeddings.select(col("vec_id"), col("embedding"),
        graft.llm.Ann.signature(
          transform(col("embedding"), x => x.cast("double")), planeMat)
          .as("bucket"))
      .write.partitionBy("bucket").mode("overwrite").parquet(path)

  /** Write embeddings partitioned by IVF list id (same at-scale shape
    * for the trained-index tier: a query probing nProbe of nLists reads
    * nProbe/nLists of the directory tree). */
  def writeIvfPartitioned(embeddings: DataFrame, path: String,
                          centroids: Array[(Int, Array[Double])]): Unit =
    graft.llm.Ann.ivfAssign(
        embeddings.select(col("vec_id"), col("embedding"),
          transform(col("embedding"), x => x.cast("double")).as("e")),
        centroids)
      .select(col("vec_id"), col("embedding"), col("list"))
      .write.partitionBy("list").mode("overwrite").parquet(path)

  /** Write the PQ-ENCODED corpus partitioned by IVF list — the serving
    * layout of the IVFADC bulk tier (VERDICT r16 #3): (vec_id, vnorm,
    * codes) under `list=N/` directories, m bytes-of-codes + a norm per
    * vector instead of dim×4 float bytes. A bulk query batch LUT-scores
    * a DPP-pruned slice of THIS layout, then exact-reranks only its
    * k×refine candidates against the raw [[writeIvfPartitioned]]
    * layout. Assignment uses [[graft.llm.Ann.pqEncode]], whose tie
    * rules mirror ivfAssign — the two layouts place every vector in
    * the same list. */
  def writeIvfEncodedPartitioned(embeddings: DataFrame, path: String,
                                 idx: graft.llm.Ann.PqIndex): Unit =
    graft.llm.Ann.pqEncode(embeddings, idx)
      .write.partitionBy("list").mode("overwrite").parquet(path)

  /** Persist a DataFrame as a bucketed, per-bucket-sorted table (catalog
    * table — bucketing metadata lives in the catalog). True overwrite:
    * also clears a stale managed-table location left by a previous
    * session's metastore (in-memory catalogs forget tables but not
    * their directories).
    *
    * The pre-write `repartition(buckets, key)` matters: repartition's
    * hash placement (pmod(murmur3(key), n)) is the SAME function as the
    * bucket spec's, so each write task holds exactly one bucket and each
    * bucket gets exactly ONE file. That is the condition under which the
    * scan advertises its per-bucket sort order (FileSourceScan only
    * trusts sortBy metadata for single-file buckets) — and a sorted
    * advertised scan is what lets a fact-fact SortMergeJoin plan with no
    * Sort AND no Exchange (LayoutSpec asserts both). Multi-file buckets
    * silently re-sort on every join, paying the layout's write cost
    * without its read benefit. Readers must also enable
    * `spark.sql.legacy.bucketedTableScan.outputOrdering` — since 3.0
    * Spark hides the advertised sort by default because it is unsound
    * for multi-file buckets; this writer restores the soundness
    * condition. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // stale-location cleanup must target the location the METASTORE
    // would use, not a string guess: identifiers are lowercased and a
    // db-qualified name maps to $warehouse/<db>.db/<tbl> — deleting
    // "$warehouse/$table" verbatim misses both (mixed case, "db.tbl"),
    // leaving the stale dir that makes saveAsTable fail with
    // "location already exists"
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val parts = table.toLowerCase(java.util.Locale.ROOT).split("\\.")
    val rel = parts match {
      case Array(t)     => t
      case Array(db, t) => s"$db.db/$t"
      case _ => throw new IllegalArgumentException(
        s"writeBucketed: cannot derive a location for '$table'")
    }
    val loc = new org.apache.hadoop.fs.Path(s"$warehouse/$rel")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.repartition(buckets, col(key))
      .write.bucketBy(buckets, key).sortBy(key)
      .mode("overwrite").format("parquet").saveAsTable(table)
  }

  /** Small-file compaction: rewrite a parquet directory into files of
    * ~`targetBytes`. The small-file problem is the first operational
    * failure mode of a long-lived 100 TB table (every micro-batch sink,
    * every over-parallel writer leaves thousands of KB-files; each costs
    * a listing entry, a footer read, and a scheduler task on every
    * subsequent scan). File count is sized from the directory's ACTUAL
    * on-disk bytes (post-compression), not row estimates, and the
    * rewrite uses coalesce — a scan-side merge that moves no data
    * between executors — rather than a repartition shuffle. Returns
    * (filesBefore, filesAfter). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long): (Int, Int) = {
    val in = new org.apache.hadoop.fs.Path(inPath)
    val fs = in.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // recursive listing: a top-level-only scan sees ZERO bytes under a
    // partitioned layout (dt=*/...), sizing the rewrite at nOut=1 and
    // funneling the whole dataset through one task into one file
    // compare against the QUALIFIED root: listFiles returns qualified
    // paths (file:/...), so an unqualified `in` would flag every file
    // as nested
    val inQ = fs.makeQualified(in)
    val it = fs.listFiles(inQ, true)
    val dataBuf = scala.collection.mutable.ArrayBuffer.empty[Long]
    var partitioned = false
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet")) {
        dataBuf += f.getLen
        if (f.getPath.getParent != inQ) partitioned = true
      }
    }
    require(!partitioned, s"compact: $inPath holds nested partition " +
      "directories — a flat rewrite would drop the partition columns " +
      "from the layout; compact each leaf partition instead")
    val dataFiles = dataBuf.toSeq
    val bytes = dataFiles.sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath).coalesce(nOut)
      .write.mode("overwrite").parquet(outPath)
    val out = new org.apache.hadoop.fs.Path(outPath)
    val outFiles = fs.listStatus(out)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (dataFiles.size, outFiles)
  }

  /** Bit-interleave two 16-bit ranks into a 32-bit Z-order (Morton)
    * key — built entirely from codegen'd bitwise built-ins (32
    * shift/mask terms), no UDF, no custom expression needed. */
  def interleave16(a: org.apache.spark.sql.Column,
                   b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 16).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** Write `df` Z-ordered on two numeric columns: each column is
    * scaled to a 16-bit rank, the ranks bit-interleaved into a Morton
    * key, and the data range-partitioned + sorted on that key. The
    * point vs a linear sort: a linear layout on (c1) gives disjoint
    * per-file ranges for c1 only — a filter on c2 touches every file.
    * Z-order trades a little locality on each dimension for locality
    * on BOTH: a point/range query on either column prunes to
    * ~sqrt(files) through the same SkipIndex manifest. Ranks here are
    * min/max-linear (one tiny agg, fine for ~uniform columns); skewed
    * columns would use approx_percentile boundaries instead — the
    * GlobalWindow boundary pattern.
    */
  def writeZOrdered(df: DataFrame, path: String, c1: String, c2: String,
                    numFiles: Int): Unit = {
    val b = df.agg(
      min(col(c1)).cast("double"), max(col(c1)).cast("double"),
      min(col(c2)).cast("double"), max(col(c2)).cast("double")).collect().head
    if (b.isNullAt(0) || b.isNullAt(2)) {
      // empty (or all-NULL-column) input: no ranks to compute — write
      // the empty frame instead of NPE-ing on a null aggregate
      df.write.mode("overwrite").parquet(path)
      return
    }
    val (lo1, hi1, lo2, hi2) =
      (b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3))
    def rank(c: String, lo: Double, hi: Double) =
      least(lit(65535L), floor(
        (col(c).cast("double") - lit(lo)) / lit(math.max(hi - lo, 1e-300)) * 65536.0
      ).cast("long"))
    val keyed = df.withColumn("__z",
      interleave16(rank(c1, lo1, hi1), rank(c2, lo2, hi2)))
    keyed.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
