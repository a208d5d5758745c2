package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap

/** Registers the test-corpus tables from a scale-factor directory as temp
  * views, so every query (SQL or DataFrame) resolves them by name.
  *
  * Design notes for scale (SURVEY.md §1.2, §4):
  *  - Tables are registered as plain parquet-backed views: Catalyst sees the
  *    file relation directly, so predicate pushdown / column pruning reach
  *    the `FileSourceScanExec` (verify via `PushedFilters` in explain).
  *  - `events.ts` timestamp vintages (both corpus generations handled):
  *    ns-precision parquet timestamps, which Spark 4.x refuses to read
  *    natively (`PARQUET_TYPE_ILLEGAL`) — read with
  *    `spark.sql.legacy.parquet.nanosAsLong=true` (BIGINT nanos) and
  *    expose `timestamp_micros(ts div 1000)`, floor ns→µs exactly like
  *    DuckDB (SURVEY.md §5.35); and µs timestamps written WITHOUT the
  *    UTC-adjusted flag (the round-7 regeneration), which arrive as
  *    TIMESTAMP_NTZ — cast to the session type (sessions are pinned UTC
  *    everywhere, so the cast is value-preserving and DuckDB's naive
  *    read sees the identical instants).
  *  - On a real cluster this catalog would point at date-partitioned
  *    parquet (events partitioned by day) + bucketed orders/customer on the
  *    join keys; the view indirection below is where that swap happens.
  */
object Catalog {
  val tables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Last directory registered per session, to make ensure() idempotent and
  // cheap (Verify/Bench call it once per query). WEAK keys: a strong
  // session-keyed map pins every churned session (the fresh-sessions-
  // over-a-shared-context test pattern, or a server embedding the
  // library) and its state forever; the String value carries no
  // back-reference to the key, so weak keying actually collects here.
  // (All access goes through ensure(), which is synchronized.)
  private val registeredDir =
    new java.util.WeakHashMap[SparkSession, String]()

  /** Collision-proof /tmp cache-dir key for a source path: the sanitized
    * path for readability PLUS an md5-8 of the raw path — sanitization
    * alone maps every non-[A-Za-z0-9._-] char to '_', so "/d/sf 1" and
    * "/d/sf_1" would otherwise share a key (ADVICE r10 #3 follow-up:
    * the fingerprint makes a collision rebuild rather than mis-reuse,
    * but two live sources sharing a dir would rebuild on EVERY probe). */
  def cacheKey(path: String): String = {
    val md = java.security.MessageDigest.getInstance("md5")
      .digest(path.getBytes("UTF-8"))
    path.replaceAll("[^A-Za-z0-9._-]", "_") + "." +
      md.take(4).map("%02x".format(_)).mkString
  }

  /** Content fingerprint of a parquet source that works for BOTH layouts:
    * a flat file (the driver corpus) and a Spark-written DIRECTORY (the
    * 10×/100× soak corpora) — for a directory, File.length is a
    * meaningless fs-block constant and mtime only tracks direct-child
    * create/delete, so a part file rewritten in place would go
    * undetected; list the data files recursively (skip _SUCCESS/.crc
    * bookkeeping) and fingerprint each (relative name, size, mtime). */
  def fingerprint(path: String): String = {
    val root = new java.io.File(path)
    // a missing source must FAIL, not fingerprint as the constant
    // ":0:0" (File.length/lastModified return 0 for nonexistent paths)
    // — two different moved/missing sources would compare "identical"
    require(root.exists(), s"fingerprint: $path does not exist")
    def walk(f: java.io.File, rel: String): Seq[String] =
      if (f.isDirectory) {
        // listFiles returns NULL on an I/O or permission error
        val children = f.listFiles()
        require(children != null, s"fingerprint: cannot list $f")
        children.sortBy(_.getName).toSeq
          .filterNot(c => c.getName.startsWith("_") || c.getName.startsWith("."))
          .flatMap(c => walk(c, s"$rel/${c.getName}"))
      } else Seq(s"$rel:${f.length}:${f.lastModified}")
    walk(root, "").mkString("\n")
  }

  /** Idempotently register all tables from `dir` as temp views. */
  def ensure(spark: SparkSession, dir: String): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(plans.DeferProjectionPastTopK))
      spark.experimental.extraOptimizations ++= Seq(plans.DeferProjectionPastTopK)
    if (!spark.experimental.extraOptimizations.contains(plans.FuseMd5Prefix32))
      spark.experimental.extraOptimizations ++= Seq(plans.FuseMd5Prefix32)
    functions.CosineSim.register(spark)
    functions.PqLutScore.register(spark)
    functions.SimHash64.register(spark)
    functions.WinnowFps.register(spark)
    functions.WinnowFpsMd5.register(spark)
    functions.Md5Prefix32Expr.register(spark)
    functions.AffineMinSig.register(spark)
    functions.FoldAccents.register(spark)
    functions.DamerauLevenshtein.register(spark)
    functions.JaroWinkler.register(spark)
    functions.PerceptualHash32.register(spark)
    if (registeredDir.get(spark) != dir) {
      // Required to read the ns-precision events.ts column; the other
      // tables use ms timestamps and are unaffected by this flag.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      tables.foreach { t =>
        val df = spark.read.parquet(s"$dir/$t.parquet")
        val nsFixed =
          if (t == "events" &&
              df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
            // ts arrives as BIGINT nanos under nanosAsLong; floor-truncate
            // to µs (matches DuckDB's ns→µs conversion, SURVEY.md §5.35).
            // Re-materialized corpora (ScaleSoak) store µs timestamps
            // directly and skip the conversion.
            df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
          else df
        // normalize timezone-naive timestamp columns (TIMESTAMP_NTZ) to
        // the session type: UTC sessions make this a pure re-tag, and the
        // timestamp function surface (unix_millis, from_utc_timestamp,
        // watermarks) expects the session type
        val view = nsFixed.schema.fields
          .filter(_.dataType == org.apache.spark.sql.types.TimestampNTZType)
          .foldLeft(nsFixed)((d, f) =>
            d.withColumn(f.name, col(f.name).cast("timestamp")))
        view.createOrReplaceTempView(t)
      }
      registeredDir.put(spark, dir)
    }
  }

  /** Load a single table as a DataFrame (events already ts-normalized). */
  def load(spark: SparkSession, dir: String, table: String): DataFrame = {
    ensure(spark, dir)
    spark.table(table)
  }

  // Plan cache (prepared statements): repeated submissions of the same SQL
  // against the same catalog state reuse the analyzed/optimized/compiled
  // plan — Spark's planning+codegen costs 100-600ms per query, dwarfing
  // execution at small SF. Keyed by (session, dir, sql); a dir switch
  // yields different keys, so stale view bindings can't leak. Bounded
  // (simple size cap with full clear — an LRU would be overkill for a
  // per-session statement cache an order of magnitude above the
  // inventory size).
  private val planCacheMax = 512
  private val planCache = new TrieMap[(SparkSession, String, String), DataFrame]()

  /** Plan-cache kill switch. The cache exists to amortize ANALYSIS of
    * the 300+ big SQL texts across Verify/driver passes — but a reused
    * DataFrame also reuses its RDD lineage, and Spark SKIPS already-
    * computed shuffle map stages on resubmission (the DAGScheduler's
    * map-output check), so a timing loop over the memoized object
    * measures ONLY THE FINAL STAGE after rep 1. Discovered r13 from an
    * impossibility: x74's 9.6M-row pipeline "ran" in 50 ms memoized vs
    * 3.8 s fresh. Bench disables the cache for every timed set
    * (SCALE.md §36); Verify keeps it (correctness, not timing). The
    * env form (`SPARK_GRAFT_PLANCACHE=off`) exists for ad-hoc runs. */
  @volatile var planCacheEnabled: Boolean = true
  private def cacheOff: Boolean =
    !planCacheEnabled || sys.env.get("SPARK_GRAFT_PLANCACHE").contains("off")

  def sql(spark: SparkSession, dir: String, sqlText: String): DataFrame = {
    ensure(spark, dir)
    if (cacheOff) return spark.sql(sqlText)
    if (planCache.size > planCacheMax) {
      // weak keys cannot work here — the cached DataFrames back-
      // reference their session, so the entry's VALUE would pin the
      // weak KEY forever. Evict dead sessions' entries explicitly
      // first; only if live entries alone still bust the cap, clear.
      planCache.keys.filter(_._1.sparkContext.isStopped)
        .foreach(planCache.remove)
      if (planCache.size > planCacheMax) planCache.clear()
    }
    planCache.getOrElseUpdate((spark, dir, sqlText), spark.sql(sqlText))
  }
}
