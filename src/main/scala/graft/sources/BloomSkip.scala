package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-file Bloom-filter skipping index — the POINT-LOOKUP complement to
  * [[SkipIndex]]'s min/max zone map.
  *
  * A zone map prunes range queries only when the layout CLUSTERS the
  * column; on a hash-bucketed or random layout every file's [min,max]
  * spans the domain and nothing prunes. Equality probes on high-
  * cardinality keys (user_id, order key, doc hash) are exactly that
  * case — and exactly what a Bloom filter answers: "can this file
  * contain v?" with no false negatives. Table formats in the
  * Delta/Iceberg family persist the same sidecar; this is the
  * engine-side form for plain parquet directories.
  *
  * Layout: one manifest row per (file, seed, word) holding a 64-bit
  * lane of the file's m-bit filter — built with one distributed scan
  * (groupBy(file, seed, word) + bit_or), O(distinct keys · k) shuffled
  * rows, nothing driver-sized. At m = 2^16 and k = 4 the manifest is at
  * most 4·1024 rows per file (dense worst case) and far fewer when a
  * file holds < m/64 distinct keys — manifest size tracks DISTINCT KEYS
  * per file, not rows.
  *
  * Probing stays distributed: [[candidates]] filters the manifest to
  * the k probed (seed, word) lanes — a k-row broadcast semi-join shape,
  * pruning cost proportional to manifest rows TOUCHED (k lanes per
  * file), then [[readEq]] applies the same bounded-driver-list contract
  * as [[SkipIndex.readRange]] (collect at most `maxDriverFiles` paths,
  * else fall back to the full scan with the predicate pushed down).
  *
  * Hash family: xxhash64(value, seed) for k seeds — evaluated by the
  * SAME Catalyst expression on the build and probe sides, so engine
  * hash stability is definitionally symmetric. NULLs are never added
  * and `col = v` never matches NULL, so skipping NULL-only lanes is
  * sound. No false negatives by construction: every stored value sets
  * all k of its lanes in its own file's filter. */
object BloomSkip {

  /** Number of 64-bit words per filter at `mBits`. */
  private def words(mBits: Int): Int = mBits / 64

  /** Build the manifest for `path`, filtering on column `c`:
    * one row per (file, seed, word) lane with a nonzero mask, plus the
    * root/params columns readers need ([[readEq]] re-derives probe
    * positions from m/k recorded here, so a manifest is self-describing
    * and index/probe parameter drift cannot desynchronize). */
  def build(spark: SparkSession, path: String, c: String,
            mBits: Int = 1 << 16, k: Int = 4): DataFrame = {
    require(mBits >= 64 && (mBits & (mBits - 1)) == 0, "mBits must be a power of two >= 64")
    require(k >= 1 && k <= 16, "k in [1,16]")
    val seeds = array((0 until k).map(lit): _*)
    spark.read.parquet(path)
      .where(col(c).isNotNull)
      .select(input_file_name().as("file"), col(c).as("v"))
      .select(col("file"), explode(seeds).as("seed"), col("v"))
      .select(col("file"), col("seed"),
        pmod(xxhash64(col("v"), col("seed")), lit(mBits.toLong)).as("pos"))
      .select(col("file"), col("seed"),
        (col("pos") / 64).cast("int").as("word"),
        // functions.shiftleft takes a literal Int shift; the per-row
        // shift goes through the SQL form
        expr("shiftleft(1L, cast(pos % 64 AS int))").as("bit"))
      .groupBy("file", "seed", "word")
      .agg(expr("bit_or(bit)").as("mask"))
      .withColumn("root", lit(path))
      .withColumn("m_bits", lit(mBits))
      .withColumn("k_hashes", lit(k))
  }

  /** The k probe lanes for a value under the manifest's (m, k) params:
    * (seed, word, bit) triples computed by EVALUATING the same
    * xxhash64 Catalyst expression the build side ran — one eval per
    * seed, no Spark job. */
  private[sources] def probes(v: Any, mBits: Int, k: Int): Seq[(Int, Int, Long)] = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val m = mBits.toLong
    (0 until k).map { seed =>
      // Same expression tree the build side runs: xxhash64(v, seed) with
      // the two values as children. `v` must carry the COLUMN's type
      // (e.g. Long for a BIGINT key) — xxhash64 of an Int and a Long of
      // equal value hash differently.
      val raw = new XxHash64(Seq(Literal.create(v), Literal(seed)))
        .eval(null).asInstanceOf[Long]
      val h = ((raw % m) + m) % m // pmod, mirroring the build side
      (seed, (h / 64).toInt, 1L << (h % 64).toInt)
    }
  }

  /** Distributed pruning predicate: files whose filter has ALL k probed
    * bits set. The manifest filter touches k lanes per file; a file
    * missing a probed lane row cannot contain the value (its mask for
    * that lane is all-zero) and drops out of the k-of-k count.
    *
    * (m, k) come from the manifest's OWN m_bits/k_hashes columns — the
    * manifest is self-describing, and a caller-supplied mismatch would
    * probe positions mod the wrong m: files genuinely containing v
    * fail the k-of-k test and are pruned, a silent FALSE NEGATIVE (the
    * one failure class a Bloom skip must never have). An empty index
    * matches nothing. */
  def candidates(index: DataFrame, v: Any): DataFrame = {
    val meta = index.select("m_bits", "k_hashes").limit(1).collect().headOption
    if (meta.isEmpty) return index.select("file").limit(0)
    val (mBits, k) = (meta.get.getInt(0), meta.get.getInt(1))
    val ps = probes(v, mBits, k)
    val laneHit = ps.map { case (s, w, b) =>
      col("seed") === s && col("word") === w && (col("mask").bitwiseAND(lit(b)) =!= 0)
    }.reduce(_ || _)
    index.where(laneHit)
      .groupBy("file").agg(countDistinct("seed").as("lanes"))
      .where(col("lanes") === k)
  }

  /** Equality read through the index: scan only candidate files, keep
    * the exact predicate (the filter is an overapproximation — false
    * positives read a file and filter it to zero rows; false negatives
    * cannot occur). Same driver-bound/fallback contract as
    * [[SkipIndex.readRange]]: at most `maxDriverFiles` paths are ever
    * collected, beyond that (or with nothing indexed and no root) the
    * read degrades to the plain directory scan with `c = v` pushed
    * down. Empty candidate sets return a schema-preserving empty frame
    * from the recorded root. */
  def readEq(spark: SparkSession, index: DataFrame, c: String, v: Any,
             maxDriverFiles: Int = 65536,
             tableRoot: Option[String] = None): DataFrame =
    SkipIndex.boundedPrunedRead(spark, index, candidates(index, v),
      col(c) === lit(v), maxDriverFiles, tableRoot)
}
