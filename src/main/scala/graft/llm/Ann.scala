package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search over an embedding column.
  *
  * Two tiers (SURVEY.md §2.9):
  *  - [[bruteForceTopK]]: exact cosine top-k — one narrow scan, codegen'd
  *    higher-order functions, TakeOrdered. The correctness baseline.
  *  - [[lshTopK]]: random-hyperplane LSH — signature computed per row
  *    against a deterministic, seed-derived plane matrix (a broadcast
  *    literal; no fitting step), candidates restricted to buckets within
  *    a Hamming probe radius of the query's bucket. At 100 TB the bucket
  *    column becomes the partition key so a query touches few partitions.
  */
object Ann {

  private def toDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** dot(a,b) via zip_with + aggregate (stays in whole-stage codegen). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)

  def norm(a: Column): Column = sqrt(aggregate(a, lit(0.0), (s, x) => s + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k by cosine vs a query vector. */
  def bruteForceTopK(embeddings: DataFrame, query: Seq[Double], k: Int): DataFrame = {
    val q = lit(query.toArray)
    embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("sim", cosine(col("e"), q))
      .select(col("vec_id"), col("sim"))
      .orderBy(desc("sim"), col("vec_id"))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplanes (seeded, not data-dependent). */
  def planes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(rnd.nextGaussian())
  }

  /** Sign-bit signature of a vector against the plane matrix. */
  def signature(vec: Column, planeMat: Array[Array[Double]]): Column = {
    val bits = planeMat.map { p =>
      when(dot(vec, lit(p)) > 0, 1L).otherwise(0L)
    }
    bits.foldLeft(lit(0L))((acc, b) => acc * 2 + b)
  }

  /** Bucketed table: (vec_id, e, bucket). Materialize/partition by bucket
    * at scale; recomputed inline here. */
  def bucketed(embeddings: DataFrame, planeMat: Array[Array[Double]]): DataFrame =
    embeddings
      .select(col("vec_id"), toDouble(col("embedding")).as("e"))
      .withColumn("bucket", signature(col("e"), planeMat))

  // ---- IVF (inverted-file) tier --------------------------------------

  /** Train IVF centroids: deterministic seeding (vec_id mod nLists) plus
    * `iters` Lloyd refinement steps. The per-list mean is computed with
    * the typed VectorAvg Aggregator — partial buffers merge map-side, so
    * training shuffles one (dim+1)-wide buffer per list per partition,
    * never the vectors. Centroids (nLists × dim) collect to the driver:
    * that's the index metadata a real deployment broadcasts. */
  def ivfTrain(embeddings: DataFrame, nLists: Int, dim: Int,
               iters: Int = 2): Array[(Int, Array[Double])] = {
    import embeddings.sparkSession.implicits._
    val avg = new graft.functions.Udfs.VectorAvg(dim)
    val base = embeddings.select(col("vec_id"),
      toDouble(col("embedding")).as("e"))
    def listMeans(df: DataFrame): Array[(Int, Array[Double])] =
      df.select(col("list"), col("e").cast("array<float>").as("ef"))
        .as[(Int, Array[Float])]
        .groupByKey(_._1)
        .mapValues(_._2)
        .agg(avg.toColumn.name("c"))
        .collect().map { case (l, c) => (l, c.map(_.toDouble)) }

    var centroids = listMeans(
      base.withColumn("list", (col("vec_id") % nLists).cast("int")))
    var i = 0
    while (i < iters) {
      centroids = listMeans(ivfAssign(base, centroids))
      i += 1
    }
    centroids.sortBy(_._1)
  }

  /** Assign each vector to its nearest centroid (list). At scale the
    * result is what you write out partitioned/bucketed by `list`. */
  def ivfAssign(vectors: DataFrame, centroids: Array[(Int, Array[Double])]): DataFrame = {
    // argmax over nLists dot products, unrolled as a greatest-of-structs
    val scored = centroids.map { case (l, c) =>
      struct(dot(col("e"), lit(c)).as("sim"), lit(l).as("list"))
    }
    vectors.withColumn("list", greatest(scored: _*).getField("list"))
  }

  /** IVF query: score the (driver-resident) centroids, probe the nProbe
    * best lists, exact cosine within. */
  def ivfTopK(embeddings: DataFrame, query: Seq[Double], k: Int,
              nLists: Int = 16, nProbe: Int = 4, dim: Int = 64,
              centroids: Option[Array[(Int, Array[Double])]] = None): DataFrame = {
    val cs = centroids.getOrElse(ivfTrain(embeddings, nLists, dim))
    val probe = cs.map { case (l, c) =>
        val qn = math.sqrt(query.map(x => x * x).sum)
        val cn = math.sqrt(c.map(x => x * x).sum) max 1e-12
        (l, c.zip(query).map { case (a, b) => a * b }.sum / (qn * cn))
      }.sortBy(-_._2).take(nProbe).map(_._1).toSet
    val base = embeddings.select(col("vec_id"), toDouble(col("embedding")).as("e"))
    val assigned = ivfAssign(base, cs)
    val q = lit(query.toArray)
    assigned.where(col("list").isin(probe.toSeq: _*))
      .withColumn("sim", cosine(col("e"), q))
      .select(col("vec_id"), col("sim"))
      .orderBy(desc("sim"), col("vec_id"))
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucketed candidate
    * generation (probe = own bucket ∪ single-bit flips), exact cosine
    * verification ≥ minSimBp. Completes the dedup family (exact /
    * MinHash / SimHash / n-gram Jaccard / embedding-cosine): true
    * near-identical vectors agree on nearly all hyperplane signs, so
    * radius-1 probing finds them without the all-pairs join. */
  def cosineNearDups(embeddings: DataFrame, minSimBp: Long = 9000L,
                     numPlanes: Int = 12, dim: Int = 64,
                     seed: Long = 42L): DataFrame = {
    val mat = planes(numPlanes, dim, seed)
    val b = bucketed(embeddings, mat)
    val masks = 0L +: (0 until numPlanes).map(p => 1L << p)
    val probed = b.withColumn("pb",
      explode(array(masks.map(m => col("bucket").bitwiseXOR(lit(m))): _*)))
    val cands = probed.as("x").join(b.as("y"),
        col("x.pb") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a"), col("x.e").as("ea"),
        col("y.vec_id").as("b"), col("y.e").as("eb"))
      .dropDuplicates("a", "b")
    cands
      .withColumn("sim_bp",
        floor(cosine(col("ea"), col("eb")) * 10000.0).cast("long"))
      .where(col("sim_bp") >= minSimBp)
      .select(col("a"), col("b"), col("sim_bp"))
      .orderBy(desc("sim_bp"), col("a"), col("b"))
  }

  /** ANN top-k: probe all buckets within `probeRadius` Hamming distance of
    * the query bucket, exact cosine within the candidate set. */
  def lshTopK(embeddings: DataFrame, query: Seq[Double], k: Int,
              numPlanes: Int = 8, probeRadius: Int = 2,
              seed: Long = 42L): DataFrame = {
    val mat = planes(numPlanes, query.length, seed)
    val qSig = mat.map(p =>
      if (p.zip(query).map { case (a, b) => a * b }.sum > 0) 1L else 0L)
      .foldLeft(0L)((acc, b) => acc * 2 + b)
    val b = bucketed(embeddings, mat)
    val q = lit(query.toArray)
    b.where(bit_count(col("bucket").bitwiseXOR(lit(qSig))) <= probeRadius)
      .withColumn("sim", cosine(col("e"), q))
      .select(col("vec_id"), col("sim"))
      .orderBy(desc("sim"), col("vec_id"))
      .limit(k)
  }
}
