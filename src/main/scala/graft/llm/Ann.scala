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
