package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** The UDF surface tier (SURVEY.md §2.9): registered scalar UDF, typed
  * Aggregator (UDAF), and a generator via Dataset.flatMap. The declared
  * t2 queries deliberately avoid UDFs (the oracle can't run Scala), but
  * the library exposes the extension points a user of the engine needs.
  *
  * Preference order stands: built-in functions > custom codegen'd
  * Expression > Scala UDF (opaque to Catalyst: no pushdown through it,
  * no codegen fusion) — see graft.plans for the Expression tier.
  */
object Udfs {

  /** Element-wise mean of float vectors — a typed UDAF. Partial sums are
    * double arrays merged associatively (map-side combine works), so the
    * shuffle carries one (dim+1)-wide buffer per group, not vectors. */
  class VectorAvg(dim: Int) extends Aggregator[Array[Float], VectorAvg.Buf, Array[Float]] {
    import VectorAvg.Buf
    def zero: Buf = Buf(new Array[Double](dim), 0L)
    def reduce(b: Buf, a: Array[Float]): Buf = {
      var i = 0
      while (i < dim && i < a.length) { b.sum(i) += a(i); i += 1 }
      Buf(b.sum, b.n + 1)
    }
    def merge(x: Buf, y: Buf): Buf = {
      var i = 0
      while (i < dim) { x.sum(i) += y.sum(i); i += 1 }
      Buf(x.sum, x.n + y.n)
    }
    def finish(b: Buf): Array[Float] =
      if (b.n == 0) new Array[Float](dim)
      else b.sum.map(s => (s / b.n).toFloat)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Array[Float]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
  }
  object VectorAvg { case class Buf(sum: Array[Double], n: Long) }

  /** Register the scalar-UDF examples on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions.udf
    // scalar UDF: crude BPE-ish subword count (regex word/number/punct
    // splits then length buckets) — the token-counting heuristic a data
    // pipeline uses when no tokenizer binary is available
    val tokenCount = udf { (s: String) =>
      if (s == null) 0
      else "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]".r.findAllIn(s)
        .map(t => 1 + (t.length - 1) / 4).sum
    }
    spark.udf.register("subword_count", tokenCount)

    // generator-style UDF: char n-grams (use with explode(...))
    val charNgrams = udf { (s: String, n: Int) =>
      if (s == null || s.length < n) Array.empty[String]
      else (0 to s.length - n).map(i => s.substring(i, i + n)).toArray
    }
    spark.udf.register("char_ngrams", charNgrams)
  }
}
