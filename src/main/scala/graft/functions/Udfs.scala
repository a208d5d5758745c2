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

  /** Mergeable MinHash sketch of a GROUP's string values (vs the per-row
    * signatures in graft.llm.Dedup): slot i = min over values of
    * (a_i·H(v) + b_i) mod p with H = first-8-hex of md5 — the exact hash
    * family of query x74, so DuckDB reproduces the sketch with a plain
    * group-min and the operator is hash-checkable (x89).
    *
    * The buffer is `slots` longs regardless of group size, and merge is
    * elementwise min — associative and commutative, so map-side combine
    * applies and sketches of shards/days/partitions union by min: the
    * 100 TB path to corpus-level similarity without re-reading text.
    */
  class MinHashSketch(slots: Int = 16) extends Aggregator[String, Array[Long], Array[Long]] {
    private val P = 2147483647L
    // same affine constants as x74's inline perm table
    private val A = Array(1299721L, 1299827L, 1300021L, 1300033L, 1300109L,
      1300151L, 1300187L, 1300201L, 1300247L, 1300289L, 1300303L, 1300313L,
      1300333L, 1300351L, 1300369L, 1300387L)
    private val B = Array(104729L, 104743L, 104759L, 104761L, 104773L,
      104779L, 104789L, 104801L, 104803L, 104827L, 104831L, 104849L,
      104851L, 104869L, 104879L, 104891L)
    require(slots <= A.length)

    private def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    def zero: Array[Long] = Array.fill(slots)(Long.MaxValue)
    def reduce(buf: Array[Long], v: String): Array[Long] = {
      if (v != null) {
        val h = h32(v)
        var i = 0
        while (i < slots) {
          val x = (A(i) * h + B(i)) % P
          if (x < buf(i)) buf(i) = x
          i += 1
        }
      }
      buf
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < slots) { if (y(i) < x(i)) x(i) = y(i); i += 1 }
      x
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

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
