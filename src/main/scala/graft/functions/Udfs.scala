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

  /** Grouped top-k as a MERGEABLE aggregate: per-group state is a
    * bounded buffer of at most `4k` (score, id) pairs (compacted to the
    * top k by (score desc, id asc) on overflow), partials combine
    * map-side, and the shuffle carries the FIXED (1 + 8k)-long buffer
    * per group — the fill varies (k..4k live pairs plus zeroed slack),
    * not "k pairs", because the Aggregator API serializes the whole
    * reduce buffer and offers no pre-shuffle compaction hook; still
    * O(k) per group, constant-factor 4-8× over the ideal.
    *
    * Measured honestly (SCALE.md §22): Spark 4's own WindowGroupLimit
    * already prunes a rank-FILTERED window map-side (a partial
    * group-limit before the exchange — 1M rows → 7 200 shuffled records
    * in the dense-group probe), so for a standalone "top k per key" the
    * built-in window with a visible `rk <= k` filter is the recommended
    * plan and this aggregate does not beat it. What the aggregate
    * uniquely provides is COMPOSABILITY: top-k alongside other
    * aggregates (count, sum, sketches) in ONE aggregation pass — a
    * window cannot share a pass with an agg — and a mergeable state
    * usable in rollup trees (per-shard top-k union-merged upward, the
    * same pattern as [[MinHashSketch]]).
    *
    * Output is the final top-k as (score, id) pairs in rank order —
    * posexplode gives back (rank-1, pair), reproducing exactly the
    * window form's rows, which is the x253 oracle. */
  class TopK(k: Int) extends Aggregator[TopK.In, Array[Long], Seq[TopK.In]] {
    import TopK.In
    require(k >= 1)
    private val cap = 4 * k
    // buffer layout: [n, s0, id0, s1, id1, ...] at FIXED capacity —
    // reduce mutates in place (the buffer object lives across a
    // partition's rows; serialization happens only at the shuffle), so
    // the hot path allocates nothing. Overflow compacts to the top k
    // in place: amortized O(1) appends, O(cap log cap) every ~3k rows.
    private def compact(buf: Array[Long], keep: Int): Unit = {
      val n = buf(0).toInt
      val pairs = Array.tabulate(n)(i => (buf(1 + 2 * i), buf(2 + 2 * i)))
      val top = pairs.sortBy { case (s, id) => (-s, id) }.take(keep)
      var i = 0
      while (i < top.length) {
        buf(1 + 2 * i) = top(i)._1; buf(2 + 2 * i) = top(i)._2; i += 1
      }
      buf(0) = top.length.toLong
    }
    private def append(buf: Array[Long], s: Long, id: Long): Unit = {
      if (buf(0).toInt == cap) compact(buf, k)
      val n = buf(0).toInt
      buf(1 + 2 * n) = s; buf(2 + 2 * n) = id; buf(0) = n + 1L
    }
    def zero: Array[Long] = new Array[Long](1 + 2 * cap)
    def reduce(buf: Array[Long], in: In): Array[Long] = {
      append(buf, in.score, in.id); buf
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      val m = y(0).toInt
      var i = 0
      while (i < m) { append(x, y(1 + 2 * i), y(2 + 2 * i)); i += 1 }
      x
    }
    def finish(b: Array[Long]): Seq[In] = {
      compact(b, k)
      val n = b(0).toInt
      (0 until n).map(i => In(b(1 + 2 * i), b(2 + 2 * i)))
    }
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[In]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[In]]()
  }
  object TopK { case class In(score: Long, id: Long) }

  /** Register the scalar-UDF examples on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions.udf
    // scalar UDF: crude BPE-ish subword count (regex word/number/punct
    // splits then length buckets) — the token-counting heuristic a data
    // pipeline uses when no tokenizer binary is available. The pattern
    // is hoisted: compiled once per executor at closure deserialization,
    // not re-compiled per row inside the lambda
    val subwordPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]".r
    val tokenCount = udf { (s: String) =>
      if (s == null) 0
      else subwordPattern.findAllIn(s)
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
