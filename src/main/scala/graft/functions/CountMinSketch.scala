package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Count-Min sketch (Cormode & Muthukrishnan 2005): a
  * depth×width counter grid; insert bumps one counter per row at that
  * row's hash of the key; the point estimate is the MIN over rows —
  * never an undercount (all increments are non-negative), overcount
  * bounded by ε·N with ε = e/width at probability 1−e^(−depth).
  *
  * Completes the repo's mergeable-summary family (x253 top-k, x261
  * quantile ladder, x266 Misra-Gries): merge is element-wise addition,
  * so partial aggregates combine in any order/grouping — the shuffle
  * carries one depth×width grid per group instead of the group's rows,
  * the fleet-rollup shape.
  *
  * Hash family: row 0 is the IDENTITY bucket (x mod width); rows ≥ 1
  * use Carter-Wegman multiply-shift over the Mersenne prime 2⁶¹−1 with
  * fixed odd constants — deterministic, public, pairwise independent.
  *
  * Exactness regime (structural, the x261/x266 pattern): row 0 is
  * INJECTIVE whenever every key lies in [0, width), and CMS never
  * undercounts, so min(rows) = row 0 = the exact multiset count — in
  * that regime the declared x301 entry hash-matches a plain GROUP BY
  * oracle. Since round 10 the entry is DUAL-MODE (operators/Sketches
  * .cmsProbe): the key range rides the same aggregation and an `exact`
  * flag column marks the regime per row — over-width keyspaces get the
  * ε·N-bounded estimate flagged approx instead of a dead job.
  * Production capacities (depth 4, width 2048) are ε-bound-spec'd in
  * InvariantsSpec.
  *
  * Buffer is a flat primitive Array[Long] (depth·width), mutated in
  * place per row (the r8 HeavyHitters lesson — no per-row allocation);
  * zero is an EMPTY array sentinel so under-full groups never allocate
  * the full grid until their first input.
  */
class CountMinSketch(depth: Int, width: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(depth >= 1 && width >= 2)
  // The Carter-Wegman constant tables hold 8 rows; cycling past them
  // (j % 8) would silently reuse row 0's identity hash for row 8,
  // duplicating a row and voiding the 1−e^(−depth) bound (ADVICE r9 #1).
  require(depth <= CountMinSketch.maxDepth,
    s"depth must be <= ${CountMinSketch.maxDepth} (distinct hash rows available)")

  def zero: Array[Long] = Array.emptyLongArray

  private def grid(b: Array[Long]): Array[Long] =
    if (b.length == depth * width) b else new Array[Long](depth * width)

  def reduce(b: Array[Long], key: Long): Array[Long] = {
    val g = grid(b)
    var j = 0
    while (j < depth) {
      g(j * width + CountMinSketch.bucket(key, j, width)) += 1L
      j += 1
    }
    g
  }

  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    if (y.length == 0) return x
    val g = grid(x)
    var i = 0
    while (i < g.length) { g(i) += y(i); i += 1 }
    g
  }

  def finish(b: Array[Long]): Array[Long] = grid(b)

  def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object CountMinSketch {
  private val P = (1L << 61) - 1 // Mersenne prime 2^61-1
  /** Max supported depth = number of distinct hash rows (identity + 7
    * Carter-Wegman rows). */
  val maxDepth: Int = 8
  // fixed odd Carter-Wegman constants per row (row 0 unused: identity)
  private val A = Array(0L, 0x9e3779b97f4a7c15L, 0xc2b2ae3d27d4eb4fL, 0x165667b19e3779f9L,
    0x27d4eb2f165667c5L, 0x85ebca77c2b2ae63L, 0x2545f4914f6cdd1dL, 0xff51afd7ed558ccdL)
  private val B = Array(0L, 0x94d049bb133111ebL, 0xbf58476d1ce4e5b9L, 0x4cf5ad432745937fL,
    0x9e3779b185ebca87L, 0xd6e8feb86659fd93L, 0xa5a5a5a5a5a5a5a5L, 0x6c62272e07bb0142L)

  /** Row j's bucket for `key` in [0, width). Row 0 = identity mod. */
  def bucket(key: Long, j: Int, width: Int): Int = {
    if (j == 0) return (math.floorMod(key, width.toLong)).toInt
    // multiply-add over the Mersenne prime, lane-mixed per row
    val a = A(j % A.length) | 1L
    val b = B(j % B.length)
    val h = java.lang.Math.multiplyHigh(key ^ b, a) ^ ((key ^ b) * a)
    (math.floorMod(h, P) % width).toInt
  }

  /** Point estimate: min over rows of the key's counter. Driver/probe
    * side only — the grid itself is the distributed object. */
  def probe(grid: Array[Long], depth: Int, width: Int, key: Long): Long = {
    var est = Long.MaxValue
    var j = 0
    while (j < depth) {
      val c = grid(j * width + bucket(key, j, width))
      if (c < est) est = c
      j += 1
    }
    if (est == Long.MaxValue) 0L else est
  }
}
