package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Deterministic mergeable quantile sketch (MRL/KLL-family ladder with a
  * deterministic compaction offset — no randomness, so a run is exactly
  * reproducible).
  *
  * State is a level ladder: level i holds ≤ k values each representing
  * 2^i inputs (weight). Inserts append to level 0; a full level sorts
  * and keeps every second value (offset 0), promoting the survivors to
  * level i+1 — classic b-ary compaction with b=2. Merge concatenates
  * level-wise with the same overflow rule, so partial aggregates combine
  * associatively enough for Spark's map-side partial + final merge
  * (compaction makes the ESTIMATE arrival-order dependent; the error
  * bound below holds for every order).
  *
  * Rank semantics: quantile p = the value at rank ceil(p·N) of the
  * sorted multiset (1-indexed) — percentile_disc's definition. The rank
  * target is computed in INTEGER arithmetic from the rational p =
  * num/den ((num·N + den − 1) / den), so no float boundary can disagree
  * with the oracle's integer form.
  *
  * Exactness regime (the x54/x103 full-probe pattern, structural by
  * construction): with capacity k ≥ N no level ever fills, nothing is
  * ever compacted, the ladder IS the exact multiset, and merge order
  * cannot matter — the declared x261 entry runs in that regime and
  * hash-matches its explicit-rank DuckDB oracle. Production capacities
  * are error-bound-spec'd instead (InvariantsSpec): each compaction at
  * level i perturbs any rank by ≤ 2^i, and a level compacts ≤ N/(k·2^i)
  * times, so the worst-case rank error is ≤ L·N/k for L active levels —
  * the spec asserts the measured error against that bound.
  *
  * Scale: the shuffle carries one ladder (≤ k·L longs) per group instead
  * of the group's rows; map-side partials do the heavy folding. This is
  * the mergeable-summary shape a 1000-executor rollup needs.
  */
class QuantileSketch(k: Int, probs: Seq[(Int, Int)])
    extends Aggregator[Long, Array[Array[Long]], Seq[Long]] {
  require(k >= 2 && k % 2 == 0, "capacity must be even and >= 2")
  require(probs.nonEmpty && probs.forall { case (n, d) => n >= 0 && n <= d && d > 0 })

  // level layout: [n, v0, v1, ...] — n live values, then capacity slack.
  // Level 0 grows geometrically to k before its first compaction, so an
  // under-full group never allocates the full capacity.
  private def append(level: Array[Long], v: Long): Array[Long] = {
    val n = level(0).toInt
    val grown =
      if (1 + n < level.length) level
      else {
        val next = new Array[Long](math.min(2 * (level.length - 1), k) + 1)
        System.arraycopy(level, 0, next, 0, level.length)
        next
      }
    grown(1 + n) = v; grown(0) = n + 1L; grown
  }

  /** Sort a full level, keep survivors at even offsets (deterministic
    * offset 0), return them; the level is emptied in place. */
  private def compact(level: Array[Long]): Array[Long] = {
    val n = level(0).toInt
    val vals = java.util.Arrays.copyOfRange(level, 1, 1 + n)
    java.util.Arrays.sort(vals)
    val out = new Array[Long](n / 2)
    var i = 0
    while (i < out.length) { out(i) = vals(2 * i); i += 1 }
    level(0) = 0L
    out
  }

  private def pushAt(state: Array[Array[Long]], lvl: Int, v: Long): Array[Array[Long]] = {
    var st = state
    if (lvl >= st.length) {
      val next = new Array[Array[Long]](lvl + 1)
      System.arraycopy(st, 0, next, 0, st.length)
      var i = st.length
      while (i < next.length) { next(i) = new Array[Long](9); i += 1 }
      st = next
    }
    st(lvl) = append(st(lvl), v)
    if (st(lvl)(0).toInt >= k) {
      val survivors = compact(st(lvl))
      var i = 0
      while (i < survivors.length) { st = pushAt(st, lvl + 1, survivors(i)); i += 1 }
    }
    st
  }

  def zero: Array[Array[Long]] = Array(new Array[Long](9))

  def reduce(state: Array[Array[Long]], v: Long): Array[Array[Long]] =
    pushAt(state, 0, v)

  def merge(x: Array[Array[Long]], y: Array[Array[Long]]): Array[Array[Long]] = {
    var st = x
    var lvl = 0
    while (lvl < y.length) {
      val n = y(lvl)(0).toInt
      var i = 0
      while (i < n) { st = pushAt(st, lvl, y(lvl)(1 + i)); i += 1 }
      lvl += 1
    }
    st
  }

  def finish(state: Array[Array[Long]]): Seq[Long] = {
    // weighted multiset: (value, 2^level) pairs, sorted by value
    val pairs = state.iterator.zipWithIndex.flatMap { case (level, lvl) =>
      val n = level(0).toInt
      (0 until n).iterator.map(i => (level(1 + i), 1L << lvl))
    }.toArray.sortBy(_._1)
    val total = pairs.iterator.map(_._2).sum
    if (total == 0L) return probs.map(_ => 0L)
    probs.map { case (num, den) =>
      val target = (num.toLong * total + den - 1) / den // ceil(p*N), exact
      var cum = 0L; var i = 0; var out = pairs.last._1
      while (i < pairs.length) {
        cum += pairs(i)._2
        if (cum >= target) { out = pairs(i)._1; i = pairs.length }
        else i += 1
      }
      out
    }
  }

  def bufferEncoder: Encoder[Array[Array[Long]]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Array[Long]]]()
  def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
