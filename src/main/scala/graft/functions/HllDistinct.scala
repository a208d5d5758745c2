package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable dual-mode distinct-count sketch (the x56 promotion,
  * VERDICT r12 #4): SPARSE-EXACT while a group's distinct values fit in
  * k entries, degrading to classic HyperLogLog registers (Flajolet et
  * al. 2007, the same sparse→dense promotion HLL++ describes in Heule
  * et al. 2013) the moment any partial state outgrows k.
  *
  * State (one [[Map]]-encoded buffer, the [[HeavyHitters.MgBuf]] in-place
  * technique):
  *  - sparse: value → 1 per distinct input value, ≤ k entries. The set
  *    IS the answer: size = exact distinct count.
  *  - dense: a mode marker ([[HllDistinct.DenseMarker]] → 0, a pair no
  *    sparse state can contain since sparse entries all carry 1) plus
  *    register-index → max-rank entries, ≤ 2^p of them. Rank = leading-
  *    zero count of the post-index hash bits + 1 — order- and merge-
  *    invariant by max.
  *
  * Exactness regime is STRUCTURAL (the x261/x266/x301 pattern): a
  * densify fires only when some partial union holds > k distinct
  * values, which implies the group's true distinct count > k; and while
  * the true count ≤ k no reduce/merge path can overflow. So
  * `exact` = 1 ⟺ distinct ≤ k — the flag a plain COUNT(DISTINCT)
  * oracle computes from its own result, making the contract entry
  * hash-checkable at every contract SF. Over capacity the published
  * HLL bound applies: σ ≈ 1.04/√m relative standard error (m = 2^p),
  * with linear counting below 2.5·m (InvariantsSpec asserts a 5σ
  * envelope and merge-order invariance on a >k synthetic corpus).
  *
  * Scale shape: the shuffle carries ≤ max(k, 2^p + 1) longs per group
  * instead of the group's rows — the same fleet-rollup contract as the
  * rest of the mergeable-summary family. At 100 TB a group with
  * billions of distinct users costs 2^p registers, never an exact
  * expand. */
class HllDistinct(k: Int, p: Int)
    extends Aggregator[Long, Map[Long, Long], (Long, Long)] {
  require(k >= 1, s"sparse capacity k must be >= 1, got $k")
  require(p >= 4 && p <= 18, s"register precision p must be in 4..18, got $p")
  import HeavyHitters.MgBuf
  import HllDistinct.{DenseMarker, mix}

  private val m = 1 << p
  // α_m for m >= 128 (p >= 7); the classic small-m constants for below
  private val alpha =
    if (m >= 128) 0.7213 / (1.0 + 1.079 / m)
    else if (m == 64) 0.709
    else if (m == 32) 0.697
    else 0.673

  private def buf(x: Map[Long, Long]): MgBuf = x match {
    case b: MgBuf => b
    case other =>
      val u = scala.collection.mutable.LongMap.empty[Long]
      other.foreach { case (i, c) => u.update(i, c) }
      new MgBuf(u)
  }

  private def isDense(u: scala.collection.mutable.LongMap[Long]): Boolean =
    u.getOrElse(DenseMarker, 1L) == 0L

  private def updateReg(u: scala.collection.mutable.LongMap[Long],
                        value: Long): Unit = {
    val h = mix(value)
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    val rank =
      if (w == 0L) 64 - p + 1
      else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (rank > u.getOrElse(idx.toLong, 0L)) u.update(idx.toLong, rank.toLong)
  }

  private def densify(u: scala.collection.mutable.LongMap[Long]): Unit = {
    val vals = u.keysIterator.toArray
    u.clear()
    u.update(DenseMarker, 0L)
    var i = 0
    while (i < vals.length) { updateReg(u, vals(i)); i += 1 }
  }

  def zero: Map[Long, Long] = new MgBuf(scala.collection.mutable.LongMap.empty[Long])

  def reduce(x: Map[Long, Long], value: Long): Map[Long, Long] = {
    val b = buf(x); val u = b.u
    if (isDense(u)) updateReg(u, value)
    else {
      u.update(value, 1L)
      if (u.size > k) densify(u)
    }
    b
  }

  def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] = {
    val b = buf(x); val u = b.u
    val yb = buf(y).u
    (isDense(u), isDense(yb)) match {
      case (false, false) =>
        yb.foreachKey(v => u.update(v, 1L))
        if (u.size > k) densify(u)
      case _ =>
        if (!isDense(u)) densify(u)
        if (isDense(yb)) {
          yb.foreach { case (idx, r) =>
            if (idx != DenseMarker && r > u.getOrElse(idx, 0L)) u.update(idx, r)
          }
        } else yb.foreachKey(v => updateReg(u, v))
    }
    b
  }

  /** (count, exact): exact distinct count + flag 1 in the sparse regime;
    * the HLL estimate (linear counting below 2.5·m with empty registers)
    * + flag 0 in the dense regime. */
  def finish(x: Map[Long, Long]): (Long, Long) = {
    val u = buf(x).u
    if (!isDense(u)) (u.size.toLong, 1L)
    else {
      var denom = 0.0
      var nonZero = 0
      u.foreach { case (idx, r) =>
        if (idx != DenseMarker) {
          denom += java.lang.Math.pow(2.0, -r.toDouble)
          nonZero += 1
        }
      }
      val zeros = m - nonZero
      denom += zeros.toDouble // 2^0 per empty register
      val raw = alpha * m.toDouble * m.toDouble / denom
      val est =
        if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
        else raw
      (math.round(est), 0L)
    }
  }

  def bufferEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
  def outputEncoder: Encoder[(Long, Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Long)]()
}

object HllDistinct {
  /** Dense-mode marker key: pairs with value 0, which no sparse entry
    * carries (sparse values are all 1) and no register entry carries
    * (ranks are ≥ 1) — so mode survives the encoder round-trip even if
    * a real input value equals the marker key. */
  private[functions] val DenseMarker: Long = Long.MinValue

  /** SplitMix64 finalizer (Steele et al. 2014, public domain reference
    * construction) — a full-avalanche 64-bit mix so sequential ids
    * spread uniformly over registers and rank bits. */
  private[functions] def mix(v: Long): Long = {
    var z = v + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
