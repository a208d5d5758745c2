package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries frequent-items summary (the deterministic
  * heavy-hitters sketch; Misra & Gries 1982, mergeability per Agarwal
  * et al., "Mergeable Summaries", PODS 2012).
  *
  * State: ≤ k (item → counter) entries. Insert: bump an existing
  * counter, else claim a free slot, else decrement ALL counters by one
  * and drop zeros (the absorbed insert). Merge: sum counters item-wise;
  * if more than k survive, subtract the (k+1)-th largest counter from
  * every entry and drop the non-positives — the standard merge that
  * preserves the MG guarantee. Both paths give the classic bounds:
  * every stored counter undercounts its item's true frequency by at
  * most (N − M)/(k+1) (N inputs, M = sum of stored counters), and any
  * item with true count > N/(k+1) is guaranteed present
  * (InvariantsSpec asserts both on adversarial merges).
  *
  * Exactness regime (x261's pattern, structural; dual-mode entry since
  * r10 — operators/Sketches.heavyHittersTop flags `exact` per row
  * instead of asserting): with k ≥ the number of
  * DISTINCT items, no decrement can ever fire — every item holds a
  * slot, counters are exact multiset counts in any arrival/merge order,
  * and the declared x266 entry runs in that regime against a plain
  * GROUP BY oracle. Production capacities trade memory for the ε-bound
  * above; either way the shuffle carries ≤ k pairs per group instead of
  * the group's rows — the same fleet-rollup shape as the TopK and
  * quantile aggregates.
  */
class HeavyHitters(k: Int) extends Aggregator[Long, Map[Long, Long], Seq[(Long, Long)]] {
  require(k >= 1)
  import HeavyHitters.MgBuf

  // ObjectHashAggregate holds the buffer as a live object between rows and
  // only serializes at the shuffle boundary, so reduce/merge mutate a
  // wrapped mutable.LongMap in place (ADVICE r8 #4 — the immutable Map
  // buffer allocated a fresh map per input row; SCALE.md §23 measured it
  // as the x266 soak cost). The encoder surface stays Map[Long, Long]:
  // MgBuf IS an immutable.Map view (serialized via its iterator), and a
  // post-shuffle deserialized plain Map is re-wrapped on first touch.
  private def buf(m: Map[Long, Long]): MgBuf = m match {
    case b: MgBuf => b
    case other =>
      val u = scala.collection.mutable.LongMap.empty[Long]
      other.foreach { case (i, c) => u.update(i, c) }
      new MgBuf(u)
  }

  def zero: Map[Long, Long] = new MgBuf(scala.collection.mutable.LongMap.empty[Long])

  def reduce(m: Map[Long, Long], item: Long): Map[Long, Long] = {
    val b = buf(m); val u = b.u
    val cur = u.getOrElse(item, -1L)
    if (cur >= 0L) u.update(item, cur + 1)
    else if (u.size < k) u.update(item, 1L)
    else { // decrement-all, drop zeros; the insert is absorbed
      val keys = u.keysIterator.toArray
      var j = 0
      while (j < keys.length) {
        val c = u(keys(j))
        if (c <= 1L) u.remove(keys(j)) else u.update(keys(j), c - 1L)
        j += 1
      }
    }
    b
  }

  def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] = {
    val b = buf(x); val u = b.u
    y.foreach { case (i, c) => u.update(i, u.getOrElse(i, 0L) + c) }
    if (u.size > k) {
      // subtract the (k+1)-th largest counter from everyone
      val vals = u.valuesIterator.toArray
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - 1 - k)
      val keys = u.keysIterator.toArray
      var j = 0
      while (j < keys.length) {
        val c = u(keys(j))
        if (c <= cut) u.remove(keys(j)) else u.update(keys(j), c - cut)
        j += 1
      }
    }
    b
  }

  /** Top items by (count desc, item asc) — deterministic tie-break. */
  def finish(m: Map[Long, Long]): Seq[(Long, Long)] =
    m.toSeq.sortBy { case (i, c) => (-c, i) }

  def bufferEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
  def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}

object HeavyHitters {
  /** Immutable-Map facade over an in-place mutable.LongMap: the encoder
    * serializes through `iterator`; the two immutable ops are only there
    * to satisfy the trait (never on the aggregation hot path). */
  private[functions] final class MgBuf(val u: scala.collection.mutable.LongMap[Long])
      extends Map[Long, Long] {
    def get(key: Long): Option[Long] = u.get(key)
    def iterator: Iterator[(Long, Long)] = u.iterator
    def removed(key: Long): Map[Long, Long] = u.toMap.removed(key)
    def updated[V1 >: Long](key: Long, value: V1): Map[Long, V1] =
      u.toMap.updated(key, value)
    override def size: Int = u.size
  }
}
