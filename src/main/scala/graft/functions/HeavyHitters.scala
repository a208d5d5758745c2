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
  * Exactness gate (x261's pattern, structural): with k ≥ the number of
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

  def zero: Map[Long, Long] = Map.empty

  def reduce(m: Map[Long, Long], item: Long): Map[Long, Long] =
    m.get(item) match {
      case Some(c) => m.updated(item, c + 1)
      case None if m.size < k => m.updated(item, 1L)
      case None => // decrement-all, drop zeros; the insert is absorbed
        m.iterator.collect { case (i, c) if c > 1 => i -> (c - 1) }.toMap
    }

  def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] = {
    val sum = y.foldLeft(x) { case (m, (i, c)) =>
      m.updated(i, m.getOrElse(i, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest counter from everyone
      val cut = sum.valuesIterator.toArray.sortBy(-_).apply(k)
      sum.iterator.collect { case (i, c) if c > cut => i -> (c - cut) }.toMap
    }
  }

  /** Top items by (count desc, item asc) — deterministic tie-break. */
  def finish(m: Map[Long, Long]): Seq[(Long, Long)] =
    m.toSeq.sortBy { case (i, c) => (-c, i) }

  def bufferEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
  def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}
