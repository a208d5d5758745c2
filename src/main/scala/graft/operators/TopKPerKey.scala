package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-key top-k as a map-side-combining AGGREGATION instead of a
  * `row_number().over(Window.partitionBy(key))` cascade — the serving
  * tiers' hot-path shuffle lever (r17).
  *
  * The window form shuffles EVERY scored row to its key's partition and
  * sorts there: at the ANN 1 M tier that is |queries| × |probed slice|
  * ≈ 125 M narrow rows per batch through one exchange. This form keeps
  * a bounded ≤k sorted buffer per (map partition, key) — partial
  * aggregation combines map-side, so the exchange carries one ≤k
  * buffer per key per map partition (thousands of rows, not millions),
  * and no sort ever sees the full scored set. Same selection, same
  * order: candidates are ranked by (sim DESC, id ASC) with
  * java.lang.Double.compare semantics — NaN ranks ABOVE every finite
  * sim, exactly like Spark's descending double sort, so swapping this
  * in for the window form cannot move an answer (AnnServeStreamSpec's
  * full-probe ≡ brute-force and pruned ≡ inline-operator parities pin
  * it).
  *
  * A `payload` column rides along uncompared (the LUT tier carries the
  * candidate's IVF list id through to the DPP-pruned rerank join);
  * pass `lit(0L)` when unused.
  *
  * NULL sims are dropped before the aggregation (the window form ranks
  * them past every non-null row, so they can only appear in a top-k
  * when a key has fewer than k non-null rows — then this form returns
  * the non-null rows only; callers' layouts never produce null sims).
  */
object TopKPerKey {

  /** Bounded sorted-buffer top-k aggregator: buffer is always sorted
    * best-first and capped at k; reduce is O(1) reject below the
    * current k-th, O(k) arraycopy on accept; merge is a k-bounded
    * sorted merge. Input rows are (id, payload, sim). */
  class TopKAgg(k: Int)
      extends Aggregator[(Long, Long, Double), Array[(Long, Long, Double)],
        Array[(Long, Long, Double)]] {
    require(k >= 1, s"k must be >= 1, got $k")

    // strict total order: sim DESC (NaN greatest, Double.compare), id
    // ASC; payload never participates (ids are unique per key in every
    // caller, so the order is total without it)
    private def better(a: (Long, Long, Double), b: (Long, Long, Double)): Boolean = {
      val c = java.lang.Double.compare(a._3, b._3)
      c > 0 || (c == 0 && a._1 < b._1)
    }

    override def zero: Array[(Long, Long, Double)] = Array.empty

    override def reduce(buf: Array[(Long, Long, Double)],
                        e: (Long, Long, Double)): Array[(Long, Long, Double)] = {
      val n = buf.length
      if (n == k && !better(e, buf(n - 1))) return buf
      // insertion position by binary search on the strict order
      var lo = 0; var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (better(buf(mid), e)) lo = mid + 1 else hi = mid
      }
      val outLen = math.min(n + 1, k)
      val out = new Array[(Long, Long, Double)](outLen)
      System.arraycopy(buf, 0, out, 0, lo)
      out(lo) = e
      if (lo < outLen - 1) System.arraycopy(buf, lo, out, lo + 1, outLen - 1 - lo)
      out
    }

    override def merge(a: Array[(Long, Long, Double)],
                       b: Array[(Long, Long, Double)]): Array[(Long, Long, Double)] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val out = new Array[(Long, Long, Double)](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length) {
        if (i < a.length && (j >= b.length || better(a(i), b(j)))) {
          out(o) = a(i); i += 1
        } else { out(o) = b(j); j += 1 }
        o += 1
      }
      out
    }

    override def finish(r: Array[(Long, Long, Double)]): Array[(Long, Long, Double)] = r

    override def bufferEncoder =
      org.apache.spark.sql.Encoders.kryo[Array[(Long, Long, Double)]]
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Long, Double)]]()
  }

  /** (key, rnk, id, payload, sim) — top `k` rows per `key` by
    * (sim DESC, id ASC), selection and order identical to
    * `row_number().over(Window.partitionBy(key).orderBy(desc(sim), id))
    * <= k`, executed as a partial-combining aggregation. */
  def topK(df: DataFrame, key: Column, id: Column, payload: Column,
           sim: Column, k: Int, keyName: String = "key"): DataFrame = {
    val agg = udaf(new TopKAgg(k))
    df.where(sim.isNotNull)
      .groupBy(key.as(keyName))
      .agg(agg(id, payload, sim).as("top"))
      .select(col(keyName), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col(keyName), (col("pos") + 1).cast("long").as("rnk"),
        col("e._1").as("id"), col("e._2").as("payload"), col("e._3").as("sim"))
  }
}
