package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming mini-batch k-means — the ingest-time twin of the x340/x341
  * batch training pair (the §2.9 streaming set's clustering entry, next
  * to NearDupStream's ingest-time dedup). A `foreachBatch` sink folds
  * each arriving micro-batch of embeddings into driver-held cluster
  * state and emits a per-batch drift row — the "is today's crawl
  * drifting off the corpus clusters" monitor.
  *
  * Update rule — the batched cumulative-mean variant of the mini-batch
  * rule (Sculley, "Web-Scale K-Means Clustering", WWW 2010): each point
  * is counted exactly once, under the centroid set current when its
  * batch ARRIVED, and every centroid is the integer mean of all points
  * ever assigned to it:
  *
  *   assign(batch_t, c_{t-1}) → fold (Σ shifted vals, n) per (cid, dim)
  *   c_t(cid, dim) = cumSum(cid, dim) div cumN(cid) − 10000
  *
  * Arithmetic is x333/x340's quantized-integer discipline verbatim, so
  * the fold is exactly reproducible: replaying the same ordered batches
  * through a fresh instance lands bit-identical centroids
  * (KMeansStreamSpec pins stream-replay ≡ direct sequential fold).
  *
  * Scale shape: the distributed work per batch is one broadcast join
  * (centroids are k × dims rows) + two hash aggs over the BATCH — cost
  * O(batch), never O(corpus). Driver state is the cumulative (cid, dim)
  * sum/count table: k × dims longs — the same index-sized ceiling as
  * the batch loop's driver-held centroids; nothing grows with stream
  * length. Seeds = the k lowest DISTINCT vec_ids of the FIRST
  * non-empty batch (the batch pair's lowest-id convention),
  * deterministic on an ordered replay; the seed read is
  * orderBy(vec_id).limit(k) — O(k) ids to the driver, never the
  * batch's id set (review r16: the old full-batch id collect was the
  * one corpus-shaped collect left in src/main).
  */
final class MiniBatchKMeans(val k: Int = 8, val dims: Int = 64) {

  /** Per-batch drift row: points folded, exact BIGINT inertia of the
    * batch under the pre-update centroids, and how many centroid
    * components the update moved (the drift signal). */
  final case class BatchStat(batchId: Long, n: Long, inertia: Long,
                             movedComponents: Long)

  private var cumSum = scala.collection.mutable.Map.empty[(Long, Int), Long]
  private var cumN = scala.collection.mutable.Map.empty[Long, Long]
  private var cent: Seq[(Long, Int, Long)] = Nil
  private val statsB = Seq.newBuilder[BatchStat]

  def centroids: Seq[(Long, Int, Long)] = cent
  def stats: Seq[BatchStat] = statsB.result()

  /** Pre-seed from a persisted centroid table
    * ([[graft.llm.IndexStore.loadCentroids]] / [[graft.llm.KMeans.Train.centroids]])
    * instead of the first batch's k lowest ids — the
    * train-once/serve-many shape (VERDICT r15 #5). Must precede the
    * first folded batch; with seeds present EVERY row of every batch
    * folds (no rows are consumed as seeds). Cumulative state still
    * starts empty, so a pre-seeded centroid is retained at its loaded
    * position until first fed and then becomes the mean of its fed
    * points — exactly the first-batch-seeding semantics for the seed
    * rows themselves (IndexStoreSpec pins the equivalence). */
  def seed(centroids: Seq[(Long, Int, Long)]): Unit = {
    require(cent.isEmpty && cumSum.isEmpty && cumN.isEmpty,
      "seed() must precede the first folded batch")
    val s = centroids.sortBy(c => (c._1, c._2))
    require(s.size == k * dims && s.map(_._1).distinct.size == k,
      s"seed table must carry k×dims = ${k * dims} components over $k distinct cids, got ${s.size}")
    cent = s
  }

  /** Fold one micro-batch; returns its drift row. An EMPTY batch —
    * including an empty FIRST batch, which a file/kafka source can
    * trigger before data lands — is a recorded no-op (n = 0, state and
    * seeds untouched; seeding waits for the first non-empty batch).
    * The first NON-EMPTY batch must carry ≥ k vectors to seed.
    * Thread-safe under Structured Streaming's serial foreachBatch
    * contract (one invocation at a time). */
  def applyBatch(spark: SparkSession, batch: DataFrame, batchId: Long): BatchStat = {
    import spark.implicits._
    val seeding = cent.isEmpty
    // one BOUNDED driver read: the k lowest distinct vec_ids double as
    // the empty-batch gate and (when seeding) the seed choice —
    // orderBy + limit(k), so the driver sees O(k) ids whatever the
    // batch size (a production first batch can be millions of rows;
    // the pre-r16 full-id collect was corpus-shaped). distinct:
    // duplicate vec_ids within a batch must not count twice toward the
    // "≥ k vectors to seed" requirement (ADVICE r15 #1).
    val seedIds: Array[Long] =
      if (seeding)
        batch.select("vec_id").distinct().orderBy("vec_id").limit(k)
          .as[Long].collect()
      else null
    if (seeding && seedIds.isEmpty) {
      val stat = BatchStat(batchId, 0L, 0L, 0L)
      statsB += stat
      return stat
    }
    val q = graft.llm.KMeans.quantizedLong(batch, dims)
    val pts =
      if (!seeding) q
      else {
        // first non-empty batch: the k lowest distinct vec_ids seed
        // the centroids, the rest of the batch are the first folded
        // points
        require(seedIds.length == k,
          s"first non-empty batch carries ${seedIds.length} < $k distinct vectors — cannot seed")
        cent = q.where(col("vec_id").isInCollection(seedIds.toSeq))
          .select(col("vec_id"), col("dim"), col("val"))
          .as[(Long, Int, Long)].collect().sortBy(c => (c._1, c._2)).toSeq
        // a duplicate seed ROW (same vec_id twice in one batch) would
        // silently double a centroid's components — vec_id is a key by
        // contract, assert it where the violation would corrupt state
        require(cent.size == k * dims,
          s"seed rows yield ${cent.size} centroid components, expected ${k * dims} — duplicate seed vec_ids in the first batch?")
        q.where(!col("vec_id").isInCollection(seedIds.toSeq))
      }
    // assignment persisted for the batch: the fold and the stat read
    // both consume it, and without the pin the whole quantize +
    // broadcast-join + agg lineage would execute twice per batch
    // (review r15 — the drain was paying ~2× per micro-batch)
    val assign = graft.llm.KMeans.assignTo(spark, pts, cent).persist()
    try {
      val folds = pts.join(assign.select("vec_id", "cid"), "vec_id")
        .groupBy("cid", "dim")
        .agg(sum(col("val") + lit(10000L)).as("s"), count(lit(1)).as("n"))
        .as[(Long, Int, Long, Long)].collect()
      val agg = assign.agg(count(lit(1)), coalesce(sum("dist"), lit(0L)))
        .as[(Long, Long)].head()
      folds.foreach { case (cid, dim, s, _) =>
        cumSum.updateWith((cid, dim))(prev => Some(prev.getOrElse(0L) + s))
      }
      folds.groupBy(_._1).foreach { case (cid, rows) =>
        cumN.updateWith(cid)(prev => Some(prev.getOrElse(0L) + rows.head._4))
      }
      val next = cent.map { case (cid, dim, old) =>
        val n = cumN.getOrElse(cid, 0L)
        val v = if (n == 0L) old
                else Math.floorDiv(cumSum.getOrElse((cid, dim), 0L), n) - 10000L
        (cid, dim, v)
      }
      val moved = next.zip(cent).count { case (a, b) => a._3 != b._3 }
      cent = next
      val stat = BatchStat(batchId, agg._1, agg._2, moved.toLong)
      statsB += stat
      stat
    } finally assign.unpersist()
  }
}

object KMeansStream {

  /** Drain a bounded embedding stream through a fresh model; returns it
    * with all batches folded. The caller's `writeStream.foreachBatch`
    * shape, packaged for the bench/spec replays. `seeds` pre-seeds the
    * model from a persisted centroid table (IndexStore) — the
    * serve-many shape; None keeps first-batch seeding. */
  def drain(spark: SparkSession, vecs: DataFrame, k: Int = 8,
            dims: Int = 64,
            seeds: Option[Seq[(Long, Int, Long)]] = None): MiniBatchKMeans = {
    val model = new MiniBatchKMeans(k, dims)
    seeds.foreach(model.seed)
    val q = vecs.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        model.applyBatch(spark, b, id); ()
      }.start()
    q.awaitTermination()
    model
  }
}
