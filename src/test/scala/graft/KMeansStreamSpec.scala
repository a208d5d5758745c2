package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming mini-batch k-means (§2.9 set): the stream replay must fold
  * to EXACTLY the state a direct sequential fold of the same ordered
  * batches produces — integer arithmetic leaves no tolerance. */
class KMeansStreamSpec extends SparkSpec {

  private def writeReplay(df: DataFrame, dir: String, n: Int): Unit = {
    val d = new java.io.File(dir)
    if (d.exists()) new scala.reflect.io.Directory(d).deleteRecursively()
    d.mkdirs()
    val t0 = System.currentTimeMillis()
    (0 until n).foreach { i =>
      val tmp = s"$dir-tmp$i"
      df.where(pmod(col("vec_id"), lit(n.toLong)) === i)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dest = Paths.get(dir, s"b$i.parquet")
      Files.copy(part.toPath, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(t0 + i * 10000L))
      new scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }

  test("stream replay folds to the exact state of a direct sequential fold") {
    val vecs = Catalog.load(spark, sf0001, "embeddings")
      .select("vec_id", "embedding")
    val dir = "/tmp/graft-kmeans-stream-spec"
    writeReplay(vecs, dir, 4)

    val streamed = streaming.KMeansStream.drain(spark,
      spark.readStream.schema(vecs.schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(dir))

    val direct = new streaming.MiniBatchKMeans(8, 64)
    (0 until 4).foreach { i =>
      direct.applyBatch(spark,
        vecs.where(pmod(col("vec_id"), lit(4L)) === i), i.toLong)
    }

    assert(streamed.centroids == direct.centroids,
      "stream replay and direct fold must land bit-identical centroids")
    assert(streamed.stats.map(s => (s.n, s.inertia, s.movedComponents)) ==
      direct.stats.map(s => (s.n, s.inertia, s.movedComponents)))
    // every non-seed vector folded exactly once
    val total = vecs.count() - 8
    assert(streamed.stats.map(_.n).sum == total)
    // driver state is index-sized: k × dims centroid components
    assert(streamed.centroids.size == 8 * 64)
  }

  // The empty-cluster divergence EXECUTED on the streaming side
  // (VERDICT r15 #3, the twin of QueriesSpec's drop-out fixture): a
  // centroid no batch ever feeds must be RETAINED at its last position
  // (a stream cannot re-derive "the SQL would have dropped it" without
  // corpus history) — and retained means LIVE: a later batch's point
  // can still be captured by it, exactly what the batch twin's drop-out
  // forbids. Same 1-D geometry as the batch fixture.
  test("an unfed centroid is retained at its last position and stays live (divergence by design)") {
    import spark.implicits._
    def batch(rows: Seq[(Long, Array[Float])]): DataFrame =
      rows.toDF("vec_id", "embedding")
    val m = new streaming.MiniBatchKMeans(4, 1)
    // batch 0: seeds c0=0, c1=1, c2=40, c3=60; folds 35×3 → c2, 0.4 → c0
    m.applyBatch(spark, batch(
      Seq(0L -> Array(0f), 1L -> Array(1f), 2L -> Array(40f), 3L -> Array(60f)) ++
        (4L to 6L).map(i => i -> Array(35f)) :+ (7L -> Array(0.4f))), 0L)
    assert(m.centroids.contains((3L, 1, 600000L)),
      s"unfed c3 must sit at its seed after batch 0: ${m.centroids}")
    // batch 1: more c2 mass; c3 still unfed → still exactly at the seed
    m.applyBatch(spark, batch(Seq(8L -> Array(36f), 9L -> Array(36f))), 1L)
    assert(m.centroids.contains((3L, 1, 600000L)),
      s"two unfed batches later c3 must be bit-unchanged: ${m.centroids}")
    assert(m.centroids.contains((2L, 1, 354000L)),
      "c2 = cumulative mean(35,35,35,36,36) = 35.4 exactly")
    // batch 2: a point at 59 — nearest is the RETAINED c3 (1² vs c2's
    // 23.6²); under batch-twin drop-out semantics c3 would not exist to
    // capture it. The capture moves c3 to its one point's position.
    val s2 = m.applyBatch(spark, batch(Seq(10L -> Array(59f))), 2L)
    assert(s2.n == 1L)
    assert(m.centroids.contains((3L, 1, 590000L)),
      s"the retained centroid must capture and move: ${m.centroids}")
  }

  test("an empty first batch is a recorded no-op; seeding waits for data") {
    val vecs = Catalog.load(spark, sf0001, "embeddings")
      .select("vec_id", "embedding")
    val withEmpty = new streaming.MiniBatchKMeans(8, 64)
    withEmpty.applyBatch(spark, vecs.where(org.apache.spark.sql.functions.lit(false)), 0L)
    assert(withEmpty.centroids.isEmpty, "an empty batch must not seed")
    assert(withEmpty.stats == Seq(withEmpty.BatchStat(0L, 0L, 0L, 0L)))
    withEmpty.applyBatch(spark, vecs, 1L)
    val direct = new streaming.MiniBatchKMeans(8, 64)
    direct.applyBatch(spark, vecs, 0L)
    assert(withEmpty.centroids == direct.centroids,
      "a leading empty batch must not change where the fold lands")
  }
}
