package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** The decode is a stub; what these tests pin down is the Spark plumbing:
  * schema, batch independence, partitioning invariance, determinism. */
class MultimodalSpec extends SparkSpec {

  lazy val media = Multimodal.demoMedia(spark, sf0001)

  test("feature extraction covers every row with the right schema") {
    val f = Multimodal.decodeFeatures(media)
    assert(f.count() == 500)
    assert(f.schema.fieldNames.toSeq ==
      Seq("media_id", "kind", "size_bytes", "content_hash", "width", "height", "embedding"))
    val r = f.orderBy("media_id").head()
    assert(r.embedding.length == 16)
    assert(r.size_bytes > 0)
  }

  test("results are invariant to partitioning and batch size") {
    def canon(f: Multimodal.MediaFeatures) =
      (f.media_id, f.kind, f.size_bytes, f.content_hash, f.width, f.height,
        f.embedding.toSeq)
    val a = Multimodal.decodeFeatures(media, batchSize = 32)
      .orderBy("media_id").collect().map(canon).toSeq
    val b = Multimodal.decodeFeatures(media.repartition(13), batchSize = 5)
      .orderBy("media_id").collect().map(canon).toSeq
    assert(a == b, "batched decode must not depend on physical layout")
  }

  test("identical bytes give identical content hash and embedding") {
    val f = Multimodal.decodeFeatures(media)
    val dup = Multimodal.decodeFeatures(
      media.map(m => m.copy(media_id = m.media_id + 100000))(
        org.apache.spark.sql.Encoders.product[Multimodal.MediaRow]))
    val joined = f.as("a").join(dup.as("b"),
      col("a.media_id") === col("b.media_id") - 100000)
    val mismatched = joined.where(
      col("a.content_hash") =!= col("b.content_hash") ||
      col("a.width") =!= col("b.width")).count()
    assert(mismatched == 0)
  }

  test("resize preserves aspect ratio bound") {
    val f = Multimodal.resize(Multimodal.decodeFeatures(media), maxDim = 128)
    val over = f.filter(x => x.width > 128 || x.height > 128).count()
    assert(over == 0)
  }

  test("extracted embeddings flow into similarity search (multimodal -> ANN)") {
    import graft.llm.Ann
    // features from the blob pipeline become a standard (vec_id, embedding)
    // table — the contract that makes every ANN tier (brute/LSH/IVF)
    // apply unchanged to multimodal content
    val vecs = Multimodal.decodeFeatures(media)
      .select(col("media_id").as("vec_id"), col("embedding"))
    val q = vecs.where(col("vec_id") === 0)
      .head().getSeq[Float](1).map(_.toDouble).toSeq
    val exact = Ann.bruteForceTopK(vecs.where(col("vec_id") =!= 0), q, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(exact.length == 5)
    // LSH candidates at radius 2 should recover most of the exact top-5
    val approx = Ann.lshTopK(vecs.where(col("vec_id") =!= 0), q,
      k = 5, numPlanes = 6, probeRadius = 2)
      .collect().map(_.getLong(0)).toSet
    assert(approx.intersect(exact.toSet).size >= 3,
      s"LSH recall too low: exact=$exact approx=$approx")
  }

  test("frame sampling yields every stride-th frame for video rows") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 4)
    val videos = media.filter(_.kind == "video").count()
    assert(frames.count() >= videos, "at least one frame per video")
    val bad = frames.filter(fr => fr.frame_no % 4 != 0).count()
    assert(bad == 0)
  }
}
