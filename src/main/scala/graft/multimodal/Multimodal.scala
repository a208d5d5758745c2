package graft.multimodal

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns as opaque binary + typed
  * metadata, with batched decode / feature-extract / resize / frame-sample
  * plumbing.
  *
  * IMAGE decode is REAL: [[decodeImage]] reads PNG/BMP/GIF/JPEG through
  * javax.imageio (pure JVM, no native codecs needed) and extracts true
  * dimensions plus a content-derived 16-d grid-luminance embedding.
  * Audio/video and undecodable image bytes fall back to `decodeStub`,
  * which produces deterministic pseudo-features derived from the bytes
  * (this container has no audio/video codecs; the stub keeps the batched
  * execution path exercised end-to-end — swap it for the JNI/codec call).
  *
  * Scale notes:
  *  - Blobs never shuffle after load: features are extracted in the scan's
  *    partitions (or after an explicit repartition by id when upstream
  *    produced skewed/few splits), and only small feature rows move on.
  *  - Batched iterator: the decode sees `batchSize` rows at a time (the
  *    batch shape a vectorized/Pandas-style UDF would get), holding at
  *    most one batch of blobs in memory per task.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                      meta: Map[String, String])

  case class MediaFeatures(media_id: Long, kind: String, size_bytes: Long,
                           content_hash: Long, width: Int, height: Int,
                           embedding: Array[Float])

  // in-memory stream cache: never spill decode temp files on executors
  javax.imageio.ImageIO.setUseCache(false)

  /** Real pure-JVM image decode (PNG/BMP/GIF/JPEG via the standard
    * javax.imageio plugins): true width/height plus a 16-d unit-norm
    * embedding of 4×4 grid mean luminances — an actual content feature
    * the ANN tier consumes (near-identical images → cosine ≈ 1).
    * Returns None when the bytes aren't a decodable image; the caller
    * falls back to [[decodeStub]]. Per-pixel getRGB is fine at the
    * batch sizes the pipeline feeds; a production build would read the
    * raster buffer directly. */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        val feat = new Array[Float](16)
        val counts = new Array[Int](16)
        var y = 0
        while (y < h) {
          val cy = math.min(3, y * 4 / h) * 4
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = 0.299f * ((rgb >> 16) & 255) +
              0.587f * ((rgb >> 8) & 255) + 0.114f * (rgb & 255)
            val cell = cy + math.min(3, x * 4 / w)
            feat(cell) += lum; counts(cell) += 1
            x += 1
          }
          y += 1
        }
        var i = 0
        while (i < 16) { if (counts(i) > 0) feat(i) /= counts(i); i += 1 }
        val norm = math.sqrt(feat.map(v => v.toDouble * v).sum).toFloat max 1e-9f
        Some((w, h, feat.map(_ / norm)))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic fake decode — the fallback for kinds/bytes no
    * installed codec reads (audio/video in this container). */
  private[graft] def decodeStub(bytes: Array[Byte]): (Int, Int, Array[Float]) = {
    // stand-in for image decode: derive stable pseudo-dimensions and a
    // unit-norm pseudo-embedding from the content
    val h = bytes.foldLeft(1125899906842597L)((acc, b) => 31 * acc + b)
    val width = 64 + math.floorMod(h, 512).toInt
    val height = 64 + math.floorMod(h >> 9, 512).toInt
    val raw = Array.tabulate(16)(i =>
      math.floorMod(h >> (i * 3), 1024).toFloat / 1024f - 0.5f)
    val norm = math.sqrt(raw.map(x => x * x).sum).toFloat max 1e-9f
    (width, height, raw.map(_ / norm))
  }

  private def contentHash(bytes: Array[Byte]): Long =
    bytes.foldLeft(-7046029254386353131L)((acc, b) => acc * 1099511628211L ^ b)

  /** Batched feature extraction. One narrow pass; only feature rows (no
    * blobs) leave the stage. */
  def decodeFeatures(media: Dataset[MediaRow], batchSize: Int = 32): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // audio/video would decode the whole batch in one native call;
        // images go through the real javax.imageio path per item
        batch.map { m =>
          val (w, h, emb) =
            (if (m.kind == "image") decodeImage(m.bytes) else None)
              .getOrElse(decodeStub(m.bytes))
          MediaFeatures(m.media_id, m.kind, m.bytes.length.toLong,
            contentHash(m.bytes), w, h, emb)
        }
      }
    }
  }

  /** Resize metadata transform (stub does the aspect-preserving math the
    * real resampler would follow). */
  def resize(features: Dataset[MediaFeatures], maxDim: Int): Dataset[MediaFeatures] = {
    import features.sparkSession.implicits._
    features.map { f =>
      val scale = math.min(1.0, maxDim.toDouble / math.max(f.width, f.height))
      f.copy(width = math.max(1, (f.width * scale).toInt),
        height = math.max(1, (f.height * scale).toInt))
    }
  }

  case class Frame(media_id: Long, frame_no: Int, offset_bytes: Long,
                   frame_hash: Long)

  /** Frame sampling for video-kind rows: every `stride`-th fixed-size
    * chunk stands in for a decoded frame. */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 256,
                   stride: Int = 4): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val nFrames = math.max(1, m.bytes.length / frameBytes)
      (0 until nFrames by stride).map { i =>
        val off = i.toLong * frameBytes
        val end = math.min(m.bytes.length, (i + 1) * frameBytes)
        Frame(m.media_id, i, off,
          contentHash(java.util.Arrays.copyOfRange(m.bytes, off.toInt, end)))
      }
    }
  }

  /** Demo corpus: the documents table's text bytes as stand-in blobs
    * (deterministic, derived from driver-provided data). */
  def demoMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Catalog.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .map { case (id, text, lang) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, kind, text.getBytes("UTF-8"), Map("lang" -> lang))
      }
  }
}
