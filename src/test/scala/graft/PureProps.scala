package graft

import graft.llm.Ann
import graft.multimodal.Multimodal
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties over the engine's pure (non-Spark) kernels. */
object PureProps extends Properties("graft.pure") {

  val bytesGen: Gen[Array[Byte]] =
    Gen.nonEmptyListOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray)

  property("decodeStub is deterministic") = Prop.forAll(bytesGen) { b =>
    val (w1, h1, e1) = Multimodal.decodeStub(b)
    val (w2, h2, e2) = Multimodal.decodeStub(b)
    w1 == w2 && h1 == h2 && e1.toSeq == e2.toSeq
  }

  property("decodeStub embedding is unit-norm") = Prop.forAll(bytesGen) { b =>
    val (_, _, e) = Multimodal.decodeStub(b)
    val n = math.sqrt(e.map(x => x.toDouble * x).sum)
    math.abs(n - 1.0) < 1e-3
  }

  property("decodeStub dims are positive and bounded") = Prop.forAll(bytesGen) { b =>
    val (w, h, _) = Multimodal.decodeStub(b)
    w >= 64 && w < 576 && h >= 64 && h < 576
  }

  property("lsh planes are seed-deterministic and seed-sensitive") =
    Prop.forAll(Gen.chooseNum(1L, 1000L)) { seed =>
      val a = Ann.planes(4, 8, seed)
      val b = Ann.planes(4, 8, seed)
      val c = Ann.planes(4, 8, seed + 1)
      a.flatten.toSeq == b.flatten.toSeq && a.flatten.toSeq != c.flatten.toSeq
    }

  // WinnowFpsMd5's fused byte-walk vs an independent code-point
  // reference (java.lang.String code points → substring → UTF-8 bytes →
  // MessageDigest) — a genuinely different path to the same definition,
  // pinning the two-pointer boundary tracking on arbitrary mixes of
  // 1/2/3/4-byte code points and the window=1 short-string clamp.
  private def refWinnowMd5(s: String, k: Int, window: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    val nH = math.max(cps.length - (k - 1), 1)
    if (nH < window) return Seq.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = (0 until nH).map { i =>
      val sub = new String(cps, i, math.min(k, math.max(cps.length - i, 0)))
      val d = md.digest(sub.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
    }
    (0 to nH - window).map(j => hs.slice(j, j + window).min).distinct
  }

  property("WinnowFpsMd5 byte-walk == code-point reference") = {
    val cpGen = Gen.oneOf("a", "Z", "9", " ", "é", "ß", "中", "語", "😀", "🚀")
    val strGen = Gen.listOf(cpGen).map(_.mkString)
    val kGen = Gen.chooseNum(1, 8)
    val wGen = Gen.chooseNum(1, 4)
    Prop.forAll(strGen, kGen, wGen) { (s, k, w) =>
      val expr = graft.functions.WinnowFpsMd5(
        org.apache.spark.sql.catalyst.expressions.Literal(
          org.apache.spark.unsafe.types.UTF8String.fromString(s),
          org.apache.spark.sql.types.StringType), k, w)
      val got = expr.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
      got == refWinnowMd5(s, k, w)
    }
  }

  property("Md5Prefix32.hash == MessageDigest reference on byte ranges") =
    Prop.forAll(bytesGen, Gen.chooseNum(0, 8)) { (b, off0) =>
      val off = math.min(off0, b.length)
      val len = b.length - off
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(java.util.Arrays.copyOfRange(b, off, b.length))
      val expect = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      graft.functions.Md5Prefix32.hash(b, off, len) == expect
    }

  property("AffineMinSig eval == affine reference, nulls skipped") = {
    val elemGen = Gen.oneOf(
      Gen.const(null.asInstanceOf[java.lang.Long]),
      Gen.chooseNum(0L, (1L << 32) - 1).map(java.lang.Long.valueOf))
    val arrGen = Gen.listOf(elemGen)
    val nGen = Gen.chooseNum(1, 64)
    Prop.forAll(arrGen, nGen) { (xs, n) =>
      val expr = graft.functions.AffineMinSig(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          xs, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, containsNull = true)), n)
      val got = {
        val a = expr.eval(null)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        (0 until a.numElements()).map(i =>
          if (a.isNullAt(i)) None else Some(a.getLong(i)))
      }
      val perms = graft.llm.Dedup.portablePerms(n)
      val vals = xs.filter(_ != null).map(_.longValue())
      val expect = perms.map { case (a, b) =>
        if (vals.isEmpty) None
        else Some(vals.map(hv => (hv * a + b) % 2147483647L).min)
      }
      got == expect
    }
  }

  property("log pattern accepts well-formed lines") = {
    val levels = Gen.oneOf("TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL")
    val comp = Gen.alphaNumStr.suchThat(_.nonEmpty)
    Prop.forAll(levels, comp) { (lvl, c) =>
      val line = s"2024-01-01 10:20:30.456 $lvl [$c] something happened"
      line.matches(graft.sources.LogLines.pattern)
    }
  }

  property("PerceptualHash32.quantBp == Spark round() semantics (HALF_UP on DOUBLE)") = {
    // the x329/x330 portability claim in one line: the fused kernel's
    // quantization must equal cast(round(cast(e AS DOUBLE)*10000) AS
    // BIGINT) exactly — BigDecimal HALF_UP (away from zero on .5),
    // which Math.round gets WRONG for negative halves. Floats across
    // magnitudes and signs, plus the exact half boundaries.
    val floatGen = Gen.oneOf(
      Gen.chooseNum(-10f, 10f),
      Gen.chooseNum(-1e6f, 1e6f),
      Gen.chooseNum(-32768, 32767).map(i => i / 20000.0f), // lands on .x5 halves
      Gen.oneOf(0.00005f, -0.00005f, 0.00015f, -0.00015f, 0f, -0f))
    Prop.forAll(floatGen) { f =>
      val expect = new java.math.BigDecimal(f.toDouble * 10000.0)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
      graft.functions.PerceptualHash32.quantBp(f) == expect
    }
  }
}
