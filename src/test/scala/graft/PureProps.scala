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

  property("log pattern accepts well-formed lines") = {
    val levels = Gen.oneOf("TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL")
    val comp = Gen.alphaNumStr.suchThat(_.nonEmpty)
    Prop.forAll(levels, comp) { (lvl, c) =>
      val line = s"2024-01-01 10:20:30.456 $lvl [$c] something happened"
      line.matches(graft.sources.LogLines.pattern)
    }
  }
}
