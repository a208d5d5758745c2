package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}

/** Unit contract for the native Jaro-Winkler expression. The x241 oracle
  * entry hash-checks the basis-point scores over the whole part table
  * against DuckDB's jaro_winkler_similarity; this spec pins the
  * known-answer cases (probed on DuckDB directly, including its
  * empty-string and match-window edge behavior) and the SQL/codegen
  * surface. */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    graft.functions.JaroWinkler.compute(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("known answers probed on DuckDB's jaro_winkler_similarity") {
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),   // the Winkler classic
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("aa", "ab", 0.6666666666666666),           // under the 0.7 boost gate
      ("same", "same", 1.0), ("a", "a", 1.0),
      // match window of 2-char strings is 0 → a transposed pair shares
      // NO in-window characters (probed: DuckDB says 0, not 0.something)
      ("ab", "ba", 0.0),
      ("abc", "xyz", 0.0),
      // DuckDB returns 0 whenever either side is empty — INCLUDING both
      // empty, where the conventional definition says 1
      ("", "abc", 0.0), ("abc", "", 0.0), ("", "", 0.0))
    cases.foreach { case (a, b, want) =>
      assert(jw(a, b) == want, s"jw($a, $b) = ${jw(a, b)}, want $want")
    }
  }

  test("code-point semantics: astral chars are single symbols") {
    val S = new String(Character.toChars(0x1D54A)) // 𝕊, a surrogate pair
    val O = new String(Character.toChars(0x1D546)) // 𝕆
    assert(jw(S, S) == 1.0, "identical astral char is a full match")
    // a code-UNIT implementation would see the shared surrogate halves
    // of different astral chars as partial matches; code points see two
    // distinct single symbols with no match
    assert(jw(S, O) == 0.0, "distinct astral chars share nothing")
  }

  test("SQL surface: registered function, codegen'd, null-safe") {
    import spark.implicits._
    Catalog.ensure(spark, sf0001) // registers the function
    val df = Seq(("MARTHA", "MARHTA"), (null, "x"))
      .toDF("a", "b")
    val got = df.selectExpr("jaro_winkler(a, b) AS s")
      .collect().map(r => if (r.isNullAt(0)) -1.0 else r.getDouble(0)).toSeq
    assert(got == Seq(0.9611111111111111, -1.0), "null input must yield null")
    val plan = Catalog.load(spark, sf0001, "part")
      .selectExpr("jaro_winkler(p_name, p_brand) AS s")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"),
      s"expression must stay inside whole-stage codegen:\n$plan")
  }
}

/** Score laws on random inputs — where known-answer cases are sparse,
  * these catch window/transposition implementation drift. */
object JaroWinklerProps extends Properties("JaroWinkler") {
  private def jw(a: String, b: String): Double =
    graft.functions.JaroWinkler.compute(
      UTF8String.fromString(a), UTF8String.fromString(b))

  private val shortStr = Gen.choose(0, 8)
    .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  property("range [0,1]") = forAll(shortStr, shortStr) { (a, b) =>
    val s = jw(a, b); s >= 0.0 && s <= 1.0
  }
  property("symmetry") = forAll(shortStr, shortStr) { (a, b) =>
    jw(a, b) == jw(b, a)
  }
  property("identity scores 1 (nonempty)") = forAll(shortStr) { a =>
    a.isEmpty || jw(a, a) == 1.0
  }
  property("disjoint alphabets score 0") = forAll(shortStr) { a =>
    jw(a, "xyz") == 0.0
  }
  property("a single trailing edit on a shared 4+ prefix stays above the boost gate") =
    forAll(shortStr) { a =>
      // 4 shared prefix symbols + one trailing difference: jaro is at
      // least (4/5 + 4/5 + 1)/3 > 0.85 for the len-5 pair, and the
      // Winkler boost can only raise it — the score class the operator
      // exists to rank highly (near-identical names)
      jw("abca" + a + "b", "abca" + a + "c") > 0.85
    }
}
