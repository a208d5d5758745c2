package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}

/** Unit contract for the native unrestricted Damerau-Levenshtein
  * expression. The x200 oracle entry hash-checks every value the
  * expression produces over the banded part-name join against DuckDB's
  * built-in; this spec pins the known-answer discriminators (probed on
  * DuckDB directly) and the SQL/codegen surface. */
class DamerauLevenshteinSpec extends SparkSpec {

  private def dl(a: String, b: String): Int =
    graft.functions.DamerauLevenshtein.compute(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("known answers, including the unrestricted-variant discriminators") {
    // (a, b, expected) — expected values probed on DuckDB's
    // damerau_levenshtein, the oracle the x200 entry hashes against.
    val cases = Seq(
      ("CA", "ABC", 2),          // UNRESTRICTED: OSA would say 3
      ("ab", "ba", 1),           // one transposition
      ("kitten", "sitting", 3),  // classic Levenshtein case (no swaps)
      ("abcdef", "abcfad", 3),
      ("", "abc", 3), ("abc", "", 3), ("", "", 0),
      ("same", "same", 0),
      ("azertyuiop", "qwertyuiop", 2))
    cases.foreach { case (a, b, want) =>
      assert(dl(a, b) == want, s"dl($a, $b)")
    }
  }

  test("code-point semantics: astral-plane chars are single units (ADVICE r7 #3)") {
    // U+1D54A (𝕊) and U+1D546 (𝕆) are surrogate PAIRS in UTF-16. The DP
    // folds to code points, so each counts as one character: a UTF-16
    // code-unit implementation would report 2 for the single-char cases
    // and mis-handle the transposition (pair-halves swapping).
    val S = new String(Character.toChars(0x1D54A))
    val O = new String(Character.toChars(0x1D546))
    assert(dl(S, "") == 1, "one astral char deletes as ONE edit, not two")
    assert(dl(S, O) == 1, "astral substitution is one edit")
    assert(dl(S + O, O + S) == 1, "astral transposition is one swap")
    assert(dl("a" + S, S + "a") == 1, "mixed BMP/astral transposition")
    // on ASCII (the x200 oracle columns) code points == code units ==
    // bytes, so the fold cannot move the hash gate
    assert(dl("CA", "ABC") == 2 && dl("ab", "ba") == 1)
  }

  test("SQL surface: registered function, codegen'd, null-safe") {
    import spark.implicits._
    Catalog.ensure(spark, sf0001) // registers the function
    val df = Seq(("CA", "ABC"), ("ab", "ba"), (null, "x"))
      .toDF("a", "b")
    val got = df.selectExpr("damerau_levenshtein(a, b) AS d")
      .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq
    assert(got == Seq(2, 1, -1), "null input must yield null")
    // codegen check needs a real scan — a local Seq relation folds to
    // LocalTableScan before physical planning ever sees the expression
    val plan = Catalog.load(spark, sf0001, "part")
      .selectExpr("damerau_levenshtein(p_name, p_brand) AS d")
      .queryExecution.executedPlan.toString
    // the simple plan string marks whole-stage codegen spans with "*(n)"
    assert(plan.contains("*(1) Project"),
      s"expression must stay inside whole-stage codegen:\n$plan")
  }
}

/** Metric laws — unrestricted DL is a true metric (the OSA variant is
  * not; these properties would catch an accidental OSA implementation
  * drift on random inputs where known-answer cases are sparse). */
object DamerauLevenshteinProps extends Properties("DamerauLevenshtein") {
  private def dl(a: String, b: String): Int =
    graft.functions.DamerauLevenshtein.compute(
      UTF8String.fromString(a), UTF8String.fromString(b))

  private val shortStr = Gen.listOfN(6, Gen.oneOf('a', 'b', 'c')).map(_.mkString)

  property("identity") = forAll(shortStr) { a => dl(a, a) == 0 }
  property("symmetry") = forAll(shortStr, shortStr) { (a, b) => dl(a, b) == dl(b, a) }
  property("bounded by max length") = forAll(shortStr, shortStr) { (a, b) =>
    dl(a, b) <= math.max(a.length, b.length)
  }
  property("triangle inequality") = forAll(shortStr, shortStr, shortStr) {
    (a, b, c) => dl(a, c) <= dl(a, b) + dl(b, c)
  }
  property("positive iff different") = forAll(shortStr, shortStr) { (a, b) =>
    (dl(a, b) == 0) == (a == b)
  }
}
