package graft

import graft.functions.{FoldAccents, UnicodeFold}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Contract for the accent-folding expression (x166's engine side):
  * NFD-decompose, drop combining marks, NFC re-compose — matching
  * DuckDB strip_accents (the oracle proves the corpus-level match;
  * these pin the unit edges). */
class FoldAccentsSpec extends SparkSpec {
  import spark.implicits._

  private def fold(s: String): String =
    UnicodeFold.fold(UTF8String.fromString(s)).toString

  test("precomposed and decomposed inputs fold to the same ASCII") {
    assert(fold("Crème Brûlée") === "Creme Brulee")
    assert(fold("Crème Brûlée") === "Creme Brulee")
    assert(fold("áéíóú ÁÉ ñ ç š")
      === "aeiou AE n c s")
  }

  test("non-decomposable codepoints survive; ASCII fast path is identity") {
    assert(fold("Ørsted") === "Ørsted") // Ø has no NFD decomposition
    val ascii = UTF8String.fromString("plain ascii #42")
    // eq, not ==: the fast path must return the input object untouched
    assert(UnicodeFold.fold(ascii) eq ascii)
  }

  test("supplementary-plane combining marks strip too (code-point walk)") {
    // U+1D167 MUSICAL SYMBOL COMBINING TREMOLO-1 is category Mn but two
    // UTF-16 units — a char-wise walk sees SURROGATE and keeps it, where
    // DuckDB's strip_accents removes it (probe-confirmed), splitting the
    // dedup tier's canonical hashes between the two dialects
    val mark = new String(Character.toChars(0x1D167))
    assert(fold(s"a${mark}b") === "ab")
    // and non-mark astral code points survive intact (U+1F600 emoji, So)
    val emoji = new String(Character.toChars(0x1F600))
    assert(fold(s"x${emoji}é") === s"x${emoji}e")
  }

  test("SQL form handles NULL and participates in whole-stage codegen") {
    Catalog.ensure(spark, sf0001)
    val df = spark.sql(
      "SELECT fold_accents(CAST(NULL AS STRING)) AS n, fold_accents('café') AS c")
    val r = df.collect().head
    assert(r.isNullAt(0) && r.getString(1) == "cafe")
    val plan = spark.sql(
      "SELECT fold_accents(c_name) FROM customer").queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("Project") && l.trim.startsWith("*")), plan)
  }

  test("column DSL form folds a synthesized column") {
    Catalog.ensure(spark, sf0001)
    val got = Seq("naïve", "façade").toDF("s")
      .select(FoldAccents(col("s")).as("f")).as[String].collect().toSeq
    assert(got === Seq("naive", "facade"))
  }
}
