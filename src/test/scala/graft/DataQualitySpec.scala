package graft

import graft.operators.DataQuality._
import org.apache.spark.sql.functions._

/** Contract for the fused data-quality audit (x173's engine): rule
  * classes count exactly their violation sets, NULL semantics follow
  * SQL CHECK/REFERENCES (NULL passes range and FK, fails only
  * NotNull), and all row-local rules share one scan. */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq[(java.lang.Long, java.lang.Double, String)](
    (1L, 10.0, "a"), (2L, -5.0, "b"), (3L, null, "c"),
    (null, 99.0, "d"), (2L, 10.0, "e")
  ).toDF("k", "v", "tag")

  test("planted violations: each rule class counts exactly its set") {
    val dim = Seq(1L, 2L).toDF("id")
    val got = audit(rows, Seq(
        NotNull("k_not_null", "k"),
        InRange("v_in_0_50", "v", 0.0, 50.0), // -5 and 99 violate; NULL passes
        Violates("tag_is_e", col("tag") === "e"),
        Unique("k_unique", "k"), // 5 rows, 3 distinct non-null + null handling
        ForeignKey("k_fk", "k", dim, "id") // k=3 misses; NULL k not checked
      )).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val m = got.map(t => t._1 -> t._2).toMap
    assert(m("k_not_null") === 1L)
    assert(m("tag_is_e") === 1L)
    val vr = got.find(_._1 == "v_in_0_50").get
    assert(vr._2 === 2L && vr._3 === 5L)
    val fk = got.find(_._1 == "k_fk").get
    assert(fk._2 === 1L && fk._3 === 4L, s"fk checked must exclude NULL keys: $fk")
    // count(k) - count_distinct(k): 4 - 3 = 1 — ONLY the duplicated
    // non-NULL key 2L; the NULL key is NotNull's business, not a
    // "duplicate" (ADVICE r5 #2)
    assert(m("k_unique") === 1L)
    // output is sorted by rule name
    assert(got.map(_._1) === got.map(_._1).sorted)
  }

  test("clean table audits to all-zero violations") {
    val clean = Seq((1L, 1.0, "x"), (2L, 2.0, "y")).toDF("k", "v", "tag")
    val got = audit(clean, Seq(
        NotNull("nn", "k"), InRange("rg", "v", 0, 10), Unique("uq", "k")))
      .collect()
    assert(got.forall(_.getLong(1) == 0L) && got.forall(_.getLong(2) == 2L))
  }
}
