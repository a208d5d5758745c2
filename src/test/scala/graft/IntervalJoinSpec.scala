package graft

import scala.util.Random

/** operators/IntervalJoin — bucket-gridded overlap must equal brute
  * force on adversarial inputs: half-open boundary touches, spans
  * crossing many cells (dedup), cell-sized and sub-cell intervals. */
class IntervalJoinSpec extends SparkSpec {

  test("gridded overlap == brute force on random half-open intervals") {
    import spark.implicits._
    val r = new Random(41)
    val as = Seq.tabulate(300) { i =>
      val s = r.nextInt(1000).toLong; (i.toLong, s, s + 1 + r.nextInt(120))
    }
    val bs = Seq.tabulate(200) { j =>
      val s = r.nextInt(1000).toLong; (j.toLong, s, s + 1 + r.nextInt(60))
    }
    val expected = (for {
      (i, as0, ae) <- as; (j, bs0, be) <- bs
      if as0 < be && bs0 < ae
    } yield (i, j)).toSet

    val a = as.toDF("akey", "as0", "ae")
    val b = bs.toDF("bkey", "bs0", "be")
    Seq(7L, 64L, 1024L).foreach { bucket =>
      val got = operators.IntervalJoin
        .overlap(a, "as0", "ae", "akey", b, "bs0", "be", "bkey", bucket)
        .select("akey", "bkey").as[(Long, Long)].collect().toSet
      assert(got == expected, s"bucket=$bucket")
    }
  }

  test("half-open semantics: touching intervals do not overlap") {
    import spark.implicits._
    val a = Seq((1L, 0L, 10L)).toDF("akey", "as0", "ae")
    val b = Seq((1L, 10L, 20L), (2L, 9L, 20L)).toDF("bkey", "bs0", "be")
    val got = operators.IntervalJoin
      .overlap(a, "as0", "ae", "akey", b, "bs0", "be", "bkey", 4L)
      .select("bkey").as[Long].collect().toSet
    assert(got == Set(2L)) // [0,10) touches [10,20) only at the open end
  }

  test("rejects non-integral bounds and shared column names") {
    import spark.implicits._
    val a = Seq((1L, 0.5, 2.0)).toDF("k", "s", "e")
    val b = Seq((1L, 0L, 2L)).toDF("bk", "bs", "be")
    intercept[IllegalArgumentException] {
      operators.IntervalJoin.overlap(a, "s", "e", "k", b, "bs", "be", "bk", 4L)
    }
    val c = Seq((1L, 0L, 2L)).toDF("k", "s", "e")
    intercept[IllegalArgumentException] {
      operators.IntervalJoin.overlap(c, "s", "e", "k", c, "s", "e", "k", 4L)
    }
  }
}
