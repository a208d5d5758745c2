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

  test("quoting-hostile column names (dots, hyphens, keywords) still join") {
    // ADVICE r11 #4: the cell bounds are built via expr() SQL text; an
    // unquoted name with a dot parses as field access, a hyphen breaks
    // the parser, and a reserved word collides — all must behave
    // exactly like plain names once backtick-quoted.
    import spark.implicits._
    val a = Seq((1L, 0L, 10L), (2L, 30L, 35L))
      .toDF("a key", "a.start", "end") // space, dot, reserved word
    val b = Seq((7L, 5L, 12L), (8L, 100L, 120L))
      .toDF("b-key", "b`s", "b.end") // hyphen, embedded backtick, dot
    Seq(0, 2).foreach { cap =>
      val got = operators.IntervalJoin
        .overlap(a, "a.start", "end", "a key",
                 b, "b`s", "b.end", "b-key", 4L, maxSpanCells = cap)
        .select(org.apache.spark.sql.functions.col("`a key`"),
                org.apache.spark.sql.functions.col("`b-key`"))
        .as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 7L)), s"cap=$cap")
    }
  }

  test("maxSpanCells splitting: bit-identical at span >> bucket") {
    import spark.implicits._
    val r = new Random(43)
    // degenerate long intervals: spans up to ~700 cells at bucket=7,
    // exactly the shape r9 delegated to "cap or split upstream"
    val as = Seq.tabulate(60) { i =>
      val s = r.nextInt(500).toLong; (i.toLong, s, s + 1 + r.nextInt(5000))
    }
    val bs = Seq.tabulate(80) { j =>
      val s = r.nextInt(5500).toLong; (j.toLong, s, s + 1 + r.nextInt(40))
    }
    val expected = (for {
      (i, as0, ae) <- as; (j, bs0, be) <- bs
      if as0 < be && bs0 < ae
    } yield (i, j)).toSet
    val a = as.toDF("akey", "as0", "ae")
    val b = bs.toDF("bkey", "bs0", "be")
    Seq(1, 4, 64, 100000).foreach { m =>
      val got = operators.IntervalJoin
        .overlap(a, "as0", "ae", "akey", b, "bs0", "be", "bkey", 7L,
          maxSpanCells = m)
        .select("akey", "bkey").as[(Long, Long)].collect().toSet
      assert(got == expected, s"maxSpanCells=$m")
    }
  }

  test("inverted or empty intervals fail loudly, not with a cell explosion") {
    import spark.implicits._
    val a = Seq((1L, 10L, 10L)).toDF("akey", "as0", "ae") // empty [10,10)
    val b = Seq((1L, 0L, 20L)).toDF("bkey", "bs0", "be")
    val e = intercept[Exception] {
      operators.IntervalJoin
        .overlap(a, "as0", "ae", "akey", b, "bs0", "be", "bkey", 4L)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("empty or inverted interval")),
      s"unexpected failure: $e")
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
