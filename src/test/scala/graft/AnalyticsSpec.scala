package graft

/** Round-8 analytics tier (x205–x229): statistical tests, time series,
  * business analytics, ML-eval extensions, corpus laws, recursive BFS.
  *
  * The driver's t2 gate hash-checks every entry against DuckDB at sf0.01;
  * this spec keeps `sbt test` self-contained with sf0.001 row counts plus
  * the mathematical invariants each statistic must satisfy regardless of
  * corpus — the properties a hash compare can't articulate.
  */
class AnalyticsSpec extends SparkSpec {

  val expectedRows: Map[String, Long] = Map(
    "x205_spearman" -> 3, "x206_chi_square" -> 1, "x207_ks_test" -> 1,
    "x208_mann_whitney" -> 1, "x209_gini" -> 1, "x210_welch_t" -> 1,
    "x211_cramers_v" -> 1, "x212_js_divergence" -> 1, "x213_autocorr" -> 1,
    "x214_cusum" -> 30, "x215_bollinger" -> 24, "x216_zscore_anomaly" -> 20,
    "x217_seasonal_index" -> 7, "x218_rfm" -> 64, "x219_rolling_median" -> 24,
    "x220_trimmed_mean" -> 3, "x221_haversine" -> 15, "x222_survival_km" -> 5,
    "x223_log_loss" -> 1, "x224_gains_table" -> 10, "x225_kappa_mcc" -> 1,
    "x226_ndcg" -> 10, "x227_zipf_slope" -> 1, "x228_growth_curve" -> 26,
    "x229_bfs_hops" -> 1)

  expectedRows.foreach { case (name, n) =>
    test(s"$name returns $n rows at sf0.001") {
      assert(SparkEntry.queries(name)(spark, sf0001).count() == n)
    }
  }

  test("x205: Spearman rho bounded in [-1, 1]") {
    SparkEntry.queries("x205_spearman")(spark, sf0001).collect().foreach { r =>
      val rho = r.getAs[Double]("spearman_rho")
      assert(rho >= -1.0 && rho <= 1.0, s"rho out of range: $rho")
    }
  }

  test("x207/x212: KS statistic and JS divergence live in their bounds") {
    val ks = SparkEntry.queries("x207_ks_test")(spark, sf0001)
      .collect().head.getAs[Double]("ks_stat")
    assert(ks >= 0.0 && ks <= 1.0, s"KS out of [0,1]: $ks")
    val js = SparkEntry.queries("x212_js_divergence")(spark, sf0001)
      .collect().head.getAs[Double]("js_div")
    assert(js >= 0.0 && js <= math.log(2) + 1e-9, s"JS out of [0, ln 2]: $js")
  }

  test("x208: U statistic satisfies U1 + U2 = n1 * n2 (rank-sum identity)") {
    val r = SparkEntry.queries("x208_mann_whitney")(spark, sf0001).collect().head
    val (u, na, nb) = (r.getAs[Long]("u_stat"), r.getAs[Long]("n_click"),
      r.getAs[Long]("n_error"))
    // with (effectively) no ties: U2 = n1*n2 - U1; U must sit inside [0, n1*n2]
    assert(u >= 0 && u <= na * nb, s"U=$u outside [0, ${na * nb}]")
  }

  test("x209: Gini of a nonnegative measure is within [0, 1)") {
    val g = SparkEntry.queries("x209_gini")(spark, sf0001)
      .collect().head.getAs[Double]("gini")
    assert(g >= 0.0 && g < 1.0, s"gini out of range: $g")
  }

  test("x215: band ordering lower <= ma <= upper on every row") {
    SparkEntry.queries("x215_bollinger")(spark, sf0001).collect().foreach { r =>
      val (lo, ma, hi) = (r.getAs[Double]("lower_band"), r.getAs[Double]("ma"),
        r.getAs[Double]("upper_band"))
      assert(lo <= ma && ma <= hi, s"band inversion: $lo / $ma / $hi")
    }
  }

  test("x217: seasonal indices average to ~1 weighted by day counts") {
    val rows = SparkEntry.queries("x217_seasonal_index")(spark, sf0001).collect()
    val (wsum, n) = rows.foldLeft((0.0, 0L)) { case ((s, c), r) =>
      (s + r.getAs[Double]("seasonal_index") * r.getAs[Long]("n_days"),
        c + r.getAs[Long]("n_days"))
    }
    assert(math.abs(wsum / n - 1.0) < 0.01, s"weighted mean index ${wsum / n}")
  }

  test("x218: RFM segment census sums to the customer count") {
    val total = SparkEntry.queries("x218_rfm")(spark, sf0001)
      .collect().map(_.getAs[Long]("customers")).sum
    val customers = Catalog.load(spark, sf0001, "orders")
      .select("o_custkey").distinct().count()
    assert(total == customers, s"$total segmented vs $customers customers")
  }

  test("x222: KM survival is nonincreasing and within [0, 1]") {
    val s = SparkEntry.queries("x222_survival_km")(spark, sf0001)
      .collect().map(_.getAs[Double]("survival"))
    assert(s.forall(v => v >= 0.0 && v <= 1.0))
    s.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-9, s"survival increased: $a -> $b")
    case _ => ()
    }
  }

  test("x224: gains table cumulative capture is monotone, ends at 10000 bp") {
    val rows = SparkEntry.queries("x224_gains_table")(spark, sf0001).collect()
    val caps = rows.sortBy(_.getAs[Int]("decile")).map(_.getAs[Long]("cum_capture_bp"))
    caps.sliding(2).foreach { case Array(a, b) => assert(b >= a); case _ => () }
    assert(caps.last == 10000L, s"final capture ${caps.last} bp")
  }

  test("x226: NDCG@10 is within [0, 1] for every label group") {
    SparkEntry.queries("x226_ndcg")(spark, sf0001).collect().foreach { r =>
      val v = r.getAs[Double]("ndcg10")
      assert(v >= 0.0 && v <= 1.0 + 1e-9, s"ndcg out of range: $v")
    }
  }

  test("x229: BFS source node reports 0 hops; all hops within the depth bound") {
    // sf0.01 has the sparsified multi-level frontier (sf0.001 graph has no
    // edge above the weight threshold — only the source row survives)
    val rows = SparkEntry.queries("x229_bfs_hops")(spark, "/root/testdata/sf0.01")
      .collect()
    val hops = rows.map(r => r.getAs[Int]("node") -> r.getAs[Long]("hops")).toMap
    assert(hops(0) == 0L, "source node must be 0 hops")
    assert(hops.values.forall(h => h >= 0 && h <= 5))
  }
}
