package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the classical-inference / ranking-eval operators.
  * The DuckDB oracle pins exact values; these pin the mathematical
  * contracts (identities, ranges, flags) that survive any data change.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("welch t-test: totals partition the fact table, d and t agree in sign") {
    val r = Stats.welchTTest(spark, sf).collect().head
    val nOrders = Tables(spark, sf, "orders").count()
    assert(r.getAs[Long]("n_treated") + r.getAs[Long]("n_control") === nOrders)
    val t = r.getAs[Long]("t_milli"); val d = r.getAs[Long]("d_milli")
    assert(t.sign === d.sign || t === 0L || d === 0L,
      s"t and Cohen's d must agree in sign: t=$t d=$d")
    assert(r.getAs[Long]("df_milli") > 1000L, "Welch df must exceed 1")
    // sign(t) == sign(mean gap) — the statistic tracks the effect
    val gap = r.getAs[Long]("mean_t_cents") - r.getAs[Long]("mean_c_cents")
    assert(t.sign === gap.sign || gap.abs < 100,
      s"t sign must track the mean gap: t=$t gap=$gap")
  }

  test("tost: margin is 1% of control mean, one-sided t's bracket, flag consistent") {
    val r = Stats.tostEquivalence(spark, sf).collect().head
    val w = Stats.welchTTest(spark, sf).collect().head
    assert(r.getAs[Long]("delta_cents") === w.getAs[Long]("mean_c_cents") / 100)
    val lo = r.getAs[Long]("t_lower_milli"); val hi = r.getAs[Long]("t_upper_milli")
    assert(lo >= hi, "adding the margin can only raise the statistic")
    assert(r.getAs[Boolean]("equivalent") === (lo > 1645L && hi < -1645L))
  }

  test("chi-square: dense grid, per-cell terms nonneg, dof identity") {
    val rows = Stats.chiSquareTypeWeekday(spark, sf).collect()
    val types = rows.map(_.getAs[String]("event_type")).distinct.length
    val wds = rows.map(_.getAs[Long]("wd")).distinct.length
    assert(rows.length === types * wds, "grid must be dense (absent cell = 0)")
    assert(rows.forall(_.getAs[Long]("term_u") >= 0L))
    val dof = rows.head.getAs[Long]("dof")
    assert(dof === (types - 1L) * (wds - 1L))
    val chi2 = rows.head.getAs[Long]("chi2_u")
    assert(chi2 === rows.map(_.getAs[Long]("term_u")).sum,
      "family chi2 must equal the sum of cell terms")
    assert(rows.map(_.getAs[Long]("o")).sum ===
      Tables(spark, sf, "events").count())
  }

  test("anova: group means bracket the family, eta-squared in [0, 10000]") {
    val rows = Stats.anovaF(spark, sf).collect()
    assert(rows.length === 5, "five order priorities")
    val r = rows.head
    assert(r.getAs[Long]("k") === 5L)
    assert(r.getAs[Long]("n") === Tables(spark, sf, "orders").count())
    assert(r.getAs[Long]("f_milli") >= 0L)
    val eta = r.getAs[Long]("eta_sq_bp")
    assert(eta >= 0L && eta <= 10000L)
  }

  test("kendall tau-b: bounded by ±1, concordance bounded by pair count") {
    val r = Stats.kendallTauDaily(spark, sf).collect().head
    val n = r.getAs[Long]("n_days")
    assert(r.getAs[Long]("n0") === n * (n - 1) / 2)
    assert(r.getAs[Long]("nc_minus_nd").abs <= r.getAs[Long]("n0"))
    assert(r.getAs[Long]("tau_milli").abs <= 1000L)
  }

  test("average precision: in [base rate, 1], counts match the table") {
    val r = Stats.averagePrecision(spark, sf).collect().head
    val ev = Tables(spark, sf, "events")
    assert(r.getAs[Long]("n_events") === ev.count())
    assert(r.getAs[Long]("n_pos") ===
      ev.filter($"event_type" === "purchase").count())
    val ap = r.getAs[Long]("ap_u")
    assert(ap >= 0L && ap <= 1000000L)
    assert(r.getAs[Long]("p_at_100_bp") >= 0L)
  }

  test("average precision rank is distributed (no single-partition window)") {
    import org.apache.spark.sql.execution.window.WindowExec
    // globalRowNumber's numParts-row offsets window (orders by _gp) is
    // the one permitted unpartitioned frame — constant in data size
    val df = Stats.averagePrecision(spark, sf)
    planNodes(df).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }.foreach { w =>
      val orderRefs = w.orderSpec.flatMap(_.child.references.map(_.name))
      assert(orderRefs == Seq("_gp"),
        s"AP has a data-sized unpartitioned window (orders by " +
        s"${orderRefs.mkString(",")}):\n${w.toString.take(1200)}")
    }
  }

  test("holdout calibration: ece is the test-mass-weighted mean gap") {
    val rows = Stats.holdoutCalibration(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val num = rows.map(r => r.getAs[Long]("n_test") * r.getAs[Long]("gap_bp")).sum
    val den = rows.map(_.getAs[Long]("n_test")).sum
    assert(rows.forall(_.getAs[Long]("ece_bp") === num / den))
    rows.foreach { r =>
      assert(r.getAs[Long]("gap_bp") ===
        (r.getAs[Long]("r_train_bp") - r.getAs[Long]("r_test_bp")).abs)
    }
  }

  test("link prediction: flagged edges are real LSH pairs, scores bounded") {
    val rows = Stats.linkPrediction(spark, sf).collect()
    val pairs = Dedup.sharedLshPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val key = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))
      assert(r.getAs[Boolean]("is_edge") === pairs.contains(key),
        s"is_edge must match the LSH pair set for $key")
      assert(r.getAs[Long]("cn") >= 1L, "2-hop pairs share a neighbor")
      val j = r.getAs[Long]("jacc_bp")
      assert(j >= 0L && j <= 10000L)
    }
  }

  test("hurst: R/S grows with window, slope lands in (0, 1)") {
    val rows = Stats.hurstExponent(spark, sf).collect()
    assert(rows.length >= 2, "need at least two window sizes for a slope")
    val byW = rows.sortBy(_.getAs[Long]("w"))
    val rsSeq = byW.map(_.getAs[Long]("rs_mean_u"))
    // trend, not per-step monotonicity: with few complete blocks at the
    // largest window, step-to-step ordering is sample noise, not a
    // mathematical invariant — only the overall growth is one
    assert(rsSeq.last > rsSeq.head,
      "mean rescaled range must grow from the smallest to the largest " +
      s"window: $rsSeq")
    val h = rows.head.getAs[Long]("hurst_milli")
    assert(rows.forall(_.getAs[Long]("hurst_milli") === h))
    assert(h > 0L && h < 1000L, s"Hurst exponent out of (0,1): $h")
  }

  test("dtw: warped distance never exceeds the aligned L1 path") {
    val rows = Stats.dtwWeekdayProfiles(spark, sf).collect()
    val n = rows.flatMap(r => Seq(r.getAs[Int]("nation_a"),
      r.getAs[Int]("nation_b"))).distinct.length
    assert(rows.length === n * (n - 1) / 2, "one row per unordered pair")
    rows.foreach { r =>
      val dtw = r.getAs[Long]("dtw_cents"); val l1 = r.getAs[Long]("l1_cents")
      assert(dtw >= 0L && dtw <= l1,
        "the aligned diagonal is one admissible warp path")
      if (l1 > 0)
        assert(r.getAs[Long]("dtw_over_l1_bp") === dtw * 10000 / l1)
    }
  }

  test("hits: each role max-normalizes to exactly 1e6") {
    val rows = Stats.hitsSupplierCustomer(spark, sf).collect()
    val byRole = rows.groupBy(_.getAs[String]("role"))
    assert(byRole.keySet === Set("hub", "auth"))
    byRole.foreach { case (role, rs) =>
      val scores = rs.map(_.getAs[Long]("score_u"))
      assert(scores.max === 1000000L, s"$role max must normalize to 1e6")
      assert(scores.forall(x => x > 0L && x <= 1000000L))
    }
  }
}
