package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical inference + ranking-evaluation operators over the fact
  * tables — the significance/association layer a segment dashboard or a
  * filter-threshold decision sits on top of (the same family as
  * [[Relational.mannKendall]] / [[Events]]' funnel z-tests, widened to
  * the two-sample / k-sample / contingency / rank-correlation cases).
  *
  * Numeric discipline (repo-wide contract, see functions/num.scala):
  * every sufficient statistic (counts, sums, sums of squares) is an
  * EXACT integer aggregate — associative, so partial-aggregation order
  * can't move a bit at any parallelism — and each final test statistic
  * is one fixed-shape float expression over those integers, rounded to
  * milli. Both engines evaluate the identical expression tree over
  * identical integers, so IEEE correct rounding makes the outputs
  * hash-equal.
  *
  * Scale notes (100 TB posture): every operator here is one
  * map-side-combined groupBy over a fact join (dims broadcast) followed
  * by arithmetic on a bounded frame (segments × nothing, calendar days,
  * 10 score bins, 35 contingency cells). The only data-sized rank —
  * [[averagePrecision]]'s global ordering — rides
  * [[Relational.globalRowNumber]] (range-partition + per-partition
  * window + broadcast offsets), never a single-partition window.
  */
object Stats {
  private val dec = "decimal(38,0)"
  private def d(c: Column): Column = c.cast("double")

  /** Welch two-sample t-test of order value, one market segment vs the
    * rest: unequal-variance t (the default that's safe under variance
    * imbalance), Welch–Satterthwaite df, and pooled-SD Cohen's d, all
    * in milli. Sufficient stats are exact: n, Σcents (long),
    * Σcents² (wide decimal — cents² fits int64, the SUM doesn't at
    * scale). The group rollup is the only fact-sized work; everything
    * after is a 2-row cross of scalars.
    */
  /** Exact two-group sufficient statistics (n, Σcents, Σcents² per
    * side, one 1×1 cross) for one market segment vs the rest — shared
    * by [[welchTTest]] and [[tostEquivalence]] so the moment
    * convention cannot drift between the difference test and the
    * equivalence test.
    */
  private def segmentMoments(s: SparkSession, dir: String,
                             segment: String): DataFrame = {
    import s.implicits._
    val g = Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer")
        .select($"c_custkey".as("o_custkey"), $"c_mktsegment"), Seq("o_custkey"))
      .select(($"c_mktsegment" === segment).as("treated"),
        round($"o_totalprice" * 100).cast("long").as("cents"))
      .groupBy($"treated")
      .agg(count(lit(1)).as("n"), sum($"cents").as("s"),
        sum(($"cents" * $"cents").cast(dec)).as("ss"))
      .localCheckpoint() // both 1-row sides of the cross read it
    val t = g.filter($"treated")
      .select($"n".as("n1"), $"s".as("s1"), $"ss".as("ss1"))
    val c = g.filter(!$"treated")
      .select($"n".as("n2"), $"s".as("s2"), $"ss".as("ss2"))
    t.crossJoin(broadcast(c)) // 1×1 scalar cross, never a cartesian
  }

  def welchTTest(s: SparkSession, dir: String,
                 segment: String = "BUILDING"): DataFrame = {
    import s.implicits._
    val j = segmentMoments(s, dir, segment)
    val m1 = d($"s1") / d($"n1"); val m2 = d($"s2") / d($"n2")
    val v1 = (d($"ss1") - d($"s1") * d($"s1") / d($"n1")) /
      (d($"n1") - lit(1.0))
    val v2 = (d($"ss2") - d($"s2") * d($"s2") / d($"n2")) /
      (d($"n2") - lit(1.0))
    val se2 = v1 / d($"n1") + v2 / d($"n2")
    val dfW = se2 * se2 /
      ((v1 / d($"n1")) * (v1 / d($"n1")) / (d($"n1") - lit(1.0)) +
        (v2 / d($"n2")) * (v2 / d($"n2")) / (d($"n2") - lit(1.0)))
    val sp2 = ((d($"n1") - lit(1.0)) * v1 + (d($"n2") - lit(1.0)) * v2) /
      (d($"n1") + d($"n2") - lit(2.0))
    j.select($"n1".as("n_treated"), $"n2".as("n_control"),
      expr("s1 div n1").as("mean_t_cents"),
      expr("s2 div n2").as("mean_c_cents"),
      round((m1 - m2) / sqrt(se2) * 1000).cast("long").as("t_milli"),
      round(dfW * 1000).cast("long").as("df_milli"),
      round((m1 - m2) / sqrt(sp2) * 1000).cast("long").as("d_milli"))
  }

  /** TOST equivalence test (two one-sided Welch t's) of order value,
    * one segment vs the rest — the flip side of [[welchTTest]]: "can we
    * CONFIRM the segments spend the same, within ±1% of the control
    * mean?" A non-significant difference test can't say that (absence
    * of evidence); TOST can. Margin δ = control mean / 100, exact
    * cents. Equivalent at α=0.05 when the lower one-sided t clears
    * +1.645 AND the upper clears −1.645 (the normal quantile — df is
    * in the thousands here, where t ≈ z to 3 decimals). Same
    * one-scan moment rollup as the t-test.
    */
  def tostEquivalence(s: SparkSession, dir: String,
                      segment: String = "BUILDING"): DataFrame = {
    import s.implicits._
    val j = segmentMoments(s, dir, segment)
      .withColumn("delta_cents", expr("s2 div n2 div 100"))
    val m1 = d($"s1") / d($"n1"); val m2 = d($"s2") / d($"n2")
    val v1 = (d($"ss1") - d($"s1") * d($"s1") / d($"n1")) /
      (d($"n1") - lit(1.0))
    val v2 = (d($"ss2") - d($"s2") * d($"s2") / d($"n2")) /
      (d($"n2") - lit(1.0))
    val se = sqrt(v1 / d($"n1") + v2 / d($"n2"))
    val tLo = round((m1 - m2 + d($"delta_cents")) / se * 1000).cast("long")
    val tHi = round((m1 - m2 - d($"delta_cents")) / se * 1000).cast("long")
    j.select($"n1".as("n_treated"), $"n2".as("n_control"), $"delta_cents",
      tLo.as("t_lower_milli"), tHi.as("t_upper_milli"),
      (tLo > 1645L && tHi < -1645L).as("equivalent"))
  }

  /** Pearson χ² independence test of event type × weekday (Monday=0),
    * with per-cell contributions and Cramér's V: is traffic mix
    * day-of-week-stationary, the assumption every weekday-profile
    * rollup quietly makes? Dense grid via rowTotals × colTotals left
    * join (absent cell = observed 0, still contributes). Per-cell term
    * (O·N − R·C)²·10⁶ / (R·C·N) is one wide-decimal floor division —
    * exact in both engines (numerator brushes decimal38 only past
    * ~10⁹ rows per cell-product; far beyond any gate SF — and χ² at
    * that n is saturated anyway). The grid is |types|×7 — bounded — so
    * the family window is audit-sized.
    */
  def chiSquareTypeWeekday(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cells = Tables(s, dir, "events")
      .select($"event_type",
        graft.functions.dates.weekdayIndex($"ts".cast("date"))
          .cast("long").as("wd"))
      .groupBy($"event_type", $"wd").agg(count(lit(1)).as("o"))
      .localCheckpoint() // row/col/grand totals all re-aggregate it
    val rowT = cells.groupBy($"event_type").agg(sum($"o").as("r"))
    val colT = cells.groupBy($"wd").agg(sum($"o").as("c"))
    val tot = cells.agg(sum($"o").as("n"),
      countDistinct($"event_type").as("n_types"),
      countDistinct($"wd").as("n_wd"))
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing) // bounded: |types|·|weekdays| cells
    rowT.crossJoin(colT)
      .join(cells, Seq("event_type", "wd"), "left")
      .na.fill(0L, Seq("o"))
      .crossJoin(broadcast(tot))
      .withColumn("e_micro", expr(
        s"CAST(CAST(r AS $dec) * c * 1000000 div n AS BIGINT)"))
      .withColumn("term_u", expr(
        s"""CAST((CAST(o AS $dec) * n - CAST(r AS $dec) * c) *
            (CAST(o AS $dec) * n - CAST(r AS $dec) * c) * 1000000
            div (CAST(r AS $dec) * c * n) AS BIGINT)"""))
      .withColumn("chi2_u", sum($"term_u").over(all))
      .withColumn("dof", (($"n_types" - 1L) * ($"n_wd" - 1L)).cast("long"))
      .withColumn("v_milli", round(sqrt(
        d($"chi2_u") / lit(1000000.0) /
          d($"n" * least($"n_types" - 1L, $"n_wd" - 1L))) * 1000)
        .cast("long"))
      .select($"event_type", $"wd", $"o", $"e_micro", $"term_u",
        $"chi2_u", $"dof", $"v_milli")
      .orderBy($"event_type", $"wd")
  }

  /** One-way ANOVA of order value across the five order priorities —
    * fully integer-exact: SS splits are computed in micro-units via
    * wide-decimal floor divisions (Σs_g²·10⁶/n_g per group), and the F
    * statistic itself is ONE integer expression
    * SSB·(N−k)·1000 div (SSW·(k−1)) — no float anywhere, so the milli
    * value is exact, not rounded. Output: the per-priority means plus
    * the family row stats (F, η² in bp) repeated per row. One fact
    * groupBy; the family fold is k=5 rows.
    *
    * Headroom bound (the chiSquareTypeWeekday discipline): the F
    * numerator ssb_u·(N−k)·10³ scales like N²·σ²·10⁹ — at cent-scale
    * order values (σ ≈ 10⁷ cents) it brushes decimal38 past N ≈ 3·10⁷
    * orders. Beyond that, drop the 10⁶ micro scaling from a_u/b_u
    * before forming the ratio (costs ≤1 milli of F precision, buys ~6
    * digits of N headroom); under ANSI the overflow raises loudly, it
    * never silently wraps.
    */
  def anovaF(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val g = Tables(s, dir, "orders")
      .select($"o_orderpriority",
        round($"o_totalprice" * 100).cast("long").as("cents"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_g"), sum($"cents").as("s_g"),
        sum(($"cents" * $"cents").cast(dec)).as("ss_g"))
      // per-group Σs²·10⁶/n exceeds int64 → wide floor div, not `div`
      .withColumn("a_u", graft.functions.num.floorDivWide(
        expr(s"CAST(s_g AS $dec) * s_g * 1000000"), $"n_g"))
      .localCheckpoint() // family fold re-aggregates it
    val fam = g.agg(sum($"n_g").as("n"), sum($"s_g".cast(dec)).as("s_tot"),
      sum($"ss_g").as("ss_tot"), count(lit(1)).as("k"),
      sum($"a_u").as("a_u"))
      .withColumn("b_u", graft.functions.num.floorDivWide(
        expr("s_tot * s_tot * 1000000"), $"n"))
      .withColumn("ssb_u", $"a_u" - $"b_u")
      .withColumn("ssw_u", expr("ss_tot * 1000000") - $"a_u")
      .withColumn("sst_u", expr("ss_tot * 1000000") - $"b_u")
      .select($"k", $"n",
        expr("CAST(ssb_u * (n - k) * 1000 div (ssw_u * (k - 1)) AS BIGINT)")
          .as("f_milli"),
        expr("CAST(ssb_u * 10000 div sst_u AS BIGINT)").as("eta_sq_bp"))
    g.select($"o_orderpriority", $"n_g",
      expr("s_g div n_g").as("mean_cents"))
      .crossJoin(broadcast(fam))
      .orderBy($"o_orderpriority")
  }

  /** Kendall τ-b rank correlation between daily revenue and daily order
    * count — does volume move with value, measured on concordant vs
    * discordant day pairs with the tie-corrected denominator? The pair
    * space is calendar² (broadcast self-join, constant in data size);
    * the day rollup is the only fact-sized work. τ in milli via the one
    * fixed-shape sqrt over exact pair/tie counts.
    */
  def kendallTauDaily(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables(s, dir, "orders")
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("x"),
        count(lit(1)).as("y"))
      .localCheckpoint() // pair join (both sides) + tie rollups read it
    val a = daily.select($"day".as("da"), $"x".as("xa"), $"y".as("ya"))
    val b = daily.select($"day".as("db"), $"x".as("xb"), $"y".as("yb"))
    val pairs = a.join(broadcast(b), $"da" < $"db")
      .agg(sum((signum(($"xa" - $"xb").cast("double")) *
        signum(($"ya" - $"yb").cast("double"))).cast("long"))
        .as("nc_minus_nd"), count(lit(1)).as("n0"))
    val tx = daily.groupBy($"x").agg(count(lit(1)).as("t"))
      .agg(sum($"t" * ($"t" - 1L)).as("n1x2")) // 2·n1 (stay integer)
    val ty = daily.groupBy($"y").agg(count(lit(1)).as("t"))
      .agg(sum($"t" * ($"t" - 1L)).as("n2x2"))
    val nd = daily.agg(count(lit(1)).as("n_days"))
    pairs.crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
      .crossJoin(broadcast(nd))
      .select($"n_days", $"n0", $"nc_minus_nd",
        expr("n1x2 div 2").as("n1"), expr("n2x2 div 2").as("n2"),
        round(d($"nc_minus_nd") /
          sqrt(d($"n0" - expr("n1x2 div 2")) *
            d($"n0" - expr("n2x2 div 2"))) * 1000)
          .cast("long").as("tau_milli"))
  }

  /** Average precision of ranking events by `value` (desc, event_id
    * tie-break) as a predictor of purchase — the area-under-PR
    * companion to q_screen_auc's rank-sum AUC: AP = mean over positives
    * of precision@that-rank, exact in micro (each precision is one
    * integer floor division; the mean is one more). The global rank is
    * distributed ([[Relational.globalRowNumber]]: range partition +
    * parallel per-partition windows + broadcast offsets) — the ranking
    * never passes through one task. Also reports precision@100 in bp.
    */
  def averagePrecision(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
      .select($"event_id", $"value", ($"event_type" === "purchase").as("pos"))
    val ranked = Relational.globalRowNumber(ev,
      Seq($"value".desc, $"event_id")).withColumnRenamed("rk", "rk_all")
      .localCheckpoint() // positives re-rank + totals read it
    val posRanked = Relational.globalRowNumber(
      ranked.filter($"pos").select($"rk_all"), Seq($"rk_all"))
    val ap = posRanked
      .agg(count(lit(1)).as("n_pos"),
        sum(expr("rk * 1000000 div rk_all")).as("sum_prec_u"))
    val tot = ranked.agg(count(lit(1)).as("n_events"),
      sum(when($"pos" && $"rk_all" <= 100, 1L).otherwise(0L))
        .as("pos_at_100"))
    tot.crossJoin(broadcast(ap))
      .select($"n_events", $"n_pos",
        expr("sum_prec_u div n_pos").as("ap_u"),
        expr("pos_at_100 * 10000 div 100").as("p_at_100_bp"))
  }

  /** Holdout calibration audit of a binned score: fixed value bins
    * (50-wide, capped at 9) get a purchase-rate "prediction" from the
    * train half of an md5 event split, then the test half scores it —
    * per-bin observed-vs-predicted gap and the expected calibration
    * error (test-mass-weighted mean |gap|) in bp. The honest version of
    * a calibration table: rates come from data the evaluation never
    * saw. Two groupBys over the event scan; the ECE window runs over
    * ≤10 bin rows.
    */
  def holdoutCalibration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables(s, dir, "events")
      .select(TextOps.hashBucket($"event_id", "cal:").as("b"),
        least(lit(9L), floor($"value" / 50.0).cast("long")).as("bin"),
        ($"event_type" === "purchase").as("pos"))
      .localCheckpoint() // train and test rollups read it
    def rates(df: DataFrame, pfx: String) = df.groupBy($"bin")
      .agg(count(lit(1)).as(s"n_$pfx"),
        sum(when($"pos", 1L).otherwise(0L)).as(s"pos_$pfx"))
      .withColumn(s"r_${pfx}_bp", expr(s"pos_$pfx * 10000 div n_$pfx"))
    val tr = rates(ev.filter($"b" < 50), "train")
    val te = rates(ev.filter($"b" >= 50), "test")
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing) // ≤10 bin rows
    tr.join(te, Seq("bin")) // a bin must appear in train to be predicted
      .withColumn("gap_bp", abs($"r_train_bp" - $"r_test_bp"))
      .withColumn("w_num", sum($"n_test" * $"gap_bp").over(all))
      .withColumn("w_den", sum($"n_test").over(all))
      .withColumn("ece_bp", expr("w_num div w_den"))
      .select($"bin", $"n_train", $"r_train_bp", $"n_test", $"r_test_bp",
        $"gap_bp", $"ece_bp")
      .orderBy($"bin")
  }

  /** Link prediction / triadic-closure audit over the near-dup
    * candidate graph: every 2-hop-connected pair (u,w) gets the classic
    * neighborhood scores — common-neighbor count, resource-allocation
    * Σ 1/deg(z) in micro (the integer-exact sibling of Adamic–Adar),
    * neighbor-Jaccard in bp, preferential attachment deg·deg — plus an
    * `is_edge` flag for whether LSH already links the pair. Non-edge
    * rows are the "which pairs did banding miss" candidates a second
    * verification pass would probe first; edge rows calibrate the score
    * threshold (what do KNOWN links score?). On a dup-family corpus the
    * families band into near-cliques, so open wedges can be rare — the
    * flag keeps the audit informative either way. Wedge enumeration
    * goes through centers with deg ≤ `maxFanout` (hub caps bound the
    * wedge count by Σ_z deg(z)² ≤ cap·|E| — the standard guard that
    * keeps 2-hop joins linear in edges at any scale); degrees in the
    * Jaccard are the uncapped ones.
    */
  def linkPrediction(s: SparkSession, dir: String,
                     maxFanout: Long = 64L): DataFrame = {
    import s.implicits._
    val pairs = Dedup.sharedLshPairs(s, dir)
    val edges = pairs.select($"doc_a".as("a"), $"doc_b".as("b"))
      .union(pairs.select($"doc_b".as("a"), $"doc_a".as("b")))
      .localCheckpoint() // degrees + both wedge legs read it
    val deg = edges.groupBy($"a").agg(count(lit(1)).as("dg"))
      .localCheckpoint() // center filter + two endpoint joins read it
    val zdeg = deg.select($"a".as("z"), $"dg".as("dz"))
      .filter($"dz" <= maxFanout)
    val wedges = edges.select($"a".as("z"), $"b".as("u")).join(zdeg, "z")
      .join(edges.select($"a".as("z"), $"b".as("w")), "z")
      .filter($"u" < $"w")
      .groupBy($"u", $"w")
      .agg(count(lit(1)).as("cn"), sum(expr("1000000 div dz")).as("ra_u"))
    wedges
      .join(pairs.select($"doc_a".as("u"), $"doc_b".as("w"),
        lit(true).as("is_edge")), Seq("u", "w"), "left")
      .na.fill(false, Seq("is_edge"))
      .join(deg.select($"a".as("u"), $"dg".as("du")), "u")
      .join(deg.select($"a".as("w"), $"dg".as("dw")), "w")
      .select($"u".as("doc_a"), $"w".as("doc_b"), $"is_edge", $"cn", $"ra_u",
        expr("cn * 10000 div (du + dw - cn)").as("jacc_bp"),
        ($"du" * $"dw").as("pa"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** Hurst exponent of daily revenue by rescaled-range analysis — the
    * long-memory diagnostic the ACF can't give in one number: H ≈ 0.5
    * is a random walk, H > 0.5 trending/persistent (shocks compound —
    * CUSUM-style monitors fire late), H < 0.5 mean-reverting. Classic
    * R/S: split the day series into complete blocks of w ∈ {8,16,32,
    * 64,128}; per block the range of mean-adjusted cumulative sums over
    * the population sd — algebra keeps both exact-integer-scaled
    * (zₖ = w·cumsumₖ − k·s, so R/S = (max z − min z)/√(w·Σv²−s²), ONE
    * sqrt per block, micro-rounded so the cross-block mean is
    * order-independent); H is the 5-point log-log OLS slope from
    * integer-scaled logs. The day rank is a calendar-bounded frame (the
    * mannKendall dispensation); block prefix sums run partitioned.
    */
  def hurstExponent(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables(s, dir, "orders")
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("v"))
      .withColumn("rk", row_number().over(Window.orderBy($"day"))
        .cast("long")) // calendar-bounded frame
      .localCheckpoint()
    val wins = daily.crossJoin(
      broadcast(Seq(8L, 16L, 32L, 64L, 128L).toDF("w")))
      .withColumn("blk", expr("(rk - 1) div w"))
      .withColumn("k", expr("(rk - 1) % w + 1"))
    val byBlk = Window.partitionBy($"w", $"blk").orderBy($"rk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val blocks = wins
      .withColumn("cum", sum($"v").over(byBlk))
      .withColumn("s_blk",
        sum($"v").over(Window.partitionBy($"w", $"blk")))
      .withColumn("z", $"w" * $"cum" - $"k" * $"s_blk")
      .groupBy($"w", $"blk")
      .agg(count(lit(1)).as("nb"), sum($"v").as("sv"),
        sum($"v".cast(dec) * $"v").as("ssv"),
        max($"z").as("z_max"), min($"z").as("z_min"))
    val rs = blocks.filter($"nb" === $"w") // complete blocks only
      .withColumn("var_w", ($"w".cast(dec) * $"ssv" -
        $"sv".cast(dec) * $"sv".cast(dec)))
      .filter($"var_w" > 0) // constant block: R/S undefined
      .withColumn("rs_u", round(($"z_max" - $"z_min").cast("double") /
        sqrt($"var_w".cast("double")) * 1000000).cast("long"))
      .groupBy($"w")
      .agg(count(lit(1)).as("n_blocks"), sum($"rs_u").as("rs_sum_u"))
      .withColumn("rs_mean_u", expr("rs_sum_u div n_blocks"))
      .withColumn("lw_u", round(log($"w".cast("double")) * 1000000)
        .cast("long"))
      .withColumn("lrs_u",
        round(log($"rs_mean_u".cast("double") / lit(1000000.0)) * 1000000)
          .cast("long"))
    val all = Window.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing) // ≤5 window-size rows
    rs
      .withColumn("kk", count(lit(1)).over(all))
      .withColumn("sx", sum($"lw_u").over(all))
      .withColumn("sy", sum($"lrs_u").over(all))
      .withColumn("sxy", sum($"lw_u" * $"lrs_u").over(all))
      .withColumn("sxx", sum($"lw_u" * $"lw_u").over(all))
      .withColumn("hurst_milli", round(
        ($"kk" * $"sxy" - $"sx" * $"sy").cast("double") /
          ($"kk" * $"sxx" - $"sx" * $"sx").cast("double") * 1000)
        .cast("long"))
      .select($"w", $"n_blocks", $"rs_mean_u", $"hurst_milli")
      .orderBy($"w")
  }

  /** Dynamic time warping between every pair of nation weekday revenue
    * profiles — the alignment-tolerant series distance the aligned L1
    * isn't: a nation whose week is shifted by a day (late-posting
    * billing, timezone) is "far" pointwise but near under warping, and
    * the dtw/L1 ratio in bp says exactly how much of the distance was
    * alignment artifact. The fact scan reduces to a |nations|×7 profile
    * grid — dimension-bounded at ANY scale factor — so the DP itself is
    * a bounded driver fold (the [[Relational.holtWinters]]
    * dispensation: collect the audit-sized grid once, fold, parallelize
    * the result). MEASURED dead end: running the DP as 12 anti-diagonal
    * wavefront rounds of shifted-coordinate joins (the
    * voptimalHistogram level-DP pattern) profiled at ~41 s at sf0.1 —
    * pure round-scheduling overhead on ≤15k-row frames — vs sub-second
    * for the fold over the identical integers. Wavefront-as-rounds is
    * for DATA-sized DP frontiers; dimension-bounded grids belong on the
    * driver.
    */
  def dtwWeekdayProfiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val prof = Tables(s, dir, "orders")
      .join(Tables(s, dir, "customer")
        .select($"c_custkey".as("o_custkey"), $"c_nationkey"), Seq("o_custkey"))
      .groupBy($"c_nationkey",
        graft.functions.dates.weekdayIndex($"o_orderdate".cast("date"))
          .cast("long").as("wd"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("v"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val nations = prof.keys.map(_._1).toSeq.distinct.sorted
    val wds = prof.keys.map(_._2).toSeq.distinct.sorted
    val m = wds.length
    def series(nk: Int): Array[Long] =
      wds.map(wd => prof.getOrElse((nk, wd), 0L)).toArray // absent = 0
    val rows = for {
      ai <- nations.indices; bi <- (ai + 1) until nations.length
    } yield {
      val xs = series(nations(ai)); val ys = series(nations(bi))
      val dp = Array.fill(m, m)(0L)
      for (i <- 0 until m; j <- 0 until m) {
        val c = math.abs(xs(i) - ys(j))
        dp(i)(j) = c + ((i, j) match {
          case (0, 0) => 0L
          case (0, _) => dp(0)(j - 1)
          case (_, 0) => dp(i - 1)(0)
          case _ => math.min(dp(i - 1)(j),
            math.min(dp(i)(j - 1), dp(i - 1)(j - 1)))
        })
      }
      val l1 = (0 until m).map(i => math.abs(xs(i) - ys(i))).sum
      (nations(ai), nations(bi), dp(m - 1)(m - 1), l1,
        if (l1 > 0) dp(m - 1)(m - 1) * 10000 / l1 else -1L)
    }
    s.createDataFrame(s.sparkContext.parallelize(rows, 1))
      .toDF("nation_a", "nation_b", "dtw_cents", "l1_cents", "gain")
      .select($"nation_a", $"nation_b", $"dtw_cents", $"l1_cents",
        when($"gain" >= 0L, $"gain").as("dtw_over_l1_bp"))
      .orderBy($"nation_a", $"nation_b")
  }

  /** HITS hubs & authorities over the supplier→customer supply graph
    * (distinct edges from lineitem ⋈ orders): which suppliers reach the
    * best-supplied customers, and which customers are reached by the
    * strongest suppliers — the mutually-recursive centrality pair,
    * unrolled two half-steps with max-normalization to 10⁶ after each
    * (integer floor division, so the distributed sums stay exact).
    * Output: one row per node, role-tagged ('auth' customers carry the
    * second-round authority; 'hub' suppliers the first-round hub).
    * Per half-step: one edge⋈score join + one map-side-combined sum —
    * the PageRank shape, no per-iteration global sort.
    */
  def hitsSupplierCustomer(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = Tables(s, dir, "lineitem").select($"l_orderkey", $"l_suppkey")
      .join(Tables(s, dir, "orders")
        .select($"o_orderkey".as("l_orderkey"), $"o_custkey"),
        Seq("l_orderkey"))
      .select($"l_suppkey".as("sk"), $"o_custkey".as("ck"))
      .distinct()
      .localCheckpoint() // three propagation joins read it
    // half-step 1: authorities from unit hubs (h0 = 10⁶ per supplier)
    val a1 = e.groupBy($"ck").agg((count(lit(1)) * 1000000L).as("a_raw"))
    val a1n = a1.crossJoin(broadcast(a1.agg(max($"a_raw").as("mx"))))
      .select($"ck", expr("a_raw * 1000000 div mx").as("a_u"))
      .localCheckpoint() // hub step joins it; keep lineage flat
    // half-step 2: hubs from normalized authorities
    val h1 = e.join(a1n, "ck").groupBy($"sk").agg(sum($"a_u").as("h_raw"))
    val h1n = h1.crossJoin(broadcast(h1.agg(max($"h_raw").as("mx"))))
      .select($"sk", expr("h_raw * 1000000 div mx").as("h_u"))
      .localCheckpoint()
    // half-step 3: second-round authorities from normalized hubs
    val a2 = e.join(h1n, "sk").groupBy($"ck").agg(sum($"h_u").as("a_raw"))
    val a2n = a2.crossJoin(broadcast(a2.agg(max($"a_raw").as("mx"))))
      .select($"ck", expr("a_raw * 1000000 div mx").as("a_u"))
    h1n.select(lit("hub").as("role"), $"sk".as("node_id"),
      $"h_u".as("score_u"))
      .union(a2n.select(lit("auth").as("role"), $"ck".as("node_id"),
        $"a_u".as("score_u")))
      .orderBy($"role", $"node_id")
  }
}
