package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class EventsSpec extends SparkSpec {
  import spark.implicits._

  test("funnelDropoffTest: fast-conversion cells recount exactly from " +
       "raw events; the A/A z stays insignificant") {
    val ev = Tables(spark, sf, "events")
      .select($"user_id", $"event_type", $"ts")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).toInstant))
    val byUser = ev.groupBy(_._1)
    def arm(u: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"fz:$u".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % 2
    }
    val trans = byUser.toSeq.flatMap { case (u, es) =>
      def firstOf(t: String) =
        es.filter(_._2 == t).map(_._3).sorted.headOption
      def firstAfter(t: String, after: java.time.Instant) =
        es.filter(e => e._2 == t && e._3.isAfter(after))
          .map(_._3).sorted.headOption
      for {
        v <- firstOf("view").toSeq
        c <- firstAfter("click", v).toSeq
        row <- Seq((1, u, !c.isAfter(v.plusSeconds(86400)))) ++
          firstAfter("purchase", c).map(p =>
            (2, u, !p.isAfter(c.plusSeconds(86400))))
      } yield row
    }
    val rows = Events.funnelDropoffTest(spark, sf).collect()
      .map(r => r.getInt(0) -> r).toMap
    Seq(1, 2).foreach { t =>
      val g = trans.filter(_._1 == t)
      val (a, b) = g.partition(x => arm(x._2) == 0L)
      val r = rows(t)
      assert(r.getAs[Long]("n_a") === a.length.toLong, s"n_a t=$t")
      assert(r.getAs[Long]("conv_a") === a.count(_._3).toLong)
      assert(r.getAs[Long]("n_b") === b.length.toLong)
      assert(r.getAs[Long]("conv_b") === b.count(_._3).toLong)
      assert(r.getAs[Long]("rate_a_bp") ===
        a.count(_._3).toLong * 10000L / a.length)
      val (na, ca, nb, cb) = (a.length.toDouble, a.count(_._3).toDouble,
        b.length.toDouble, b.count(_._3).toDouble)
      val p = (ca + cb) / (na + nb)
      val z = math.round((ca / na - cb / nb) /
        math.sqrt(p * (1 - p) * (1 / na + 1 / nb)) * 1000)
      assert(math.abs(r.getAs[Long]("z_milli") - z) <= 1L, s"z t=$t")
      // content-blind arms: a significant A/A z indicts the harness
      assert(!r.getAs[Boolean]("significant_5pct"), s"A/A alarm at t=$t")
    }
  }

  test("funnelStages: one row per user, stages monotone vs. raw event presence") {
    val stages = Events.funnelStages(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val users = Tables(spark, sf, "events")
      .select($"user_id").distinct().collect().map(_.getLong(0)).toSet
    assert(stages.keySet === users)
    assert(stages.values.forall(s => s >= 0 && s <= 3))
    // a user with no view at all must be stage 0
    val viewers = Tables(spark, sf, "events")
      .filter($"event_type" === "view")
      .select($"user_id").distinct().collect().map(_.getLong(0)).toSet
    stages.foreach { case (u, s) =>
      if (!viewers.contains(u)) assert(s === 0)
      else assert(s >= 1)
    }
    // recount stage-3 users independently: purchase after click after view
    val ev = Tables(spark, sf, "events")
      .select($"user_id", $"event_type", unix_micros($"ts")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val expected3 = ev.collect { case (u, rows) =>
      val views = rows.filter(_._2 == "view").map(_._3)
      val s3 = views.nonEmpty && {
        val v = views.min
        val clicks = rows.filter(r => r._2 == "click" && r._3 > v).map(_._3)
        clicks.nonEmpty && {
          val c = clicks.min
          rows.exists(r => r._2 == "purchase" && r._3 > c)
        }
      }
      u -> s3
    }.filter(_._2).map(_._1).toSet
    assert(stages.filter(_._2 == 3).keySet === expected3)
  }

  test("valueDeciles: 10 near-equal buckets per type, contiguous value ranges") {
    val rows = Events.valueDeciles(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val typeCounts = Tables(spark, sf, "events")
      .groupBy($"event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (t, ds) =>
      assert(ds.map(_._2).sorted.toSeq === (1 to 10))
      assert(ds.map(_._3).sum === typeCounts(t))
      // ntile: bucket sizes differ by at most 1, larger buckets first
      val sizes = ds.sortBy(_._2).map(_._3)
      assert(sizes.max - sizes.min <= 1 && sizes.sorted.reverse.toSeq === sizes.toSeq)
      // value ranges are non-overlapping and ordered across deciles
      ds.sortBy(_._2).sliding(2).foreach {
        case Array(lo, hi) => assert(lo._5 <= hi._4 + 1e-9)
        case _ =>
      }
    }
  }

  test("cohortRetention: offset-0 equals cohort size, totals match order months") {
    val rows = Events.cohortRetention(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    val cohorts = Tables(spark, sf, "orders")
      .groupBy($"o_custkey")
      .agg(min(date_trunc("month", $"o_orderdate").cast("date")).as("cm"))
      .groupBy($"cm").count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val zero = rows.filter(_._2 == 0).map(r => r._1 -> r._3).toMap
    assert(zero === cohorts) // every customer is active in their cohort month
    assert(rows.forall(_._2 >= 0))
    // per-cohort retention never exceeds the cohort's size
    rows.foreach { case (cm, _, n) => assert(n <= cohorts(cm)) }
  }

  test("approxQuantileAudit: every sketch estimate is inside its rank band") {
    val rows = Events.approxQuantileAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    val nTypes = Tables(spark, sf, "events")
      .select($"event_type").distinct().count()
    assert(rows.length.toLong === nTypes * 4)
    assert(rows.map(_._2).distinct.sorted.toSeq === Seq(0.25, 0.5, 0.75, 0.95))
    rows.foreach { case (t, p, ok) => assert(ok, s"rank band violated at ($t, $p)") }
  }

  test("dailyAnomalies matches a driver-side z-score recomputation") {
    val got = Events.dailyAnomalies(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    val daily = Tables(spark, sf, "events")
      .select($"event_type", to_date($"ts").cast("string").as("day")).collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((t, d), n) => (t, d, n) }
    val expected = daily.groupBy(_._1).toSeq.flatMap { case (t, ds) =>
      val ns = ds.map(_._3)
      val nd = ns.length
      val sn = ns.sum
      val sn2 = ns.map(n => n * n).sum
      val mean = sn.toDouble / nd
      val variance = (sn2.toDouble - sn.toDouble * sn / nd) / (nd - 1)
      ds.map { case (_, d, n) =>
        val z = BigDecimal((n - mean) / math.sqrt(variance))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (t, d, n, z, math.abs(z) >= 2.0)
      }
    }.sortBy(r => (r._1, r._2))
    assert(got.toSeq === expected)
    assert(got.exists(_._5), "synthetic data should contain at least one anomaly")
  }

  test("typeTransitions: pair counts conserve events, probs sum to 1 per row type") {
    val rows = Events.typeTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val nEvents = Tables(spark, sf, "events").count()
    val nUsers = Tables(spark, sf, "events")
      .select($"user_id").distinct().count()
    // each user's sequence of k events yields k-1 transitions
    assert(rows.map(_._3).sum === nEvents - nUsers)
    rows.groupBy(_._1).foreach { case (ft, grp) =>
      val total = grp.map(_._3).sum
      grp.foreach { case (_, _, n, p) =>
        assert(p === BigDecimal(n.toDouble / total)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
          s"prob mismatch for $ft")
      }
    }
  }

  test("sourceReconciliation: day-grain totals match per-source recounts") {
    import org.apache.spark.sql.functions.to_date
    val rows = Relational.sourceReconciliation(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getString(5)))
    val orderDays = Tables(spark, sf, "orders")
      .groupBy(to_date($"o_orderdate").as("d")).count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val purchaseDays = Tables(spark, sf, "events")
      .filter($"event_type" === "purchase")
      .groupBy(to_date($"ts").as("d")).count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(rows.map(_._1).toSet === orderDays.keySet ++ purchaseDays.keySet)
    rows.foreach { case (day, nOrd, nPur, oTot, eTot, status) =>
      assert(nOrd === orderDays.getOrElse(day, 0L))
      assert(nPur === purchaseDays.getOrElse(day, 0L))
      val expectedStatus =
        if (!orderDays.contains(day)) "events_only"
        else if (!purchaseDays.contains(day)) "orders_only"
        else "both"
      assert(status === expectedStatus, s"status wrong on $day")
      if (status == "events_only") assert(oTot === 0.0)
      if (status == "orders_only") assert(eTot === 0.0)
    }
  }

  test("sessionOutageOverlap: banded equi-join equals the naive interval join") {
    // lower threshold at sf0.001 (fewer events/hour) so windows exist
    val banded = Events.sessionOutageOverlap(spark, sf, errPerHour = 2)
    val out = banded.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty, "expected at least one session-outage overlap")
    // naive twin: same sessions/windows, direct O(n*m) scan in Scala
    val hourUs = 3600L * 1000000
    val gapUs = 30L * 60 * 1000000
    val evRows = Tables(spark, sf, "events")
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val windows = evRows.filter(_._2 == "error").groupBy(_._3 / hourUs)
      .collect { case (h, es) if es.length >= 2 => (h * hourUs, (h + 1) * hourUs) }
      .toSeq
    val sessions = evRows.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val ts = rows.map(_._3).sorted
      val bounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      ts.foreach { t =>
        if (bounds.nonEmpty && t - bounds.last._2 <= gapUs)
          bounds(bounds.size - 1) = (bounds.last._1, t)
        else bounds += ((t, t))
      }
      bounds.map { case (a, b) => (u, a, b) }
    }
    val expected = sessions.flatMap { case (u, a, b) =>
      val hits = windows.filter { case (ws, we) => a < we && ws <= b }
      if (hits.isEmpty) None
      else Some((u, a, hits.size.toLong,
        hits.map { case (ws, we) => math.min(b, we) - math.max(a, ws) }.sum))
    }.sortBy(t => (t._1, t._2))
    assert(out.toSeq === expected)
  }

  test("weekdayProfile: Monday=0 recount, shares floor to basis points") {
    val got = Events.weekdayProfile(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val events = graft.Tables(spark, sf, "events")
      .select("event_type", "ts").collect()
      .map(r => (r.getString(0),
        r.getTimestamp(1).toLocalDateTime.getDayOfWeek.getValue - 1))
    val expected = events.groupBy(identity).map { case ((t, w), v) =>
      (t, w, v.length.toLong)
    }.toSeq
    val totals = events.groupBy(_._1).map { case (t, v) => t -> v.length.toLong }
    val exp = expected.map { case (t, w, n) =>
      (t, w, n, n * 10000 / totals(t))
    }.sortBy(e => (e._1, e._2))
    assert(got.toSeq === exp)
    got.foreach { case (_, w, n, bp) =>
      assert(w >= 0 && w <= 6 && n > 0 && bp >= 0 && bp <= 10000)
    }
    // per-type shares sum to ~10000 (floor losses < 7 bp)
    got.groupBy(_._1).foreach { case (t, g) =>
      val s2 = g.map(_._4).sum
      assert(s2 > 10000 - 7 && s2 <= 10000, s"$t share sum $s2")
    }
  }

  test("sessionOutageOverlap never plans a nested-loop or cartesian join") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val nodes = planNodes(Events.sessionOutageOverlap(spark, sf, errPerHour = 2))
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "interval overlap must band to an equi-join, not BNLJ")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
  }

  test("psiDrift matches a sequential fixed-point replay and conserves mass") {
    import spark.implicits._
    val ev = graft.Tables(spark, sf, "events")
      .select(dayofmonth($"ts").as("d"), $"value")
      .as[(Int, Double)].collect()
    val bins = ev.map { case (d, v) =>
      (math.min(9L, math.floor(v / 50.0).toLong), d <= 15)
    }
    val refN = (0L to 9L).map(b => bins.count(x => x._1 == b && x._2).toLong)
    val curN = (0L to 9L).map(b => bins.count(x => x._1 == b && !x._2).toLong)
    val (rt, ct) = (refN.sum, curN.sum)
    val rows = Events.psiDrift(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length === 10)
    rows.foreach { case (b, rn, cn, prefBp, pcurBp, lnrU, contrib) =>
      val i = b.toInt
      assert(rn === refN(i) && cn === curN(i), s"bin $b counts")
      assert(prefBp === (rn + 1) * 10000 / (rt + 10))
      assert(pcurBp === (cn + 1) * 10000 / (ct + 10))
      val expLn = java.math.BigDecimal.valueOf(
          math.log(((rn + 1) * (ct + 10)).toDouble /
            ((cn + 1) * (rt + 10)).toDouble) * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      assert(lnrU === expLn, s"bin $b ln term")
      assert(contrib === (prefBp - pcurBp) * lnrU)
    }
    assert(rows.map(_._2).sum === rt && rows.map(_._3).sum === ct)
    // PSI of two halves of one stationary stream should read "no drift"
    val psi = rows.map(_._7).sum.toDouble / 1e10
    assert(psi >= 0.0 && psi < 0.1, s"stationary stream PSI $psi")
  }

  test("robustStats matches a sequential quantize-sort-clamp replay") {
    import spark.implicits._
    def r4(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
    // integer-exact interpolated percentile over a sorted array, in
    // hundredth-position units — the operator's definition
    def qx100(a: Array[Long], p: Long): Long = {
      val pos = p * (a.length - 1)
      val lo = (pos / 100).toInt
      val rem = pos % 100
      if (rem == 0) a(lo) * 100
      else a(lo) * (100 - rem) + a(lo + 1) * rem
    }
    val ev = graft.Tables(spark, sf, "events")
      .select($"event_type", $"value").as[(String, Double)].collect()
    val expected = ev.groupBy(_._1).map { case (t, rows) =>
      val vq = rows.map(r => java.math.BigDecimal.valueOf(r._2 * 10000)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue).sorted
      val n = vq.length.toLong
      val loq = (qx100(vq, 5) + 99) / 100
      val medx100 = qx100(vq, 50)
      val hiq = qx100(vq, 95) / 100
      val wsum = vq.map(v => math.min(math.max(v, loq), hiq)).sum
      val adev = vq.map(v => (v * 100 - medx100).abs).sorted
      t -> ((n, r4(loq / 10000.0), r4(hiq / 10000.0),
        r4(wsum.toDouble / n / 10000.0), r4(medx100 / 1e6),
        r4(qx100(adev, 50) / 1e8)))
    }
    val got0 = Events.robustStats(spark, sf)
      .as[(String, Long, Double, Double, Double, Double, Double)].collect()
    assert(got0.length === expected.size)
    got0.foreach { case (t, n, p05, p95, wm, med, mad) =>
      val (en, e05, e95, ewm, emed, emad) = expected(t)
      assert(n === en, s"$t n")
      assert(p05 === e05, s"$t p05"); assert(p95 === e95, s"$t p95")
      assert(wm === ewm, s"$t winsor_mean")
      assert(med === emed, s"$t median"); assert(mad === emad, s"$t mad")
      // winsorizing can only pull the mean toward the median's side:
      // it must land inside the clamp bounds
      assert(wm >= p05 && wm <= p95, s"$t winsor mean inside clamp")
      assert(mad >= 0.0, t)
    }
  }

  test("cupedAdjust matches a sequential BigInt-moment replay") {
    import spark.implicits._
    def r(x: Double, k: Int): Double = java.math.BigDecimal.valueOf(x)
      .setScale(k, java.math.RoundingMode.HALF_UP).doubleValue
    val ev = graft.Tables(spark, sf, "events")
      .select($"user_id", dayofmonth($"ts") <= 15, $"value")
      .as[(Long, Boolean, Double)].collect()
    val users = ev.groupBy(_._1).map { case (u, rows) =>
      def q(d: Double) = java.math.BigDecimal.valueOf(d * 10000)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      (u % 2, rows.filter(_._2).map(r => q(r._3)).sum,
        rows.filter(!_._2).map(r => q(r._3)).sum)
    }.toArray
    val n = users.length.toLong
    val sx = users.map(_._2).sum; val sy = users.map(_._3).sum
    val sxy = users.map(u => BigInt(u._2) * u._3).sum
    val sxx = users.map(u => BigInt(u._2) * u._2).sum
    val theta = (BigInt(n) * sxy - BigInt(sx) * sy).toDouble /
      (BigInt(n) * sxx - BigInt(sx) * sx).toDouble
    val meanX = sx.toDouble / n
    val expected = users.groupBy(_._1).map { case (arm, us) =>
      val na = us.length.toLong
      val sxa = us.map(_._2).sum; val sya = us.map(_._3).sum
      val den = (na * (na - 1)).toDouble
      val vy = (BigInt(na) * us.map(u => BigInt(u._3) * u._3).sum -
        BigInt(sya) * sya).toDouble / den
      val vx = (BigInt(na) * us.map(u => BigInt(u._2) * u._2).sum -
        BigInt(sxa) * sxa).toDouble / den
      val cxy = (BigInt(na) * us.map(u => BigInt(u._2) * u._3).sum -
        BigInt(sxa) * sya).toDouble / den
      val vc = vy - 2.0 * theta * cxy + theta * theta * vx
      arm -> ((na, r(sya * 100 / na / 1e6, 4),
        r((sya.toDouble / na - theta * (sxa.toDouble / na - meanX)) / 1e4,
          4),
        r(vy / 1e8, 4), r(vc / 1e8, 4), r((1.0 - vc / vy) * 100, 4)))
    }
    val got = Events.cupedAdjust(spark, sf)
      .as[(Int, Long, Double, Double, Double, Double, Double, Double)]
      .collect()
    assert(got.length === 2)
    got.foreach { case (arm, na, th, mp, mc, vp, vc, vr) =>
      val (ena, emp, emc, evp, evc, evr) = expected(arm)
      assert(na === ena, s"arm $arm n")
      assert(th === r(theta, 6), s"arm $arm theta")
      assert(mp === emp, s"arm $arm mean_post")
      assert(mc === emc, s"arm $arm mean_cuped")
      assert(vp === evp, s"arm $arm var_post")
      assert(vc === evc, s"arm $arm var_cuped")
      assert(vr === evr, s"arm $arm vr_pct")
      // the var(Y') <= var(Y) guarantee is POOLED-only (theta is the
      // pooled OLS slope); per-arm it can inflate when X barely
      // predicts Y, so only pin positivity and the right magnitude
      assert(vc > 0 && vc <= vp * 1.5, s"arm $arm adjusted variance sane")
    }
    assert(got.map(_._2).sum === n)
  }

  /** The early/late halves exactly as Events.valueHalves builds them. */
  private def halves(): (Array[Long], Array[Long]) = {
    val ev = Tables(spark, sf, "events")
      .select(unix_micros($"ts"), round($"value" * 10000).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val mid = Math.floorDiv(ev.map(_._1).min + ev.map(_._1).max, 2L)
    (ev.filter(_._1 <= mid).map(_._2), ev.filter(_._1 > mid).map(_._2))
  }

  test("ksDrift: statistic equals a sequential two-sample KS recount") {
    val (early, late) = halves()
    val n1 = early.length.toLong
    val n2 = late.length.toLong
    val points = (early ++ late).distinct.sorted
    def gap(v: Long): Long =
      math.abs(early.count(_ <= v) * n2 - late.count(_ <= v) * n1)
    val dNum = points.map(gap).max
    val row = Events.ksDrift(spark, sf).collect().head
    assert(row.getAs[Long]("n_early") === n1)
    assert(row.getAs[Long]("n_late") === n2)
    assert(row.getAs[Long]("d_num") === dNum)
    assert(row.getAs[Long]("d_bp") === dNum * 10000 / (n1 * n2))
    assert(row.getAs[Long]("at_vq") === points.filter(gap(_) == dNum).min)
    // verdict consistency: drifted iff d_bp clears the alpha=0.05 bar
    val crit = math.round(13581.0 * math.sqrt((n1 + n2).toDouble / (n1 * n2).toDouble))
    assert(row.getAs[Long]("crit_bp") === crit)
    assert(row.getAs[Boolean]("drifted") === (dNum * 10000 / (n1 * n2) >= crit))
  }

  test("poissonBootstrap: seeded weights and replicate means replay " +
       "exactly; the interval brackets the point estimate") {
    def md5hex60(s0: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map("%02x".format(_)).mkString.substring(0, 15), 16)
    }
    val th = Events.poissonThresholds
    def weight(u: Long): Long =
      th.zipWithIndex.find { case (t, _) => u < t }
        .map(_._2.toLong).getOrElse(8L)
    val rows0 = Tables(spark, sf, "events")
      .select($"event_type", $"event_id", round($"value" * 10000).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows0.groupBy(_._1).map { case (t, evs) =>
      val means = (1 to 20).map { rep =>
        var swx = 0L; var sw = 0L
        evs.foreach { case (_, id, vq) =>
          val w = weight(md5hex60(s"boot:$id:$rep"))
          swx += w * vq; sw += w
        }
        (swx / sw, rep)
      }.sortBy(identity)
      val point = evs.map(_._3).sum / evs.length
      t -> (evs.length.toLong, point, means(1)._1, means(18)._1)
    }
    val got = Events.poissonBootstrap(spark, sf).collect()
    got.foreach { r =>
      val t = r.getAs[String]("event_type")
      val (n, point, lo, hi) = expected(t)
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("mean_q") === point)
      assert(r.getAs[Long]("n_reps") === 20L)
      assert(r.getAs[Long]("ci_lo_q") === lo, s"ci_lo for $t")
      assert(r.getAs[Long]("ci_hi_q") === hi, s"ci_hi for $t")
      assert(lo <= point && point <= hi,
        s"interval must bracket the point estimate for $t")
    }
  }

  test("neymanAllocation: sigma, weights and Hamilton quotas recount; " +
       "allocations sum to the budget exactly") {
    val byType = Tables(spark, sf, "events")
      .select($"event_type", round($"value" * 10000).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val budget = 10000L
    val stats = byType.toSeq.sortBy(_._1).map { case (t, vs) =>
      val n = BigInt(vs.length)
      val sx = vs.map(BigInt(_)).sum
      val sxx = vs.map(v => BigInt(v) * BigInt(v)).sum
      val sigma = math.round(math.sqrt(
        (n * sxx - sx * sx).toDouble / (n * (n - 1)).toDouble))
      (t, n.toLong, sigma, n.toLong * sigma)
    }
    val wt = stats.map(_._4).sum
    val bases = stats.map { case (t, _, _, w) => (t, budget * w / wt, (budget * w) % wt) }
    val deficit = budget - bases.map(_._2).sum
    val bonus = bases.sortBy { case (t, _, r) => (-r, t) }
      .take(deficit.toInt).map(_._1).toSet
    val expected = bases.map { case (t, b, _) =>
      t -> (b + (if (bonus(t)) 1L else 0L)) }.toMap
    val rows = Events.neymanAllocation(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("alloc")).sum === budget)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val st = stats.find(_._1 == t).get
      assert(r.getAs[Long]("n_h") === st._2)
      assert(r.getAs[Long]("sigma_q") === st._3)
      assert(r.getAs[Long]("w") === st._4)
      assert(r.getAs[Long]("alloc") === expected(t), s"alloc for $t")
    }
  }

  test("quantileTransform: midrank CDF recounts; transform is monotone") {
    val byType = Tables(spark, sf, "events")
      .select($"event_type", round($"value" * 10000).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = Events.quantileTransform(spark, sf).collect()
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val vs = byType(t)
      val n = vs.length.toLong
      val sorted = rs.sortBy(_.getAs[Long]("vq"))
      var cb = 0L
      sorted.foreach { r =>
        val vq = r.getAs[Long]("vq")
        val tt = vs.count(_ == vq).toLong
        assert(r.getAs[Long]("t") === tt)
        assert(r.getAs[Long]("pct_bp") === (2 * cb + tt) * 10000 / (2 * n))
        cb += tt
      }
      assert(cb === n)
      // monotone nondecreasing in value
      assert(sorted.map(_.getAs[Long]("pct_bp")).sliding(2)
        .forall(p => p.length < 2 || p(0) <= p(1)))
    }
  }

  test("emdDrift: exact 1-D Wasserstein recounts from the ECDF integral") {
    val (early, late) = halves()
    val n1 = early.length.toLong
    val n2 = late.length.toLong
    val points = (early ++ late).distinct.sorted
    var w1 = BigInt(0)
    points.sliding(2).foreach {
      case Array(v, next) =>
        val gap = math.abs(early.count(_ <= v) * n2 - late.count(_ <= v) * n1)
        w1 += BigInt(gap) * BigInt(next - v)
      case _ =>
    }
    val row = Events.emdDrift(spark, sf).collect().head
    assert(row.getAs[Long]("n_early") === n1)
    assert(row.getAs[Long]("n_late") === n2)
    assert(BigInt(row.getAs[Long]("w1_num")) === w1)
    assert(row.getAs[Long]("w1_micro") === (w1 * 100 / (n1 * n2)).toLong)
  }

  test("mannWhitney: U, midranks and tie term equal a sequential recount") {
    val (early, late) = halves()
    val n1 = early.length.toLong
    val n2 = late.length.toLong
    val counts = (early.map((_, 1L, 1L)) ++ late.map((_, 1L, 0L)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (v, g) => (v, g.map(_._2).sum, g.map(_._3).sum) }
    var cb = 0L; var r1x2 = 0L; var tie = 0L
    counts.foreach { case (_, t, t1) =>
      r1x2 += t1 * (2 * cb + t + 1); tie += t * t * t - t; cb += t
    }
    val u1x2 = r1x2 - n1 * (n1 + 1)
    val row = Events.mannWhitney(spark, sf).collect().head
    assert(row.getAs[Long]("n_early") === n1)
    assert(row.getAs[Long]("n_late") === n2)
    assert(row.getAs[Long]("r1_x2") === r1x2)
    assert(row.getAs[Long]("u1_x2") === u1x2)
    assert(row.getAs[Long]("u2_x2") === 2 * n1 * n2 - u1x2)
    assert(row.getAs[Long]("tie_term") === tie)
    assert(row.getAs[Long]("auc_bp") === u1x2 * 10000 / (2 * n1 * n2))
    // U1 + U2 = n1*n2 (the rank-sum identity, in x2 units)
    assert(row.getAs[Long]("u1_x2") + row.getAs[Long]("u2_x2") === 2 * n1 * n2)
    val n = n1 + n2
    val z = BigDecimal(((u1x2 - n1 * n2).toDouble / 2.0) /
        math.sqrt(n1.toDouble * n2.toDouble * ((n + 1).toDouble -
          tie.toDouble / (n.toDouble * (n - 1).toDouble)) / 12.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("z") === z)
  }

  test("kaplanMeier: risk sets, hazards and log-survival recount " +
       "exactly; the risk set telescopes to zero") {
    import graft.Tables
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = Tables(spark, sf, "events")
      .select($"user_id", $"event_type", $"event_id",
        expr("unix_micros(ts) div 3600000000").as("hr"))
      .as[(Long, String, Long, Long)].collect()
    val birth = ev.groupBy(_._1).map { case (u, xs) =>
      u -> xs.map(_._4).min
    }
    val errHr = ev.filter(e => e._2 == "error" && e._3 % 11 == 0)
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._4).min }
    val wend = ev.map(_._4).max
    val lives = birth.toSeq.map { case (u, b) =>
      errHr.get(u) match {
        case Some(e) => (e - b, true)
        case None    => (wend - b, false)
      }
    }
    val byT = lives.groupBy(_._1).map { case (t, xs) =>
      (t, xs.count(_._2).toLong, xs.count(!_._2).toLong)
    }.toSeq.sortBy(_._1)
    var left = 0L
    var lnS = 0L
    val nTotal = lives.size.toLong
    val rows = Events.kaplanMeier(spark, sf).collect()
    assert(rows.length === byT.length)
    rows.zip(byT).foreach { case (r, (t, d, c)) =>
      val nRisk = nTotal - left
      left += d + c
      val lnTerm =
        if (d == 0) 0L
        else if (d == nRisk) -30000000L
        else BigDecimal(math.log((nRisk - d).toDouble / nRisk) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      lnS += lnTerm
      assert(r.getAs[Long]("t_hours") === t)
      assert(r.getAs[Long]("n_risk") === nRisk, s"n_risk at t=$t")
      assert(r.getAs[Long]("n_deaths") === d)
      assert(r.getAs[Long]("n_censored") === c)
      assert(r.getAs[Long]("hazard_ppm") === 1000000L * d / nRisk)
      assert(r.getAs[Long]("ln_term_u") === lnTerm, s"ln term at t=$t")
      assert(r.getAs[Long]("ln_s_u") === lnS, s"ln_s at t=$t")
    }
    // every subject leaves exactly once: the risk set telescopes out
    assert(left === nTotal)
    // the fixture must exercise both deaths and censoring
    assert(byT.map(_._2).sum > 0 && byT.map(_._3).sum > 0)
  }

  test("logRankTest: hypergeometric O-E and variance recount exactly; " +
       "the A/A hash split is insignificant") {
    import graft.Tables
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = Tables(spark, sf, "events")
      .select($"user_id", $"event_type", $"event_id",
        expr("unix_micros(ts) div 3600000000").as("hr"))
      .as[(Long, String, Long, Long)].collect()
    val birth = ev.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._4).min }
    val errHr = ev.filter(e => e._2 == "error" && e._3 % 11 == 0)
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._4).min }
    val wend = ev.map(_._4).max
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def inA(u: Long): Boolean =
      java.lang.Long.parseLong(md5hex("arm:" + u).substring(0, 15), 16) % 100 < 50
    val lives = birth.toSeq.map { case (u, b) =>
      errHr.get(u) match {
        case Some(e) => (e - b, true, inA(u))
        case None    => (wend - b, false, inA(u))
      }
    }
    val nTot = lives.size.toLong
    val nA = lives.count(_._3).toLong
    var leftAll = 0L; var leftA = 0L
    var oe = 0L; var v = BigInt(0)
    lives.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (_, xs) =>
      val nRisk = nTot - leftAll
      val n1 = nA - leftA
      val d = xs.count(_._2).toLong
      val d1 = xs.count(x => x._2 && x._3).toLong
      leftAll += xs.size; leftA += xs.count(_._3)
      if (d > 0) {
        oe += d1 * 1000000L - d * n1 * 1000000L / nRisk
        if (nRisk > 1)
          v += BigInt(d) * n1 * (nRisk - n1) * (nRisk - d) * 1000000 /
            (BigInt(nRisk) * nRisk * (nRisk - 1))
      }
    }
    val r = Events.logRankTest(spark, sf).collect().head
    assert(r.getAs[Long]("n_total") === nTot)
    assert(r.getAs[Long]("n_a") === nA)
    assert(r.getAs[Long]("n_b") === nTot - nA)
    assert(r.getAs[Long]("deaths_a") ===
      lives.count(x => x._2 && x._3).toLong)
    assert(r.getAs[Long]("deaths_b") ===
      lives.count(x => x._2 && !x._3).toLong)
    assert(r.getAs[Long]("oe_u") === oe)
    assert(BigInt(r.getAs[Long]("v_u")) === v)
    assert(r.getAs[Long]("chi2_u") === (BigInt(oe) * oe / v).toLong)
    val z = BigDecimal(oe.toDouble / (1000.0 * math.sqrt(v.toDouble)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("z") === z)
    // A/A on a content-independent hash must not "discover" an effect
    assert(math.abs(r.getAs[Double]("z")) < 3.0)
  }

  test("ccfLeadLag: centered cross-products and normalization recount " +
       "exactly over the zero-filled hourly grid") {
    import graft.Tables
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = Tables(spark, sf, "events")
      .select($"event_type", expr("unix_micros(ts) div 3600000000").as("hr"))
      .as[(String, Long)].collect()
    val h0 = ev.map(_._2).min
    val h1 = ev.map(_._2).max
    val n = (h1 - h0 + 1)
    def cnt(t: String) = {
      val m = ev.filter(_._1 == t).groupBy(_._2)
        .map { case (h, xs) => h -> xs.length.toLong }
      (h0 to h1).map(h => m.getOrElse(h, 0L))
    }
    val x = cnt("click"); val y = cnt("purchase")
    val sx = x.sum; val sy = y.sum
    val xc = x.map(v0 => BigInt(n * v0 - sx))
    val yc = y.map(v0 => BigInt(n * v0 - sy))
    val gxx = xc.map(v0 => v0 * v0).sum
    val gyy = yc.map(v0 => v0 * v0).sum
    val rows = Events.ccfLeadLag(spark, sf).collect()
    assert(rows.length === 25)
    rows.foreach { r =>
      val k = r.getAs[Long]("lag_k").toInt
      val gxy =
        if (k >= 0) xc.dropRight(k).zip(yc.drop(k))
          .map { case (a, b) => a * b }.sum
        else xc.drop(-k).zip(yc.dropRight(-k))
          .map { case (a, b) => a * b }.sum
      assert(r.getAs[Long]("n_pairs") === n - math.abs(k))
      assert(BigInt(r.getAs[Long]("gxy_num")) === gxy,
        s"gxy at lag $k")
      assert(BigInt(r.getAs[Long]("gxx")) === gxx)
      assert(BigInt(r.getAs[Long]("gyy")) === gyy)
      val rho = BigDecimal(gxy.toDouble /
        (math.sqrt(gxx.toDouble) * math.sqrt(gyy.toDouble)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("rho") === rho, s"rho at lag $k")
      assert(math.abs(rho) <= 1.0)
    }
  }

  test("touchAttribution: U-shaped Hamilton credits conserve exactly " +
       "10000 bp per purchase and the hour rollup recounts") {
    import graft.Tables
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = Tables(spark, sf, "events")
      .select($"event_type", $"user_id", $"event_id",
        unix_micros($"ts").as("us"), hour($"ts").cast("long").as("h"),
        round($"value" * 100).cast("long").as("cents"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val purchases = ev.filter(_._1 == "purchase")
    val clicks = ev.filter(_._1 == "click")
    val byUser = clicks.groupBy(_._2)
    val win = 7L * 86400L * 1000000L
    case class Touch(hour: Long, creditBp: Long, cents: Long)
    val touches = purchases.flatMap { p =>
      val path = byUser.getOrElse(p._2, Array.empty)
        .filter(c => c._4 < p._4 && c._4 >= p._4 - win)
        .sortBy(c => (c._4, c._3))
      val n = path.length.toLong
      path.zipWithIndex.map { case (c, i) =>
        val pos = i + 1L
        val credit =
          if (n == 1) 10000L
          else if (n == 2) 5000L
          else if (pos == 1 || pos == n) 4000L
          else 2000L / (n - 2) + (if (pos - 1 <= 2000L % (n - 2)) 1L else 0L)
        Touch(c._5, credit, p._6)
      }
    }
    // conservation: per purchase the credits sum to exactly 10000 bp
    purchases.foreach { p =>
      val path = byUser.getOrElse(p._2, Array.empty)
        .filter(c => c._4 < p._4 && c._4 >= p._4 - win)
      val n = path.length.toLong
      if (n > 0) {
        val total =
          if (n == 1) 10000L
          else if (n == 2) 10000L
          else 8000L + (n - 2) * (2000L / (n - 2)) + (2000L % (n - 2))
        assert(total === 10000L)
      }
    }
    val expected = touches.groupBy(_.hour).map { case (h, xs) =>
      h -> (xs.length.toLong, xs.map(_.creditBp).sum,
        xs.map(x => BigInt(x.cents) * x.creditBp).sum)
    }
    val rows = Events.touchAttribution(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("click_hour")).toSet === expected.keySet)
    rows.foreach { r =>
      val (n, bp, cbp) = expected(r.getAs[Long]("click_hour"))
      assert(r.getAs[Long]("n_touches") === n)
      assert(r.getAs[Long]("credit_bp_sum") === bp)
      assert(BigInt(r.getAs[Long]("attr_cents_bp")) === cbp)
      assert(r.getAs[Long]("attr_cents") === (cbp / 10000).toLong)
    }
  }
  test("markovStationary: the exact power rounds recount sequentially " +
       "and pi stays a sub-distribution in ppm") {
    val pairs = Tables(spark, sf, "events")
      .select($"user_id", $"event_type", unix_micros($"ts"), $"event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
      .groupBy(_._1).values.flatMap { evs =>
        val o = evs.sortBy(e => (e._3, e._4))
        o.zip(o.drop(1)).map { case (a, b) => (a._2, b._2) }
      }.toSeq
    val counts = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val states = counts.keys.map(_._1).toSeq.distinct.sorted
    val closed = counts.filter { case ((_, t), _) => states.contains(t) }
    val outTot = closed.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    val p = closed.map { case ((f, t), n) => (f, t) -> n * 1000000L / outTot(f) }
    var pi = states.map(_ -> 1000000L / states.length).toMap
    for (_ <- 1 to 20)
      pi = states.map(j => j -> states.map(i =>
        pi(i) * p.getOrElse((i, j), 0L)).sum / 1000000L).toMap
    val fromTot = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val grand = fromTot.values.sum
    val rows = Events.markovStationary(spark, sf).collect()
    assert(rows.length === states.length)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_out") === fromTot(t))
      assert(r.getAs[Long]("emp_share_ppm") === fromTot(t) * 1000000L / grand)
      assert(r.getAs[Long]("pi_ppm") === pi(t), s"pi at $t")
    }
    // truncating rounds only ever LOSE mass: pi sums to <= 1e6 and the
    // chain must still place most mass somewhere
    val tot = rows.map(_.getAs[Long]("pi_ppm")).sum
    assert(tot <= 1000000L && tot > 900000L, s"pi mass $tot")
  }

  test("absorptionSteps: the milli-step value iteration recounts " +
       "sequentially; the target is pinned at zero") {
    val pairs = Tables(spark, sf, "events")
      .select($"user_id", $"event_type", unix_micros($"ts"), $"event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).values.flatMap { evs =>
        val o = evs.sortBy(e => (e._3, e._4))
        o.zip(o.drop(1)).map { case (a, b) => (a._2, b._2) }
      }.toSeq
    val counts = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val states = counts.keys.map(_._1).toSeq.distinct.sorted
    val closed = counts.filter { case ((_, t), _) => states.contains(t) }
    val outTot = closed.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val p = closed.map { case ((f, t), n) => (f, t) -> n * 1000000L / outTot(f) }
    var e = states.map(_ -> 0L).toMap
    for (_ <- 1 to 25)
      e = states.map(i => i -> (if (i == "purchase") 0L
        else 1000L + states.map(j =>
          p.getOrElse((i, j), 0L) * e(j)).sum / 1000000L)).toMap
    val fromTot = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val rows = Events.absorptionSteps(spark, sf).collect()
    assert(rows.length === states.length)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_out") === fromTot(t))
      assert(r.getAs[Long]("e_steps_milli") === e(t), s"E at $t")
    }
    val byType = rows.map(r =>
      r.getAs[String]("event_type") -> r.getAs[Long]("e_steps_milli")).toMap
    assert(byType("purchase") === 0L)
    // every non-target state needs at least one step
    byType.filter(_._1 != "purchase").values
      .foreach(v => assert(v >= 1000L))
  }

  test("sprtMonitor: the LLR walk recounts from daily cells; bounds " +
       "and self-calibration laws hold") {
    val daily = Tables(spark, sf, "events")
      .groupBy(to_date($"ts").cast("string").as("day"))
      .agg(count(lit(1)).as("t"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("s"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    val p0 = daily.map(_._3).sum * 10000L / daily.map(_._2).sum
    val p1 = p0 * 11L / 10L
    val lw = math.round(math.log(p1.toDouble / p0) * 1e6)
    val ll = math.round(
      math.log((10000.0 - p1) / (10000.0 - p0)) * 1e6)
    var cum = 0L
    val expected = daily.map { case (day, t, su) =>
      val inc = su * lw + (t - su) * ll
      cum += inc
      (day, t, su, inc, cum,
        if (cum >= 2944439L) "h1"
        else if (cum <= -2944439L) "h0" else "continue")
    }
    val rows = Events.sprtMonitor(spark, sf).collect()
    assert(rows.length === daily.length)
    rows.zip(expected).foreach { case (r, (day, t, su, inc, c, st)) =>
      assert(r.getAs[java.sql.Date]("day").toString === day)
      assert(r.getAs[Long]("trials") === t)
      assert(r.getAs[Long]("successes") === su)
      assert(r.getAs[Long]("p0_bp") === p0)
      assert(r.getAs[Long]("llr_day_u") === inc, s"inc at $day")
      assert(r.getAs[Long]("llr_cum_u") === c, s"cum at $day")
      assert(r.getAs[String]("state") === st)
    }
    // self-calibrated null: the pooled-rate walk must not end at the
    // H1 bound (the rate cannot have lifted 10% over ITS OWN average
    // and the per-day drift in this fixture is mild)
    assert(rows.last.getAs[String]("state") != "h1")
  }

  test("energyDistance: all three pairwise-|delta| means recount by " +
       "brute force; the E-statistic is nonnegative up to floor slack") {
    val vals = Tables(spark, sf, "events")
      .select(unix_micros($"ts"), round($"value" * 10000).cast("long"))
      .as[(Long, Long)].collect()
    val mid = (vals.map(_._1).min + vals.map(_._1).max) / 2
    val x = vals.filter(_._1 <= mid).map(_._2)
    val y = vals.filter(_._1 > mid).map(_._2)
    def crossAbs(a: Seq[Long], b: Seq[Long]): BigInt = {
      // sorted-merge closed form, not the O(n^2) loop (n ~ 5000)
      val bs = b.sorted
      val pre = bs.scanLeft(BigInt(0))(_ + _).tail
      val tot = pre.lastOption.getOrElse(BigInt(0))
      a.map { v =>
        val k = bs.count(_ <= v)
        val sBelow = if (k == 0) BigInt(0) else pre(k - 1)
        BigInt(k) * v - sBelow + (tot - sBelow) - BigInt(bs.length - k) * v
      }.sum
    }
    val sxy = crossAbs(x.toSeq, y.toSeq)
    val sxx = crossAbs(x.toSeq, x.toSeq)
    val syy = crossAbs(y.toSeq, y.toSeq)
    val n1 = BigInt(x.length); val n2 = BigInt(y.length)
    val r = Events.energyDistance(spark, sf).collect().head
    assert(r.getAs[Long]("n_early") === x.length.toLong)
    assert(r.getAs[Long]("n_late") === y.length.toLong)
    assert(r.getAs[Long]("a_u") === (sxy * 100 / (n1 * n2)).toLong)
    assert(r.getAs[Long]("b_u") === (sxx * 100 / (n1 * n1)).toLong)
    assert(r.getAs[Long]("c_u") === (syy * 100 / (n2 * n2)).toLong)
    assert(r.getAs[Long]("energy_u") ===
      r.getAs[Long]("a_u") * 2 - r.getAs[Long]("b_u") - r.getAs[Long]("c_u"))
    // the exact E-statistic is >= 0; floored means concede <= 2 micro
    assert(r.getAs[Long]("energy_u") >= -2L)
  }

  test("funnelLatency: exact rank picks recount from raw transition " +
       "latencies; p90 bounds the median") {
    val ev = Tables(spark, sf, "events")
      .select($"user_id", $"event_type", unix_micros($"ts"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val lats = ev.values.toSeq.flatMap { es =>
      val views = es.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) Nil
      else {
        val v = views.min
        val clicks = es.filter(e => e._2 == "click" && e._3 > v).map(_._3)
        if (clicks.isEmpty) Nil
        else {
          val c = clicks.min
          val s1 = Seq((1, (c - v) / 1000000L))
          val ps = es.filter(e => e._2 == "purchase" && e._3 > c).map(_._3)
          if (ps.isEmpty) s1 else s1 :+ ((2, (ps.min - c) / 1000000L))
        }
      }
    }
    def stats(xs: Seq[Long]): (Long, Long, Long, Long) = {
      val s0 = xs.sorted; val n = s0.length
      (n.toLong, s0((n + 1) / 2 - 1) + s0(n / 2),
        s0((n * 9 + 9) / 10 - 1), xs.sum / n)
    }
    val rows = Events.funnelLatency(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    Seq(1, 2).foreach { st =>
      val xs = lats.filter(_._1 == st).map(_._2)
      val (n, med2, p90, mean) = stats(xs)
      assert(rows(st)._1 === n, s"n at stage $st")
      assert(rows(st)._2 === med2, s"med2 at stage $st")
      assert(rows(st)._3 === p90, s"p90 at stage $st")
      assert(rows(st)._4 === mean, s"mean at stage $st")
      assert(rows(st)._3 * 2 >= rows(st)._2, s"p90 below median at $st")
    }
  }

  test("cohortLtv: cumulative per-capita revenue is monotone per cohort") {
    val rows = Events.cohortLtv(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cohort_week")).foreach { case (_, rs) =>
      val byAge = rs.sortBy(_.getAs[Long]("age_week"))
      val cums = byAge.map(_.getAs[Long]("cum_cents"))
      assert(cums === cums.sorted, "running revenue must be monotone")
      byAge.foreach { r =>
        assert(r.getAs[Long]("ltv_per_user_cents") ===
          r.getAs[Long]("cum_cents") / r.getAs[Long]("n_users"))
      }
    }
  }

  test("pChart: limits bracket the pooled rate, flag recomputes") {
    val rows = Events.pChart(spark, sf).collect()
    assert(rows.nonEmpty)
    val sx = rows.map(_.getAs[Long]("x")).sum
    val sn = rows.map(_.getAs[Long]("n")).sum
    val pbarBp = sx * 10000 / sn
    rows.foreach { r =>
      assert(r.getAs[Long]("x") <= r.getAs[Long]("n"))
      val u = r.getAs[Long]("ucl_bp"); val l = r.getAs[Long]("lcl_bp")
      assert(l >= 0L && u >= pbarBp && l <= pbarBp + 1,
        "3-sigma limits must bracket the pooled rate")
      val p = r.getAs[Long]("p_bp")
      assert(r.getAs[Boolean]("ooc") === (p > u || p < l))
    }
  }

  test("nelsonAalen: exp(-H) dominates the KM product-limit curve") {
    val na = Events.nelsonAalen(spark, sf).collect()
      .map(r => r.getAs[Long]("t_hours") ->
        ((r.getAs[Long]("h_cum_ppm"), r.getAs[Long]("s_na_milli")))).toMap
    val km = Events.kaplanMeier(spark, sf).collect()
    assert(na.keySet === km.map(_.getAs[Long]("t_hours")).toSet,
      "same event-time grid as KM (shared lives)")
    km.foreach { r =>
      val t = r.getAs[Long]("t_hours")
      val sKm = math.exp(r.getAs[Long]("ln_s_u") / 1e6) * 1000
      // e^{-h} >= 1-h per term => exp(-H) >= S_KM (±1 for the roundings)
      assert(na(t)._2 + 1 >= sKm.floor.toLong,
        s"NA survival must dominate KM at t=$t")
    }
    // H is nondecreasing in t
    val byT = na.toSeq.sortBy(_._1).map(_._2._1)
    assert(byT === byT.sorted, "cumulative hazard must be monotone")
  }

  test("eventBurstiness: Fano and B recompute from the daily counts " +
       "with silent days as zeros; B stays in (-1e6, 1e6)") {
    import graft.Tables
    val daily = Tables(spark, sf, "events")
      .selectExpr("event_type", "CAST(ts AS DATE) AS day")
      .groupBy($"event_type", $"day").count()
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate,
        r.getLong(2)))
    val d = daily.map(_._2.toEpochDay).max - daily.map(_._2.toEpochDay).min + 1
    val rows = Events.eventBurstiness(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val xs = daily.filter(_._1 == et).map(_._3)
      val s0 = xs.sum; val q = xs.map(x => x * x).sum
      assert(r.getAs[Long]("n_days") === d)
      assert(r.getAs[Long]("n_active_days") === xs.length.toLong)
      assert(r.getAs[Long]("n_events") === s0)
      assert(r.getAs[Long]("mean_milli") === s0 * 1000 / d)
      val fano = math.round(
        (d * q - s0 * s0).toDouble / (d * s0).toDouble * 1000)
      assert(r.getAs[Long]("fano_milli") === fano)
      val rr = math.sqrt((d * q - s0 * s0).toDouble)
      assert(r.getAs[Long]("burstiness_u") ===
        math.floor((rr - s0) / (rr + s0) * 1000000).toLong)
      val b = r.getAs[Long]("burstiness_u")
      assert(b > -1000000L && b < 1000000L)
    }
  }

}
