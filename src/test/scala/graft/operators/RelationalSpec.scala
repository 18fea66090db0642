package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Sanity-level invariants over the synthetic testdata at sf0.001; exact
  * value parity is covered by the DuckDB oracle gate (tools/compare_oracle.py).
  */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("pricing summary: one row per (returnflag, linestatus), counts add up") {
    val df = Relational.pricingSummary(spark, sf).cache()
    assert(df.count() === df.select($"l_returnflag", $"l_linestatus").distinct().count())
    val total = df.agg(sum($"count_order")).head().getLong(0)
    val expected = Tables(spark, sf, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp")).count()
    assert(total === expected)
  }

  test("anti join + semi join partition the customer set") {
    val all = Tables(spark, sf, "customer").count()
    val without = Relational.custWithoutRecentOrders(spark, sf).count()
    val withOrders = Tables(spark, sf, "customer")
      .join(Tables(spark, sf, "orders")
        .filter($"o_orderdate" >= lit("2001-01-01").cast("timestamp")),
        $"c_custkey" === $"o_custkey", "left_semi").count()
    assert(without + withOrders === all)
  }

  test("window top-k emits at most 3 rows per customer, rank contiguous") {
    val df = Relational.topOrdersPerCustomer(spark, sf)
    val bad = df.groupBy($"o_custkey")
      .agg(count(lit(1)).as("n"), max($"rank_in_cust").as("mx"))
      .filter($"n" > 3 || $"n" =!= $"mx")
    assert(bad.count() === 0)
  }

  test("calendar-style expansion: 7 rows per order") {
    val orders = Tables(spark, sf, "orders").count()
    val days = Relational.orderDayExpansion(spark, sf)
      .agg(sum($"n_active_orders")).head().getLong(0)
    assert(days === orders * 7)
  }

  test("rollup has grand-total row equal to customer count") {
    val grand = Relational.nationRollup(spark, sf)
      .filter($"r_name".isNull && $"n_name".isNull)
      .select($"n_customers").head().getLong(0)
    assert(grand === Tables(spark, sf, "customer").count())
  }

  test("geo radius keeps only points within 30km") {
    val df = Relational.geoRadius(spark, sf)
    assert(df.count() > 0)
    assert(df.filter($"dist_m" > 30000L).count() === 0)
  }

  test("range join matches a per-purchase recount through a different plan") {
    val got = Relational.attributionRangeJoin(spark, sf)
    val rows = got.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) >= 1)) // inner join: only attributed purchases
    // recount one purchase's window membership through a plain filter
    val probe = rows.head
    val (eid, n) = (probe.getLong(0), probe.getLong(1))
    val p = Tables(spark, sf, "events")
      .filter($"event_id" === eid)
      .select($"user_id", $"ts").head()
    val recount = Tables(spark, sf, "events")
      .filter($"event_type" === "click" &&
        $"user_id" === p.getLong(0) &&
        $"ts" >= lit(p.getTimestamp(1)) - expr("INTERVAL 30 MINUTES") &&
        $"ts" < lit(p.getTimestamp(1)))
      .count()
    assert(recount === n)
  }

  test("aboveAvgOrders: every kept order beats its customer's mean, none missed") {
    val byCust = Tables(spark, sf, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    // exact-decimal recount (price·n > Σprice), mirroring the operator —
    // a floating-point average here could flip the same borderline rows
    // the operator's DECIMAL arithmetic exists to protect
    def dec2(d: Double) = BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val expected = byCust.toSeq.flatMap { case (_, os) =>
      val sum = os.map(o => dec2(o._3)).sum
      os.filter(o => dec2(o._3) * os.length > sum).map(_._2)
    }.toSet
    val got = Relational.aboveAvgOrders(spark, sf).collect()
      .map(_.getLong(1)).toSet
    assert(got === expected)
  }

  test("groupingSets: each grouping's counts sum to the joined row count") {
    val total = Relational.nationRollup(spark, sf)
      .filter($"r_name".isNull).head().getLong(2) // rollup grand total
    val rows = Relational.groupingSetsRevenue(spark, sf).collect()
      .map(r => (r.getInt(2), r.getLong(3)))
    val byGid = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(byGid.keySet === Set(1, 2)) // (r_name) keeps n_name null and vice versa
    assert(byGid(1) === total && byGid(2) === total)
  }

  test("scd2Customers: one current row per customer, versions chain exactly") {
    val rows = Relational.scd2Customers(spark, sf).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getDouble(2),
        Option(r.getDate(3)).map(_.toString), Option(r.getDate(4)).map(_.toString),
        r.getBoolean(5)))
    val nCust = Tables(spark, sf, "customer").count()
    val withOrders = Tables(spark, sf, "orders")
      .select($"o_custkey").distinct().collect().map(_.getLong(0)).toSet
    assert(rows.length === nCust + withOrders.size)
    val byCust = rows.groupBy(_._1)
    assert(byCust.keySet.size === nCust)
    // exact-decimal recount of the updated balance for ordered customers
    def dec2(d: Double) = BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val spend = Tables(spark, sf, "orders")
      .select($"o_custkey", $"o_totalprice").collect()
      .map(r => (r.getLong(0), dec2(r.getDouble(1))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    byCust.foreach { case (ck, vs) =>
      assert(vs.count(_._6) === 1) // exactly one current version
      if (withOrders(ck)) {
        val Seq(v1, v2) = vs.sortBy(_._2).toSeq
        assert(!v1._6 && v2._6)
        assert(v1._5 === v2._4) // v1 closes exactly where v2 opens
        assert(dec2(v2._3) === dec2(v1._3) + spend(ck))
      } else {
        assert(vs.length === 1 && vs.head._6 && vs.head._5.isEmpty)
      }
    }
  }

  test("profileOrders: counts match independent per-column recounts") {
    val prof = Relational.profileOrders(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val orders = Tables(spark, sf, "orders")
    val n = orders.count()
    assert(prof.keySet === orders.columns.toSet)
    prof.values.foreach { case (rows, _, _) => assert(rows === n) }
    assert(prof("o_orderkey") === ((n, 0L, n))) // PK: no nulls, all distinct
    val distinctStatus = orders.select($"o_orderstatus").distinct().count()
    assert(prof("o_orderstatus")._3 === distinctStatus)
  }

  test("orderGaps matches a driver-side lag recomputation") {
    val got = Relational.orderGaps(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val orders = Tables(spark, sf, "orders")
      .select($"o_custkey", $"o_orderkey", $"o_orderdate".cast("date")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate))
    val expected = orders.groupBy(_._1).toSeq.collect {
      case (ck, os) if os.length >= 5 =>
        val sorted = os.sortBy(o => (o._3.toEpochDay, o._2))
        val gaps = sorted.sliding(2).collect {
          case Array(a, b) => b._3.toEpochDay - a._3.toEpochDay
        }.toSeq
        (ck, os.length.toLong,
          BigDecimal(gaps.sum.toDouble / gaps.length)
            .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
          gaps.max)
    }.sortBy(_._1)
    assert(got.toSeq === expected)
  }

  test("snapshotDiff classifies every CDC case from fixture snapshots") {
    import spark.implicits._
    val a = Seq((1L, "fa"), (2L, "fb"), (3L, "fc"))
      .toDF("doc_id", "fp")
    val b = Seq((2L, "fb"), (3L, "fc2"), (4L, "fd"))
      .toDF("doc_id", "fp")
    val got = Relational.snapshotDiff(a, b)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "modified", 4L -> "added"))
  }

  test("profileEvents: rows constant per column, distincts match recounts") {
    import spark.implicits._
    val total = graft.Tables(spark, sf, "events").count()
    val got = Relational.profileEvents(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got.map(_._1).toSet === Set("event_id", "ts", "user_id",
      "event_type", "value", "props"))
    got.foreach { case (c, n, nulls, dist) =>
      assert(n === total, s"$c row count")
      assert(nulls >= 0 && dist <= n - nulls)
    }
    // spot recounts against direct aggregations
    val byName = got.map(g => g._1 -> g).toMap
    val ev = graft.Tables(spark, sf, "events")
    assert(byName("event_id")._4 ===
      ev.select($"event_id").distinct().count())
    assert(byName("event_type")._4 ===
      ev.select($"event_type").distinct().count())
    assert(byName("user_id")._4 ===
      ev.select($"user_id").distinct().count())
  }

  test("linearAttribution conserves every purchase's cents exactly") {
    import spark.implicits._
    val got = Relational.linearAttribution(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(got.nonEmpty)
    val valueC = graft.Tables(spark, sf, "events")
      .filter($"event_type" === "purchase")
      .select($"event_id", round($"value" * 100).cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.groupBy(_._1).foreach { case (pid, shares) =>
      // exact conservation: shares sum to the purchase value in cents
      assert(shares.map(_._4).sum === valueC(pid), s"purchase $pid leaks cents")
      // equal split up to one cent, extra cents to the earliest ranks
      val byRk = shares.sortBy(_._3)
      assert(byRk.map(_._3) === (1 to shares.length).toArray)
      val mn = byRk.map(_._4).min; val mx = byRk.map(_._4).max
      assert(mx - mn <= 1L)
      val bonus = byRk.takeWhile(_._4 == mx)
      assert(byRk.drop(bonus.length).forall(_._4 == mn))
    }
    // remainder handling is genuinely exercised somewhere
    assert(got.groupBy(_._1).exists { case (pid, shares) =>
      valueC(pid) % shares.length != 0
    })
  }

  test("pitEnrichment: every order matches exactly one version, the right one") {
    import spark.implicits._
    val got = Relational.pitEnrichment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    val nOrders = graft.Tables(spark, sf, "orders").count()
    // exactly-one-version totality: validity intervals partition time
    assert(got.length === nOrders)
    assert(got.map(_._1).distinct.length === got.length)
    // the version choice is point-in-time correct: the customer's
    // LAST-dated order(s) get version 2, strictly earlier orders get 1
    val lastDate = graft.Tables(spark, sf, "orders")
      .groupBy($"o_custkey").agg(max($"o_orderdate".cast("date")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDate(1).toLocalDate).toMap
    val orderDates = graft.Tables(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getTimestamp(2).toLocalDateTime.toLocalDate)).toMap
    got.foreach { case (ok, cust, version, _) =>
      val (c2, d) = orderDates(ok)
      assert(c2 === cust)
      val expVer = if (d.isBefore(lastDate(cust))) 1 else 2
      assert(version === expVer, s"order $ok on $d: version $version")
    }
    // both versions genuinely occur (past facts see the PAST attribute)
    assert(got.exists(_._3 == 1) && got.exists(_._3 == 2))
  }

  test("nationVolume conserves cross-nation items; returnedItems ranks by loss") {
    import spark.implicits._
    val nv = Relational.nationVolume(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getDouble(3),
        r.getLong(4)))
    assert(nv.nonEmpty)
    nv.foreach { case (sn, cn, _, vol, n) =>
      assert(sn != cn); assert(n > 0); assert(vol > 0.0)
    }
    // independent conservation count: lineitems whose supplier and
    // customer nations differ, counted without the group-by pipeline
    val expected = graft.Tables(spark, sf, "lineitem")
      .join(graft.Tables(spark, sf, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(graft.Tables(spark, sf, "customer"), $"o_custkey" === $"c_custkey")
      .join(graft.Tables(spark, sf, "supplier"), $"l_suppkey" === $"s_suppkey")
      .filter($"s_nationkey" =!= $"c_nationkey")
      .count()
    assert(nv.map(_._5).sum === expected)
    val ri = Relational.returnedItemReport(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getLong(4)))
    assert(ri.nonEmpty && ri.length <= 20)
    val lost = ri.map(_._2)
    assert(lost.zip(lost.tail).forall { case (a, b) => a >= b },
      "top-20 not ordered by lost revenue")
    ri.foreach { case (_, v, n) => assert(v > 0.0 && n > 0) }
  }

  test("applyCdc is the exact inverse of snapshotDiff on a synthetic merge") {
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("doc_id", "fp")
    val changes = Seq(
      (2L, "modified", "b2"), // update
      (3L, "removed", null),  // delete
      (4L, "added", "d"))     // insert
      .toDF("doc_id", "status", "fp")
    val got = Relational.applyCdc(base, changes)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "a"), (2L, "b2"), (4L, "d")))
    // round trip: the diff of (base, applied) regenerates the changes
    val rediff = Relational.snapshotDiff(base,
        Relational.applyCdc(base, changes))
      .filter($"status" =!= "unchanged")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rediff === Set((2L, "modified"), (3L, "removed"), (4L, "added")))
    // corpus instance: applying the derived feed reproduces snapshot B
    val applied = Relational.cdcApply(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    def h60(sz: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(sz.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        md.map("%02x".format(_)).mkString.take(15), 16)
    }
    def md5hex(sz: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(sz.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .flatMap { r =>
        val id = r.getLong(0); val bk = h60(s"snap:$id") % 100
        if (bk < 10) None
        else Some((id, md5hex(
          if (bk >= 40 && bk < 60) r.getString(1).toUpperCase
          else r.getString(1))))
      }.toSet
    assert(applied === expected)
  }

  test("geoPairs equals the brute all-pairs radius join; no BNLJ planned") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.joins.CartesianProductExec
    val keys = graft.Tables(spark, sf, "customer")
      .select("c_custkey").collect().map(_.getLong(0))
    def pos(k: Long) = (52.0 + (k % 100) / 100.0,
      13.0 + ((k / 100) % 100) / 100.0)
    def hav(a: (Double, Double), b: (Double, Double)): Double = {
      val dLat = math.toRadians(b._1) - math.toRadians(a._1)
      val dLon = math.toRadians(b._2) - math.toRadians(a._2)
      val h = math.pow(math.sin(dLat / 2), 2) +
        math.cos(math.toRadians(a._1)) * math.cos(math.toRadians(b._1)) *
          math.pow(math.sin(dLon / 2), 2)
      2 * 6371000.0 * math.atan2(math.sqrt(h), math.sqrt(1.0 - h))
    }
    // brute truth over every pair — the banded join must find ALL of it
    // (proves the 3x3 neighborhood covers the radius at this cell size)
    val expected = (for {
      i <- keys.indices; j <- i + 1 until keys.length
      a = math.min(keys(i), keys(j)); b = math.max(keys(i), keys(j))
      d = hav(pos(a), pos(b)) if d <= 800.0
    } yield (a, b, math.round(d))).sortBy(p => (p._1, p._2))
    val df = Relational.geoPairs(spark, sf)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === expected)
    // non-degenerate: both zero-distance (shared-coordinate) and true
    // near pairs occur
    assert(got.exists(_._3 == 0L) || got.exists(_._3 > 0L))
    assert(got.nonEmpty)
    val nodes = planNodes(df)
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "radius self-join must bucket to an equi-join, not BNLJ")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
  }

  test("constraintAudit matches direct recounts; both verdicts occur " +
       "(this lineitem genuinely fails pk uniqueness)") {
    import spark.implicits._
    val l = graft.Tables(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount",
        $"l_extendedprice", $"l_returnflag")
      .collect()
    val n = l.length.toLong
    val orders = graft.Tables(spark, sf, "orders")
      .select($"o_orderkey").as[Long].collect()
    val oset = orders.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = Map(
      "completeness_returnflag" -> l.count(!_.isNullAt(5)).toLong,
      "pk_uniqueness" -> l.map(r => (r.getLong(0), r.getInt(1))).distinct.length.toLong,
      "range_quantity_1_50" ->
        l.count(r => r.getDouble(2) >= 1 && r.getDouble(2) <= 50).toLong,
      "range_discount_0_01" ->
        l.count(r => r.getDouble(3) >= 0 && r.getDouble(3) <= 0.1).toLong,
      "positive_price" -> l.count(_.getDouble(4) > 0).toLong,
      // left-join semantics: a lineitem row contributes one matched row
      // PER matching order row (0 when unmatched)
      "ri_orderkey_in_orders" ->
        l.map(r => oset.getOrElse(r.getLong(0), 0L)).sum)
    val got = Relational.constraintAudit(spark, sf)
      .as[(String, Long, Long, Boolean)].collect()
    assert(got.length === 6)
    got.foreach { case (name, bp, thr, pass) =>
      assert(bp === expected(name) * 10000 / n, name)
      assert(pass === (bp >= thr), name)
    }
    assert(got.exists(_._4) && got.exists(!_._4),
      "fixture must exercise both verdicts")
  }

  test("ewmaAnomalies matches a sequential lag-weighted replay") {
    import spark.implicits._
    val daily = graft.Tables(spark, sf, "orders")
      .select($"o_orderdate".cast("date").cast("string"), $"o_totalprice")
      .as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r =>
        java.math.BigDecimal.valueOf(r._2 * 100)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue).sum)
      .toMap
    val w = Relational.ewmaWeightsU(7, 30)
    val days = daily.keys.toSeq.sorted
    val expected = days.flatMap { d =>
      val ld = java.time.LocalDate.parse(d)
      val lags = (1 to 30).flatMap(k =>
        daily.get(ld.minusDays(k).toString).map(x => (w(k - 1), x)))
      if (lags.isEmpty) None
      else {
        val ewma = lags.map(l => l._1 * l._2).sum / lags.map(_._1).sum
        val dev = daily(d) * 10000 / ewma - 10000
        Some(d -> ((daily(d), ewma, dev, math.abs(dev) >= 3000)))
      }
    }.toMap
    val got = Relational.ewmaAnomalies(spark, sf)
      .select($"day".cast("string"), $"cents", $"ewma_cents", $"dev_bp",
        $"alarm")
      .as[(String, Long, Long, Long, Boolean)].collect()
    assert(got.length === expected.size)
    got.foreach { case (d, c, e, dev, al) =>
      val (ec, ee, edev, eal) = expected(d)
      assert(c === ec, s"$d cents"); assert(e === ee, s"$d ewma")
      assert(dev === edev, s"$d dev"); assert(al === eal, s"$d alarm")
    }
    // the screen must be discriminative at fixture scale: some alarms,
    // not all alarms (daily volume at sf0.001 is genuinely spiky)
    assert(got.exists(_._5) && got.exists(!_._5))
  }

  test("benfordAudit matches a sequential first-digit replay; chi-square " +
       "total is the sum of the per-digit contributions") {
    import spark.implicits._
    def r4(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
    val prices = graft.Tables(spark, sf, "orders")
      .select($"o_totalprice").as[Double].collect().filter(_ >= 1.0)
    val counts = prices
      .map(p => BigDecimal(math.floor(p)).toBigInt.toString.head - '0')
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nTot = counts.values.sum
    val expected = (1 to 9).map { dgt =>
      val nObs = counts.getOrElse(dgt, 0L)
      val expShare = math.log(1.0 + 1.0 / dgt) / math.log(10.0)
      val expN = nTot * expShare
      val contribU = java.math.BigDecimal
        .valueOf((nObs - expN) * (nObs - expN) / expN * 1e6)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      (dgt, nObs, r4(expShare), r4(expN), contribU)
    }
    val chi2 = r4(expected.map(_._5).sum / 1e6)
    val got = Relational.benfordAudit(spark, sf)
      .as[(Int, Long, Double, Double, Double, Double)].collect()
    assert(got.length === 9)
    got.zip(expected).foreach {
      case ((d, n, es, en, c, x2), (ed, eN, eEs, eEn, eCu)) =>
        assert(d === ed)
        assert(n === eN, s"digit $d n_obs")
        assert(es === eEs, s"digit $d exp_share")
        assert(en === eEn, s"digit $d exp_n")
        assert(c === r4(eCu / 1e6), s"digit $d contrib")
        assert(x2 === chi2, s"digit $d chi2 total")
    }
    // every order lands somewhere: observed digits conserve the row count
    assert(got.map(_._2).sum === nTot)
  }

  test("globalRowNumber: identical to the single-partition window, and " +
       "the data-sized window runs partitioned") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // documents: doc_id is unique, so (n_chars, doc_id) is a TOTAL order
    // — the precondition the operator documents (with ties, tied rows
    // may straddle a range boundary and tie order becomes partition-
    // dependent)
    val df = graft.Tables(spark, sf, "documents")
      .select($"doc_id", $"n_chars")
    val order = Seq($"n_chars", $"doc_id")
    val got = Relational.globalRowNumber(df, order, numParts = 7)
      .select($"doc_id", $"rk")
      .as[(Long, Long)].collect().map(r => r._1 -> r._2).toMap
    val single = df.withColumn("rk", row_number().over(
        Window.partitionBy(lit(1)).orderBy(order: _*)).cast("long"))
      .select($"doc_id", $"rk")
      .as[(Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got === single)
    assert(got.nonEmpty)
    // ranks are a permutation of 1..n with no gaps
    assert(got.values.toSeq.sorted === (1L to got.size.toLong))
  }

  test("cusumShift: window identity equals the textbook CUSUM recursion") {
    val daily = Tables(spark, sf, "orders")
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.toString)
    val mu = daily.map(_._2).sum / daily.length
    val slack = mu / 20
    var sHi = 0L; var sLo = 0L
    val expected = daily.map { case (day, cents) =>
      sHi = math.max(0L, sHi + (cents - mu - slack))
      sLo = math.max(0L, sLo - (cents - mu + slack))
      (day.toString, cents, sHi, sLo)
    }
    val rows = Relational.cusumShift(spark, sf).collect()
    assert(rows.length === daily.length)
    rows.zip(expected).foreach { case (r, (day, cents, hi, lo)) =>
      assert(r.getAs[java.sql.Date]("day").toString === day)
      assert(r.getAs[Long]("cents") === cents)
      assert(r.getAs[Long]("mu") === mu)
      assert(r.getAs[Long]("s_hi") === hi, s"s_hi at $day")
      assert(r.getAs[Long]("s_lo") === lo, s"s_lo at $day")
      assert(r.getAs[Boolean]("alarm_hi") === (hi >= mu / 4))
      assert(r.getAs[Boolean]("alarm_lo") === (lo >= mu / 4))
    }
  }

  test("hillTail: top-k log sum and alpha recount exactly") {
    val cents = Tables(spark, sf, "orders")
      .select($"o_orderkey", round($"o_totalprice" * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, c) => (-c, id) }
    val top = cents.take(201)
    val thr = top.last._2
    val lsum = top.take(200).map { case (_, c) =>
      BigDecimal(math.log(c.toDouble / thr.toDouble) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.sum
    val row = Relational.hillTail(spark, sf).collect().head
    assert(row.getAs[Long]("k") === 200L)
    assert(row.getAs[Long]("threshold_cents") === thr)
    assert(row.getAs[Long]("lsum_u") === lsum)
    assert(row.getAs[Long]("alpha_milli") === 200L * 1000000000L / lsum)
    assert(row.getAs[Long]("alpha_milli") > 0)
  }

  test("runsTest: median split, run count and z recount exactly") {
    val daily = Tables(spark, sf, "orders")
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.toString)
    val n0 = daily.length
    val sorted = daily.map(_._2).sorted
    val medX2 = if (n0 % 2 == 1) 2 * sorted(n0 / 2)
      else sorted(n0 / 2 - 1) + sorted(n0 / 2)
    val signs = daily.filter(_._2 * 2 != medX2).map(_._2 * 2 > medX2)
    val runs = 1L + signs.sliding(2).count {
      case Array(a, b) => a != b
      case _ => false
    }
    val n1 = signs.count(identity).toLong
    val n2 = signs.count(!_).toLong
    val n = n1 + n2
    val row = Relational.runsTest(spark, sf).collect().head
    assert(row.getAs[Long]("n_days") === n)
    assert(row.getAs[Long]("n_above") === n1)
    assert(row.getAs[Long]("n_below") === n2)
    assert(row.getAs[Long]("runs") === runs)
    assert(row.getAs[Long]("e_runs_x_n") === n + 2 * n1 * n2)
    val z = BigDecimal((runs.toDouble - (1.0 + 2.0 * n1 * n2 / n)) /
        math.sqrt((2.0 * n1 * n2 * (2.0 * n1 * n2 - n)) /
          (n.toDouble * n * (n - 1))))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("z") === z)
  }

  test("joinSizeEst: sketch inner products recount; soundness is a theorem") {
    def md5hex60(s0: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s0.getBytes("UTF-8")).map("%02x".format(_)).mkString
          .substring(0, 15), 16)
    val ka = Tables(spark, sf, "orders").select($"o_custkey")
      .as[Long].collect()
    val kb = Tables(spark, sf, "events").select($"user_id")
      .as[Long].collect()
    def sketch(keys: Array[Long]): Map[(Int, Long), Long] =
      (for (k <- keys; r <- 0 until 4)
        yield (r, md5hex60(s"$r:js:$k") % 32)).groupBy(identity)
        .view.mapValues(_.length.toLong).toMap
    val (sa, sb) = (sketch(ka), sketch(kb))
    val fa = ka.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val fb = kb.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val exact = fa.keySet.intersect(fb.keySet).toSeq
      .map(k => fa(k) * fb(k)).sum
    val rows = Relational.joinSizeEst(spark, sf).collect()
    assert(rows.length === 4)
    rows.foreach { row =>
      val r = row.getAs[Long]("r").toInt
      val est = (0L until 32L).map(b =>
        sa.getOrElse((r, b), 0L) * sb.getOrElse((r, b), 0L)).sum
      assert(row.getAs[Long]("est") === est)
      assert(row.getAs[Long]("exact_size") === exact)
      assert(row.getAs[Boolean]("sound"), "CMS inner product must be >= truth")
      assert(row.getAs[Long]("cms_est") ===
        rows.map(_.getAs[Long]("est")).min)
    }
  }

  test("changepoint: argmax location and segment means recount exactly") {
    val daily = Tables(spark, sf, "orders")
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.toString)
    val n = daily.length.toLong
    val pn = daily.map(_._2).sum
    var p = 0L
    val stats = daily.dropRight(1).zipWithIndex.map { case ((day, c), i) =>
      p += c
      (day.toString, i + 1L, p, math.abs(n * p - (i + 1L) * pn))
    }
    val gmax = stats.map(_._4).max
    val (day, t, pt, _) = stats.filter(_._4 == gmax).minBy(_._1)
    val row = Relational.changepoint(spark, sf).collect().head
    assert(row.getAs[java.sql.Date]("split_day").toString === day)
    assert(row.getAs[Long]("n_before") === t)
    assert(row.getAs[Long]("n_after") === n - t)
    assert(row.getAs[Long]("mean_before_cents") === pt / t)
    assert(row.getAs[Long]("mean_after_cents") === (pn - pt) / (n - t))
    assert(row.getAs[Long]("g_stat") === gmax)
    assert(row.getAs[Long]("shift_cents") ===
      (pn - pt) / (n - t) - pt / t)
  }

  test("dpCounts: seeded discrete-Laplace noise recounts from the exact " +
       "inverse CDF; release is clamped nonnegative") {
    def md5hex60(s0: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map("%02x".format(_)).mkString.substring(0, 15), 16)
    }
    def noiseOf(src: String): Long = {
      val u3 = 3L * md5hex60("dp:" + src)
      (-30 to 30).find { k =>
        val t3 = if (k == 30) Long.MaxValue
          else if (k < 0) 1L << (61 + k)
          else 3L * (1L << 60) - (1L << (60 - k))
        u3 < t3
      }.get.toLong
    }
    val trueCounts = Tables(spark, sf, "documents")
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    val rows = Relational.dpCounts(spark, sf).collect()
    assert(rows.map(_.getAs[String]("source")).toSet === trueCounts.keySet)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("n_docs") === trueCounts(src))
      assert(r.getAs[Long]("noise") === noiseOf(src), s"noise for $src")
      assert(r.getAs[Long]("released") ===
        math.max(trueCounts(src) + noiseOf(src), 0L))
      assert(math.abs(r.getAs[Long]("noise")) <= 30)
    }
  }

  test("kAnonymity: class sizes, diversity and risk shares recount exactly") {
    val cust = Tables(spark, sf, "customer")
      .select($"c_nationkey", $"c_mktsegment", $"c_acctbal")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    def band(x: Double) = if (x < 0) "debt" else if (x < 5000) "low" else "high"
    val classes = cust.groupBy(c => (c._1, c._2)).view.mapValues { g =>
      (g.length.toLong, g.map(c => band(c._3)).distinct.length.toLong)
    }.toMap
    val kMin = classes.values.map(_._1).min
    val riskyRows = classes.values
      .collect { case (sz, l) if sz < 5 || l <= 1 => sz }.sum
    val nRows = cust.length.toLong
    val rows = Relational.kAnonymity(spark, sf).collect()
    assert(rows.length === classes.size)
    rows.foreach { r =>
      val key = (r.getAs[Int]("c_nationkey"), r.getAs[String]("c_mktsegment"))
      val (sz, l) = classes(key)
      assert(r.getAs[Long]("class_size") === sz)
      assert(r.getAs[Long]("l_diversity") === l)
      assert(r.getAs[Boolean]("k_risky") === (sz < 5))
      assert(r.getAs[Boolean]("l_risky") === (l <= 1))
      assert(r.getAs[Long]("k_min") === kMin)
      assert(r.getAs[Long]("risky_share_bp") === riskyRows * 10000 / nRows)
    }
    // every customer is in exactly one class
    assert(rows.map(_.getAs[Long]("class_size")).sum === nRows)
  }

  test("acfLjungBox: lag autocovariances, rho and cumulative Q recount " +
       "exactly; Cauchy-Schwarz bounds rho") {
    val daily = Tables(spark, sf, "orders")
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.toString)
    val n = daily.length.toLong
    val s0 = daily.map(_._2).sum
    val y = daily.map { case (_, c) => BigInt(n * c - s0) }
    val g0 = y.map(v => v * v).sum
    val crit = Seq(3841L, 5991L, 7815L, 9488L, 11070L, 12592L, 14067L,
      15507L, 16919L, 18307L)
    var q = 0L
    val rows = Relational.acfLjungBox(spark, sf).collect()
    assert(rows.length === 10)
    rows.zipWithIndex.foreach { case (r, i) =>
      val k = i + 1
      val gk = y.dropRight(k).zip(y.drop(k)).map { case (a, b) => a * b }.sum
      val rho = ((gk * 1000000 + 1000000 * g0) / g0 - 1000000).toLong
      q += n * (n + 2) * rho * rho / ((n - k) * 1000000000L)
      assert(r.getAs[Long]("lag_k") === k.toLong)
      assert(BigInt(r.getAs[String]("g0_num")) === g0)
      assert(BigInt(r.getAs[String]("gamma_num")) === gk,
        s"gamma at lag $k")
      assert(r.getAs[Long]("rho_u") === rho, s"rho at lag $k")
      assert(math.abs(rho) <= 1000000L) // |gamma_k| <= gamma_0
      assert(r.getAs[Long]("q_milli") === q, s"Q at lag $k")
      assert(r.getAs[Long]("crit_milli") === crit(i))
      assert(r.getAs[Boolean]("reject") === (q > crit(i)))
    }
  }

  test("kruskalWallis: doubled tie-average ranks, H and tie correction " +
       "recount exactly; rank sums cover 2*(1+..+N)") {
    val daily = Tables(spark, sf, "orders")
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .as[(java.sql.Date, Long)].collect()
    val n = daily.length.toLong
    val byCents = daily.groupBy(_._2)
    val tieSum = byCents.values.map { g =>
      val t = g.length.toLong; t * t * t - t
    }.sum
    val sorted = daily.map(_._2).sorted
    // doubled average rank per value: 2*minRank + count - 1
    val dr = byCents.map { case (c, g) =>
      val minRank = sorted.indexOf(c) + 1L
      c -> (2L * minRank + g.length - 1L)
    }
    val wdOf = daily.map { case (d, c) =>
      (d.toLocalDate.getDayOfWeek.getValue - 1L, c)
    }
    val groups = wdOf.groupBy(_._1)
    val contribs = groups.map { case (wd, xs) =>
      val r2 = xs.map { case (_, c) => dr(c) }.sum
      wd -> (xs.length.toLong, r2,
        3000L * r2 * r2 / (xs.length.toLong * n * (n + 1)))
    }
    val hMilli = contribs.values.map(_._3).sum - 3000L * (n + 1)
    val tieDenomPpm = 1000000L - 1000000L * tieSum / (n * n * n - n)
    val hAdj = (hMilli * 1000000L + 1000000000L * tieDenomPpm) /
      tieDenomPpm - 1000000000L
    val rows = Relational.kruskalWallis(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("wd")).toSet === groups.keySet)
    rows.foreach { r =>
      val (nd, r2, hc) = contribs(r.getAs[Long]("wd"))
      assert(r.getAs[Long]("n_days") === nd)
      assert(r.getAs[Long]("r2_sum") === r2)
      assert(r.getAs[Long]("mean_rank_milli") === 1000L * r2 / (2L * nd))
      assert(r.getAs[Long]("h_contrib_milli") === hc)
      assert(r.getAs[Long]("h_milli") === hMilli)
      assert(r.getAs[Long]("tie_sum") === tieSum)
      assert(r.getAs[Long]("tie_denom_ppm") === tieDenomPpm)
      assert(r.getAs[Long]("h_adj_milli") === hAdj)
      assert(r.getAs[Boolean]("reject") === (hAdj > 12592L))
    }
    // doubled ranks over all days must sum to 2*(1+...+N) = N(N+1)
    assert(rows.map(_.getAs[Long]("r2_sum")).sum === n * (n + 1))
  }

  test("pageHinkley: running-mean deviations, prefix extrema and alarms " +
       "recount exactly; first-day PH is zero") {
    val daily = Tables(spark, sf, "orders")
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.toString)
    var sCum = BigInt(0); var m = BigInt(0)
    var mMin = BigInt(0); var mMax = BigInt(0)
    val expected = daily.zipWithIndex.map { case ((day, cents), i) =>
      val t = i + 1L
      sCum += cents
      val mbar = sCum * 1000000 / t
      m += BigInt(cents) * 1000000 - mbar
      mMin = mMin.min(m); mMax = mMax.max(m)
      (day.toString, cents, t, mbar, m, m - mMin, mMax - m)
    }
    val rows = Relational.pageHinkley(spark, sf).collect()
    assert(rows.length === daily.length)
    rows.zip(expected).foreach {
      case (r, (day, cents, t, mbar, mc, hi, lo)) =>
        assert(r.getAs[java.sql.Date]("day").toString === day)
        assert(r.getAs[Long]("cents") === cents)
        assert(r.getAs[Long]("t") === t)
        assert(r.getAs[Long]("mbar_u") === mbar.toLong, s"mbar at $day")
        // output contract is BIGINT (wide decimal is internal-only)
        assert(BigInt(r.getAs[Long]("m_cum")) === mc, s"m_cum at $day")
        assert(BigInt(r.getAs[Long]("ph_hi")) === hi, s"ph_hi at $day")
        assert(BigInt(r.getAs[Long]("ph_lo")) === lo, s"ph_lo at $day")
        assert(r.getAs[Boolean]("alarm_hi") === (hi >= mbar / 4))
        assert(r.getAs[Boolean]("alarm_lo") === (lo >= mbar / 4))
    }
    // day 1: mean == value exactly, so the deviation and both PH are 0
    assert(rows.head.getAs[Long]("m_cum") === 0L)
    assert(rows.head.getAs[Long]("ph_hi") === 0L)
  }

  test("matrixProfile: nearest-neighbor distances recount exactly; " +
       "the profile is symmetric-bounded and excludes trivial matches") {
    val m = 7
    val daily = Tables(spark, sf, "orders")
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.toString)
    val d0 = daily.head._1.toLocalDate
    val byT = daily.map { case (d, c) =>
      java.time.temporal.ChronoUnit.DAYS.between(d0, d.toLocalDate) -> c
    }.toMap
    val ts = byT.keys.toSeq.sorted
    // windows are ROW-consecutive (lead over observed days, as in the
    // operator), anchored at the window's first day offset
    val wins = ts.indices.dropRight(m - 1)
      .map(i => ts(i) -> (0 until m).map(k => byT(ts(i + k))))
    def d2(a: Seq[Long], b: Seq[Long]): BigInt =
      a.zip(b).map { case (x, y) => BigInt(x - y) * (x - y) }.sum
    val expected = wins.map { case (ti, wa) =>
      val cands = wins.filter { case (tj, _) => math.abs(ti - tj) >= m }
      val best = cands.map { case (tj, wb) => (d2(wa, wb), tj) }
        .minBy(identity)
      (ti, best._2, best._1)
    }
    val rows = Relational.matrixProfile(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigInt(r.getAs[Long]("dist2")),
        r.getAs[Long]("discord_rank")))
    assert(rows.map(t => (t._1, t._2, t._3)).toSeq === expected)
    rows.foreach { case (t0, nn, _, _) => assert(math.abs(t0 - nn) >= m) }
    // discord ranks are a permutation ordered by descending distance
    val byRank = rows.sortBy(_._4)
    assert(byRank.map(_._4).toSeq === (1L to rows.length))
    assert(byRank.map(_._3).toSeq === byRank.map(_._3).sortBy(v => -v))
  }

  test("newsvendor: the critical fractile and both costs recount " +
       "exactly; the fractile beats EVERY other stock level") {
    val cents = Tables(spark, sf, "orders")
      .groupBy($"o_orderdate".cast("date"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")))
      .as[(java.sql.Date, Long)].collect()
      .sortBy(t => (t._2, t._1.toString)).map(_._2)
    val n = cents.length
    def cost(stock: Long): BigInt = cents.map(d =>
      BigInt(math.max(d - stock, 0L)) * 3 + math.max(stock - d, 0L)).sum
    val sStar = cents(((n * 3 + 3) / 4 - 1).toInt)
    val sMean = (cents.map(BigInt(_)).sum / n).toLong
    val r = Relational.newsvendor(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_days") === n.toLong)
    assert(r.getAs[Long]("s_star") === sStar)
    assert(r.getAs[Long]("s_mean") === sMean)
    assert(BigInt(r.getAs[Long]("cost_star")) === cost(sStar))
    assert(BigInt(r.getAs[Long]("cost_mean")) === cost(sMean))
    assert(r.getAs[Long]("saving_cents") ===
      (cost(sMean) - cost(sStar)).toLong)
    // the critical fractile minimizes the EMPIRICAL newsvendor cost —
    // check against every observed demand level as candidate stock
    cents.distinct.foreach(sC =>
      assert(cost(sStar) <= cost(sC), s"beaten by stock $sC"))
  }

  test("brandHhi: shares and the index recount exactly per nation; " +
       "HHI sits between perfect competition and monopoly bounds") {
    val nb = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(Tables(spark, sf, "customer"), $"o_custkey" === $"c_custkey")
      .join(Tables(spark, sf, "part"), $"l_partkey" === $"p_partkey")
      .groupBy($"c_nationkey", $"p_brand")
      .agg(sum(round($"l_extendedprice" * 100).cast("long")))
      .as[(Int, String, Long)].collect()
    val byNation = nb.groupBy(_._1)
    val rows = Relational.brandHhi(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(rows.keySet === byNation.keySet)
    byNation.foreach { case (nk, g) =>
      val tot = g.map(_._3).sum
      val shares = g.map(t => t._3 * 10000L / tot)
      val (nBr, totC, hhi, top) = rows(nk)
      assert(nBr === g.length.toLong)
      assert(totC === tot)
      assert(hhi === shares.map(x => x * x).sum)
      assert(top === shares.max)
      // bounds: floored-share HHI never exceeds monopoly and sits at
      // least near the perfect-competition floor (floor slack < n·2·10⁴)
      assert(hhi <= 100000000L)
      assert(hhi >= 100000000L / g.length - g.length * 20000L)
    }
  }

  test("lorenzCurve: deciles, cumulative shares and the rank-identity " +
       "Gini recount exactly; the curve is convex-increasing") {
    val rev = Tables(spark, sf, "orders")
      .groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long")))
      .as[(Long, Long)].collect().sortBy(t => (t._2, t._1)).map(_._2)
    val n = rev.length
    val s = rev.map(BigInt(_)).sum
    val ix = rev.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    val gini = 2 * ix * 1000000 / (BigInt(n) * s) -
      BigInt(n + 1) * 1000000 / n
    val expected = rev.zipWithIndex
      .groupBy { case (_, i) => (i * 10 / n) + 1 }
      .map { case (d, g) => d -> ((g.length.toLong,
        g.map(t => BigInt(t._1)).sum)) }
    val rows = Relational.lorenzCurve(spark, sf).collect().map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq === (1 to 10))
    var cum = BigInt(0)
    rows.foreach { case (d, nc, rc, crc, csbp, g) =>
      assert(nc === expected(d)._1, s"n_cust decile $d")
      assert(BigInt(rc) === expected(d)._2, s"rev decile $d")
      cum += expected(d)._2
      assert(BigInt(crc) === cum)
      assert(BigInt(csbp) === cum * 10000 / s)
      assert(BigInt(g) === gini)
    }
    // Lorenz convexity: ascending-rank decile revenues never decrease
    val decRevs = rows.map(_._3)
    assert(decRevs.toSeq === decRevs.sorted.toSeq)
    assert(rows.last._5 === 10000L)
  }

  test("schemaDrift: per-side stats recount exactly for a spot column; " +
       "the edit band drifts fp but never lang") {
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val d = Tables(spark, sf, "documents")
      .select($"doc_id", $"lang", $"text",
        graft.operators.TextOps.hashBucket($"doc_id", "snap:"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    val a = d.filter(_._4 < 90)
    val b = d.filter(_._4 >= 10).map { case (id, l, t, bk) =>
      (id, l, if (bk >= 40 && bk < 60) t.toUpperCase else t, bk) }
    val rows = Relational.schemaDrift(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    // spot recount: the fingerprint column end to end
    val fp = rows("fp")
    assert(fp.getAs[Long]("n_a") === a.length.toLong)
    assert(fp.getAs[Long]("n_b") === b.length.toLong)
    assert(fp.getAs[Long]("ndv_a") === a.map(t => md5hex(t._3)).distinct.length.toLong)
    assert(fp.getAs[Long]("ndv_b") === b.map(t => md5hex(t._3)).distinct.length.toLong)
    assert(fp.getAs[Boolean]("min_changed") ===
      (a.map(t => md5hex(t._3)).min != b.map(t => md5hex(t._3)).min))
    // the carve's contract: text edits drift fp; lang never drifts
    // beyond row deltas
    assert(fp.getAs[Boolean]("drifted"))
    val lang = rows("lang")
    assert(lang.getAs[Long]("ndv_delta") === 0L)
    assert(!lang.getAs[Boolean]("drifted"))
  }

  test("sqlRevenueShare: the SQL-text path equals the DataFrame path " +
       "and shares sum to ~10000 bp") {
    val viaSql = Relational.sqlRevenueShare(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // independent DataFrame-API recompute of the same logic
    val cents = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "customer"), $"o_custkey" === $"c_custkey")
      .join(Tables(spark, sf, "nation"), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = cents.values.sum
    val expected = cents.map { case (n, c) =>
      (n, c, c * 10000L / total) }.toSeq.sortBy(t => (-t._2, t._1))
    assert(viaSql.toSeq === expected)
    // floor shares can undershoot by at most |nations| bp
    val shareSum = viaSql.map(_._3).sum
    assert(shareSum <= 10000L && shareSum > 10000L - viaSql.length)
  }

  test("custOrderHistogram: buckets recount exactly and the zero-order " +
       "cohort is a first-class bucket") {
    val perCust = Tables(spark, sf, "orders")
      .groupBy($"o_custkey").agg(count(lit(1)))
      .as[(Long, Long)].collect().toMap
    val custs = Tables(spark, sf, "customer")
      .select($"c_custkey").as[Long].collect()
    val expected = custs.map(c => perCust.getOrElse(c, 0L))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val rows = Relational.custOrderHistogram(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(rows.toMap === expected)
    assert(rows.map(_._2).sum === custs.length.toLong)
    // the ranking is (n_customers desc, c_count desc), total; every
    // customer lands in exactly one bucket (the outer-join guarantee —
    // this fixture has no dormant customers, so the sum check is what
    // pins the LEFT join: an inner join would still pass only because
    // the cohort is empty, and the oracle compares the same shape)
    assert(rows.toSeq === rows.toSeq.sortBy(t => (-t._2, -t._1)))
  }

  test("priorityCheck: the EXISTS semi-join recounts exactly and never " +
       "double-counts multi-match orders") {
    val shipByOrder = Tables(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_shipdate".cast("date").cast("string"))
      .as[(Long, String)].collect().groupBy(_._1)
    val expected = Tables(spark, sf, "orders")
      .select($"o_orderkey", $"o_orderpriority",
        $"o_orderdate".cast("date").cast("string"))
      .as[(Long, String, String)].collect()
      .filter { case (ok, _, od) =>
        shipByOrder.getOrElse(ok, Array.empty[(Long, String)])
          .exists(_._2 > od) }
      .groupBy(_._2).map { case (p, g) => p -> g.length.toLong }
    val rows = Relational.priorityCheck(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows === expected)
  }

  test("permutationTest: the null distribution recounts exactly from " +
       "seeded md5 draws; the A/A p-value respects its resolution floor") {
    def md5hex(x: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(x.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def arm(p: Int, okey: Long): Int = {
      val h = md5hex(s"perm:$okey") + md5hex(s"perm2:$okey")
      val c = p / 60
      val chunk = java.lang.Long.parseLong(
        h.substring(c * 15, c * 15 + 15), 16)
      ((chunk >> (p % 60)) & 1L).toInt
    }
    val orders = Tables(spark, sf, "orders")
      .select($"o_orderkey", round($"o_totalprice" * 100).cast("long"))
      .as[(Long, Long)].collect()
    def tStat(p: Int): (BigInt, Long, Long) = {
      val (a, b) = orders.partition(o => arm(p, o._1) == 0)
      val t = (BigInt(b.length) * a.map(o => BigInt(o._2)).sum
        - BigInt(a.length) * b.map(o => BigInt(o._2)).sum).abs
      (t, a.length.toLong, b.length.toLong)
    }
    val (tObs, nA, nB) = tStat(0)
    val nulls = (1 to 199).map(p => tStat(p)._1)
    val nGe = nulls.count(_ >= tObs).toLong
    val r = Relational.permutationTest(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_arm_a") === nA)
    assert(r.getAs[Long]("n_arm_b") === nB)
    assert(BigInt(r.getAs[Long]("t_obs")) === tObs)
    assert(r.getAs[Long]("n_perms") === 199L)
    assert(r.getAs[Long]("n_ge") === nGe)
    assert(r.getAs[Long]("p_milli") === (1L + nGe) * 1000L / 200L)
    // the exact test can never report below its resolution floor
    assert(r.getAs[Long]("p_milli") >= 5L)
  }

  test("basketRules: support/confidence/lift recount exactly from raw " +
       "baskets; rules respect min support and the ranking is total") {
    val ob = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "part"), $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"p_brand").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nOrders = ob.map(_._1).distinct.length.toLong
    val byBrand = ob.groupBy(_._2).map { case (b, v) => b -> v.length.toLong }
    val byOrder = ob.groupBy(_._1).values.map(_.map(_._2).toSet)
    val both = byOrder.toSeq.flatMap(bs =>
        for (a <- bs; b <- bs if a != b) yield (a, b))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      .filter(_._2 >= 20L)
    val expected = both.map { case ((a, c), nb) =>
      (a, c) -> ((nb, byBrand(a), byBrand(c), nb * 10000 / byBrand(a),
        nb * nOrders * 1000000 / (byBrand(a) * byBrand(c)))) }
    val rows = Relational.basketRules(spark, sf).collect().map(r =>
      ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))))
    rows.foreach { case (k, v) => assert(expected(k) === v, s"rule $k") }
    // top-30 by (lift desc, antecedent, consequent) — exactly
    val want = expected.toSeq
      .sortBy { case ((a, c), v) => (-v._5, a, c) }.take(30)
      .map { case (k, v) => (k, v) }
    assert(rows.toSeq === want)
  }

  test("seasonalDecompose: trend + seasonal + remainder reassemble the " +
       "series exactly; seasonal means recount per weekday") {
    val rows = Relational.seasonalDecompose(spark, sf).collect().map(r =>
      (r.getAs[java.sql.Date]("day"), r.getAs[Long]("weekday"),
        r.getAs[Long]("cents"), r.getAs[Long]("trend_u"),
        r.getAs[Long]("seasonal_u"), r.getAs[Long]("remainder_u")))
    // identity: detrended == seasonal + remainder at every day
    rows.foreach { case (d, _, c, t, sea, rem) =>
      assert(c * 1000000L - t === sea + rem, s"identity at $d") }
    // weekday index matches the calendar (Monday = 0)
    rows.foreach { case (d, wd, _, _, _, _) =>
      assert(wd === d.toLocalDate.getDayOfWeek.getValue.toLong - 1L) }
    // seasonal is one value per weekday and recounts as the truncated
    // mean of the detrended series
    val byWd = rows.groupBy(_._2)
    byWd.foreach { case (wd, g) =>
      assert(g.map(_._5).distinct.length === 1)
      val det = g.map(t => BigInt(t._3) * 1000000 - t._4)
      assert(BigInt(g.head._5) === det.sum / det.length, s"weekday $wd")
    }
    // trend recounts as the centered 7-day MA over the full rollup
    val daily = Tables(spark, sf, "orders")
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.toString)
    val idx = daily.map(_._1.toString).zipWithIndex.toMap
    rows.foreach { case (d, _, _, t, _, _) =>
      val i = idx(d.toString)
      val s7 = (i - 3 to i + 3).map(k => daily(k)._2).sum
      assert(t === s7 * 1000000L / 7L, s"trend at $d")
    }
    assert(rows.length === daily.length - 6)
  }

  test("seasonalAnomalies: the remainder spread recounts exactly and " +
       "the flag is the 3-MAD rule on the DESEASONALIZED series") {
    val dec = Relational.seasonalDecompose(spark, sf).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("cents"), r.getAs[Long]("remainder_u")))
    def m2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s((s.length + 1) / 2 - 1) + s((s.length + 2) / 2 - 1)
    }
    val med2 = m2(dec.map(_._3))
    val mad4 = m2(dec.map(t => math.abs(2 * t._3 - med2)))
    val rows = Relational.seasonalAnomalies(spark, sf).collect().map(r =>
      (r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("cents"),
        r.getAs[Long]("remainder_u"), r.getAs[Long]("med2_u"),
        r.getAs[Long]("mad4_u"), r.getAs[Boolean]("anomaly")))
    assert(rows.length === dec.length)
    rows.foreach { case (d, c, rem, m, md, a) =>
      assert(m === med2 && md === mad4, d)
      assert(a === (math.abs(rem * 2 - med2) * 2 > mad4 * 3), d)
    }
    assert(rows.map(t => (t._1, t._2, t._3)).toSeq === dec.toSeq)
  }

  test("maseBacktest: error sums recount sequentially; the trailing-mean " +
       "model is honestly scored against seasonal-naive") {
    val daily = Tables(spark, sf, "orders")
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.toString).map(_._2)
    val evalRows = (7 until daily.length).map { i =>
      val fc = (i - 7 until i).map(daily).sum * 1000000L / 7L
      val eModel = math.abs(daily(i) * 1000000L - fc)
      val eNaive = math.abs(daily(i) - daily(i - 7)) * 1000000L
      (eModel, eNaive)
    }
    val seM = evalRows.map(t => BigInt(t._1)).sum
    val seN = evalRows.map(t => BigInt(t._2)).sum
    val r = Relational.maseBacktest(spark, sf).collect()(0)
    assert(r.getAs[Long]("n_eval") === evalRows.length.toLong)
    assert(BigInt(r.getAs[Long]("mae_model_u")) === seM / evalRows.length)
    assert(BigInt(r.getAs[Long]("mae_naive_u")) === seN / evalRows.length)
    assert(BigInt(r.getAs[Long]("mase_milli")) === seM * 1000 / seN)
    assert(r.getAs[Long]("win_bp") ===
      evalRows.count(t => t._1 < t._2).toLong * 10000L / evalRows.length)
  }

  test("powerAnalysis: the staged integer formula recounts exactly; " +
       "quadrupling the MDE cuts the requirement ~4x") {
    val cents = Tables(spark, sf, "orders")
      .select(round($"o_totalprice" * 100).cast("long"))
      .as[Long].collect()
    val n = BigInt(cents.length)
    val sS = cents.map(BigInt(_)).sum
    val q = cents.map(c => BigInt(c) * c).sum
    val varC2 = (n * q - sS * sS) / (n * (n - 1))
    val meanC = sS / n
    def nReq(mdeBp: Long): BigInt = {
      val deltaC = meanC * mdeBp / 10000
      val z2 = BigInt(2801585) * 2801585
      val den = deltaC * deltaC * BigInt("1000000000000")
      (2 * z2 * varC2 + den - 1) / den
    }
    val r = Relational.powerAnalysis(spark, sf).collect()(0)
    assert(BigInt(r.getAs[Long]("var_c2")) === varC2)
    assert(BigInt(r.getAs[Long]("mean_c")) === meanC)
    assert(BigInt(r.getAs[Long]("delta_c")) === meanC * 200 / 10000)
    assert(BigInt(r.getAs[Long]("n_required")) === nReq(200))
    val r2 = Relational.powerAnalysis(spark, sf, mdeBp = 800L)
      .collect()(0)
    assert(BigInt(r2.getAs[Long]("n_required")) === nReq(800))
    // inverse-square law of detectability (integer-rounding slack)
    assert(nReq(800) <= nReq(200) / 16 + 1)
  }

  test("columnStats: per-column NDV/min/max/nulls recount exactly " +
       "against direct single-column aggregates") {
    val li = Tables(spark, sf, "lineitem")
    val rows = Relational.columnStats(spark, sf).collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))).toMap
    assert(rows.keySet === Set("l_orderkey", "l_partkey", "l_suppkey",
      "l_quantity", "l_cents", "l_returnflag", "l_shipdate"))
    val n = li.count()
    rows.values.foreach { case (nr, nn, _, _, _) =>
      assert(nr === n); assert(nn === 0L) }
    // spot-exact: independent per-column aggregates must agree
    assert(rows("l_orderkey")._3 ===
      li.select($"l_orderkey").distinct().count())
    assert(rows("l_returnflag")._3 ===
      li.select($"l_returnflag").distinct().count())
    val rf = li.agg(min($"l_returnflag"), max($"l_returnflag"))
      .collect()(0)
    assert(rows("l_returnflag")._4 === rf.getString(0))
    assert(rows("l_returnflag")._5 === rf.getString(1))
    // zero-padding makes string order the numeric order
    val ok = li.agg(min($"l_orderkey"), max($"l_orderkey")).collect()(0)
    assert(rows("l_orderkey")._4.toLong === ok.getLong(0))
    assert(rows("l_orderkey")._5.toLong === ok.getLong(1))
  }

  test("rollingMedianMad: doubled median and quadrupled MAD recount " +
       "exactly per trailing window; the alarm is the 3-MAD rule") {
    val daily = Tables(spark, sf, "orders")
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.toString)
    def m2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s((s.length + 1) / 2 - 1) + s((s.length + 2) / 2 - 1)
    }
    val expected = (27 until daily.length).map { i =>
      val w = (i - 27 to i).map(k => daily(k)._2)
      val med2 = m2(w)
      val mad4 = m2(w.map(v => math.abs(2 * v - med2)))
      (daily(i)._1.toString, daily(i)._2, med2, mad4,
        math.abs(daily(i)._2 * 2 - med2) * 2 > mad4 * 3)
    }
    val rows = Relational.rollingMedianMad(spark, sf).collect().map(r =>
      (r.getAs[java.sql.Date]("day").toString, r.getAs[Long]("cents"),
        r.getAs[Long]("med2"), r.getAs[Long]("mad4"),
        r.getAs[Boolean]("anomaly")))
    assert(rows.toSeq === expected)
    // robustness sanity: every alarm day genuinely sits 1.5 raw MADs
    // past the window median of its own trailing window
    rows.filter(_._5).foreach { case (d, c, med2, mad4, _) =>
      assert(math.abs(2 * c - med2).toDouble > 1.5 * mad4 / 2.0, d) }
  }

  test("ivmAggApply: the maintained view equals a full recompute; the " +
       "min repair fires exactly when a deleted row could carry the min") {
    val b = Tables(spark, sf, "orders").select($"o_orderkey", $"o_custkey",
        round($"o_totalprice" * 100).cast("long").as("cents"),
        graft.operators.TextOps.hashBucket($"o_orderkey", "ivm:").as("bk"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val base = b.filter(_._4 < 90)
    val post = base.filter(_._4 < 80).map(t => (t._2, t._3)) ++
      base.filter(t => t._4 >= 80 && t._4 < 85)
        .map(t => (t._2, t._3 + 1000L)) ++
      b.filter(_._4 >= 90).map(t => (t._2, t._3))
    val expected = post.groupBy(_._1).map { case (k, v) =>
      k -> ((v.length.toLong, v.map(_._2).sum, v.map(_._2).min)) }
    val vMin = base.groupBy(_._2).map { case (k, v) =>
      k -> v.map(_._3).min }
    val dMin = base.filter(_._4 >= 80).groupBy(_._2).map { case (k, v) =>
      k -> v.map(_._3).min }
    val rows = Relational.ivmAggApply(spark, sf).collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))))
    assert(rows.map(t => t._1 -> ((t._2._1, t._2._2, t._2._3))).toMap
      === expected)
    rows.foreach { case (k, (_, _, _, repaired)) =>
      val want = vMin.contains(k) && dMin.get(k).exists(_ <= vMin(k))
      assert(repaired === want, s"repair flag for group $k")
    }
    // the delta genuinely exercises both paths
    assert(rows.count(_._2._4) > 0, "no group took the repair path")
    assert(rows.count(!_._2._4) > 0, "no group took the fast path")
  }

  test("vOptimalHistogram: the exact DP recounts — chosen buckets are " +
       "the min-SSE partition with earliest-j tie-breaks") {
    val b = 6
    val daily = Tables(spark, sf, "orders")
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.toString)
    val n = daily.length
    val cs = daily.map(_._2).scanLeft(BigInt(0))(_ + _)
    val cs2 = daily.map(_._2).scanLeft(BigInt(0))((a, c) => a + BigInt(c) * c)
    def sse(j: Int, i: Int): BigInt = {
      val d = cs(i) - cs(j)
      (cs2(i) - cs2(j)) - d * d / (i - j)
    }
    val none = BigInt(-1)
    var dp = Array.tabulate(n + 1)(i => if (i >= 1) sse(0, i) else none)
    val args = Array.ofDim[Int](b + 1, n + 1)
    for (l <- 2 to b) {
      val nxt = Array.fill(n + 1)(none)
      for (i <- l to n; j <- 1 until i if dp(j) != none) {
        val c = dp(j) + sse(j, i)
        // ascending j + strict < = earliest-j argmin, the operator's
        // min(struct(cost, j)) tie-break
        if (nxt(i) == none || c < nxt(i)) { nxt(i) = c; args(l)(i) = j }
      }
      dp = nxt
    }
    val bounds = new Array[Int](b + 1)
    bounds(b) = n
    for (l <- b - 1 to 1 by -1) bounds(l) = args(l + 1)(bounds(l + 1))
    val expected = (1 to b).map { l =>
      val (j, i) = (bounds(l - 1), bounds(l))
      (l.toLong, daily(j)._1.toString, daily(i - 1)._1.toString,
        (i - j).toLong, (cs(i) - cs(j)).toLong, sse(j, i))
    }
    val rows = Relational.vOptimalHistogram(spark, sf, b).collect().map(r =>
      (r.getAs[Int]("bucket").toLong, r.getAs[java.sql.Date]("day_start")
        .toString, r.getAs[java.sql.Date]("day_end").toString,
        r.getAs[Long]("n_days"), r.getAs[Long]("sum_cents"),
        BigInt(r.getAs[String]("sse_u"))))
    assert(rows.toSeq === expected)
    // partition laws: spans tile the calendar rollup; revenue conserves
    assert(rows.map(_._4).sum === n.toLong)
    assert(rows.map(_._5).sum === (cs(n) - cs(0)).toLong)
    // optimality: total SSE is <= any equi-width B-split's total
    val eq = (0 to b).map(k => k * n / b)
    val eqSse = (1 to b).map(l => sse(eq(l - 1), eq(l))).sum
    assert(rows.map(_._6).sum <= eqSse)
  }

  test("durbinWatson: fixed-point OLS residuals and both quadratic " +
       "sums recount exactly; DW stays in [0, 4000] milli") {
    val daily = Tables(spark, sf, "orders")
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.toString)
    val d0 = daily.head._1.toLocalDate
    val pts = daily.map { case (d, c) =>
      (java.time.temporal.ChronoUnit.DAYS.between(d0, d.toLocalDate), c)
    }
    val n = pts.length.toLong
    val st = pts.map(p => BigInt(p._1)).sum
    val sc = pts.map(p => BigInt(p._2)).sum
    val num = n * pts.map(p => BigInt(p._1) * p._2).sum - st * sc
    val den = n * pts.map(p => BigInt(p._1) * p._1).sum - st * st
    val shift = BigInt(2000000000000000L)
    val bU = ((num * 1000000 + shift * den) / den - shift).toLong
    val aU = ((sc * 1000000 - BigInt(bU) * st + shift * n) / n - shift)
      .toLong
    val e = pts.map { case (t, c) =>
      BigInt(c) * 1000000 - aU - BigInt(bU) * t
    }
    val sse = e.map(v => v * v).sum
    val ssd = e.zip(e.tail).map { case (a, b) => (b - a) * (b - a) }.sum
    val r = Relational.durbinWatson(spark, sf).collect().head
    assert(r.getAs[Long]("n_days") === n)
    assert(r.getAs[Long]("b_u") === bU)
    assert(r.getAs[Long]("a_u") === aU)
    assert(BigInt(r.getAs[String]("sse")) === sse)
    assert(BigInt(r.getAs[String]("ssd")) === ssd)
    val dw = (BigInt(1000) * ssd / sse).toLong
    assert(r.getAs[Long]("dw_milli") === dw)
    assert(r.getAs[Long]("rho_milli") === 1000L - dw / 2)
    assert(dw >= 0L && dw <= 4000L)
  }

  test("rfmSegments: quintiles, labels and cell rollups recount " +
       "exactly; customers partition across cells") {
    val orders = Tables(spark, sf, "orders")
      .select($"o_custkey", $"o_orderdate".cast("date"),
        round($"o_totalprice" * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2)))
    val dmax = orders.map(_._2).max
    val per = orders.groupBy(_._1).map { case (ck, xs) =>
      val lastDay = xs.map(_._2).max
      val rec = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(lastDay), java.time.LocalDate.parse(dmax))
      (ck, rec, xs.length.toLong, xs.map(_._3).sum)
    }.toSeq
    def ntile5(keyed: Seq[(Long, Long)]): Map[Long, Long] = {
      // keyed: (custkey, sort-dependent rank position already applied)
      val n = keyed.length
      keyed.zipWithIndex.map { case ((ck, _), i) =>
        // ntile: first (n mod 5) buckets get ceil(n/5)
        val big = n % 5; val base = n / 5
        val bucket =
          if (i < big * (base + 1)) i / (base + 1)
          else big + (i - big * (base + 1)) / base
        ck -> (bucket + 1L)
      }.toMap
    }
    val rq = ntile5(per.sortBy(p => (p._2, p._1)).map(p => (p._1, p._2)))
    val fq = ntile5(per.sortBy(p => (-p._3, p._1)).map(p => (p._1, p._3)))
    val mq = ntile5(per.sortBy(p => (-p._4, p._1)).map(p => (p._1, p._4)))
    case class Cell(seg: String, r: Long, f: Long, m: Long)
    val cells = per.groupBy { p =>
      val (r0, f0, m0) = (rq(p._1), fq(p._1), mq(p._1))
      val seg =
        if (r0 == 1 && f0 <= 2 && m0 <= 2) "champion"
        else if (r0 <= 2 && f0 <= 2) "loyal"
        else if (r0 >= 4 && m0 <= 2) "at_risk_high_value"
        else if (r0 >= 4) "hibernating"
        else "regular"
      Cell(seg, r0, f0, m0)
    }
    val rows = Relational.rfmSegments(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_customers")).sum === per.length.toLong)
    assert(rows.length === cells.size)
    rows.foreach { r =>
      val xs = cells(Cell(r.getAs[String]("segment"), r.getAs[Long]("r_q"),
        r.getAs[Long]("f_q"), r.getAs[Long]("m_q")))
      assert(r.getAs[Long]("n_customers") === xs.length.toLong)
      assert(r.getAs[Long]("n_orders") === xs.map(_._3).sum)
      assert(r.getAs[Long]("revenue_cents") === xs.map(_._4).sum)
      assert(r.getAs[Long]("mean_recency_days") ===
        xs.map(_._2).sum / xs.length)
    }
  }

  test("theilSenTrend: pairwise-slope median and exact OLS slope " +
       "recount; the pair count is n(n-1)/2") {
    val daily = Tables(spark, sf, "orders")
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.toString)
    val d0 = daily.map(_._1.toLocalDate).min(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
    val pts = daily.map { case (d, c) =>
      (java.time.temporal.ChronoUnit.DAYS.between(d0, d.toLocalDate), c)
    }
    val n = pts.length.toLong
    val slopes = (for {
      i <- pts.indices; j <- (i + 1) until pts.length
    } yield ((pts(j)._2 - pts(i)._2) * 1000000L) / (pts(j)._1 - pts(i)._1))
      .sorted
    val np = slopes.length.toLong
    assert(np === n * (n - 1) / 2)
    val medX2 =
      if (np % 2 == 1) 2L * slopes((np / 2).toInt)
      else slopes((np / 2 - 1).toInt) + slopes((np / 2).toInt)
    val st = pts.map(p => BigInt(p._1)).sum
    val sc = pts.map(p => BigInt(p._2)).sum
    val stc = pts.map(p => BigInt(p._1) * p._2).sum
    val stt = pts.map(p => BigInt(p._1) * p._1).sum
    val num = n * stc - st * sc
    val den = n * stt - st * st
    val ols = ((num * 1000000 + BigInt(2000000000000000L) * den) / den
      - BigInt(2000000000000000L)).toLong
    val r = Relational.theilSenTrend(spark, sf).collect().head
    assert(r.getAs[Long]("n_days") === n)
    assert(r.getAs[Long]("n_pairs") === np)
    assert(r.getAs[Long]("slope_med_x2_u") === medX2)
    assert(r.getAs[Long]("ols_slope_u") === ols)
    assert(r.getAs[Long]("robust_minus_ols_x2_u") === medX2 - 2L * ols)
  }

  test("theilDecomposition: per-nation terms recount exactly and the " +
       "additivity law total = between + within holds to term rounding") {
    def lnU(num: BigInt, den: BigInt): Long =
      BigDecimal(math.log(num.toDouble / den.toDouble) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val cust = Tables(spark, sf, "orders")
      .groupBy($"o_custkey")
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("x"))
      .join(Tables(spark, sf, "customer")
        .select($"c_custkey".as("o_custkey"), $"c_nationkey"), "o_custkey")
      .select($"c_nationkey", $"x").as[(Int, Long)].collect()
    val xt = BigInt(cust.map(_._2).sum)
    val n = BigInt(cust.length)
    val byNat = cust.groupBy(_._1)
    def shiftDiv(num: BigInt): Long = {
      val d = (num + BigInt(100000000) * xt) / xt // nonneg → floor = trunc
      (d - 100000000).toLong
    }
    val totNum = cust.map { case (_, x) =>
      BigInt(x) * lnU(BigInt(x) * n, xt)
    }.sum
    val winNum = byNat.map { case (_, xs) =>
      val xg = BigInt(xs.map(_._2).sum); val ng = BigInt(xs.length)
      xs.map { case (_, x) => BigInt(x) * lnU(BigInt(x) * ng, xg) }.sum
    }.sum
    val btwNum = byNat.map { case (_, xs) =>
      val xg = BigInt(xs.map(_._2).sum); val ng = BigInt(xs.length)
      xg * lnU(xg * n, xt * ng)
    }.sum
    val rows = Relational.theilDecomposition(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("c_nationkey")).toSet === byNat.keySet)
    rows.foreach { r =>
      val xs = byNat(r.getAs[Int]("c_nationkey"))
      val xg = BigInt(xs.map(_._2).sum); val ng = BigInt(xs.length)
      assert(r.getAs[Long]("n_cust") === xs.length.toLong)
      assert(r.getAs[Long]("revenue_cents") === xg.toLong)
      assert(r.getAs[Long]("within_contrib_u") === shiftDiv(
        xs.map { case (_, x) => BigInt(x) * lnU(BigInt(x) * ng, xg) }.sum))
      assert(r.getAs[Long]("between_contrib_u") ===
        shiftDiv(xg * lnU(xg * n, xt * ng)))
      assert(r.getAs[Long]("theil_u") === shiftDiv(totNum))
      assert(r.getAs[Long]("between_u") === shiftDiv(btwNum))
      assert(r.getAs[Long]("within_u") === shiftDiv(winNum))
      assert(r.getAs[Long]("residual_u") ===
        shiftDiv(totNum) - shiftDiv(btwNum) - shiftDiv(winNum))
      // decomposition law: exact up to ±1 micro per fixed-point ln term
      assert(math.abs(r.getAs[Long]("residual_u")) <= cust.length.toLong)
    }
    // inequality is nonnegative and between-component is a lower part
    assert(rows.head.getAs[Long]("theil_u") >= 0L)
  }

  test("dominantPeriod: integer rho recounts from the centered dailies; " +
       "the argmax flag marks exactly one lag") {
    val daily = Tables(spark, sf, "orders")
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .select($"day".cast("string"), $"cents")
      .as[(String, Long)].collect().sortBy(_._1)
    val n = BigInt(daily.length)
    val s0 = daily.map(d => BigInt(d._2)).sum
    val y = daily.map(d => n * d._2 - s0)
    val g0 = y.map(v => v * v).sum
    val expected = (1 to 30).map { k =>
      val gk = (0 until y.length - k).map(i => y(i) * y(i + k)).sum
      k.toLong -> ((gk * 1000000 + 1000000 * g0) / g0 - 1000000).toLong
    }
    val best = expected.minBy { case (k, r) => (-r, k) }._1
    val rows = Relational.dominantPeriod(spark, sf).collect()
    assert(rows.length === 30)
    rows.zip(expected).foreach { case (r, (k, rho)) =>
      assert(r.getAs[Long]("lag_k") === k)
      assert(r.getAs[Long]("rho_u") === rho, s"rho at lag $k")
      assert(r.getAs[Boolean]("dominant") === (k == best))
    }
    assert(rows.count(_.getAs[Boolean]("dominant")) === 1)
  }

  test("holtLinear: the dyadic-gain recursion recounts sequentially; " +
       "day-1 error is zero and forecasts lag the series") {
    val daily = Tables(spark, sf, "orders")
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .select($"day".cast("string"), $"cents")
      .as[(String, Long)].collect().sortBy(_._1)
    var l = daily.head._2 * 1000000L; var b = 0L
    val expected = daily.zipWithIndex.map { case ((day, cents), i) =>
      val yv = cents * 1000000L
      val f = l + b
      val e = if (i == 0) 0L else yv - f
      if (i > 0) { val lp = l; l = (yv + 3L * (l + b)) / 4L
        b = ((l - lp) + 7L * b) / 8L }
      (day, cents, l, b, f, e)
    }
    val rows = Relational.holtLinear(spark, sf).collect()
    assert(rows.length === daily.length)
    rows.zip(expected).foreach { case (r, (day, cents, lv, tv, f, e)) =>
      assert(r.getAs[java.sql.Date]("day").toString === day)
      assert(r.getAs[Long]("cents") === cents)
      assert(r.getAs[Long]("level_u") === lv, s"level at $day")
      assert(r.getAs[Long]("trend_u") === tv, s"trend at $day")
      assert(r.getAs[Long]("forecast_u") === f)
      assert(r.getAs[Long]("err_u") === e)
    }
    assert(rows.head.getAs[Long]("err_u") === 0L)
  }

  test("haarEnergy: the cascade recounts from the zero-filled calendar " +
       "series and satisfies the scaled Parseval identity") {
    val dc = Tables(spark, sf, "orders")
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(count(lit(1)).as("c"))
      .select($"day".cast("string"), $"c")
      .as[(String, Long)].collect().toMap
    val d0 = java.time.LocalDate.parse(dc.keys.min)
    val series = (0 until 1024)
      .map(i => BigInt(dc.getOrElse(d0.plusDays(i.toLong).toString, 0L)))
    var cur = series.toVector
    val expected = (1 to 10).map { l =>
      val sums = cur.grouped(2).map(p => p(0) + p(1)).toVector
      val diffs = cur.grouped(2).map(p => p(0) - p(1)).toVector
      cur = sums
      (l, diffs.length.toLong, diffs.map(x => x * x).sum)
    }
    val rows = Relational.haarEnergy(spark, sf).collect()
    assert(rows.length === 10)
    rows.zip(expected).foreach { case (r, (l, n, e)) =>
      assert(r.getAs[Int]("level") === l)
      assert(r.getAs[Long]("n_coeffs") === n)
      assert(BigInt(r.getAs[Long]("energy")) === e, s"energy at level $l")
    }
    // scaled Parseval for the unnormalized transform:
    // 2^10 * sum(x^2) = sum_l 2^(10-l) * E_l + (sum x)^2
    val lhs = series.map(x => x * x).sum * BigInt(1024)
    val rhs = expected.map { case (l, _, e) => e * BigInt(1 << (10 - l)) }.sum +
      series.sum * series.sum
    assert(lhs === rhs)
  }

  test("tCloseness: per-class EMD recounts from the band histograms; " +
       "a class distributed like the corpus scores ~0") {
    val cust = Tables(spark, sf, "customer")
      .select($"c_nationkey", $"c_mktsegment", $"c_acctbal")
      .collect().map { r =>
        val band = if (r.getDouble(2) < 0) 0 else if (r.getDouble(2) < 5000) 1 else 2
        ((r.getInt(0), r.getString(1)), band)
      }
    val nTot = BigInt(cust.length)
    val globalCum = (0 to 2).map(b => BigInt(cust.count(_._2 <= b)))
    val rows = Relational.tCloseness(spark, sf).collect()
    rows.foreach { r =>
      val key = (r.getAs[Int]("c_nationkey"), r.getAs[String]("c_mktsegment"))
      val mine = cust.filter(_._1 == key).map(_._2)
      val nc = BigInt(mine.length)
      val gaps = (0 to 2).map(b =>
        (BigInt(mine.count(_ <= b)) * nTot - globalCum(b) * nc).abs).sum
      assert(r.getAs[Long]("class_size") === mine.length.toLong)
      // ordered-EMD 1/(m−1) normalization: m = 3 bands → divide by 2
      assert(r.getAs[Long]("t_bp") === (gaps * 10000 / (nc * nTot * 2)).toLong,
        s"t at $key")
      assert(r.getAs[Boolean]("t_risky") ===
        (r.getAs[Long]("t_bp") > 2000L))
    }
    assert(rows.map(_.getAs[Long]("class_size")).sum === cust.length.toLong)
  }
  test("cusumArl: each seeded permutation's first alarm recounts from a " +
       "sequential CUSUM walk; p=0 is chronological") {
    val daily = Tables(spark, sf, "orders")
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .select($"day".cast("string"), $"cents")
      .as[(String, Long)].collect()
    val mu = daily.map(_._2).sum / daily.length
    val slack = mu / 20; val h = mu / 4
    def md5x(s0: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    def walk(ordered: Seq[Long]): (Option[Long], Option[Long]) = {
      var pHi = 0L; var pLo = 0L
      var mn = Long.MaxValue; var mx = Long.MinValue
      var fHi: Option[Long] = None; var fLo: Option[Long] = None
      ordered.zipWithIndex.foreach { case (c, i) =>
        pHi += c - mu - slack; pLo += c - mu + slack
        mn = math.min(mn, pHi); mx = math.max(mx, pLo)
        val sHi = pHi - math.min(mn, 0L)
        val sLo = math.max(mx, 0L) - pLo
        if (fHi.isEmpty && sHi >= h) fHi = Some(i + 1L)
        if (fLo.isEmpty && sLo >= h) fLo = Some(i + 1L)
      }
      (fHi, fLo)
    }
    val rows = Relational.cusumArl(spark, sf).collect()
      .map(r => r.getAs[Long]("p") ->
        ((Option(r.get(r.fieldIndex("first_hi_t"))).map(_.asInstanceOf[Long]),
          Option(r.get(r.fieldIndex("first_lo_t"))).map(_.asInstanceOf[Long]),
          r.getAs[Long]("n_days")))).toMap
    assert(rows.size === 65)
    rows.values.foreach(v => assert(v._3 === daily.length.toLong))
    // spot-check a handful of permutations against the sequential walk
    Seq(0L, 1L, 7L, 64L).foreach { p =>
      val ordered =
        if (p == 0L) daily.sortBy(_._1).map(_._2).toSeq
        else daily.sortBy(d => md5x(s"arl:$p:${d._1}")).map(_._2).toSeq
      val (eh, el) = walk(ordered)
      assert(rows(p)._1 === eh, s"first_hi at p=$p")
      assert(rows(p)._2 === el, s"first_lo at p=$p")
    }
    // the REAL series alarms (this fixture has a genuine shift) while
    // most null permutations should survive longer or never alarm
    val real = rows(0L)
    assert(real._1.isDefined || real._2.isDefined)
  }

  test("priceElasticity: per-brand ln-ln slope recounts from exact " +
       "fixed-point logs") {
    val parts = Tables(spark, sf, "part")
      .select($"p_partkey", $"p_brand",
        round($"p_retailprice" * 100).cast("long"))
      .as[(Long, String, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val qty = Tables(spark, sf, "lineitem")
      .groupBy($"l_partkey")
      .agg(round(sum($"l_quantity")).cast("long").as("q"))
      .as[(Long, Long)].collect()
    val perBrand = qty.flatMap { case (pk, q) =>
      parts.get(pk).map { case (brand, cents) =>
        brand -> ((math.round(math.log(cents.toDouble) * 1e6),
          math.round(math.log(q.toDouble) * 1e6)))
      }
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = Relational.priceElasticity(spark, sf).collect()
    assert(rows.length === perBrand.size)
    rows.foreach { r =>
      val b = r.getAs[String]("p_brand")
      val xs = perBrand(b)
      val n = BigInt(xs.length)
      val sx = xs.map(v => BigInt(v._1)).sum
      val sy = xs.map(v => BigInt(v._2)).sum
      val sxy = xs.map(v => BigInt(v._1) * v._2).sum
      val sxx = xs.map(v => BigInt(v._1) * v._1).sum
      val slope = BigDecimal((n * sxy - sx * sy).toDouble /
        (n * sxx - sx * sx).toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Long]("n_parts") === xs.length.toLong)
      assert(r.getAs[Double]("elasticity") === slope, s"slope at $b")
    }
  }

  test("trendSignReversals: per-nation and pooled slopes recount from " +
       "exact moments; pooled matches the nation-blind series") {
    val daily = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "customer")
        .select($"c_custkey".as("o_custkey"), $"c_nationkey"),
        Seq("o_custkey"))
      .groupBy($"c_nationkey", $"o_orderdate".cast("date").as("day"))
      .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      .select($"c_nationkey", $"day".cast("string"), $"cents")
      .as[(Int, String, Long)].collect()
    val d0 = daily.map(_._2).min
    def dd(s0: String) = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.parse(d0), java.time.LocalDate.parse(s0))
    def slope(xs: Seq[(Long, Long)]): Long = {
      val n = BigInt(xs.length)
      val st = xs.map(x => BigInt(x._1)).sum
      val sc = xs.map(x => BigInt(x._2)).sum
      val stc = xs.map(x => BigInt(x._1) * x._2).sum
      val stt = xs.map(x => BigInt(x._1) * x._1).sum
      val num = n * stc - st * sc
      val den = n * stt - st * st
      ((num * 1000000 + BigInt("2000000000000000") * den) / den
        - BigInt("2000000000000000")).toLong
    }
    val byNat = daily.groupBy(_._1).view
      .mapValues(_.map(x => (dd(x._2), x._3)).toSeq).toMap
    val pooledSeries = daily.groupBy(x => dd(x._2)).view
      .mapValues(_.map(_._3).sum).toSeq
    val pooled = slope(pooledSeries)
    val rows = Relational.trendSignReversals(spark, sf).collect()
    assert(rows.length === byNat.size)
    rows.foreach { r =>
      val nat = r.getAs[Int]("c_nationkey")
      assert(r.getAs[Long]("n_days") === byNat(nat).length.toLong)
      assert(r.getAs[Long]("slope_u") === slope(byNat(nat)), s"nation $nat")
      assert(r.getAs[Long]("pooled_slope_u") === pooled)
      assert(r.getAs[Boolean]("reversed") ===
        ((slope(byNat(nat)) > 0) != (pooled > 0)))
    }
  }

  test("seasonal strength: bp-bounded, counts match the decomposition") {
    val r = Relational.seasonalStrength(spark, sf).collect().head
    assert(r.getAs[Long]("n") ===
      Relational.seasonalDecompose(spark, sf).count())
    Seq("seasonal_strength_bp", "trend_strength_bp").foreach { c =>
      if (!r.isNullAt(r.fieldIndex(c))) {
        val v = r.getAs[Long](c)
        assert(v >= 0L && v <= 10000L, s"$c out of [0,10000]: $v")
      }
    }
  }

  test("pacf: lag-1 partial equals the plain autocorrelation") {
    val rows = Relational.pacf3(spark, sf).collect()
      .map(r => r.getAs[Long]("lag_k") ->
        ((r.getAs[Long]("rho_u"),
          Option(r.getAs[java.lang.Long]("pacf_milli"))))).toMap
    assert(rows.keySet === Set(1L, 2L, 3L))
    val acf = Relational.acfLjungBox(spark, sf, 3).collect()
      .map(r => r.getAs[Long]("lag_k") -> r.getAs[Long]("rho_u")).toMap
    rows.foreach { case (k, (rho, _)) => assert(rho === acf(k)) }
    // phi_11 == r1 by construction
    rows(1L)._2.foreach { p =>
      val expected = math.round(rows(1L)._1 / 1000.0)
      assert((p - expected).abs <= 1L, s"phi11 $p vs rho/1000 $expected")
    }
  }

  test("abc-xyz: matrix partitions the part universe, shares bounded") {
    val rows = Relational.xyzClassification(spark, sf).collect()
    val nParts = Tables(spark, sf, "lineitem")
      .select("l_partkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_parts")).sum === nParts,
      "every part lands in exactly one matrix cell")
    assert(rows.map(_.getAs[Long]("share_bp")).sum <= 10000L,
      "floor-divided shares can't exceed the whole")
    rows.foreach { r =>
      assert(Set("A", "B", "C")(r.getAs[String]("abc_class")))
      assert(Set("X", "Y", "Z")(r.getAs[String]("xyz_class")))
    }
  }

  test("croston: fold over demand events only, forecast = size/interval") {
    val rows = Relational.croston(spark, sf).collect()
    import spark.implicits._
    val li = Tables(spark, sf, "lineitem")
    val pk = li.agg(org.apache.spark.sql.functions.min($"l_partkey"))
      .collect().head.getLong(0)
    val nDays = li.filter($"l_partkey" === pk)
      .select($"l_shipdate".cast("date")).distinct().count()
    assert(rows.length.toLong === nDays, "one row per demand day")
    rows.foreach { r =>
      assert(r.getAs[Long]("gap") >= 1L)
      assert(r.getAs[Long]("f_u") ===
        (BigInt(r.getAs[Long]("z_u")) * 1000000 /
          BigInt(r.getAs[Long]("p_u"))).toLong,
        "forecast is exactly size/interval in micro")
    }
  }

  test("entropy l-diversity: H bounded by ln(distinct), flags track l=2") {
    val rows = Relational.entropyLDiversity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Long]("h_micro")
      val lDist = r.getAs[Long]("l_distinct")
      assert(h >= 0L, "entropy is nonnegative")
      // H <= ln(l_distinct) (uniform maximizes), so l_eff <= l_distinct
      assert(h <= math.round(math.log(lDist.toDouble) * 1e6) + 1)
      val lEff = r.getAs[Long]("l_eff_milli")
      assert(lEff <= lDist * 1000 + 1)
      assert(r.getAs[Boolean]("l2_risky") === (lEff < 2000L))
    }
  }

  test("median polish: exact additive decomposition over a dense grid") {
    val rows = Relational.medianPolish(spark, sf).collect()
    val nks = rows.map(_.getAs[Int]("c_nationkey")).distinct.length
    val wds = rows.map(_.getAs[Long]("wd")).distinct.length
    assert(rows.length === nks * wds, "grid must be dense")
    rows.foreach { r =>
      assert(r.getAs[Long]("cell_cents") ===
        r.getAs[Long]("row_eff_cents") + r.getAs[Long]("col_eff_cents") +
          r.getAs[Long]("resid_cents"),
        "cell = row effect + col effect + residual, exactly")
    }
    // medians localize shocks: at least half of each row's residuals
    // sit at or below the row's median absolute residual — weak sanity
    // that the polish actually centered rows (last sweep was columns,
    // so rows are within one sweep of centered, not exactly)
    assert(rows.map(_.getAs[Long]("resid_cents")).count(_ == 0L) >= 1,
      "a converged-ish polish pins at least one cell to zero")
  }

}
