package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("asof join picks the most recent right row at or before left time") {
    val quotes = Seq(
      (1L, t("2024-01-01 10:00:00"), 100.0, 1L),
      (1L, t("2024-01-01 10:05:00"), 101.0, 2L),
      (1L, t("2024-01-01 10:10:00"), 102.0, 3L),
      (2L, t("2024-01-01 10:00:00"), 50.0, 4L),
    ).toDF("qkey", "qts", "price", "qid")
    val trades = Seq(
      (1L, t("2024-01-01 10:03:00"), "a"), // -> 100.0
      (1L, t("2024-01-01 10:05:00"), "b"), // equal ts -> 101.0 (>= semantics)
      (1L, t("2024-01-01 10:30:00"), "c"), // -> 102.0
      (2L, t("2024-01-01 09:59:00"), "d"), // before any quote -> dropped
      (3L, t("2024-01-01 10:00:00"), "e"), // no key match -> dropped
    ).toDF("tkey", "tts", "tag")
    val got = AsOf.asofJoin(trades, "tkey", "tts", quotes, "qkey", "qts",
        Seq("price", "qid"), "qid")
      .select($"tag", $"price").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("a" -> 100.0, "b" -> 101.0, "c" -> 102.0))
  }

  test("asof join ties on right time resolve to greatest tie-break") {
    val right = Seq(
      (1L, t("2024-01-01 10:00:00"), "old", 1L),
      (1L, t("2024-01-01 10:00:00"), "new", 2L),
    ).toDF("k", "rts", "v", "id")
    val left = Seq((1L, t("2024-01-01 11:00:00"))).toDF("k2", "lts")
    val got = AsOf.asofJoin(left, "k2", "lts", right, "k", "rts", Seq("v"), "id")
      .select($"v").head().getString(0)
    assert(got === "new")
  }

  test("asof join does not tear payload columns across right rows") {
    // matched right row has a NULL price: the result must carry that
    // null, not back-fill from the older row
    val right = Seq(
      (1L, t("2024-01-01 10:00:00"), Option(5.0), 100L),
      (1L, t("2024-01-01 10:05:00"), None, 200L),
    ).toDF("k", "rts", "price", "rid")
    val left = Seq((1L, t("2024-01-01 11:00:00"))).toDF("k2", "lts")
    val got = AsOf.asofJoin(left, "k2", "lts", right, "k", "rts",
      Seq("rid", "price"), "rid").select($"rid", $"price").head()
    assert(got.getLong(0) === 200L)
    assert(got.isNullAt(1), "price must be the matched row's NULL, not 5.0")
  }

  test("asof join keeps matches whose first payload field is null") {
    val right = Seq((1L, t("2024-01-01 10:00:00"), Option.empty[Double], 7L))
      .toDF("k", "rts", "price", "rid")
    val left = Seq((1L, t("2024-01-01 11:00:00"))).toDF("k2", "lts")
    val got = AsOf.asofJoin(left, "k2", "lts", right, "k", "rts",
      Seq("price", "rid"), "rid")
    assert(got.count() === 1)
  }

  test("forward asof picks the earliest right row at or after left time") {
    val quotes = Seq(
      (1L, t("2024-01-01 10:00:00"), 100.0, 1L),
      (1L, t("2024-01-01 10:05:00"), 101.0, 2L),
      (1L, t("2024-01-01 10:10:00"), 102.0, 3L),
      (2L, t("2024-01-01 10:00:00"), 50.0, 4L),
    ).toDF("qkey", "qts", "price", "qid")
    val trades = Seq(
      (1L, t("2024-01-01 10:03:00"), "a"), // -> 101.0 (next at 10:05)
      (1L, t("2024-01-01 10:05:00"), "b"), // equal ts -> 101.0 (>= semantics)
      (1L, t("2024-01-01 10:30:00"), "c"), // after all quotes -> dropped
      (2L, t("2024-01-01 09:59:00"), "d"), // -> 50.0
      (3L, t("2024-01-01 10:00:00"), "e"), // no key match -> dropped
    ).toDF("tkey", "tts", "tag")
    val got = AsOf.asofJoinForward(trades, "tkey", "tts", quotes, "qkey", "qts",
        Seq("price", "qid"), "qid")
      .select($"tag", $"price").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("a" -> 101.0, "b" -> 101.0, "d" -> 50.0))
  }

  test("forward asof ties on right time resolve to greatest tie-break") {
    val right = Seq(
      (1L, t("2024-01-01 12:00:00"), "old", 1L),
      (1L, t("2024-01-01 12:00:00"), "new", 2L),
    ).toDF("k", "rts", "v", "id")
    val left = Seq((1L, t("2024-01-01 11:00:00"))).toDF("k2", "lts")
    val got = AsOf.asofJoinForward(left, "k2", "lts", right, "k", "rts",
      Seq("v"), "id").select($"v").head().getString(0)
    assert(got === "new")
  }

  test("forward asof on the corpus: every match is the true next event") {
    // recount against a driver scan of the deduped right side
    val events = graft.Tables(spark, sf, "events")
      .select("event_id", "user_id", "ts").collect()
      .map(r => (r.getLong(1), r.getTimestamp(2).getTime, r.getLong(0)))
      .groupBy(t2 => (t2._1, t2._2))
      .map { case (k, g) => k -> g.map(_._3).max }
    val orders = graft.Tables(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_orderdate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
    val expected = orders.flatMap { case (ok, cust, od) =>
      val future = events.keys.filter(k => k._1 == cust && k._2 >= od)
      if (future.isEmpty) None
      else Some(ok -> events(future.minBy(_._2)))
    }.toMap
    val got = AsOf.orderNextEventAsof(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got === expected)
    assert(got.nonEmpty && got.size < orders.length,
      "no order lacks a future event — dropped-left case unexercised")
  }

  test("salted join equals the plain join") {
    val plain = Relational.joinRevenue(spark, sf).collect().toSeq
    val salted = Relational.saltedJoinRevenue(spark, sf).collect().toSeq
    assert(salted === plain)
  }
}
