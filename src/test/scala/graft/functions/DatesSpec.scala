package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DatesSpec extends SparkSpec {
  import spark.implicits._

  test("yyyymmdd codec roundtrips across month/year boundaries") {
    val df = Seq("2019-01-31", "2019-02-01", "2019-12-31", "2020-02-29")
      .toDF("s").select(to_date($"s").as("d"))
    val got = df.select(
      dates.decodeDateInt(dates.encodeDateInt($"d")).as("rt"), $"d").collect()
    got.foreach(r => assert(r.getDate(0) === r.getDate(1)))
  }

  test("encodeDateInt matches the reference formula y*10000+m*100+d") {
    val v = Seq("2019-02-21").toDF("s")
      .select(dates.encodeDateInt(to_date($"s"))).head().getInt(0)
    assert(v === 20190221)
  }

  test("GTFS times past 24:00 survive and roll the day") {
    val df = Seq(("2019-02-21", "25:10:00"), ("2019-02-21", "08:30:15"))
      .toDF("d", "t")
      .select(to_date($"d").as("d"), dates.gtfsTimeToSeconds($"t").as("secs"))
    val rows = df.select($"secs",
      dates.gtfsEventTimestamp($"d", $"secs").cast("string").as("ts")).collect()
    assert(rows(0).getLong(0) === 25 * 3600 + 10 * 60)
    assert(rows(0).getString(1) === "2019-02-22 01:10:00")
    assert(rows(1).getString(1) === "2019-02-21 08:30:15")
  }

  test("weekdayIndex is Monday=0 like the reference's getValue-1") {
    // 2019-02-18 was a Monday
    val got = (0 to 6).map(i =>
      Seq(i).toDF("i")
        .select(dates.weekdayIndex(date_add(to_date(lit("2019-02-18")), $"i")))
        .head().getInt(0))
    assert(got === (0 to 6))
  }

  test("local-time string has exactly 7 fractional digits (Jackson parity)") {
    val s = Seq("2019-02-21 12:34:56.789").toDF("s")
      .select(dates.gtfsLocalTimeString(to_timestamp($"s"))).head().getString(0)
    assert(s === "2019-02-21 12:34:56.7890000")
    assert(s.split("\\.")(1).length === 7)
  }
}
