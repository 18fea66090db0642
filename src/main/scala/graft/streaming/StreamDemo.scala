package graft.streaming

import graft.Sessions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** Runnable streaming entry: replays paced arrival JSON into a live
  * Structured Streaming query (parse -> geo filter -> re-serialize) and a
  * stateful sessionization query, printing what each emits. MemoryStream
  * stands in for the Kafka source (no broker in this container); swap
  * `readStream.format("kafka").option("subscribe","gtfs-arrivals")` in
  * production — every transform is source-agnostic.
  *
  * Usage: runMain graft.streaming.StreamDemo
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("4", "4")
    import spark.implicits._

    // ---- geo filter stream over replayed arrivals -----------------------
    val arrivals = MemoryStream[String](spark)
    val geoQ = Streams.toArrivalValue(
        Streams.geoFilter(Streams.parseArrivals(arrivals.toDF()),
          52.52437, 13.41053, 30000))
      .writeStream.format("memory").queryName("demo_geo")
      .outputMode(OutputMode.Append).start()

    val feed = Seq(
      ("2019-02-18 08:30:15", """{"local-time":"2019-02-18 08:30:15.0000000","name":"Alexanderplatz","latitude":52.52437,"longitude":13.41053}"""),
      ("2019-02-18 08:30:15", """corrupt {"""),
      ("2019-02-18 09:00:00", """{"local-time":"2019-02-18 09:00:00.0000000","name":"Potsdam Hbf","latitude":52.39886,"longitude":13.06566}"""),
      ("2019-02-18 09:30:00", """{"local-time":"2019-02-18 09:30:00.0000000","name":"Outer Rim","latitude":48.13743,"longitude":11.57549}"""))
    println("== replaying 4 records at 3600x (1h event time ~ 1s wall)")
    val t0 = System.currentTimeMillis()
    Replay.replay[String](
      feed.iterator.map { case (t, v) => (Timestamp.valueOf(t), v) },
      r => arrivals.addData(r._2),
      speedup = 3600.0)
    geoQ.processAllAvailable()
    println(s"== replay wall time: ${System.currentTimeMillis() - t0} ms")
    println("== geo-filtered stream emitted:")
    spark.table("demo_geo").collect().foreach(r => println("   " + r.getString(0)))
    geoQ.stop()

    // ---- stateful sessionization ---------------------------------------
    import StatefulSessions._
    val events = MemoryStream[Event](spark)
    val sessQ = sessionize(events.toDS().withWatermark("ts", "10 minutes"),
        gapMs = 30 * 60 * 1000)
      .writeStream.format("memory").queryName("demo_sessions")
      .outputMode(OutputMode.Append).start()
    events.addData(
      Event(7L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      Event(7L, Timestamp.valueOf("2024-01-01 10:05:00"), 2.0),
      Event(7L, Timestamp.valueOf("2024-01-01 12:00:00"), 9.0))
    sessQ.processAllAvailable()
    events.addData(Event(8L, Timestamp.valueOf("2024-01-01 15:00:00"), 0.0))
    sessQ.processAllAvailable()
    events.addData(Event(8L, Timestamp.valueOf("2024-01-01 16:00:00"), 0.0))
    sessQ.processAllAvailable()
    println("== closed sessions emitted:")
    spark.table("demo_sessions").collect().foreach(r => println("   " + r))
    sessQ.stop()

    // ---- streaming dedup + SQL-registered native expression -------------
    val dupes = MemoryStream[(Long, Timestamp, Double)](spark)
    val dedupQ = Streams.dedupEvents(
        dupes.toDF().toDF("event_id", "ts", "value"), lateness = "10 minutes")
      .writeStream.format("memory").queryName("demo_dedup")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    dupes.addData(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      (1L, Timestamp.valueOf("2024-01-01 10:00:30"), 1.0),
      (2L, Timestamp.valueOf("2024-01-01 10:01:00"), 2.0))
    dedupQ.processAllAvailable()
    println(s"== streaming dedup kept ${spark.table("demo_dedup").count()} of 3 (1 dup dropped)")
    dedupQ.stop()

    graft.functions.registry.registerAll(spark)
    println("== SQL dot_product(array(1,2,3),(4,5,6)) = " + spark.sql(
      "SELECT dot_product(array(1.0d,2.0d,3.0d), array(4.0d,5.0d,6.0d))").head().getDouble(0))
    spark.stop()
  }
}
