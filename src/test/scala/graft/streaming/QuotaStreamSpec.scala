package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import java.sql.Timestamp

/** Streaming per-domain admission quota: first `cap` arrivals per
  * source admitted in (ts, doc_id) order, quota state carried across
  * micro-batches, redeliveries re-emit their original admission
  * without burning quota.
  */
class QuotaStreamSpec extends SparkSpec {
  import spark.implicits._
  import StatefulQuota._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def run(cap: Int, batches: Seq[Seq[DocArrival]]): Seq[Admission] = {
    val input = MemoryStream[DocArrival](spark)
    val name = s"quota_out_${System.nanoTime()}"
    val q = admissions(input.toDS(), cap)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    val rows = spark.table(name).as[Admission].collect().toSeq
    q.stop()
    rows
  }

  test("quota admits the first cap per source across micro-batches, then closes") {
    val b1 = Seq(
      DocArrival(10L, "a", ts("2024-01-01 09:00:00")),
      DocArrival(11L, "a", ts("2024-01-01 09:01:00")),
      DocArrival(20L, "b", ts("2024-01-01 09:00:30")))
    val b2 = Seq(
      DocArrival(12L, "a", ts("2024-01-01 09:02:00")), // over quota for a
      DocArrival(21L, "b", ts("2024-01-01 09:03:00")))
    val got = run(cap = 2, Seq(b1, b2))
    val byDoc = got.map(a => a.doc_id -> (a.source, a.rank_in_domain)).toMap
    assert(byDoc === Map(
      10L -> ("a", 1L), 11L -> ("a", 2L),
      20L -> ("b", 1L), 21L -> ("b", 2L)))
    assert(!got.exists(_.doc_id == 12L), "over-quota doc must be dropped")
  }

  test("within-batch order is (ts, doc_id), not arrival order") {
    val got = run(cap = 1, Seq(Seq(
      DocArrival(5L, "a", ts("2024-01-01 09:05:00")),
      DocArrival(7L, "a", ts("2024-01-01 09:01:00"))))) // earlier ts wins
    assert(got.map(_.doc_id) === Seq(7L))
  }

  test("redelivery re-emits the same admission and never burns quota") {
    val b1 = Seq(DocArrival(10L, "a", ts("2024-01-01 09:00:00")))
    val b2 = Seq(
      DocArrival(10L, "a", ts("2024-01-01 09:00:00")), // redelivered
      DocArrival(11L, "a", ts("2024-01-01 09:01:00")))
    val got = run(cap = 2, Seq(b1, b2))
    // doc 10 appears twice with the SAME rank; doc 11 still got slot 2
    assert(got.count(_.doc_id == 10L) === 2)
    assert(got.filter(_.doc_id == 10L).map(_.rank_in_domain).distinct === Seq(1L))
    assert(got.find(_.doc_id == 11L).map(_.rank_in_domain) === Some(2L))
  }

  test("stream admissions equal a sequential driver simulation of the same feed") {
    val cap = 3
    val feed = (0 until 40).map { i =>
      DocArrival(100L + i, s"src${i % 5}",
        ts(f"2024-01-01 09:${i / 2}%02d:${(i % 2) * 30}%02d"))
    }
    val batches = feed.grouped(7).map(_.toSeq).toSeq
    val got = run(cap, batches)
      .map(a => (a.doc_id, a.source, a.rank_in_domain)).sorted
    // driver sim: same per-batch (ts, doc_id) order, same quota policy
    var admitted = Map.empty[String, Vector[Long]]
    val expected = batches.flatMap { b =>
      b.sortBy(d => (d.ts.getTime, d.doc_id)).flatMap { d =>
        val cur = admitted.getOrElse(d.source, Vector.empty)
        if (cur.contains(d.doc_id)) Some((d.doc_id, d.source, cur.indexOf(d.doc_id) + 1L))
        else if (cur.length < cap) {
          admitted += d.source -> (cur :+ d.doc_id)
          Some((d.doc_id, d.source, cur.length + 1L))
        } else None
      }
    }.sorted
    assert(got === expected)
    assert(got.groupBy(_._2).values.forall(_.length <= cap))
  }
}
