package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Streaming per-domain admission quota — the ingest-time twin of
  * `TextOps.domainCapSample`. The batch form draws an unbiased hash
  * sample because it sees the whole corpus at once; a stream cannot
  * (future arrivals are unknown), so the streaming quota is the honest
  * online policy: FIRST `cap` arrivals per source are admitted, in
  * deterministic (event time, doc_id) order within a batch, and the
  * gate closes. This is the crawl-frontier shape — stop fetching a
  * domain once its budget is spent — rather than a retrospective
  * sample.
  *
  * State per source is the admitted id list, BOUNDED BY cap (never the
  * arrival history), so state size is #domains × cap regardless of
  * corpus size; no timeout — a quota is a lifetime budget, not a
  * window. At-least-once sources can redeliver an admitted doc: the
  * redelivery RE-EMITS the same admission row (same rank), so delivery
  * downstream stays at-least-once with stable content and the
  * idempotent merge sink (`Streams.idempotentMergeSink` on doc_id)
  * collapses it — a redelivery can never burn quota or mint a second
  * rank.
  */
object StatefulQuota {

  case class DocArrival(doc_id: Long, source: String, ts: Timestamp)
  case class QuotaState(admitted: Vector[Long])
  case class Admission(doc_id: Long, source: String, ts: Timestamp,
                       rank_in_domain: Long)

  def admissions(docs: Dataset[DocArrival], cap: Int): Dataset[Admission] = {
    implicit val stateEnc = Encoders.product[QuotaState]
    implicit val outEnc = Encoders.product[Admission]
    docs
      .groupByKey(_.source)(Encoders.STRING)
      .flatMapGroupsWithState[QuotaState, Admission](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, batch: Iterator[DocArrival],
         state: GroupState[QuotaState]) =>
          val arrivals = batch.toVector.sortBy(d => (d.ts.getTime, d.doc_id))
          val s0 = state.getOption.getOrElse(QuotaState(Vector.empty))
          val (out, s1) = arrivals.foldLeft(
            (Vector.empty[Admission], s0)) { case ((acc, s), d) =>
            val seenAt = s.admitted.indexOf(d.doc_id)
            if (seenAt >= 0)
              // redelivery: same row again, no state change
              (acc :+ Admission(d.doc_id, src, d.ts, seenAt + 1L), s)
            else if (s.admitted.length < cap)
              (acc :+ Admission(d.doc_id, src, d.ts, s.admitted.length + 1L),
                QuotaState(s.admitted :+ d.doc_id))
            else (acc, s)
          }
          state.update(s1)
          out.iterator
      }
  }
}
