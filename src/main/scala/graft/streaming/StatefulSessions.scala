package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Custom stateful sessionization via flatMapGroupsWithState — the
  * "arbitrary state" path for semantics session_window can't express
  * (e.g. emitting a summary exactly once when a session closes, with
  * per-session derived fields).
  *
  * State is one small record per active (user) key, bounded by the
  * event-time timeout: when the watermark passes last-event + gap, the
  * session closes and its summary is emitted. This is the pattern that
  * scales to 10^8 concurrent keys on a cluster — state lives in the
  * executors' state store, never on the driver.
  */
object StatefulSessions {

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, lastEvent: Long, n: Long, sum: Double)
  case class SessionSummary(user_id: Long, session_start: Timestamp,
                            session_end: Timestamp, n_events: Long,
                            sum_value: Double)

  /** Streaming sessionize: emits one summary per closed session. `gapMs`
    * is the silence that ends a session. Requires a watermark on `ts`
    * upstream (for GroupStateTimeout.EventTimeTimeout).
    */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[SessionSummary] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[SessionSummary]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionSummary(userId, new Timestamp(s.start),
              new Timestamp(s.lastEvent), s.n, s.sum))
          } else {
            val evs = batch.toSeq
            val (closed, opened) = evs.sortBy(_.ts.getTime).foldLeft(
              (Vector.empty[SessionSummary], state.getOption)) {
              case ((done, cur), e) =>
                val t = e.ts.getTime
                cur match {
                  case Some(s) if t - s.lastEvent <= gapMs =>
                    (done, Some(s.copy(lastEvent = math.max(s.lastEvent, t),
                      n = s.n + 1, sum = s.sum + e.value)))
                  case Some(s) => // gap exceeded inside the batch: close + reopen
                    (done :+ SessionSummary(userId, new Timestamp(s.start),
                      new Timestamp(s.lastEvent), s.n, s.sum),
                      Some(SessionState(t, t, 1, e.value)))
                  case None => (done, Some(SessionState(t, t, 1, e.value)))
                }
            }
            opened.foreach { s =>
              state.update(s)
              // clamp past the watermark: flatMapGroupsWithState still
              // hands us late rows, and a timeout at/before the current
              // watermark is rejected by Spark (query-failing)
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(s.lastEvent + gapMs, wm + 1))
            }
            closed.iterator
          }
      }
  }
}
