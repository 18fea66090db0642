package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Streaming twin of graft.operators.Events.funnelStages: per user, the
  * ordered view → click → purchase conversion stage, finalized exactly
  * once per user when the event-time watermark passes their last
  * activity + `quietMs`.
  *
  * Exactness under out-of-order arrival (within the watermark delay —
  * Spark's stateful operators drop rows older than the watermark) is the
  * design constraint: the first view only ever moves EARLIER as
  * stragglers land, which can retroactively validate a click that
  * preceded every view seen so far. So the state keeps the min view plus
  * ALL candidate click/purchase timestamps (bounded by one user's
  * activity inside the watermark horizon — the same bound session stores
  * live with), and the funnel chain (min view < first click after it <
  * first purchase after that) is resolved once, at timeout, when the
  * watermark guarantees no more events can arrive. The emitted stage
  * therefore equals the batch operator's answer on the same in-watermark
  * events — the spec cross-checks exactly that, disorder included.
  */
object StatefulFunnel {

  case class Event(user_id: Long, event_type: String, ts: Timestamp)
  case class FunnelState(minView: Long, clicks: Vector[Long], purchases: Vector[Long],
                         lastSeen: Long)
  case class FunnelResult(user_id: Long, stage: Int)

  private val NoTs = Long.MaxValue

  /** Resolve the chained funnel from the accumulated candidates. */
  private[streaming] def resolveStage(s: FunnelState): Int =
    if (s.minView == NoTs) 0
    else s.clicks.filter(_ > s.minView).sorted.headOption match {
      case None => 1
      case Some(c) => if (s.purchases.exists(_ > c)) 3 else 2
    }

  /** `quietMs`: silence (in event time) after which a user's funnel is
    * final. Requires an upstream watermark on `ts`.
    */
  def funnel(events: Dataset[Event], quietMs: Long): Dataset[FunnelResult] = {
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[FunnelResult]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[FunnelState, FunnelResult](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val stage = resolveStage(state.get)
            state.remove()
            Iterator(FunnelResult(userId, stage))
          } else {
            val s0 = state.getOption.getOrElse(FunnelState(NoTs, Vector.empty, Vector.empty, 0L))
            val s = batch.foldLeft(s0) { (acc, e) =>
              val t = e.ts.getTime
              val acc2 = e.event_type match {
                case "view" => acc.copy(minView = math.min(acc.minView, t))
                case "click" => acc.copy(clicks = acc.clicks :+ t)
                case "purchase" => acc.copy(purchases = acc.purchases :+ t)
                case _ => acc
              }
              acc2.copy(lastSeen = math.max(acc2.lastSeen, t))
            }
            state.update(s)
            // finalize once the watermark clears lastSeen + quiet period
            // (clamped past the current watermark — an at-or-before
            // timeout is rejected by Spark)
            state.setTimeoutTimestamp(
              math.max(s.lastSeen + quietMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }
}
