package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Streaming twin of graft.operators.Events.typeTransitions: per user,
  * the first-order Markov transition pairs of their event sequence,
  * finalized once the event-time watermark passes their last activity +
  * `quietMs`.
  *
  * Transitions are ADJACENCY facts — a straggler landing between two
  * already-seen events rewrites the pair list (A→C becomes A→B, B→C) —
  * so nothing can be emitted incrementally without retraction. Like
  * [[StatefulFunnel]], the state buffers the user's in-horizon events
  * (the same bound every session store carries) and the sequence is
  * sorted ONCE, at timeout, when the watermark guarantees order is
  * final. The emitted pairs then equal the batch operator's on the same
  * in-watermark events, with the identical (ts, event_id) total order.
  */
object StatefulTransitions {

  case class Event(user_id: Long, event_type: String, ts: Timestamp, event_id: Long)
  case class Ev(tsMs: Long, eventId: Long, typ: String)
  case class TransState(events: Vector[Ev], lastSeen: Long)
  case class Transition(user_id: Long, from_type: String, to_type: String, n: Long)

  /** Resolve a user's final pair counts from the buffered events. */
  private[streaming] def resolve(userId: Long, evs: Vector[Ev]): Iterator[Transition] = {
    val sorted = evs.sortBy(e => (e.tsMs, e.eventId))
    sorted.iterator.zip(sorted.iterator.drop(1))
      .map { case (a, b) => (a.typ, b.typ) }.toVector
      .groupBy(identity).iterator
      .map { case ((f, t), g) => Transition(userId, f, t, g.size.toLong) }
  }

  /** `quietMs`: event-time silence after which a user's sequence is
    * final. Requires an upstream watermark on `ts`.
    */
  def transitions(events: Dataset[Event], quietMs: Long): Dataset[Transition] = {
    implicit val stateEnc = Encoders.product[TransState]
    implicit val outEnc = Encoders.product[Transition]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[TransState, Transition](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[TransState]) =>
          if (state.hasTimedOut) {
            val out = resolve(userId, state.get.events)
            state.remove()
            out
          } else {
            val s0 = state.getOption.getOrElse(TransState(Vector.empty, 0L))
            val s = batch.foldLeft(s0) { (acc, e) =>
              TransState(acc.events :+ Ev(e.ts.getTime, e.event_id, e.event_type),
                math.max(acc.lastSeen, e.ts.getTime))
            }
            state.update(s)
            state.setTimeoutTimestamp(
              math.max(s.lastSeen + quietMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }
}
