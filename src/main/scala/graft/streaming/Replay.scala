package graft.streaming

import java.sql.Timestamp

/** Event-time replay pacing — the reference producer's wall-clock
  * simulation (kafka/GtfsArrivalsProducer.java:158-182 in
  * XComp/vbb-data-pipeline): between consecutive arrivals, sleep
  * `max(0, Δevent − Δwall)` so the output stream replays at real-time
  * speed (optionally scaled); same-timestamp events go out immediately.
  *
  * This is a test-harness/driver utility, not a distributed operator
  * (SURVEY §2.14 T1): it feeds simulated live streams into Structured
  * Streaming tests. Clock and sleeper are injectable for deterministic
  * unit tests.
  */
object Replay {

  /** Compute the pacing sleep (ms) before emitting `next`, given the
    * previous event's time and the wall-clock elapsed since it.
    */
  def pacingDelayMs(prevEventMs: Long, nextEventMs: Long,
                    wallElapsedMs: Long, speedup: Double = 1.0): Long =
    math.max(0L, ((nextEventMs - prevEventMs) / speedup).toLong - wallElapsedMs)

  /** Replay time-ordered (timestamp, payload) records through `emit`,
    * pacing with injected `nowMs`/`sleep` (defaults: real clock).
    */
  def replay[T](records: Iterator[(Timestamp, T)],
                emit: ((Timestamp, T)) => Unit,
                speedup: Double = 1.0,
                nowMs: () => Long = () => System.currentTimeMillis(),
                sleep: Long => Unit = Thread.sleep): Unit = {
    var prev: Option[(Long, Long)] = None // (eventMs, emittedAtWallMs)
    records.foreach { case (ts, payload) =>
      prev.foreach { case (prevEventMs, prevWallMs) =>
        val d = pacingDelayMs(prevEventMs, ts.getTime, nowMs() - prevWallMs, speedup)
        if (d > 0) sleep(d)
      }
      emit((ts, payload))
      prev = Some((ts.getTime, nowMs()))
    }
  }
}
