package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state streaming: gap-based user sessionization with
  * `flatMapGroupsWithState` — the streaming twin of the batch
  * gaps-and-islands query (`RelationalQueries.qSessionize`). State is one
  * small [[SessionState]] per active user, closed and emitted either by
  * an event arriving past the gap or by an event-time timeout once the
  * watermark passes; both paths bound state size (no session lives past
  * watermark + gap).
  *
  * Scale shape: state is partitioned by user_id across executors by the
  * state store; per micro-batch work is O(new events) + O(timed-out
  * keys). This is the `KeyValueGroupedDataset` custom-state surface the
  * batch-only reference had no analogue for.
  */
object StreamingSessionize {

  case class Event(user_id: Long, ts: Timestamp)

  case class SessionState(start: Long, last: Long, nEvents: Long)

  /** A closed session, emitted downstream. */
  case class ClosedSession(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long)

  val DefaultGapMs: Long = 30 * 60 * 1000

  private def close(userId: Long, s: SessionState): ClosedSession =
    ClosedSession(userId, new Timestamp(s.start), new Timestamp(s.last), s.nEvents)

  /** The per-user state transition. Exposed for direct unit testing. */
  def onUser(gapMs: Long)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val out = state.getOption.map(close(userId, _)).iterator
      state.remove()
      return out
    }
    val sorted = events.toSeq.sortBy(_.ts.getTime)
    var cur = state.getOption
    val closed = Seq.newBuilder[ClosedSession]
    for (e <- sorted) {
      val t = e.ts.getTime
      cur match {
        case Some(s) if t - s.last > gapMs =>
          closed += close(userId, s)
          cur = Some(SessionState(t, t, 1))
        case Some(s) =>
          cur = Some(SessionState(s.start, math.max(s.last, t), s.nEvents + 1))
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    cur.foreach { s =>
      state.update(s)
      // close via timeout when the watermark passes last-event + gap
      state.setTimeoutTimestamp(s.last + gapMs)
    }
    closed.result().iterator
  }

  /** Wire the transition over a (possibly streaming) event Dataset.
    * Requires `withWatermark` upstream when streaming (event-time
    * timeout needs it).
    */
  def sessions(
      events: Dataset[Event],
      gapMs: Long = DefaultGapMs): Dataset[ClosedSession] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(onUser(gapMs))
  }
}
