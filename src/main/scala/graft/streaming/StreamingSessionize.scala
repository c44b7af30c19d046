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
  * All arithmetic runs in event-time MICROSECONDS (Catalyst's native
  * timestamp precision): `Timestamp.getTime` is millisecond-truncated,
  * and a gap decided at ms precision can disagree with the batch
  * query's microsecond `>` comparison when an inter-event gap lands
  * within 1 ms of the boundary — session starts/ends round-trip
  * exactly through the Catalyst encoder this way.
  *
  * Scale shape: state is partitioned by user_id across executors by the
  * state store; per micro-batch work is O(new events) + O(timed-out
  * keys). This is the `KeyValueGroupedDataset` custom-state surface the
  * batch-only reference had no analogue for.
  */
object StreamingSessionize {

  case class Event(user_id: Long, ts: Timestamp)

  /** Per-user open session; bounds are epoch MICROSECONDS. */
  case class SessionState(startUs: Long, lastUs: Long, nEvents: Long)

  /** A closed session, emitted downstream. */
  case class ClosedSession(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long)

  val DefaultGapMs: Long = 30 * 60 * 1000

  /** Epoch micros of a Timestamp (getTime is ms-truncated; the nanos
    * field carries the full sub-second part).
    */
  def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Microsecond-precise Timestamp (inverse of [[micros]]). */
  def tsOf(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def close(userId: Long, s: SessionState): ClosedSession =
    ClosedSession(userId, tsOf(s.startUs), tsOf(s.lastUs), s.nEvents)

  /** The per-user state transition. Exposed for direct unit testing. */
  def onUser(gapMs: Long)(
      userId: Long,
      events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[ClosedSession] = {
    val gapUs = gapMs * 1000L
    if (state.hasTimedOut) {
      val out = state.getOption.map(close(userId, _)).iterator
      state.remove()
      return out
    }
    val sorted = events.map(e => micros(e.ts)).toSeq.sorted
    var cur = state.getOption
    val closed = Seq.newBuilder[ClosedSession]
    for (t <- sorted) {
      cur match {
        case Some(s) if t - s.lastUs > gapUs =>
          closed += close(userId, s)
          cur = Some(SessionState(t, t, 1))
        case Some(s) =>
          // CROSS-BATCH disorder contract (within a batch `sorted`
          // makes order immaterial): an out-of-order event from a
          // LATER batch that lands within the open session's span — or
          // within the gap BEFORE its start — folds in, and min()
          // extends the start backwards so that case matches the batch
          // gaps-and-islands answer exactly. An event more than a gap
          // before the start folds too (a single-open-session
          // transition cannot re-open closed history); the batch query
          // would report a separate earlier session — the same
          // one-divergence tradeoff the funnel documents, and late
          // data past the watermark never reaches here at all.
          cur = Some(SessionState(math.min(s.startUs, t),
            math.max(s.lastUs, t), s.nEvents + 1))
        case None =>
          cur = Some(SessionState(t, t, 1))
      }
    }
    cur.foreach { s =>
      state.update(s)
      // close via timeout when the watermark passes last-event + gap
      // (+1 ms: the timeout clock is ms-grained, the gap test is not)
      state.setTimeoutTimestamp(s.lastUs / 1000L + gapMs + 1L)
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
