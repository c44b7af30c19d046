package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental cohort-retention maintenance with
  * `flatMapGroupsWithState` — the streaming twin of the batch matrix
  * (`RelationalQueries.qRetention`): per user, the week of the FIRST
  * signup event (the cohort) and the distinct set of active weeks;
  * the (cohort_week, week_offset) matrix then counts cohort members
  * active in each later week. The per-user half is the expensive half
  * at scale — the batch query's `DISTINCT (user, week)` + cohort join
  * re-shuffles the corpus per refresh, while this state absorbs each
  * event for O(1) amortized work — so that is what the stream
  * maintains: one [[RetentionState]] per active user (an optional
  * cohort stamp + the distinct week stamps), emitted as finalized
  * [[RetentionRow]]s on event-time TIMEOUT once the watermark passes
  * the user's horizon. The matrix itself is a cheap bounded-output
  * aggregate over those finalized rows (cardinality weeks², never
  * events) — left to the sink reader, where it is one pass over
  * append-only data.
  *
  * Semantics vs batch, stated: cohort = min signup week and the week
  * set are both order-independent folds, so batch/stream coincide on
  * ANY within-watermark arrival order (unlike the funnel's set-once
  * stamps there is no ordering divergence). Two stated differences
  * from a batch re-aggregation: late data past the watermark is
  * dropped by the source contract, and a user returning after MORE
  * than the finalization horizon ([[HorizonMs]]) of event-time
  * inactivity re-opens fresh state whose already-flushed history it
  * cannot amend — size the horizon to the retention window being
  * analyzed. Weeks are ISO-Monday
  * truncations computed by the SAME Spark `date_trunc("week", ts)`
  * the batch query uses, carried into the state transition as an
  * epoch-microsecond stamp rather than re-derived here.
  *
  * Scale shape: state is one long + one stamp per ACTIVE WEEK per
  * user — bounded by the corpus time-span in weeks, never by event
  * count — partitioned by user across executors; per-batch work is
  * O(new events) + O(timed-out keys). Retention windows in practice
  * cap the span (a 52-week product matrix is 52 stamps), and a
  * deployment that needs a hard cap evicts weeks below
  * `cohort + horizon` in the transition without changing the shape.
  */
object StreamingRetention {

  /** `wk_us` is `unix_micros(date_trunc("week", ts))`, precomputed in
    * the streaming plan so truncation semantics are byte-identical to
    * the batch query's.
    */
  case class RetentionEvent(
      user_id: Long, event_type: String, ts: Timestamp, wk_us: Long)

  /** Per-user state: earliest signup week (None until a signup
    * arrives) + distinct active-week stamps (order-free folds both),
    * and the user's last-activity stamp — carried IN the state so a
    * later batch's out-of-order event can only EXTEND the flush
    * horizon, never shrink it below already-absorbed activity (the
    * same reason [[StreamingSessionize.SessionState]] stores
    * `lastUs`).
    */
  case class RetentionState(
      cohortUs: Option[Long], weeks: Seq[Long], lastUs: Long)

  /** One finalized (user, active week) pair for a cohorted user —
    * `wk_us >= cohort_us` always holds (pre-cohort activity is
    * excluded at emission, mirroring the batch WHERE).
    */
  case class RetentionRow(user_id: Long, cohort_us: Long, wk_us: Long)

  private val Empty = RetentionState(None, Nil, 0L)

  /** Finalization horizon: a user's matrix rows flush once the
    * watermark passes their last activity plus this span. Sized to
    * the ANALYSIS window, not a session gap: retention counts
    * returns weeks later, so a user must be event-time-inactive for
    * the whole horizon before their history is finalized. A return
    * BEYOND the horizon re-opens fresh state whose earlier (already
    * emitted) history it cannot amend — the standard
    * finalize-on-timeout tradeoff, stated here rather than hidden;
    * size the horizon to the product's retention window (35 days
    * covers a 5-week matrix).
    */
  private val HorizonMs = 35L * 86400 * 1000

  /** The per-user transition. Exposed for direct unit testing. */
  def onUser(
      userId: Long,
      events: Iterator[RetentionEvent],
      state: GroupState[RetentionState]): Iterator[RetentionRow] = {
    if (state.hasTimedOut) {
      val out = state.getOption.iterator.flatMap(s =>
        s.cohortUs.iterator.flatMap(c =>
          s.weeks.filter(_ >= c).sorted.iterator
            .map(w => RetentionRow(userId, c, w))))
      // materialize before remove(): the iterator reads the state
      val rows = out.toVector
      state.remove()
      return rows.iterator
    }
    var s = state.getOption.getOrElse(Empty)
    for (e <- events) {
      // horizon folds OVER the stored stamp: a batch whose events are
      // all event-time-earlier than prior batches must not pull the
      // flush forward
      s = s.copy(lastUs = math.max(s.lastUs, StreamingSessionize.micros(e.ts)))
      if (e.event_type == "signup")
        s = s.copy(cohortUs =
          Some(s.cohortUs.fold(e.wk_us)(math.min(_, e.wk_us))))
      if (!s.weeks.contains(e.wk_us)) s = s.copy(weeks = s.weeks :+ e.wk_us)
    }
    if (s != Empty) {
      state.update(s)
      // flush when the watermark passes last activity + the horizon
      // (+1 ms: the timeout clock is ms-grained); any later real event
      // re-arms before the watermark can reach it
      state.setTimeoutTimestamp(s.lastUs / 1000L + HorizonMs + 1L)
    }
    Iterator.empty
  }

  /** Wire the transition over a (possibly streaming) event Dataset.
    * Requires `withWatermark` upstream when streaming.
    */
  def retention(events: Dataset[RetentionEvent]): Dataset[RetentionRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RetentionState, RetentionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(onUser)
  }
}
