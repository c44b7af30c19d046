package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental ordered-funnel maintenance with `flatMapGroupsWithState`
  * — the streaming twin of the batch funnel
  * (`RelationalQueries.qFunnel`): per user, the earliest view, the
  * earliest click STRICTLY AFTER that view, and the earliest purchase
  * strictly after that click. State is one [[FunnelState]] (three
  * optional microsecond stamps) per user who has produced a view —
  * constant-size, unlike the sessionize state only in that it never
  * closes mid-stream: a funnel record is final only when no more
  * events can arrive, so users emit on event-time TIMEOUT once the
  * watermark passes their horizon.
  *
  * Ordering contract (the streaming tradeoff, stated): each batch's
  * events are processed in event-time order, so any reordering WITHIN
  * a micro-batch is immaterial; stage stamps are set-once, so an event
  * arriving in a LATER batch with an earlier timestamp than a recorded
  * stage cannot retroactively lower it (the batch query would). Late
  * data past the watermark is dropped by the source contract anyway —
  * within-watermark cross-batch regressions are the one divergence,
  * the same one `dropDuplicatesWithinWatermark` accepts. The gated
  * query feeds the whole fixture in one micro-batch, where the
  * semantics coincide exactly; StreamingFunnelSpec pins both the
  * coincidence and the documented divergence.
  *
  * Scale shape: state is 3 longs per converting user, partitioned by
  * user across executors; per-batch work is O(new events) + O(timed-
  * out keys). The batch funnel re-aggregates the corpus per refresh —
  * this maintains the same answer for O(delta) per micro-batch.
  */
object StreamingFunnel {

  case class FunnelEvent(user_id: Long, event_type: String, ts: Timestamp)

  /** Set-once stage stamps, epoch micros. Invariant: tClick defined ⇒
    * tView defined; tPurchase defined ⇒ tClick defined. `lastUs`
    * (last activity) is carried IN the state so a later batch's
    * out-of-order event can only EXTEND the flush horizon, never
    * shrink it below already-absorbed activity.
    */
  case class FunnelState(
      tView: Option[Long], tClick: Option[Long], tPurchase: Option[Long],
      lastUs: Long = 0L)

  /** A finalized per-user funnel record (user reached stage 1+). */
  case class FunnelRow(
      user_id: Long,
      t_view_us: Long,
      t_click_us: Option[Long],
      t_purchase_us: Option[Long])

  private val Empty = FunnelState(None, None, None, 0L)

  /** Finalization horizon: a user's funnel record is emitted once the
    * watermark passes their last activity + this, the same sized
    * constant [[StreamingRetention.HorizonMs]] uses — "final only when
    * no more events can arrive" is only as true as this horizon, and a
    * buried small constant (it was a hardcoded hour) silently
    * finalizes any user whose stage gap exceeds it: the record emits
    * without the later stage, and that stage's eventual arrival
    * re-opens empty state where it is discarded (a duplicate,
    * stage-poorer row vs the batch funnel). 35 days covers any
    * plausible view→purchase window; a domain with longer journeys
    * sizes it up, trading state residence time, exactly the retention
    * tradeoff.
    */
  private[streaming] val HorizonMs = 35L * 86400 * 1000

  /** The per-user transition. Exposed for direct unit testing. */
  def onUser(
      userId: Long,
      events: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): Iterator[FunnelRow] = {
    if (state.hasTimedOut) {
      val out = state.getOption.flatMap(s =>
        s.tView.map(v => FunnelRow(userId, v, s.tClick, s.tPurchase))).iterator
      state.remove()
      return out
    }
    // event-time order; ties keep the strict-> stage comparisons
    // order-independent (a click at exactly t_view never converts,
    // whichever side of the tie is folded first)
    val sorted = events.toSeq
      .map(e => (StreamingSessionize.micros(e.ts), e.event_type))
      .sortBy(_._1)
    var s = state.getOption.getOrElse(Empty)
    for ((us, tpe) <- sorted) {
      // fold over the STORED stamp: an all-earlier batch must not pull
      // the flush horizon below already-absorbed activity
      s = s.copy(lastUs = math.max(s.lastUs, us))
      tpe match {
        case "view" if s.tView.isEmpty =>
          s = s.copy(tView = Some(us))
        case "click" if s.tClick.isEmpty && s.tView.exists(us > _) =>
          s = s.copy(tClick = Some(us))
        case "purchase" if s.tPurchase.isEmpty && s.tClick.exists(us > _) =>
          s = s.copy(tPurchase = Some(us))
        case _ => ()
      }
    }
    if (s.tView.isDefined) {
      state.update(s)
      // flush when the watermark passes the user's last activity +
      // [[HorizonMs]] (+1 ms: the timeout clock is ms-grained); any
      // later real event re-arms the horizon before the watermark can
      // reach it
      state.setTimeoutTimestamp(s.lastUs / 1000L + HorizonMs + 1L)
    }
    Iterator.empty
  }

  /** Wire the transition over a (possibly streaming) event Dataset.
    * Requires `withWatermark` upstream when streaming.
    */
  def funnel(events: Dataset[FunnelEvent]): Dataset[FunnelRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(onUser)
  }
}
