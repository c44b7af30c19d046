package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import StreamingSessionize._

/** flatMapGroupsWithState sessionization: the pure transition function,
  * then the full streaming pipeline with watermark-driven timeouts.
  */
class StreamingSessionizeSpec extends SparkSpec {

  private def ts(m: Int, s: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:$s%02d")

  test("streaming sessions close on gap within a batch and on timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val events = input.toDS().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes").as[Event]
    val q = StreamingSessionize.sessions(events, gapMs = 5 * 60 * 1000)
      .writeStream.format("memory").queryName("sessions").outputMode("append")
      .start()
    try {
      // user 1: two events 2min apart (one session), then 20min gap
      input.addData((1L, ts(0)), (1L, ts(2)), (1L, ts(22)))
      q.processAllAvailable()
      // in-batch gap close: session [10:00,10:02] with 2 events
      val afterBatch1 = spark.table("sessions").as[ClosedSession].collect()
      assert(afterBatch1.map(s => (s.user_id, s.n_events)).toSeq == Seq((1L, 2L)))
      // advance watermark far past 10:22+gap -> timeout closes the tail
      input.addData((2L, ts(59)))
      q.processAllAvailable()
      input.addData((2L, ts(59, 30))) // nudge another batch
      q.processAllAvailable()
      val all = spark.table("sessions").as[ClosedSession].collect()
        .sortBy(s => (s.user_id, s.session_start.getTime))
      assert(all.exists(s => s.user_id == 1L && s.n_events == 1L &&
        s.session_start == ts(22)), all.toSeq.toString)
    } finally q.stop()
  }

  test("transition function: batch semantics match the windowed batch query") {
    // pure-function check, no stream: feed events directly
    val events = Iterator(
      Event(7L, ts(0)), Event(7L, ts(1)), Event(7L, ts(30)), Event(7L, ts(31)))
    val state = new TestGroupState[SessionState]
    val closed = StreamingSessionize.onUser(5 * 60 * 1000)(7L, events, state).toList
    assert(closed.map(_.n_events) == List(2L))
    assert(state.value.exists(_.nEvents == 2L)) // open tail session
  }

  test("a cross-batch straggler within the gap BEFORE the open session's start extends it backwards (batch-exact)") {
    val gapMs = 5 * 60 * 1000L
    val state = new TestGroupState[SessionState]
    // batch 1: session opens at 10:10
    StreamingSessionize.onUser(gapMs)(7L, Iterator(Event(7L, ts(10))), state)
    assert(state.value.exists(s => micros(ts(10)) == s.startUs))
    // batch 2: a within-watermark straggler at 10:07 (3 min before the
    // start, inside the 5-min gap) — the batch gaps-and-islands query
    // reports ONE session [10:07, 10:10]; the transition must agree,
    // not keep the start pinned at 10:10
    StreamingSessionize.onUser(gapMs)(7L, Iterator(Event(7L, ts(7))), state)
    val s = state.value.get
    assert(s.startUs == micros(ts(7)),
      s"straggler did not extend the session start: ${s.startUs}")
    assert(s.lastUs == micros(ts(10)) && s.nEvents == 2L)
    // the documented divergence: a straggler MORE than a gap before
    // the start still folds (single-open-session contract) — pin the
    // shape so the contract is explicit, not accidental
    StreamingSessionize.onUser(gapMs)(7L, Iterator(Event(7L, ts(0))), state)
    val s2 = state.value.get
    assert(s2.startUs == micros(ts(0)) && s2.nEvents == 3L)
  }

  /** Minimal GroupState stub for driving the transition directly. */
  private class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
    private var s: Option[S] = None
    def value: Option[S] = s
    override def exists: Boolean = s.isDefined
    override def get: S = s.get
    override def getOption: Option[S] = s
    override def update(newState: S): Unit = s = Some(newState)
    override def remove(): Unit = s = None
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(durationMs: Long): Unit = ()
    override def setTimeoutDuration(duration: String): Unit = ()
    override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
    override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
    override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }
}
