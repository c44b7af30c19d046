package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import StreamingFunnel._

/** Incremental funnel: the pure transition (ordered-vs-presence
  * semantics, which the fixture cannot discriminate — every fixture
  * user converts at every stage), the cross-batch behavior including
  * the documented late-view divergence, and watermark-timeout flush.
  */
class StreamingFunnelSpec extends SparkSpec {

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
  private def us(m: Int): Long = StreamingSessionize.micros(ts(m))

  private def ev(u: Long, t: String, m: Int) = FunnelEvent(u, t, ts(m))

  private def drive(batches: Seq[FunnelEvent]*): (Option[FunnelState], Seq[FunnelRow]) = {
    val state = new TestGroupState[FunnelState]
    val out = Seq.newBuilder[FunnelRow]
    batches.foreach(b => out ++= StreamingFunnel.onUser(1L, b.iterator, state))
    // fire the timeout: emit whatever finalized
    state.timedOut = true
    out ++= StreamingFunnel.onUser(1L, Iterator.empty, state)
    (state.value, out.result())
  }

  test("order matters: click before the first view does not convert") {
    val (_, rows) = drive(Seq(
      ev(1, "click", 1), ev(1, "view", 5), ev(1, "click", 9), ev(1, "purchase", 3)))
    assert(rows == Seq(FunnelRow(1L, us(5), Some(us(9)), None)))
  }

  test("a click at exactly t_view never converts (strict after)") {
    val (_, rows) = drive(Seq(ev(1, "view", 5), ev(1, "click", 5)))
    assert(rows == Seq(FunnelRow(1L, us(5), None, None)))
  }

  test("stages chain across micro-batches") {
    val (_, rows) = drive(
      Seq(ev(1, "view", 1)),
      Seq(ev(1, "click", 2)),
      Seq(ev(1, "purchase", 3)))
    assert(rows == Seq(FunnelRow(1L, us(1), Some(us(2)), Some(us(3)))))
  }

  test("an out-of-order later batch never shrinks the flush horizon") {
    // regression: lastUs was reset per invocation, so a batch of
    // all-earlier events re-armed the timeout BELOW already-absorbed
    // activity and could flush a converting user early
    val state = new TestGroupState[FunnelState]
    StreamingFunnel.onUser(1L, Iterator(ev(1, "view", 50)), state)
    val armedAfterB1 = state.armedMs
    StreamingFunnel.onUser(1L, Iterator(ev(1, "click", 10)), state)
    assert(state.armedMs == armedAfterB1,
      s"horizon shrank: ${state.armedMs} < $armedAfterB1")
    assert(state.value.exists(_.lastUs == us(50)))
  }

  test("documented divergence: a late view cannot lower a recorded stage") {
    // batch semantics would re-elect t_view=1 and convert the click@2;
    // set-once streaming state keeps t_view=5 (click@2 is before it)
    val (_, rows) = drive(
      Seq(ev(1, "view", 5)),
      Seq(ev(1, "view", 1), ev(1, "click", 2)))
    assert(rows == Seq(FunnelRow(1L, us(5), None, None)))
  }

  test("no view, no state: stray clicks leave nothing behind") {
    val state = new TestGroupState[FunnelState]
    val out = StreamingFunnel.onUser(1L,
      Iterator(ev(1, "click", 1), ev(1, "purchase", 2)), state)
    assert(out.isEmpty && state.value.isEmpty)
  }

  test("full pipeline: checkpoint-free end-to-end flush via watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val events = input.toDS().toDF("user_id", "event_type", "ts")
      .withWatermark("ts", "10 minutes").as[FunnelEvent]
    val q = StreamingFunnel.funnel(events)
      .writeStream.format("memory").queryName("funnel_rows")
      .outputMode("append").start()
    try {
      input.addData((1L, "view", ts(0)), (1L, "click", ts(2)), (2L, "click", ts(1)))
      q.processAllAvailable()
      // nothing final yet
      assert(spark.table("funnel_rows").isEmpty)
      // two watermark-advancing batches fire the 35-day-horizon
      // timeouts (StreamingFunnel.HorizonMs — sized like retention's)
      input.addData((99L, "view", Timestamp.valueOf("2024-02-20 10:00:00")))
      q.processAllAvailable()
      input.addData((99L, "view", Timestamp.valueOf("2024-04-10 10:00:00")))
      q.processAllAvailable()
      val rows = spark.table("funnel_rows").as[FunnelRow].collect().sortBy(_.user_id)
      // user 1 finalized; user 2 (click only) never held state
      assert(rows.map(_.user_id).toSeq == Seq(1L))
      assert(rows.head == FunnelRow(1L, us(0), Some(us(2)), None))
    } finally q.stop()
  }

  /** Minimal GroupState stub for driving the transition directly. */
  private class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
    private var s: Option[S] = None
    var timedOut: Boolean = false
    def value: Option[S] = s
    override def exists: Boolean = s.isDefined
    override def get: S = s.get
    override def getOption: Option[S] = s
    override def update(newState: S): Unit = s = Some(newState)
    override def remove(): Unit = s = None
    override def hasTimedOut: Boolean = timedOut
    override def setTimeoutDuration(durationMs: Long): Unit = ()
    override def setTimeoutDuration(duration: String): Unit = ()
    var armedMs: Long = -1L
    override def setTimeoutTimestamp(timestampMs: Long): Unit = armedMs = timestampMs
    override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
    override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }
}
