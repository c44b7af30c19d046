package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import StreamingRetention._

/** Incremental cohort retention: the pure transition (min-signup
  * cohort, distinct-week fold, pre-cohort exclusion at emission — all
  * order-free, so there is NO batch divergence to document, unlike
  * the funnel's set-once stamps), cross-batch behavior, and the
  * watermark-timeout flush end-to-end.
  */
class StreamingRetentionSpec extends SparkSpec {

  private def ts(d: Int, h: Int = 10): Timestamp =
    Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")

  /** Week stamp through the SAME Spark expression the pipeline uses. */
  private def wk(t: Timestamp): Long =
    spark.range(1).select(unix_micros(date_trunc("week", lit(t)))).head.getLong(0)

  private def ev(u: Long, tpe: String, t: Timestamp) =
    RetentionEvent(u, tpe, t, wk(t))

  private def drive(batches: Seq[RetentionEvent]*): (Option[RetentionState], Seq[RetentionRow]) = {
    val state = new TestGroupState[RetentionState]
    val out = Seq.newBuilder[RetentionRow]
    batches.foreach(b => out ++= StreamingRetention.onUser(1L, b.iterator, state))
    state.timedOut = true
    out ++= StreamingRetention.onUser(1L, Iterator.empty, state)
    (state.value, out.result())
  }

  test("cohort is the MIN signup week, whatever order signups arrive") {
    // signup in week of Jan 8 arrives first; an earlier signup (week
    // of Jan 1) lands in a later batch and must lower the cohort
    val (st, rows) = drive(
      Seq(ev(1, "signup", ts(10))),
      Seq(ev(1, "signup", ts(3)), ev(1, "click", ts(17))))
    assert(st.isEmpty) // timeout removed it
    assert(rows == Seq(
      RetentionRow(1L, wk(ts(3)), wk(ts(3))),
      RetentionRow(1L, wk(ts(3)), wk(ts(10))),
      RetentionRow(1L, wk(ts(3)), wk(ts(17)))))
  }

  test("pre-cohort activity is excluded at emission, mirroring the batch WHERE") {
    val (_, rows) = drive(Seq(
      ev(1, "view", ts(3)), ev(1, "signup", ts(10)), ev(1, "view", ts(17))))
    assert(rows == Seq(
      RetentionRow(1L, wk(ts(10)), wk(ts(10))),
      RetentionRow(1L, wk(ts(10)), wk(ts(17)))))
  }

  test("weeks dedup across batches: many events, one stamp per active week") {
    val (_, rows) = drive(
      Seq(ev(1, "signup", ts(3)), ev(1, "view", ts(4))),
      Seq(ev(1, "click", ts(5, 23)), ev(1, "view", ts(10))))
    assert(rows == Seq(
      RetentionRow(1L, wk(ts(3)), wk(ts(3))),
      RetentionRow(1L, wk(ts(3)), wk(ts(10)))))
  }

  test("no signup, no emission: activity-only state clears on timeout") {
    val (st, rows) = drive(Seq(ev(1, "view", ts(3)), ev(1, "view", ts(10))))
    assert(rows.isEmpty && st.isEmpty)
  }

  test("an out-of-order later batch never shrinks the flush horizon") {
    // regression: lastUs was reset per invocation, so a batch of
    // all-earlier events re-armed the timeout BELOW already-absorbed
    // activity and could flush a user early, orphaning later weeks
    val state = new TestGroupState[RetentionState]
    StreamingRetention.onUser(1L, Iterator(ev(1, "signup", ts(28))), state)
    val armedAfterB1 = state.armedMs
    StreamingRetention.onUser(1L, Iterator(ev(1, "view", ts(3))), state)
    assert(state.armedMs == armedAfterB1,
      s"horizon shrank: ${state.armedMs} < $armedAfterB1")
    assert(state.value.exists(_.lastUs == StreamingSessionize.micros(ts(28))))
  }

  test("full pipeline: watermark timeout flushes the finalized rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val events = input.toDS().toDF("user_id", "event_type", "ts")
      .withColumn("wk_us", unix_micros(date_trunc("week", col("ts"))))
      .withWatermark("ts", "10 minutes")
      .as[RetentionEvent]
    val q = StreamingRetention.retention(events)
      .writeStream.format("memory").queryName("retention_rows")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "signup", ts(2)), (1L, "view", ts(9)),
        (2L, "view", ts(2))) // never signs up
      q.processAllAvailable()
      assert(spark.table("retention_rows").isEmpty) // nothing final yet
      // two watermark-advancing batches fire the 35-day-horizon timeouts
      input.addData((99L, "view", Timestamp.valueOf("2024-03-01 10:00:00")))
      q.processAllAvailable()
      input.addData((99L, "view", Timestamp.valueOf("2024-04-15 10:00:00")))
      q.processAllAvailable()
      val rows = spark.table("retention_rows").as[RetentionRow].collect()
        .sortBy(r => (r.user_id, r.wk_us))
      assert(rows.toSeq == Seq(
        RetentionRow(1L, wk(ts(2)), wk(ts(2))),
        RetentionRow(1L, wk(ts(2)), wk(ts(9)))))
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
