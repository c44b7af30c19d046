package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The semantic delta `q_stream_session_window` exists to exercise:
  * Spark's native session-window state MERGES — a late in-gap event
  * arriving in a later micro-batch fuses two open sessions into one.
  * The fMGWS sessionize transition cannot express this (it processes
  * each batch in event-time order and closes gaps immediately), which
  * is exactly why the engine carries both forms.
  */
class SessionWindowMergeSpec extends SparkSpec {

  private def ts(h: Int, m: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("a late in-gap event fuses two open sessions in native session-window state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val agg = input.toDS().toDF("user_id", "ts")
      .withWatermark("ts", "10 hours") // generous: the bridge event must not be late-dropped
      .groupBy(col("user_id"), session_window(col("ts"), "6 hours"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("n_events"))
    val q = agg.writeStream.format("memory").queryName("sw_merge")
      .outputMode("append").start()
    try {
      // batch 1: two events 10h apart -> TWO open sessions in state
      input.addData((1L, ts(0)), (1L, ts(10)))
      q.processAllAvailable()
      // batch 2: a bridge event at 5h sits within 6h of both -> the
      // sessions must FUSE into one [00:00, 16:00+6h) in state
      input.addData((1L, ts(5)))
      q.processAllAvailable()
      assert(spark.table("sw_merge").isEmpty, "nothing final before the watermark")
      // advance the watermark far past the fused session's end twice
      // (watermark updates at batch end; the next batch emits)
      input.addData((99L, Timestamp.valueOf("2024-01-03 12:00:00")))
      q.processAllAvailable()
      input.addData((99L, Timestamp.valueOf("2024-01-05 12:00:00")))
      q.processAllAvailable()
      val rows = spark.table("sw_merge").filter(col("user_id") === 1L)
        .collect().map(r => (r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      assert(rows.toSeq == Seq((ts(0), ts(16), 3L)),
        s"expected ONE fused session [00:00, 10:00+6h) with 3 events, got ${rows.toSeq}")
    } finally q.stop()
  }
}
