package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The count300k aggregate running incrementally: buffers must survive
  * state-store serialize/deserialize between micro-batches, and the
  * watermark must drop late rows (the streaming analogues of the
  * reference's exchange boundary and its missing late-data story).
  */
class StreamingDistinctSpec extends SparkSpec {

  private def ts(hour: Int, minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")

  test("streaming hourly distinct users accumulates across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val agg = StreamingDistinct.hourlyDistinctUsers(
      input.toDF().toDF("ts", "user_id", "event_type"))
    val q = agg.writeStream
      .format("memory").queryName("hourly_distinct")
      .outputMode("complete").start()
    try {
      input.addData((ts(10, 0), 1L, "click"), (ts(10, 10), 2L, "click"))
      q.processAllAvailable()
      // batch 2: duplicate user 1 (same window) + new user in a new window
      input.addData((ts(10, 20), 1L, "click"), (ts(11, 5), 3L, "click"))
      q.processAllAvailable()
      val rows = spark.table("hourly_distinct")
        .orderBy("window_start", "event_type").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getString(2), r.getLong(3)))
      assert(rows.toSeq == Seq(
        (ts(10, 0), "click", "2", 3L), // user 1 deduped across batches
        (ts(11, 0), "click", "1", 1L)))
    } finally q.stop()
  }

  test("watermark drops rows later than the threshold (append mode)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val agg = StreamingDistinct.hourlyDistinctUsers(
      input.toDF().toDF("ts", "user_id", "event_type"), watermark = "30 minutes")
    val q = agg.writeStream
      .format("memory").queryName("late_data")
      .outputMode("append").start()
    try {
      input.addData((ts(10, 0), 1L, "view"), (ts(10, 30), 2L, "view"))
      q.processAllAvailable()
      // advance watermark well past the 10:00 window...
      input.addData((ts(13, 0), 3L, "view"))
      q.processAllAvailable()
      // ...then send a late row for 10:xx — must be dropped
      input.addData((ts(10, 45), 99L, "view"))
      q.processAllAvailable()
      input.addData((ts(15, 0), 4L, "view")) // close the 13:00 window too
      q.processAllAvailable()
      val rows = spark.table("late_data")
        .orderBy("window_start").collect()
        .map(r => (r.getTimestamp(0), r.getString(2), r.getLong(3)))
      // the 10:00 window was finalized with 2 users; late user 99 never lands
      assert(rows.contains((ts(10, 0), "2", 2L)), rows.toSeq.toString)
      assert(!rows.exists(_._3 == 3L && rows.count(_._1 == ts(10, 0)) > 1))
    } finally q.stop()
  }

  test("count300k state survives the RocksDB state store (production provider)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Timestamp, Long, String)]
      val agg = StreamingDistinct.hourlyDistinctUsers(
        input.toDF().toDF("ts", "user_id", "event_type"))
      val q = agg.writeStream
        .format("memory").queryName("rocksdb_distinct")
        .outputMode("complete").start()
      try {
        input.addData((ts(9, 0), 1L, "view"), (ts(9, 5), 2L, "view"))
        q.processAllAvailable()
        input.addData((ts(9, 10), 1L, "view"), (ts(9, 20), 3L, "view"))
        q.processAllAvailable()
        val rows = spark.table("rocksdb_distinct").collect()
          .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
        // buffer deserialized from RocksDB between batches: 3 distinct of 4
        assert(rows.toSeq == Seq(("view", "3", 4L)), rows.toSeq.toString)
      } finally q.stop()
    } finally {
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("query restart recovers count300k state from the checkpoint") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val input = MemoryStream[(Timestamp, Long, String)]
    def start(name: String) =
      StreamingDistinct.hourlyDistinctUsers(
        input.toDF().toDF("ts", "user_id", "event_type"))
        .writeStream.format("memory").queryName(name)
        .option("checkpointLocation", ckpt)
        .outputMode("complete").start()
    val q1 = start("ckpt_run1")
    input.addData((ts(8, 0), 1L, "click"), (ts(8, 5), 2L, "click"))
    q1.processAllAvailable()
    q1.stop()
    // restart from the same checkpoint: prior distinct set must survive
    val q2 = start("ckpt_run2")
    try {
      input.addData((ts(8, 10), 1L, "click"), (ts(8, 15), 3L, "click"))
      q2.processAllAvailable()
      val rows = spark.table("ckpt_run2").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
      // user 1 deduped against the recovered state: 3 distinct of 4 events
      assert(rows.toSeq == Seq(("click", "3", 4L)), rows.toSeq.toString)
    } finally q2.stop()
  }

  test("file-source streaming over the events fixture reaches a result") {
    val stream = StreamingDistinct.readEventsStream(spark, "/root/testdata/sf0.001")
    assert(stream.isStreaming)
    val q = StreamingDistinct.hourlyDistinctUsers(stream)
      .writeStream.format("memory").queryName("events_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val n = spark.table("events_stream").count()
      assert(n > 0)
      // cross-check against the batch path over the same fixture
      val batch = graft.operators.CoreQueries
        .qEventsHourly(spark, "/root/testdata/sf0.001").count()
      assert(n == batch)
    } finally q.stop()
  }
}
