package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Stream-stream interval join (click attribution): matches must emit
  * incrementally across micro-batches, the interval condition must
  * bound what joins (and what state is retained), and the streaming
  * result must equal the batch range-join on the same data.
  */
class StreamStreamJoinSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val imps = Seq((1L, ts(0)), (2L, ts(2)))
  private val clicks = Seq(
    (1L, ts(5)),  // within 10 min of imp 1 → match
    (2L, ts(8)),  // within 10 min of imp 2 → match
    (1L, ts(30))) // 30 min after imp 1 → outside window, no match

  test("streaming interval join matches clicks within the window only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val impIn = MemoryStream[(Long, Timestamp)]
    val clickIn = MemoryStream[(Long, Timestamp)]
    val joined = StreamJoins.clickAttribution(
      impIn.toDF().toDF("ad_id", "imp_ts"),
      clickIn.toDF().toDF("click_ad", "click_ts"))
    assert(joined.isStreaming)
    val q = joined.writeStream
      .format("memory").queryName("attributed")
      .outputMode("append").start()
    try {
      impIn.addData(imps)
      clickIn.addData(clicks.head)
      q.processAllAvailable()
      clickIn.addData(clicks.tail)
      q.processAllAvailable()
      val got = spark.table("attributed").collect()
        .map(r => (r.getLong(0), r.getTimestamp(2))).toSet
      assert(got == Set((1L, ts(5)), (2L, ts(8))))
    } finally q.stop()
  }

  test("stream-static broadcast enrichment equals the batch join") {
    val dir = "/root/testdata/sf0.001"
    val streamed =
      graft.operators.StreamingQueries.qStreamStaticJoin(spark, dir).collect()
    val batch = graft.Engine.table(spark, dir, "events")
      .join(graft.Engine.table(spark, dir, "customer"),
        col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"),
        col("c_nationkey").cast("long").as("nation_key"),
        col("c_mktsegment").as("segment"))
      .orderBy("event_id")
      .collect()
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("streaming result equals the batch range-join on the same data") {
    import spark.implicits._
    val batch = StreamJoins.clickAttribution(
      imps.toDF("ad_id", "imp_ts"),
      clicks.toDF("click_ad", "click_ts"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(2))).toSet
    assert(batch == Set((1L, ts(5)), (2L, ts(8))))
  }

  test("streaming LEFT OUTER interval join equals the batch left join incl. null rows") {
    val dir = "/root/testdata/sf0.001"
    val streamed = graft.operators.StreamingQueries
      .qStreamOuterJoin(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSet
    val ev = graft.Engine.table(spark, dir, "events")
    val i = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("ad_id"), col("ts").as("imp_ts"),
        col("event_id").as("imp_id"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("click_ad"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val batch = i.join(c, expr(
        "ad_id = click_ad AND click_ts >= imp_ts AND click_ts <= imp_ts + interval 1 hour"),
        "left_outer")
      .select(col("ad_id"), col("imp_id"), col("click_id"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSet
    assert(streamed == batch)
    // the null-emission path is actually exercised: unmatched rows exist
    assert(streamed.exists(_._3 == -1L),
      "fixture must contain unmatched impressions (null click rows)")
  }

  test("streaming FULL OUTER interval join equals the batch full join in BOTH null directions") {
    val dir = "/root/testdata/sf0.001"
    def key(r: org.apache.spark.sql.Row) = (
      r.getLong(0),
      if (r.isNullAt(1)) -1L else r.getLong(1),
      if (r.isNullAt(2)) -1L else r.getLong(2))
    val streamed = graft.operators.StreamingQueries
      .qStreamFullOuterJoin(spark, dir)
      .select("ad", "imp_id", "click_id")
      .collect().map(key).toSet
    val ev = graft.Engine.table(spark, dir, "events")
    val i = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("ad_id"), col("ts").as("imp_ts"),
        col("event_id").as("imp_id"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("click_ad"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val batch = i.join(c, expr(
        "ad_id = click_ad AND click_ts >= imp_ts AND click_ts <= imp_ts + interval 1 hour"),
        "full_outer")
      .select(coalesce(col("ad_id"), col("click_ad")).as("ad"),
        col("imp_id"), col("click_id"))
      .collect().map(key).toSet
    assert(streamed == batch)
    // both null-extension directions actually fire on the fixture
    assert(streamed.exists(_._3 == -1L),
      "fixture must contain unmatched impressions")
    assert(streamed.exists(_._2 == -1L),
      "fixture must contain orphan clicks (no preceding impression)")
  }
}
