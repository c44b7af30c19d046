package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Engine

/** Structured-Streaming surface: the reference's distinct-count semantics
  * applied to an unbounded `events` stream (the capability the batch-only
  * reference never had — SURVEY.md §2.2 "streaming: absent entirely").
  *
  * The same `count300k` TypedImperativeAggregate serves as the streaming
  * aggregate: its serialize/deserialize pair is what the state store
  * persists between micro-batches, exactly the role the reference's
  * 'D'-form buffer played across Impala's exchange
  * (`/root/reference/hashset-count.cc:195-262`).
  *
  * Scale notes: state is keyed by (window, event_type) — cardinality is
  * bounded by windows x types, not by events; the watermark bounds how
  * many windows stay open, so state size is O(open_windows x types x
  * distinct users per window).
  */
object StreamingDistinct {

  /** Hourly distinct users + event count per event_type, late data
    * dropped past the watermark. Works on any DataFrame with
    * (ts timestamp, user_id bigint, event_type string) — batch or stream.
    */
  def hourlyDistinctUsers(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    Engine.register(events.sparkSession)
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        expr("count300k(cast(user_id as string))").as("distinct_users"),
        count(lit(1)).as("n_events"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("distinct_users"), col("n_events"))
  }

  /** The events fixture schema as on disk: `ts` is parquet
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) = TIMESTAMP_NTZ. Readers
    * cast it to the session-zone TIMESTAMP like [[Engine.table]] does
    * on the batch path (UTC sessions — same instants).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Stream the events fixture directory as a file source. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    Engine.register(spark)
    spark.readStream
      .schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet") // fixture is a bare file
      .parquet(dir)
      .withColumn("ts", col("ts").cast("timestamp"))
  }
}
