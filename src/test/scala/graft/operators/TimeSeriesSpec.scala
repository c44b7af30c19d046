package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Falsifiability for the time-series family: the fixture oracles prove
  * value equality, these prove the SEMANTICS on synthetic frames where
  * the interesting cases (gaps, frame boundaries, outlier thresholds)
  * are constructed rather than hoped for.
  */
class TimeSeriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def ts(iso: String) = Timestamp.from(java.time.Instant.parse(iso))

  test("q_gap_fill emits a complete hour x type grid with zero-filled gaps") {
    val out = TimeSeriesQueries.qGapFill(spark, dir).cache()
    try {
      val Row(h0: Timestamp, h1: Timestamp) =
        out.agg(min("h"), max("h")).head
      val spanHours =
        (h1.getTime - h0.getTime) / 3600000L + 1
      val nTypes = out.select("event_type").distinct().count()
      assert(out.count() == spanHours * nTypes,
        "grid must be dense: every hour for every type")
      // gaps exist at this sf AND are zero-filled, not dropped
      assert(out.filter(col("n_events") === 0).count() > 0)
      // carried never decreases information: non-null from the first
      // observation onward (monotone null prefix per type)
      val badTail = out
        .withColumn("seen", sum(col("n_events")).over(
          Window.partitionBy("event_type").orderBy("h")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("seen") > 0 && col("carried").isNull)
      assert(badTail.count() == 0,
        "carried must be non-null once the type has any observation")
    } finally out.unpersist()
  }

  test("gap fill carries the LAST OBSERVED count across a constructed gap") {
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      Row(ts("2024-01-01T00:30:00Z"), "a"),
      Row(ts("2024-01-01T00:45:00Z"), "a"),
      Row(ts("2024-01-01T03:10:00Z"), "a")).asJava
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType)))
    val per = spark.createDataFrame(rows, schema)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val hours = per.agg(min("h").as("h0"), max("h").as("h1"))
      .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val w = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = hours
      .crossJoin(per.select("event_type").distinct())
      .join(per, Seq("h", "event_type"), "left")
      .select(col("h"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("n_events"), ignoreNulls = true).over(w).as("carried"))
      .orderBy("h")
      .collect()
    // hours 00..03: counts 2,0,0,1 — carried 2,2,2,1
    assert(filled.map(_.getLong(1)).toSeq == Seq(2L, 0L, 0L, 1L))
    assert(filled.map(_.getLong(2)).toSeq == Seq(2L, 2L, 2L, 1L))
  }

  test("rolling 24h RANGE frame drops hours beyond the time bound, not row count") {
    import scala.jdk.CollectionConverters._
    // observed hours 0, 1, 26: the frame at h=26 spans (2..26] and must
    // contain ONLY hour 26 — a 3-row ROWS frame would wrongly keep all
    val rows = Seq(0, 1, 26).map(h =>
      Row(ts(f"2024-01-${h / 24 + 1}%02dT${h % 24}%02d:00:00Z"), "a", 10L + h)).asJava
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("h",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("n_events",
        org.apache.spark.sql.types.LongType)))
    val w = Window.partitionBy("event_type")
      .orderBy(unix_timestamp(col("h")))
      .rangeBetween(-(23L * 3600 + 3599), Window.currentRow)
    val out = spark.createDataFrame(rows, schema)
      .select(col("h"), sum("n_events").over(w).as("roll"),
        count(lit(1)).over(w).cast("long").as("k"))
      .orderBy("h").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(10L, 21L, 36L))
    assert(out.map(_.getLong(2)).toSeq == Seq(1L, 2L, 1L))
  }

  test("q_rolling frame never exceeds 24 observed hours and sums match a self-join") {
    val out = TimeSeriesQueries.qRolling(spark, dir).cache()
    try {
      assert(out.filter(col("roll24_hours") > 24).count() == 0)
      // independent computation: trailing sum via a range self-join
      val a = out.select(col("h"), col("event_type"), col("n_events"))
      val chk = a.as("x").join(a.as("y"),
          col("y.event_type") === col("x.event_type") &&
            col("y.h") <= col("x.h") &&
            col("y.h") >= col("x.h") - expr("interval 23 hours 59 minutes 59 seconds"))
        .groupBy(col("x.h").as("h"), col("x.event_type").as("event_type"))
        .agg(sum(col("y.n_events")).as("roll_chk"))
      val bad = out.join(chk, Seq("h", "event_type"))
        .filter(col("roll24_events") =!= col("roll_chk"))
      assert(bad.count() == 0)
    } finally out.unpersist()
  }

  test("outlier predicate matches the real-valued z-score definition exactly") {
    import scala.jdk.CollectionConverters._
    // constructed skew: one spike among zeros IS an outlier, zeros are not
    val vals = Seq(0L, 0L, 0L, 0L, 0L, 100L)
    val rows = vals.map(v => Row("g", v)).asJava
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("l_returnflag",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("raw",
        org.apache.spark.sql.types.LongType)))
    val cents = spark.createDataFrame(rows, schema)
      .select(col("l_returnflag"), col("raw").cast("decimal(38,0)").as("cents"))
    val stats = cents.groupBy("l_returnflag")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum("cents").as("s1"), sum(expr("cents * cents")).as("s2"))
    val flagged = cents.join(stats, Seq("l_returnflag"))
      .filter(expr(
        "(n - 1) * (n * cents - s1) * (n * cents - s1) > 2 * n * (n * s2 - s1 * s1)"))
      .collect()
    assert(flagged.map(_.getDecimal(1).longValue()).toSeq == Seq(100L))
    // cross-check against the double z-score on the same data
    val n = vals.size.toDouble
    val mu = vals.sum / n
    val varS = vals.map(v => (v - mu) * (v - mu)).sum / (n - 1)
    assert(vals.count(v => (v - mu) * (v - mu) > 2 * varS) == 1)
  }

  test("q_outliers census is internally consistent on the fixture") {
    val rows = TimeSeriesQueries.qOutliers(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)                 // n
      assert(r.getLong(2) >= 0 && r.getLong(2) < r.getLong(1)) // n_out strict subset
      if (r.getLong(2) > 0) assert(!r.isNullAt(3) && !r.isNullAt(4))
    }
  }
}
