package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Engine

/** Time-series analytics over the events stream — the reporting shapes a
  * warehouse runs on top of its distinct counts (the reference's host,
  * Impala, served exactly this workload around the UDA:
  * `/root/reference/README.md:1-6`): densifying a sparse series,
  * time-based sliding aggregates, and statistical outlier detection.
  *
  * Scale discipline shared by all three: the raw corpus is collapsed to a
  * keyed pre-aggregate FIRST (map-side combine; one row per (hour, type)
  * or per group), and every window/grid that follows runs on that
  * DOMAIN-bounded frame — time span × type cardinality for the series,
  * group count for the stats — never on corpus-proportional rows. That is
  * the difference between a window sort over 10^11 events and one over
  * 10^3 hours at 100 TB.
  */
object TimeSeriesQueries {

  /** Per-(hour, event_type) event counts — the shared pre-aggregate. */
  private def hourlyCounts(spark: SparkSession, dir: String): DataFrame =
    Engine.table(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))

  /** Gap filling: densify the sparse hourly series to a complete
    * (hour × event_type) grid — missing hours appear with `n_events` 0
    * and `carried` repeats the last OBSERVED hour's count (NULL before
    * the first observation), the standard fill-forward for downstream
    * charting/joins that assume a dense time axis.
    *
    * The hour axis is generated with `sequence(min, max, 1 hour)` off a
    * one-row bounds aggregate — fully lazy, no driver collect — and the
    * grid is bounded by time span × type domain regardless of corpus
    * size (a month of hours × a handful of types), so the left join
    * against the hourly pre-aggregate broadcasts its tiny side and the
    * fill-forward window sorts ~10^2..10^4 rows per type, never raw
    * events.
    */
  def qGapFill(spark: SparkSession, dir: String): DataFrame = {
    val per = hourlyCounts(spark, dir)
    val hours = per.agg(min("h").as("h0"), max("h").as("h1"))
      .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val types = per.select("event_type").distinct()
    val w = Window.partitionBy("event_type").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hours.crossJoin(broadcast(types))
      .join(per, Seq("h", "event_type"), "left")
      .select(col("h"), col("event_type"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("n_events"), ignoreNulls = true).over(w).as("carried"))
      .orderBy("h", "event_type")
  }

  /** Trailing 24h frame: 23h59m59s back through the current hour, in
    * whole seconds over the epoch ORDER BY key.
    */
  private val Trailing24h = 23L * 3600 + 3599

  /** Time-based sliding aggregate: per event type, each observed hour's
    * count plus the trailing-24-hour rolling sum and the number of
    * OBSERVED hours inside that frame. The frame is a RANGE frame over
    * epoch seconds, so gaps in the series shorten the frame's row count
    * without any densification step — time semantics live in the frame
    * bound, not in the data.
    *
    * Runs on the hourly pre-aggregate (domain-bounded, see the object
    * doc); counts are integers end-to-end, so the rolling sums compare
    * exactly against the oracle.
    */
  def qRolling(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(unix_timestamp(col("h")))
      .rangeBetween(-Trailing24h, Window.currentRow)
    hourlyCounts(spark, dir)
      .select(col("h"), col("event_type"), col("n_events"),
        sum("n_events").over(w).as("roll24_events"),
        count(lit(1)).over(w).cast("long").as("roll24_hours"))
      .orderBy("h", "event_type")
  }

  /** Statistical outlier census per group, in EXACT integer arithmetic:
    * a price (in cents) is an outlier within its return-flag group when
    * its squared z-score exceeds 2 — i.e. `(x-μ)² > 2σ²` with the
    * sample variance — which multiplied through by `n²(n-1)` becomes the
    * all-integer predicate
    *
    *   (n-1)·(n·x − S)² > 2·n·(n·S₂ − S²)
    *
    * (S = Σx, S₂ = Σx²). Both engines evaluate it in wide integers
    * (DECIMAL(38,0) here, HUGEINT in the oracle), so the boundary rows
    * match bit-for-bit — the float z-score version would disagree on
    * rows within an ulp of the threshold whenever the engines' summation
    * orders differ. Threshold 2 (not the classic 9) because a
    * bounded/uniform-ish domain has max |z| = √3: 9σ² would be
    * vacuously empty on well-behaved data, while 2σ² exercises both
    * tails deterministically.
    *
    * Shape: one map-side-combined stats pass (3 groups), a broadcast
    * join of those 3 rows back onto the fact scan, one more keyed
    * aggregate — two linear passes, no window, no shuffle beyond the
    * group keys. Exactness bound: the largest product is
    * n·(n·x_max)² — at x_max ~10^7 cents that stays inside DECIMAL(38)
    * for n up to ~10^8 rows per group; beyond that scale the predicate
    * should be rebuilt on group-sharded partial sums (the arithmetic
    * stays exact under sharding because S and S₂ are plain sums).
    */
  def qOutliers(spark: SparkSession, dir: String): DataFrame = {
    val cents = Engine.table(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        expr("CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))").as("cents"))
    // Fail-fast guard on the documented exactness bound: the largest
    // intermediate is (n-1)(n·x − S)² ≤ 4·n³·x_max², so under non-ANSI
    // Spark an overflow past DECIMAL(38,0) would return NULL and
    // silently count the row as a non-outlier. Raise loudly instead
    // (3·log10 n + 2·log10 x_max ≤ 37 leaves >1 digit for the factor
    // 4 and every smaller intermediate); beyond it the predicate must
    // be rebuilt on group-sharded partial sums, as documented above.
    // Everything per-row-CONSTANT lives on this 3-row frame — the guard
    // and the threshold 2·n·(n·S₂ − S²) are evaluated once per group,
    // not once per fact row (the per-row side below is left with the
    // minimum: one difference and two wide multiplications).
    val stats = cents.groupBy("l_returnflag")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum("cents").as("s1"),
        sum(expr("cents * cents")).as("s2"),
        max(abs(col("cents"))).as("xmax"))
      .select(col("l_returnflag"), col("n"), col("s1"),
        expr(
          """CASE WHEN 3 * log10(cast(n AS double)) +
            |          2 * log10(cast(greatest(xmax, 1) AS double)) > 37
            |  THEN raise_error(concat('q_outliers: DECIMAL(38,0) exactness bound ',
            |       'exceeded for group ', l_returnflag,
            |       ' - rebuild on group-sharded partial sums'))
            |  ELSE 2 * n * (n * s2 - s1 * s1)
            |END""".stripMargin).as("rhs"))
    val isOut = expr(
      "(n - 1) * (n * cents - s1) * (n * cents - s1) > rhs")
    cents.join(broadcast(stats), Seq("l_returnflag"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(when(isOut, 1L).otherwise(0L)).as("n_out"),
        min(when(isOut, col("cents"))).cast("long").as("min_out_cents"),
        max(when(isOut, col("cents"))).cast("long").as("max_out_cents"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_gap_fill" -> (qGapFill _),
    "q_rolling" -> (qRolling _),
    "q_outliers" -> (qOutliers _)
  )

  val oracles: Map[String, String] = Map(
    // generate_series is inclusive of both bounds, like Spark's sequence
    "q_gap_fill" ->
      """WITH per AS (
        |  SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |hours AS (
        |  SELECT unnest(generate_series((SELECT min(h) FROM per),
        |                                (SELECT max(h) FROM per),
        |                                INTERVAL 1 HOUR)) AS h),
        |grid AS (
        |  SELECT hours.h, t.event_type
        |  FROM hours CROSS JOIN (SELECT DISTINCT event_type FROM per) t)
        |SELECT g.h, g.event_type,
        |       CAST(coalesce(p.c, 0) AS BIGINT) AS n_events,
        |       CAST(last_value(p.c IGNORE NULLS) OVER (
        |              PARTITION BY g.event_type ORDER BY g.h
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS BIGINT) AS carried
        |FROM grid g
        |LEFT JOIN per p ON g.h = p.h AND g.event_type = p.event_type
        |ORDER BY g.h, g.event_type""".stripMargin,
    "q_rolling" ->
      """WITH per AS (
        |  SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT h, event_type, n_events,
        |       CAST(sum(n_events) OVER w AS BIGINT) AS roll24_events,
        |       CAST(count(*) OVER w AS BIGINT) AS roll24_hours
        |FROM per
        |WINDOW w AS (PARTITION BY event_type ORDER BY CAST(epoch(h) AS BIGINT)
        |             RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW)
        |ORDER BY h, event_type""".stripMargin,
    // the same all-integer predicate in HUGEINT (128-bit) arithmetic
    "q_outliers" ->
      """WITH c AS (
        |  SELECT l_returnflag,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem),
        |s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |         sum(CAST(cents AS HUGEINT)) AS s1,
        |         sum(CAST(cents AS HUGEINT) * CAST(cents AS HUGEINT)) AS s2
        |  FROM c GROUP BY 1)
        |SELECT c.l_returnflag, count(*) AS n,
        |       CAST(count(*) FILTER (
        |         (n-1)*(n*CAST(cents AS HUGEINT) - s1)*(n*CAST(cents AS HUGEINT) - s1)
        |           > 2*n*(n*s2 - s1*s1)) AS BIGINT) AS n_out,
        |       CAST(min(cents) FILTER (
        |         (n-1)*(n*CAST(cents AS HUGEINT) - s1)*(n*CAST(cents AS HUGEINT) - s1)
        |           > 2*n*(n*s2 - s1*s1)) AS BIGINT) AS min_out_cents,
        |       CAST(max(cents) FILTER (
        |         (n-1)*(n*CAST(cents AS HUGEINT) - s1)*(n*CAST(cents AS HUGEINT) - s1)
        |           > 2*n*(n*s2 - s1*s1)) AS BIGINT) AS max_out_cents
        |FROM c JOIN s USING (l_returnflag)
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
