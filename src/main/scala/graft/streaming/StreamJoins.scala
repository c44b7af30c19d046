package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream joins: the last Structured-Streaming operator family
  * the engine surfaces. State on BOTH sides is bounded by the pair of
  * watermarks plus the join's time-interval condition — without the
  * interval bound Spark would have to keep every row forever, so the
  * condition is as much a state-retention contract as a predicate.
  */
object StreamJoins {

  /** Click attribution: inner interval join of a click stream onto the
    * impression stream of the same ad within `[imp_ts, imp_ts + win]`.
    * Works identically on batch frames (Spark plans a range join) and
    * streams (watermarked stateful join) — the spec cross-checks both.
    */
  def clickAttribution(
      impressions: DataFrame,
      clicks: DataFrame,
      window: String = "10 minutes"): DataFrame = {
    val i =
      if (impressions.isStreaming) impressions.withWatermark("imp_ts", window)
      else impressions
    val c =
      if (clicks.isStreaming) clicks.withWatermark("click_ts", window)
      else clicks
    val joined = i.join(c, expr(
      s"""ad_id = click_ad AND
         |click_ts >= imp_ts AND click_ts <= imp_ts + interval $window""".stripMargin))
    // pass event ids through when the caller tagged its sides with them
    val ids = Seq("imp_id", "click_id").filter(joined.columns.contains(_))
    joined.select((Seq("ad_id", "imp_ts", "click_ts") ++ ids).map(col): _*)
  }
}
