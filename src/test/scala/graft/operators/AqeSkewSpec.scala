package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** AQE skew-join handling: the runtime complement to the compile-time
  * salting pattern (q_salted_agg). A join keyed 90% onto one hot key
  * must have its oversized shuffle partition SPLIT by adaptive
  * execution ("skew=true" on the SortMergeJoin) instead of funneling
  * the hot key through a single task — the mechanism graft relies on
  * for skewed joins at 100 TB (ARCHITECTURE.md §3).
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits the skewed partition of a hot-key join") {
    // own newSession(): these conf changes are SQLConf-scoped, and the
    // suite-shared session is used concurrently by plan-assertion specs
    // (e.g. autoBroadcastJoinThreshold=-1 would flip their join plans)
    val s = spark.newSession()
    Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    ).foreach { case (k, v) => s.conf.set(k, v) }
    // 200k rows, 90% on key 0 → one shuffle partition dwarfs the rest
    val skewed = s.range(200000)
      .select(when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
        concat(lit("payload-payload-payload-"), col("id")).as("v"))
    val dim = s.range(1000).select(col("id").as("k"),
      concat(lit("d"), col("id")).as("d"))
    val joined = skewed.join(dim, "k")
    // run THIS dataframe's own query execution — count() would plan a
    // separate aggregate and leave joined's adaptive plan unexecuted
    assert(joined.collect().length == 180000 + 100)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"expected AQE to mark the skewed join:\n$plan")
  }
}
