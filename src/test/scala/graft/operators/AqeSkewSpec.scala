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

  test("shared-shingle join: df cap excludes the hot shingle; AQE splits it when uncapped") {
    // 600 synthetic docs all containing one hot shingle ("click here
    // now", df=600 — the web-scale pathology) and each PAIR (2j, 2j+1)
    // sharing two rare df=2 shingles.
    val s = spark.newSession()
    Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // thresholds sized to POST-COMPRESSION shuffle bytes: the hot
      // partition is 600 near-identical strings, which lz4 collapses
      // ~50x — exactly what a real stop-shingle's partition does
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1"
    ).foreach { case (k, v) => s.conf.set(k, v) }
    // hot tokens are padded so the hot shingle's shuffle partition
    // dwarfs the rare-shingle partitions even after compression — AQE
    // sizes skew on join INPUT partitions, and a df-600 shingle in a
    // real corpus carries its string bytes into the shuffle this way
    val pad = "x" * 100
    val docs = s.range(600).select(col("id").as("doc_id"),
      concat(lit(s"${pad}click ${pad}here ${pad}now s"), expr("id div 2"),
        lit("x s"), expr("id div 2"), lit("y")).as("text"))

    // compile-time guard: with the df cap, the hot shingle never joins —
    // only the 300 rare-shingle pairs (inter=2 each) survive
    val capped = DedupQueries.shinglePairs(docs, Some(5)).collect()
    assert(capped.length == 300, s"got ${capped.length}")
    assert(capped.forall(_.getAs[Long]("inter") == 2L))

    // runtime guard: uncapped, the hot shingle funnels all 600 docs
    // through ONE join key; its shuffle partition dwarfs the rest and
    // AQE must split it across tasks. Asserted on the raw self-join —
    // the stage the skew actually lands on.
    val sh = DedupQueries.shingles(docs)
    val raw = sh.as("a")
      .join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"))
    // hot pairs (each doc pair) + the two rare shingles per doc pair
    assert(raw.collect().length == 600 * 599 / 2 + 2 * 300)
    val plan = raw.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"expected AQE to mark the hot-shingle join:\n$plan")
    // and the grouped pair counts stay correct through the split
    assert(DedupQueries.shinglePairs(docs, None).collect().length == 600 * 599 / 2)
  }
}
