package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.{Engine, SparkSpec}

/** Co-located joins via bucketing — the 100 TB play for repeated
  * fact-to-fact joins: both tables pre-bucketed on the join key mean the
  * join plans with ZERO shuffle exchanges. At cluster scale this is the
  * difference between re-shuffling 100 TB per join and reading
  * co-located buckets.
  */
class BucketedJoinSpec extends SparkSpec with BeforeAndAfterAll {

  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Engine.table(spark, dir, "orders")
      .write.format("parquet").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Engine.table(spark, dir, "customer")
      .write.format("parquet").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")
  }

  override def afterAll(): Unit = {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    super.afterAll()
  }

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed fact-to-fact join plans zero shuffle exchanges") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan
      def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int =
        (p match { case _: ShuffleExchangeExec => 1; case _ => 0 }) +
          p.children.map(shuffles).sum
      // join itself must be shuffle-free; only the small groupBy result
      // may exchange (on c_mktsegment, after aggregation)
      val joinSubtree = plan.collectFirst {
        case j if j.nodeName.contains("SortMergeJoin") => j
      }
      assert(joinSubtree.isDefined, s"expected SortMergeJoin:\n$plan")
      assert(shuffles(joinSubtree.get) == 0,
        s"bucketed join should not shuffle:\n$plan")
      // results still correct vs the unbucketed path
      val expected = Engine.table(spark, dir, "orders")
        .join(Engine.table(spark, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(got == expected)
    }
  }
}
