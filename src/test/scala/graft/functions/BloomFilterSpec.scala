package graft.functions

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}
import graft.operators.RelationalQueries

/** Contract of the surfaced runtime-filter machinery (`bloom_agg` /
  * `bloom_contains`) and the `q_bloom_prune` pruning pattern built on
  * it: no false negatives ever, measured false-positive rate within
  * the sizing bound, and bloom-then-verify ≡ plain semi-join.
  */
class BloomFilterSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bloom sketch has no false negatives and a bounded FP rate") {
    Engine.register(spark)
    import spark.implicits._
    val keys = (0L until 4096L).toDF("k")
    val sketch = keys.agg(dsl.bloom_agg(col("k"), 4096L, 65536L).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    // every inserted key must probe true
    val hits = keys.filter(dsl.bloom_contains(lit(sketch), col("k"))).count()
    assert(hits == 4096L, "bloom false negative")
    // disjoint probe range: 64 Ki bits / 4 Ki keys = 16 bits/key →
    // theoretical FP ~0.5% at optimal k; assert a loose 5% ceiling
    val misses = (100000L until 110000L).toDF("k")
    val fp = misses.filter(dsl.bloom_contains(lit(sketch), col("k"))).count()
    assert(fp < 500L, s"false-positive rate too high: $fp/10000")
  }

  test("mixed integer key types hash identically (no silent false negatives)") {
    Engine.register(spark)
    import spark.implicits._
    val sketch = (0 until 512).toDF("k") // IntegerType build side
      .agg(dsl.bloom_agg(col("k"), 512L, 8192L).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val probed = (0L until 512L).toDF("k") // LongType probe side
      .filter(dsl.bloom_contains(lit(sketch), col("k"))).count()
    assert(probed == 512L, "int-built sketch must accept long probes")
  }

  test("decimal build keys accept integer probes (numeric canonicalization)") {
    // DECIMAL renders '5.00' where BIGINT renders '5' — without the
    // through-DOUBLE canonicalization the string-cast hash would
    // silently violate no-false-negatives across numeric types
    Engine.register(spark)
    import spark.implicits._
    val sketch = (0 until 512).toDF("k")
      .select(col("k").cast("decimal(10,2)").as("k")) // '0.00'..'511.00'
      .agg(dsl.bloom_agg(col("k"), 512L, 8192L).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val probed = (0L until 512L).toDF("k") // LongType probe side
      .filter(dsl.bloom_contains(lit(sketch), col("k"))).count()
    assert(probed == 512L, "decimal-built sketch must accept integer probes")
  }

  test("bloom_agg over zero rows yields NULL (the pruned-to-empty contract)") {
    Engine.register(spark)
    import spark.implicits._
    val bf = Seq.empty[Long].toDF("k")
      .agg(dsl.bloom_agg(col("k"), 16L, 128L).as("bf")).head()
    // qBloomPrune maps this to a constant-false prefilter
    assert(bf.isNullAt(0))
  }

  test("q_bloom_prune equals the plain semi-join aggregate") {
    val withBloom = RelationalQueries.qBloomPrune(spark, dir).collect()
    val urgent = Engine.table(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val plain = Engine.table(spark, dir, "lineitem")
      .join(urgent, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(floor(col("l_extendedprice") * 100).cast("long")).as("sum_cents"))
      .orderBy("l_returnflag")
      .collect()
    assert(withBloom.toSeq == plain.toSeq)
  }

  test("the bloom prefilter prunes the fact scan before the verify join") {
    Engine.register(spark)
    val urgent = Engine.table(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val sketch = urgent
      .agg(dsl.bloom_agg(col("o_orderkey"), 65536L, 524288L).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val li = Engine.table(spark, dir, "lineitem")
    val total = li.count()
    val exact = li.join(urgent, col("l_orderkey") === col("o_orderkey"),
      "left_semi").count()
    val pruned =
      li.filter(dsl.bloom_contains(lit(sketch), col("l_orderkey"))).count()
    assert(pruned >= exact, "bloom dropped a true match")
    // pruning is the point: the prefilter output must sit near the
    // exact match count, far below the full scan (URGENT ≈ 20%)
    assert(pruned < total / 2, s"no pruning: $pruned of $total")
    assert(pruned - exact <= total / 50, s"FP overrun: $pruned vs $exact")
  }
}
