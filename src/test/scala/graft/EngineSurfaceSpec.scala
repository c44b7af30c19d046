package graft

import org.apache.spark.sql.functions._

import graft.functions.dsl

/** The user-facing engine surface: Column DSL, SQL-over-views parity
  * with the reference's install DDL + SQL workflow, and streaming dedup
  * with watermarks (dropDuplicatesWithinWatermark over the event
  * stream — dedup's streaming form).
  */
class EngineSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("Column DSL: count300k/vec_dot/fnv64/vec_norm work without expr strings") {
    val li = Engine.table(spark, dir, "lineitem")
    val r = li.agg(
      dsl.count300k(col("l_returnflag")).as("flags"),
      dsl.fnv64(lit("costarring")).as("h")).collect()(0)
    assert(r.getString(0) == "3")
    assert(java.lang.Long.remainderUnsigned(r.getLong(1), 300000L) == 230045L)

    val e = Engine.table(spark, dir, "embeddings").limit(5)
      .withColumn("n", dsl.vec_norm(col("embedding")))
      .withColumn("self_cos",
        dsl.cosine(col("embedding"), col("n"), col("embedding"), col("n")))
      .collect()
    assert(e.forall(r => math.abs(r.getAs[Double]("self_cos") - 1.0) < 1e-9))

    val hh = li.agg(dsl.mg_topk(col("l_returnflag"), 8).as("hh"))
      .selectExpr("size(hh)", "hh[0].err").collect()(0)
    assert(hh.getInt(0) == 3 && hh.getLong(1) == 0L) // exact regime
  }

  test("SQL over registered views: the reference's query style end-to-end") {
    Engine.register(spark)
    Engine.registerTables(spark, dir)
    // the install-DDL-then-SQL workflow of README.md:26-33, Spark-side
    val rows = spark.sql(
      """SELECT l_returnflag, count300k(cast(l_partkey AS string)) AS parts,
        |       count300k(cast(l_suppkey AS string)) AS supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .collect()
    assert(rows.length == 3)
    assert(rows.forall(r => r.getString(1).toInt > 0 && r.getString(2).toInt > 0))
    // joins across views work too
    val n = spark.sql(
      """SELECT count(*) FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey""".stripMargin)
      .collect()(0).getLong(0)
    assert(n == Engine.table(spark, dir, "orders").count())
  }

  test("Engine.table is pure: events reads on an unwired session; ts is session-zone TIMESTAMP") {
    // A brand-new session needs no session-local confs to read any
    // fixture table — events' TIMESTAMP_NTZ micros column included.
    val unwired = spark.newSession()
    val events = Engine.table(unwired, dir, "events")
    assert(events.count() > 0)
    assert(events.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("streaming dedup: dropDuplicatesWithinWatermark drops replayed events") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val deduped = input.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = deduped.writeStream.format("memory").queryName("stream_dedup")
      .outputMode("append").start()
    try {
      input.addData((1L, ts(0)), (2L, ts(1)))
      q.processAllAvailable()
      input.addData((1L, ts(2)), (3L, ts(3))) // replay of event 1
      q.processAllAvailable()
      val ids = spark.table("stream_dedup").collect().map(_.getLong(0)).sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L), ids.toSeq.toString)
    } finally q.stop()
  }
}
