package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** topk_agg: bounded-buffer semantics (never more than k retained),
  * deterministic tie-breaks, wire-format round-trip, merge = re-bounded
  * union, and SQL-path equality with the window-function formulation.
  */
class TopKAggSpec extends SparkSpec {

  private def agg(k: Int) = TopKAgg(
    BoundReference(0, DoubleType, nullable = true),
    BoundReference(1, LongType, nullable = true),
    Literal(k))

  private def drain(a: TopKAgg, rows: Seq[(java.lang.Double, java.lang.Long)]) = {
    val buf = rows.foldLeft(a.createAggregationBuffer()) { (b, r) =>
      a.update(b, InternalRow(r._1, r._2))
    }
    a.eval(buf).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .array.map { r =>
        val row = r.asInstanceOf[InternalRow]
        (row.getDouble(0), row.getLong(1))
      }.toSeq
  }

  test("keeps the k best by (score desc, payload asc) and skips nulls") {
    val a = agg(3)
    val out = drain(a, Seq(
      (1.0, 10L), (5.0, 20L), (null, 30L), (3.0, null),
      (5.0, 15L), (2.0, 40L), (4.0, 50L)))
    // ties at 5.0 resolve to the lower payload first
    assert(out == Seq((5.0, 15L), (5.0, 20L), (4.0, 50L)))
  }

  test("buffer never exceeds k elements during update") {
    val a = agg(2)
    var buf = a.createAggregationBuffer()
    (1 to 100).foreach { i =>
      buf = a.update(buf, InternalRow(i.toDouble, i.toLong))
      assert(buf.size <= 2)
    }
    assert(buf.toList.map(_._1).sorted == List(99.0, 100.0))
  }

  test("serialize/deserialize round-trips and merge re-bounds the union") {
    val a = agg(3)
    val b1 = Seq((9.0, 1L), (7.0, 2L), (5.0, 3L))
      .foldLeft(a.createAggregationBuffer())((b, r) => a.update(b, InternalRow(r._1, r._2)))
    val b2 = Seq((8.0, 4L), (6.0, 5L), (4.0, 6L))
      .foldLeft(a.createAggregationBuffer())((b, r) => a.update(b, InternalRow(r._1, r._2)))
    val restored = a.deserialize(a.serialize(b2))
    val merged = a.merge(b1, restored)
    assert(merged.size == 3)
    assert(merged.toList.sortBy(-_._1) == List((9.0, 1L), (8.0, 4L), (7.0, 2L)))
  }

  test("k outside [1, Int.MaxValue] fails type-check instead of truncating") {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    def check(k: Long): TypeCheckResult = TopKAgg(
      BoundReference(0, DoubleType, nullable = true),
      BoundReference(1, LongType, nullable = true),
      Literal(k)).checkInputDataTypes()
    // 2^32 + 1 truncates to 1 via intValue() — must be rejected, not
    // silently run with k=1
    assert(!check(4294967297L).isSuccess)
    assert(!check(0L).isSuccess)
    assert(!check(-3L).isSuccess)
    assert(check(5L).isSuccess)
  }

  test("SQL path equals the row_number window formulation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val orders = graft.Engine.table(spark, "/root/testdata/sf0.001", "orders")
    val viaAgg = graft.operators.RelationalQueries
      .qTopKAgg(spark, "/root/testdata/sf0.001").collect().toSeq
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .select(col("o_orderpriority"),
        row_number().over(w).cast("long").as("rk"),
        col("o_orderkey"), col("o_totalprice"))
      .filter(col("rk") <= 5)
      .orderBy("o_orderpriority", "rk").collect().toSeq
    assert(viaAgg == viaWindow)
  }

  private val genPairs: Gen[List[(Double, Long)]] = Gen.listOf(
    for {
      s <- Gen.chooseNum(-5.0, 5.0)
      p <- Gen.chooseNum(0L, 30L)
    } yield (s, p))

  private def samples(n: Int): Seq[List[(Double, Long)]] =
    (1 to n).flatMap { i =>
      genPairs(Gen.Parameters.default.withSize(1 + i % 50), Seed(i.toLong)).toSeq
    }

  test("property: partition-invariance — any split merges to the window-ranked result") {
    for (xs <- samples(150); k <- Seq(1, 2, 5)) {
      val ag = agg(k)
      // reference semantics: rank all rows by (score desc, payload asc)
      // and take k — duplicate (s, p) rows are independent rows, in the
      // heap exactly as in row_number's input
      val expected = xs.sortBy { case (s, p) => (-s, p) }.take(k)
      for (splits <- Seq(1, 2, 3)) {
        val parts =
          if (xs.isEmpty) List(Nil)
          else xs.grouped(math.max(1, (xs.size + splits - 1) / splits)).toList
        val bufs = parts.map(p =>
          p.foldLeft(ag.createAggregationBuffer()) { (b, r) =>
            ag.update(b, InternalRow(r._1, r._2))
          })
        val merged = bufs.foldLeft(ag.createAggregationBuffer())(ag.merge)
        val got = ag.eval(merged)
          .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
          .array.map { r =>
            val row = r.asInstanceOf[InternalRow]
            (row.getDouble(0), row.getLong(1))
          }.toSeq
        assert(got == expected, s"input=$xs k=$k splits=$splits")
      }
    }
  }

  test("sort-based fallback path yields identical results (spill robustness)") {
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val saved = spark.conf.getOption(key)
    val sql =
      """SELECT g, topk_agg(s, p, 3) AS tk FROM (
        |  SELECT id % 20 AS g, cast(id % 97 AS double) AS s, id AS p
        |  FROM range(50000)) GROUP BY g ORDER BY g""".stripMargin
    graft.Engine.register(spark)
    val hashed = spark.sql(sql).collect().map(_.toString).toSeq
    try {
      spark.conf.set(key, "2") // abandon hashing after 2 groups → sort path
      val sorted = spark.sql(sql).collect().map(_.toString).toSeq
      assert(sorted == hashed)
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("plans as a two-phase ObjectHashAggregate with bounded shuffle") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // own newSession(): toggling AQE on the suite-shared session races
    // with concurrently-running plan-assertion suites
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val p = graft.operators.RelationalQueries
      .qTopKAgg(s, "/root/testdata/sf0.001")
      .queryExecution.executedPlan
    def all(x: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      x +: x.children.flatMap(all)
    val objAggs = all(p).filter(_.nodeName.contains("ObjectHashAggregate"))
    assert(objAggs.size == 2, s"expected partial+final ObjectHashAggregate:\n$p")
    val shuffles = all(p).collect { case x: ShuffleExchangeExec => x }
    assert(shuffles.size <= 2, s"got ${shuffles.size} shuffles:\n$p")
  }
}
