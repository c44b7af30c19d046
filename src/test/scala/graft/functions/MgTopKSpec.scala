package graft.functions

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Misra–Gries `mg_topk`: exact-regime equality, error-regime
  * guarantees (presence + bounds — summary CONTENT under decrements
  * legitimately depends on merge order, so only the guarantees are
  * asserted there), partitioning robustness, and the SQL surface.
  */
class MgTopKSpec extends SparkSpec {

  import spark.implicits._

  /** true item frequencies of a deterministic skewed stream:
    * item_i appears freq(i) times.
    */
  private val skew: Seq[(String, Long)] =
    (0 until 40).map(i => (f"item_$i%02d", math.max(1L, 400L >> i)))

  private def skewDf(parts: Int) = {
    val rows = skew.flatMap { case (it, f) => Seq.fill(f.toInt)(it) }
    spark.createDataset(rows).toDF("item").repartition(parts)
  }

  test("exact regime: distinct <= k reproduces plain counts with err 0") {
    // restrict to 6 distinct items, k=8 — no decrement can ever fire
    val six = skewDf(4).filter(col("item") < "item_06")
    val out = six.agg(expr("mg_topk(item, 8)").as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item"), col("h.est"), col("h.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = skew.take(6).toMap
    assert(out.length == 6)
    out.foreach { case (it, est, err) =>
      assert(est == expect(it), s"$it: est $est != exact ${expect(it)}")
      assert(err == 0L)
    }
    // deterministic best-first order: est desc, item asc
    assert(out.map(_._1).toSeq == expect.toSeq.sortBy { case (i, f) => (-f, i) }.map(_._1))
  }

  test("error regime: every reported item satisfies est <= true <= est + err") {
    val trueF = skew.toMap
    val n = skew.map(_._2).sum
    for (parts <- Seq(1, 3, 13)) {
      val out = skewDf(parts).agg(expr("mg_topk(item, 8)").as("hh"))
        .select(explode(col("hh")).as("h"))
        .select(col("h.item"), col("h.est"), col("h.err"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(out.nonEmpty && out.length <= 8)
      val err = out.head._3
      assert(err <= n / (8 + 1) + skew.length, // PODS'12 bound up to merge slack
        s"decrement depth $err implausibly large for n=$n")
      out.foreach { case (it, est, e) =>
        val t = trueF(it)
        assert(est <= t && t <= est + e, s"$it: est=$est err=$e true=$t (parts=$parts)")
      }
      // presence guarantee: anything with true freq > err is in the summary
      val present = out.map(_._1).toSet
      trueF.filter(_._2 > err).keys.foreach { it =>
        assert(present(it), s"heavy item $it (f=${trueF(it)}) missing at parts=$parts")
      }
    }
  }

  test("top-1 on dominant skew is recovered regardless of partitioning") {
    for (parts <- Seq(1, 7)) {
      val top = skewDf(parts).agg(expr("mg_topk(item, 4)").as("hh"))
        .select(element_at(col("hh"), 1).getField("item")).as[String].head()
      assert(top == "item_00") // 400 occurrences, next is 200
    }
  }

  test("NULLs are skipped; empty group yields an empty summary") {
    val out = Seq[(java.lang.Long, String)]((1L, null), (2L, null))
      .toDF("id", "item")
      .agg(expr("mg_topk(item, 4)").as("hh"))
      .select(size(col("hh"))).as[Int].head()
    assert(out == 0)
  }

  test("non-string items coerce through CAST like count300k") {
    val out = spark.range(100)
      .agg(expr("mg_topk(id % 3, 8)").as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item"), col("h.est"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out == Map("0" -> 34L, "1" -> 33L, "2" -> 33L))
  }

  test("type checks: k must be a positive integral literal within the state cap") {
    def fails(sql: String): Unit = {
      val e = intercept[Exception](
        spark.range(1).selectExpr("cast(id as string) AS s")
          .agg(expr(sql)).collect())
      assert(e.getMessage != null)
    }
    fails("mg_topk(s, 0)")
    fails("mg_topk(s, -3)")
    fails("mg_topk(s, 'x')")
    fails("mg_topk(s, 2000000)") // summary-state cap
    fails("mg_topk(s, id)")      // non-foldable
  }

  test("mg_topk state survives the streaming state store across micro-batches") {
    // the q_stream_hitters contract in miniature: the MG summary must
    // round-trip streaming-aggregation state between micro-batches
    // (restore → merge → save); k=4 > 2 distinct items keeps the
    // exact regime, so cross-batch counts must be plain exact counts
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val agg = input.toDF().toDF("ts", "v")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(expr("mg_topk(v, 4)").as("hh"))
      .select(col("w.start").as("ws"), explode(col("hh")).as("h"))
      .select(col("ws"), col("h.item").as("item"),
        col("h.est").as("est"), col("h.err").as("err"))
    val q = agg.writeStream.format("memory").queryName("stream_hitters")
      .outputMode("complete").start()
    try {
      input.addData((ts(10, 0), "a"), (ts(10, 10), "b"), (ts(10, 15), "a"))
      q.processAllAvailable()
      input.addData((ts(10, 20), "a"), (ts(10, 30), "b"), (ts(10, 40), "a"))
      q.processAllAvailable()
      val rows = spark.table("stream_hitters").orderBy("ws", "item").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
      assert(rows.toSeq == Seq(
        (ts(10, 0), "a", 4L, 0L), // counts accumulate across the batches
        (ts(10, 0), "b", 2L, 0L)))
    } finally q.stop()
  }

  test("summary add/merge unit semantics: batch decrement matches classic MG") {
    val s = new MisraGriesTopK.Summary
    def u(it: String, c: Long = 1L) =
      s.add(org.apache.spark.unsafe.types.UTF8String.fromString(it), c, 2)
    u("a"); u("a"); u("b") // full at k=2: a=2 b=1
    u("c")                 // overflow: cut = min(2,1,1) = 1 → a=1, b,c dead
    assert(s.err == 1L)
    assert(s.counts.keySet.map(_.toString) == Set("a"))
    assert(s.counts.values.toSeq == Seq(1L))
    // merge combine: other summary {d=5, e=2}, err 3
    val o = new MisraGriesTopK.Summary
    o.err = 3L
    o.add(org.apache.spark.unsafe.types.UTF8String.fromString("d"), 5L, 2)
    o.add(org.apache.spark.unsafe.types.UTF8String.fromString("e"), 2L, 2)
    o.counts.foreach { case (it, c) => s.add(it, c, 2) }
    s.err += o.err
    // pointwise sum {a=1,d=5,e=2} → cut = 3rd largest = 1 → {d=4,e=1}, err 1+3+1
    assert(s.err == 5L)
    assert(s.counts.map { case (k, v) => k.toString -> v } ==
      Map("d" -> 4L, "e" -> 1L))
  }
}
