package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Every SparkEntry.queries entry must execute end-to-end on the sf0.001
  * fixtures (the driver's smoke scale). DuckDB-oracle value equality is
  * the driver's job; this suite guards execution + cheap invariants.
  */
class QueriesSmokeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name executes at sf0.001") {
      val df = fn(spark, dir)
      val n = df.count()
      assert(n >= 0)
      assert(df.columns.nonEmpty)
    }
  }

  test("every query has an oracle") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // since round 4 the full surface is oracle-checked — keep it that way
    assert(noOracle.isEmpty, s"queries missing oracle SQL: $noOracle")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q_setops returns exactly the three set-operation rows") {
    val rows = RelationalQueries.qSetOps(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("a_except_b", "a_intersect_b", "a_union_b"))
  }

  test("q_array_funcs absent-element contract: value_pos is NULL iff the token is absent") {
    // the r14 regression shape: the Spark side mapped absent→NULL while
    // the oracle kept DuckDB's 0 — both engines natively return 0 for
    // absent (measured on DuckDB 1.0.0), and the shared contract is
    // NULLIF(pos, 0) on BOTH sides. Guard the Spark half here: a doc
    // lacking the token must read NULL, one containing it a 1-based
    // position — never 0, which would mean the NULLIF mapping fell off.
    val rows = RelationalQueries.qArrayFuncs(spark, dir).collect()
    assert(rows.nonEmpty)
    val docs = graft.Engine.table(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val has = docs(r.getLong(0)).split(" ").contains("value")
      val pos = if (r.isNullAt(5)) None else Some(r.getLong(5))
      assert(pos.isEmpty == !has,
        s"doc ${r.getLong(0)}: has=$has but value_pos=$pos")
      pos.foreach(p => assert(p >= 1L, s"doc ${r.getLong(0)}: pos $p"))
    }
    // the fixture must exercise BOTH branches or this test proves nothing
    assert(rows.exists(_.isNullAt(5)) && rows.exists(!_.isNullAt(5)))
  }

  test("q_dedup_exact keeps every doc when no duplicates exist") {
    val docs = graft.Engine.table(spark, dir, "documents").count()
    assert(TextQueries.qDedupExact(spark, dir).count() == docs)
  }

  test("q_langid predictions are a partition of all docs") {
    val total = TextQueries.qLangId(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("n_docs")).head.getLong(0)
    assert(total == graft.Engine.table(spark, dir, "documents").count())
  }

  test("q_bpe_learn emits a strictly rank-ordered top-10 of pair counts") {
    val rows = TextQueries.qBpeLearn(spark, dir).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(2)).toSeq == (1L to 10L))
    // counts non-increasing in rank order; ties broken by pair asc
    rows.sliding(2).foreach { case Array(a, b) =>
      val ok = a.getLong(1) > b.getLong(1) ||
        (a.getLong(1) == b.getLong(1) && a.getString(0) < b.getString(0))
      assert(ok, s"rank order violated at ${b.getString(0)}")
    }
  }

  test("q_histogram buckets are equi-depth up to cell granularity") {
    val rows = ProfileQueries.qHistogram(spark, dir).collect()
    assert(rows.length == 10)
    val n = rows.map(_.getLong(1)).sum
    assert(n == graft.Engine.table(spark, dir, "lineitem").count())
    rows.foreach { r =>
      // the bucket function gives each bucket n/k rows +-1 exactly;
      // boundary cells are SPLIT across buckets, so depth is exact
      assert(math.abs(r.getLong(1) - n / 10) <= 1, s"bucket ${r.getLong(0)}")
    }
    // value ranges are non-decreasing across buckets; a boundary cell
    // split across buckets gives equality, never inversion
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= b.getLong(2) && a.getLong(2) <= b.getLong(2))
    }
  }

  test("equi-depth walk is exact when the row count is NOT a bucket multiple") {
    import org.apache.spark.sql.functions._
    // ragged input: every fixture lineitem count is a multiple of 10,
    // which would mask a floor/ceiling error in the interval inversion
    val vals = graft.Engine.table(spark, dir, "lineitem")
      .filter(col("l_orderkey") % 7 === 0)
      .select(floor(col("l_extendedprice") / 10).cast("long").as("v"))
    val n = vals.count()
    assert(n % 10 != 0, s"filter must yield a ragged count, got $n")
    val walk = ProfileQueries.equiDepth(vals).collect()
    // row-level reference: bucket(p) = (p-1)*10 div n over sorted values
    val sorted = vals.collect().map(_.getLong(0)).sorted
    val ref = sorted.zipWithIndex
      .groupBy { case (_, i) => i.toLong * 10 / n }
      .toSeq.sortBy(_._1)
      .map { case (b, vs) =>
        (b, vs.length.toLong, vs.map(_._1).min, vs.map(_._1).max) }
    assert(walk.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq == ref)
  }

  test("q_funnel stages are monotone and match an independent replay") {
    import org.apache.spark.sql.functions._
    val rows = RelationalQueries.qFunnel(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("1_view", "2_click", "3_purchase"))
    val Array(nv, nc, np) = rows.map(_.getLong(1))
    assert(nv >= nc && nc >= np && np >= 0)
    // independent driver-side replay of the ordered-funnel definition
    val byUser = graft.Engine.table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1)
    val expected = byUser.values.foldLeft((0L, 0L, 0L)) { case ((v, c, p), evs) =>
      val tv = evs.filter(_._2 == "view").map(_._3).minOption
      val tc = tv.flatMap(t => evs.filter(e => e._2 == "click" && e._3 > t)
        .map(_._3).minOption)
      val tp = tc.flatMap(t => evs.filter(e => e._2 == "purchase" && e._3 > t)
        .map(_._3).minOption)
      (v + tv.size, c + tc.size, p + tp.size)
    }
    assert((nv, nc, np) == expected)
  }

  test("q_retention: offset-0 cells equal cohort sizes and bound later offsets") {
    import org.apache.spark.sql.functions._
    val rows = RelationalQueries.qRetention(spark, dir).collect()
    assert(rows.nonEmpty)
    val at0 = rows.filter(_.getLong(1) == 0L)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // signup week counts itself as activity, so offset 0 is the whole
    // cohort and no later week can exceed it
    rows.foreach { r =>
      assert(r.getLong(2) <= at0(r.getLong(0)), s"cohort ${r.getLong(0)}")
    }
    val expected = graft.Engine.table(spark, dir, "events")
      .filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(unix_micros(date_trunc("week", col("ts")))).as("c"))
      .groupBy(expr("c div 1000000").as("w")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(at0 == expected)
  }

  test("funnel order binds: out-of-order events do NOT convert") {
    // every fixture user converts at every stage, so ordered-vs-presence
    // bugs are invisible there; this synthetic corpus discriminates:
    //   user 1: view(10) click(20) purchase(30) → full conversion
    //   user 2: click(5) view(10) purchase(30)  → click BEFORE view: no
    //           click stage, hence no purchase stage (order, not presence)
    //   user 3: view(10) purchase(20)           → no click at all
    //   user 4: view(10) click(10)              → tie is NOT 'after': no click
    import spark.implicits._
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 5L), (2L, "view", 10L), (2L, "purchase", 30L),
      (3L, "view", 10L), (3L, "purchase", 20L),
      (4L, "view", 10L), (4L, "click", 10L)
    ).toDF("user_id", "event_type", "us")
    val rows = RelationalQueries.funnelOf(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("1_view") == (4L, 100L))
    assert(rows("2_click") == (1L, 25L), "presence-funnel would say 3")
    assert(rows("3_purchase") == (1L, 25L), "presence-funnel would say 3")
  }

  test("retention separates cohorts and offsets on multi-cohort events") {
    import spark.implicits._
    val wk = 7L * 86400 * 1000000 // one ISO week in microseconds
    // cohort A signs up week 0 (users 1, 2), cohort B week 1 (user 3);
    // user 1 returns weeks 1 and 3, user 2 never returns, user 3
    // returns week 2; user 1 also has PRE-signup activity (week -1
    // via raw activity row) that must not create a negative offset
    val ev = Seq(
      (1L, "signup", 0L), (1L, "click", wk), (1L, "view", 3 * wk),
      (2L, "signup", 0L),
      (3L, "signup", wk), (3L, "view", 2 * wk)
    ).toDF("user_id", "event_type", "wk_us")
    val cells = RelationalQueries.retentionOf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val aSec = 0L
    val bSec = wk / 1000000
    assert(cells == Map(
      (aSec, 0L) -> 2L, // both A users active in signup week
      (aSec, 1L) -> 1L, (aSec, 3L) -> 1L, // only user 1 returns
      (bSec, 0L) -> 1L, (bSec, 1L) -> 1L)) // user 3: signup then week 2
  }

  test("q_incremental_dedup finds exactly the injected duplicates") {
    import org.apache.spark.sql.functions._
    val docs = graft.Engine.table(spark, dir, "documents")
    // injected dups: incoming (odd) docs with doc_id % 10 == 1; the
    // fixture has no natural exact duplicates (q_dedup_exact invariant)
    val expected = docs.filter(col("doc_id") % 10 === 1)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = DedupQueries.qIncrementalDedup(spark, dir).collect()
    rows.foreach { r =>
      val src = r.getString(0)
      assert(r.getLong(2) == expected.getOrElse(src, 0L), s"n_dup for $src")
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3), s"census sums $src")
    }
  }
}
