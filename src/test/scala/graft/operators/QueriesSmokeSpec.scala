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

  test("q_dedup_exact keeps every doc when no duplicates exist") {
    val docs = graft.Engine.table(spark, dir, "documents").count()
    assert(TextQueries.qDedupExact(spark, dir).count() == docs)
  }

  test("q_langid predictions are a partition of all docs") {
    val total = TextQueries.qLangId(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("n_docs")).head.getLong(0)
    assert(total == graft.Engine.table(spark, dir, "documents").count())
  }
}
