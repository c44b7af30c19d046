package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions deployment path: a session built with only
  * the config (no Engine.register call) must expose graft's functions.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions-configured session resolves every injected function") {
    val shared = SparkSpec.session // materialize the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // .withExtensions is the same injection hook the static
      // spark.sql.extensions=graft.GraftExtensions conf invokes on a
      // fresh cluster; a shared-JVM test can only exercise the API form
      val s = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions()(_))
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = s.sql(
        """SELECT count300k(cast(id % 5 AS string)) AS c,
          |       vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d
          |FROM range(100)""".stripMargin).collect()(0)
      assert(r.getString(0) == "5")
      assert(r.getDouble(1) == 11.0)
      val r2 = s.sql(
        """SELECT fnv64('chars') AS h,
          |       size(fnv_grams('abcdefgh', 3)) AS ng,
          |       sliding_min(fnv_grams('abcdefgh', 3), 2) AS mins,
          |       topk_agg(cast(id AS double), id, 2) AS tk,
          |       sorted_inter_count(array('a','b','d'), array('b','c','d')) AS ic
          |FROM range(10)""".stripMargin).collect()(0)
      assert(r2.getInt(1) == 6) // 8 chars -> 6 3-grams
      assert(r2.getSeq[Long](2).length == 5) // 6 grams -> 5 windows of 2
      assert(r2.getSeq[AnyRef](3).length == 2)
      assert(r2.getLong(4) == 2L)
      // sketch-column + runtime-filter surfaces injected too: both
      // halves carry all 7 residues, and every inserted key probes true
      val flat = s.sql(
        """SELECT sketch_count(sketch_merge(sk)) AS n
          |FROM (SELECT sketch_agg(cast(id % 7 AS string)) AS sk
          |      FROM range(100) GROUP BY id % 2)""".stripMargin).collect()(0)
      assert(flat.getString(0) == "7")
      val hh = s.sql(
        """SELECT mg_topk(cast(id % 3 AS string), 8) AS hh
          |FROM range(90)""".stripMargin).collect()(0)
      assert(hh.getSeq[AnyRef](0).length == 3) // exact regime: 3 items
      val bloomHit = s.sql(
        """SELECT count(*) FROM range(100)
          |WHERE bloom_contains(
          |  (SELECT bloom_agg(id, 100, 4096) FROM range(100)), id)""".stripMargin)
        .collect()(0)
      assert(bloomHit.getLong(0) == 100L) // no false negatives
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
