package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions deployment path: a session built with only
  * the config (no Engine.register call) must expose graft's functions.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions-configured session resolves count300k and vec_dot") {
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
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
