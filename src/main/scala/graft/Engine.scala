package graft

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession, functions => F}

import graft.functions.ExactCountDistinct

/** Session-level wiring for the graft engine: function registration and
  * fixture-table access. Registration is the Spark analogue of the
  * reference's `CREATE AGGREGATE FUNCTION ... LOCATION '...so'` DDL
  * (`/root/reference/README.md:28-33`) — jar on the classpath + runtime
  * `spark.udf.register` instead of a shared library on HDFS.
  */
object Engine {

  /** Idempotently register graft's SQL function surface on a session. */
  def register(spark: SparkSession): SparkSession = synchronized {
    // Exact multi-instance distinct count (the reference's one operator).
    spark.udf.register("count300k", F.udaf(ExactCountDistinct, Encoders.STRING))
    spark
  }

  /** Load one fixture table (TESTDATA.md layout: `<dir>/<name>.parquet`). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
