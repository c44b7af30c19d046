package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine

/** Source/sink surface in the hard signal: the reference ran on
  * host-engine tables (Impala's scanners); the Spark engine must read
  * and write every mainstream format losslessly. This query WRITES the
  * nation table through each non-parquet sink (csv with header, json
  * lines, orc), reads each back through the matching source, and
  * aggregates — the oracle computes the same aggregate straight from
  * the parquet fixture, so any loss or coercion in a round trip breaks
  * the hash. (Parquet round-trips plus partitioned writes and
  * partition pruning are covered by SourceSinkSpec.)
  */
object SourceQueries {

  def qSinkRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val nation = Engine.table(spark, dir, "nation")
    val base = Files.createTempDirectory("graft_rt").toString
    val parts = Seq("csv", "json", "orc").map { fmt =>
      val p = s"$base/$fmt"
      fmt match {
        // escape = '"' (RFC 4180 quote-doubling) on BOTH sides, and
        // multiLine on the read: the writer quotes values with embedded
        // newlines correctly, but a default read would split them into
        // spurious rows — the round-trip contract must hold for any
        // string value, not just newline-free fixtures
        case "csv" => nation.write.mode("overwrite")
          .option("header", "true").option("escape", "\"").csv(p)
        case "json" => nation.write.mode("overwrite").json(p)
        case "orc" => nation.write.mode("overwrite").orc(p)
      }
      val back = fmt match {
        case "csv" => spark.read.option("header", "true")
          .option("multiLine", "true").option("escape", "\"")
          .schema(nation.schema).csv(p)
        case "json" => spark.read.schema(nation.schema).json(p)
        case "orc" => spark.read.orc(p)
      }
      back.agg(
          count(lit(1)).as("n"),
          sum(col("n_nationkey")).cast("long").as("key_sum"),
          min(col("n_name")).as("first_name"),
          max(col("n_name")).as("last_name"))
        .select(lit(fmt).as("fmt"), col("n"), col("key_sum"),
          col("first_name"), col("last_name"))
    }
    // materialize (3 rows) so the temp write directory can be deleted
    // immediately instead of leaking one tree per invocation — in a
    // finally, so a failed collect doesn't leak it either
    val out = parts.reduce(_ unionByName _).orderBy("fmt")
    try {
      val rows = out.collect()
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
    } finally graft.Fs.deleteRecursively(base)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sink_roundtrip" -> (qSinkRoundtrip _)
  )

  val oracles: Map[String, String] = Map(
    "q_sink_roundtrip" ->
      """SELECT fmt, count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
        |       min(n_name) AS first_name, max(n_name) AS last_name
        |FROM nation CROSS JOIN (SELECT unnest(['csv','json','orc']) AS fmt) f
        |GROUP BY fmt ORDER BY fmt""".stripMargin
  )
}
