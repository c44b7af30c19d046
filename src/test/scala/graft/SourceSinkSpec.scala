package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink breadth (SURVEY §2.2 "scans/sources" + "sinks/writes"):
  * the host engine read HDFS tables; graft reads/writes parquet, csv,
  * json and orc through the same DataFrame surface, losslessly for the
  * fixture schemas.
  */
class SourceSinkSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft_io_").toString
  private lazy val sample = Engine
    .table(spark, "/root/testdata/sf0.001", "lineitem")
    .limit(200)
    .cache()

  private def roundTrip(fmt: String): Unit = {
    val path = s"$tmp/$fmt"
    val writer = sample.write.mode("overwrite")
    (if (fmt == "csv") writer.option("header", "true") else writer)
      .format(fmt).save(path)
    val reader = spark.read
    val back = (fmt match {
      case "csv" => reader.option("header", "true").schema(sample.schema).format(fmt)
      case "json" => reader.schema(sample.schema).format(fmt)
      case _ => reader.format(fmt)
    }).load(path)
    assert(back.count() == 200)
    // exact content equality both directions
    assert(back.exceptAll(sample).isEmpty && sample.exceptAll(back).isEmpty,
      s"$fmt round-trip lost or altered rows")
  }

  for (fmt <- Seq("parquet", "orc", "json", "csv")) {
    test(s"$fmt round-trip preserves data exactly") { roundTrip(fmt) }
  }

  test("partitioned parquet write prunes partitions on read") {
    val path = s"$tmp/partitioned"
    sample.write.mode("overwrite").partitionBy("l_returnflag").parquet(path)
    val one = spark.read.parquet(path).filter(col("l_returnflag") === "R")
    val s = one.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // partition filter must reach the scan, not a post-scan Filter
    assert(s.contains("PartitionFilters") && s.contains("l_returnflag"), s)
    assert(one.count() == sample.filter(col("l_returnflag") === "R").count())
  }
}
