package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: time named queries (or all) with plans on demand.
  * `runMain graft.BenchOne [-explain] q1 q2 ...`
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val explain = args.contains("-explain")
    val names = args.filterNot(_.startsWith("-"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val picked =
      if (names.isEmpty) SparkEntry.queries else SparkEntry.queries.filter(kv => names.contains(kv._1))
    picked.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      if (explain) { println(s"=== $name ==="); df.explain("formatted") }
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save() // full evaluation
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$name%-20s $secs%8.2f s  (${df.count()} rows)")
    }
    spark.stop()
  }
}
