package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/codegen/scheduler warm-up so the first measured query isn't
    // charged for session infrastructure (startup still ~6s before this)
    spark.range(1000000).selectExpr("count(distinct id % 100)").collect()
    // Deterministic name order: Map iteration order shifts whenever a
    // query is added, which changes each query's JVM/GC neighborhood
    // and makes rounds incomparable. The GC below levels heap state so
    // each query is benched standalone, not charged for its
    // predecessor's garbage.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      System.gc()
      val t0 = System.nanoTime()
      // noop sink forces full evaluation of every output column —
      // count() would let Spark skip projected expressions entirely
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
        }
      val secs = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // queries are benched standalone
      // a failed query records -1.0, never its wall time — a broken
      // query must be visible in the emitted JSON, not look fast
      name -> (if (err.isEmpty) secs else -1.0, err)
    }
    val qs = results.map { case (k, (v, _)) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // results is an ordered Seq of pairs now
    def values = results.map(_._2)
    def jstr(s: String): String =
      "\"" + s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => " "; case c => c.toString } + "\""
    val errs = results.collect { case (k, (_, Some(e))) => s"\"" + k + "\":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = values.collect { case (v, None) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
