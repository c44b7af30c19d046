package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The z-order layout's reason to exist, measured: under a conjunctive
  * (user-range AND hour-range) predicate, a z-sorted file layout must
  * localize matches to FEWER files than the natural time-ordered
  * ingest layout, whose files all contain every active user. Also
  * pins the Morton code's arithmetic properties the oracle relies on.
  */
class ZorderSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val NFiles = 8

  test("morton code: bijective on the 8-bit grid, box-local on ranges") {
    val rows = spark.sql(
      s"""SELECT x, y, ${SourceQueries.sparkMorton("x", "y")} AS z
         |FROM (SELECT id % 256 AS x, id div 256 AS y
         |      FROM range(${256 * 32}))""".stripMargin).collect()
    // injective: every (x, y) gets a distinct code
    assert(rows.map(_.getLong(2)).distinct.length == rows.length)
    // interleave identity: z of (x, 0) spreads x's bits to even positions
    rows.filter(_.getLong(1) == 0L).foreach { r =>
      val x = r.getLong(0)
      val z = r.getLong(2)
      (0 until 8).foreach { b =>
        assert(((z >> (2 * b)) & 1L) == ((x >> b) & 1L))
        assert(((z >> (2 * b + 1)) & 1L) == 0L)
      }
    }
  }

  test("z-order layout localizes a conjunctive predicate to fewer files") {
    val base = Files.createTempDirectory("graft_zorder").toString
    try {
      val coded = SourceQueries.zcodedEvents(spark, dir)
        .select("event_id", "ubucket", "hr", "zcode")
      // natural ingest layout: range-partitioned by event time proxy
      // (event_id follows ts order in the fixture) — what a streaming
      // ingest produces without a layout job
      coded.repartitionByRange(NFiles, col("event_id"))
        .write.mode("overwrite").parquet(s"$base/by_time")
      // layout job: one z-sorted range-partitioned rewrite
      coded.repartitionByRange(NFiles, col("zcode"))
        .write.mode("overwrite").parquet(s"$base/by_z")
      def filesWithMatches(path: String): Long =
        spark.read.parquet(path)
          // box inside the sf0.001 data range (user_id 0-14, hr 0-23)
          .filter(col("ubucket").between(4, 7) && col("hr").between(6, 11))
          .select(input_file_name()).distinct().count()
      val timeFiles = filesWithMatches(s"$base/by_time")
      val zFiles = filesWithMatches(s"$base/by_z")
      // the time layout spreads every user over all files; the z layout
      // confines the (user-range x hour-range) box
      assert(timeFiles == NFiles, s"expected all $NFiles time files hit")
      assert(zFiles < timeFiles, s"z-order did not localize: $zFiles")
    } finally graft.Fs.deleteRecursively(base)
  }

  test("q_zorder_write read-back pushes the conjunctive box into the scan") {
    val s = SourceQueries.qZorderWrite(spark, dir).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(s.contains("PushedFilters: ["), s)
    // both dimensions' bounds reach the parquet reader — file/row-group
    // min-max skipping (the z layout's payoff) happens below Spark
    Seq("GreaterThanOrEqual(ubucket,64)", "LessThanOrEqual(ubucket,127)",
      "GreaterThanOrEqual(hr,6)", "LessThanOrEqual(hr,11)").foreach(f =>
      assert(s.contains(f), s"missing pushed filter $f\n$s"))
  }
}
