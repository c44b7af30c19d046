package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two-level cell walk behind q_median/q_quantiles must produce the
  * SAME global rank ranges as the naive one-window form — the fixture
  * oracle proves the fixture, this spec proves the decomposition on
  * shapes the fixture lacks: negative values, values straddling cell
  * boundaries, groups narrower than one cell, and widths that don't
  * divide the domain.
  */
class QuantileCellSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(String, Long, Long)]): Set[(String, Long, Long, Long, Long)] =
    rows.groupBy(_._1).flatMap { case (g, vs) =>
      val sorted = vs.sortBy(_._2)
      val n = sorted.map(_._3).sum
      var pos = 0L
      sorted.map { case (_, v, c) =>
        val lo = pos + 1; pos += c
        (g, v, lo, pos, n)
      }
    }.toSet

  private def walk(rows: Seq[(String, Long, Long)], width: Long) =
    RelationalQueries.rankedOverCells(
      rows.toDF("g", "v", "c"), Seq("g"), width)
      .select(col("g"), col("v"), col("lo"), col("hi"), col("n"))
      .as[(String, Long, Long, Long, Long)].collect().toSet

  test("matches the one-window ranking on a boundary-heavy hand case") {
    // cells of width 10: values at -11, -10, -1, 0, 9, 10, 11 hit every
    // boundary class; group "b" fits entirely inside one cell
    val rows = Seq(
      ("a", -11L, 2L), ("a", -10L, 1L), ("a", -1L, 3L), ("a", 0L, 1L),
      ("a", 9L, 4L), ("a", 10L, 1L), ("a", 11L, 2L),
      ("b", 3L, 5L), ("b", 4L, 1L))
    assert(walk(rows, 10) == brute(rows))
  }

  test("matches the one-window ranking on random count tables, any width") {
    val rnd = new scala.util.Random(42) // deterministic: no flap
    for (trial <- 1 to 5; width <- Seq(1L, 7L, 100L, 10000L)) {
      val rows = (1 to 200).map { _ =>
        (s"g${rnd.nextInt(3)}", rnd.between(-500L, 500L), 1L + rnd.nextInt(5))
      }.distinctBy(r => (r._1, r._2))
      assert(walk(rows, width) == brute(rows), s"trial=$trial width=$width")
    }
  }
}
