package graft.functions

import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** sorted_inter_count: interpreted eval, SQL/codegen parity with
  * `size(array_intersect(...))` on sorted distinct inputs (the contract
  * the MinHash verification path relies on), and null/type handling.
  */
class SortedInterCountSpec extends SparkSpec {

  private def arr(xs: String*): ArrayData =
    ArrayData.toArrayData(xs.toArray.map(UTF8String.fromString))

  private val e = SortedInterCount(
    BoundReference(0, ArrayType(StringType, containsNull = false), nullable = true),
    BoundReference(1, ArrayType(StringType, containsNull = false), nullable = true))

  test("interpreted eval: merge-count over sorted distinct arrays") {
    assert(e.eval(InternalRow(arr("a", "b", "d"), arr("b", "c", "d"))) == 2L)
    assert(e.eval(InternalRow(arr(), arr("a"))) == 0L)
    assert(e.eval(InternalRow(arr("a"), arr())) == 0L)
    assert(e.eval(InternalRow(arr("a", "b"), arr("a", "b"))) == 2L)
    assert(e.eval(InternalRow(null, arr("a"))) == null)
    assert(e.eval(InternalRow(arr("a"), null)) == null)
  }

  test("rejects nullable-element and non-string arrays at type check") {
    val nullable = SortedInterCount(
      BoundReference(0, ArrayType(StringType, containsNull = true), nullable = true),
      BoundReference(1, ArrayType(StringType, containsNull = false), nullable = true))
    assert(!nullable.checkInputDataTypes().isSuccess)
    val ints = SortedInterCount(
      BoundReference(0, ArrayType(IntegerType, containsNull = false), nullable = true),
      BoundReference(1, ArrayType(IntegerType, containsNull = false), nullable = true))
    assert(!ints.checkInputDataTypes().isSuccess)
    assert(e.checkInputDataTypes().isSuccess)
  }

  test("SQL/codegen path matches size(array_intersect) on sorted distinct input") {
    import spark.implicits._
    // word-set shape: sorted_distinct(split(...)) — exactly the
    // producer the dedup pipeline uses
    val df = Seq(
      "the quick brown fox", "the quick red fox", "lorem ipsum dolor",
      "a b c d e", "e d c b a", "x", "")
      .toDF("text")
      .selectExpr("sort_array(array_distinct(split(text, ' '))) AS ws")
    val pairs = df.as("l").crossJoin(df.as("r"))
      .select(
        expr("sorted_inter_count(l.ws, r.ws)").as("merge_n"),
        expr("size(array_intersect(l.ws, r.ws))").cast("long").as("builtin_n"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(r.getLong(0) == r.getLong(1), r))
  }

  test("property: equals size(intersect) for random sorted distinct string sets") {
    val word = Gen.oneOf("a", "b", "c", "dd", "ee", "ff", "ggg", "", "zz", "yy")
    val set = Gen.listOf(word).map(_.distinct.sorted)
    (0 until 200).foreach { i =>
      val xs = set(Gen.Parameters.default.withSize(1 + i % 20), Seed(i.toLong)).getOrElse(Nil)
      val ys = set(Gen.Parameters.default.withSize(1 + (i * 7) % 20), Seed(1000L + i)).getOrElse(Nil)
      val expected = xs.toSet.intersect(ys.toSet).size.toLong
      assert(e.eval(InternalRow(arr(xs: _*), arr(ys: _*))) == expected, s"$xs vs $ys")
    }
  }

  // --- sorted_inter_atleast (threshold-gated, early-exit) ---------------

  private val eAtLeast = SortedInterAtLeast(
    BoundReference(0, ArrayType(StringType, containsNull = false), nullable = true),
    BoundReference(1, ArrayType(StringType, containsNull = false), nullable = true),
    9, 10)

  test("atleast: exact count at/above threshold, -1 below, nulls propagate") {
    // identical sets: J = 1 >= 0.9 -> exact count
    assert(eAtLeast.eval(InternalRow(arr("a", "b"), arr("a", "b"))) == 2L)
    // 2 of 3 shared: J = 2/4 < 0.9 -> -1
    assert(eAtLeast.eval(InternalRow(arr("a", "b", "d"), arr("b", "c", "d"))) == -1L)
    // both empty: union = 0, 0*10 >= 0*9 holds -> 0 (matches the old
    // filter's vacuous-truth on empty sets)
    assert(eAtLeast.eval(InternalRow(arr(), arr())) == 0L)
    // one empty: J = 0 -> -1
    assert(eAtLeast.eval(InternalRow(arr(), arr("a"))) == -1L)
    assert(eAtLeast.eval(InternalRow(null, arr("a"))) == null)
    assert(eAtLeast.eval(InternalRow(arr("a"), null)) == null)
  }

  test("atleast: length-ratio cut fires before any element compare") {
    // 10*min < 9*max -> impossible regardless of content; sizes 9 vs 11
    val small = (1 to 9).map(i => f"w$i%02d")
    val big = (1 to 11).map(i => f"w$i%02d")
    assert(eAtLeast.eval(InternalRow(arr(small: _*), arr(big: _*))) == -1L)
  }

  test("atleast: property — sign and value agree with the exact filter") {
    val word = Gen.oneOf("a", "b", "c", "dd", "ee", "ff", "ggg", "", "zz", "yy",
      "m", "n", "o", "p", "q")
    val set = Gen.listOf(word).map(_.distinct.sorted)
    (0 until 300).foreach { i =>
      val xs = set(Gen.Parameters.default.withSize(1 + i % 15), Seed(i.toLong)).getOrElse(Nil)
      val ys = set(Gen.Parameters.default.withSize(1 + (i * 3) % 15), Seed(2000L + i)).getOrElse(Nil)
      val inter = xs.toSet.intersect(ys.toSet).size.toLong
      val union = xs.size + ys.size - inter
      val expected = if (inter * 10 >= union * 9) inter else -1L
      assert(eAtLeast.eval(InternalRow(arr(xs: _*), arr(ys: _*))) == expected,
        s"$xs vs $ys")
    }
  }

  test("atleast: SQL path matches the unfiltered count + threshold filter") {
    import spark.implicits._
    val df = Seq(
      "the quick brown fox", "the quick brown fox jumps",
      "the quick brown fox jumps over", "lorem ipsum", "a b c d e f g h i j",
      "a b c d e f g h i k", "x", "")
      .toDF("text")
      .selectExpr("sort_array(array_distinct(split(text, ' '))) AS ws")
    val rows = df.as("l").crossJoin(df.as("r"))
      .select(
        expr("sorted_inter_atleast(l.ws, r.ws, 9, 10)").as("gated"),
        expr("sorted_inter_count(l.ws, r.ws)").as("n"),
        (expr("size(l.ws)") + expr("size(r.ws)")).cast("long").as("sz"))
      .collect()
    assert(rows.nonEmpty)
    var pass = 0
    rows.foreach { r =>
      val expected =
        if (r.getLong(1) * 10 >= (r.getLong(2) - r.getLong(1)) * 9) r.getLong(1)
        else -1L
      assert(r.getLong(0) == expected, r)
      if (r.getLong(0) >= 0) pass += 1
    }
    // the fixture must exercise BOTH outcomes
    assert(pass > 0 && pass < rows.length)
  }

  test("atleast: non-literal threshold arguments are rejected") {
    import spark.implicits._
    val df = Seq(("x", 9)).toDF("text", "k")
      .selectExpr("sort_array(array_distinct(split(text, ' '))) AS ws", "k")
    val err = intercept[Exception] {
      df.selectExpr("sorted_inter_atleast(ws, ws, k, 10)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal"))
  }
}
