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
}
