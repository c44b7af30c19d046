package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

import graft.SparkSpec

/** vec_dot: interpreted eval, SQL/codegen path, null handling, and
  * equivalence with the declarative HOF formulation it replaces.
  */
class VectorDotSpec extends SparkSpec {

  private def arr(xs: Double*): ArrayData = ArrayData.toArrayData(xs.toArray)
  private def farr(xs: Float*): ArrayData = ArrayData.toArrayData(xs.toArray)

  test("interpreted eval: double arrays") {
    val e = VectorDot(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      BoundReference(1, ArrayType(DoubleType), nullable = true))
    assert(e.eval(InternalRow(arr(1, 2, 3), arr(4, 5, 6))) == 32.0)
    assert(e.eval(InternalRow(arr(), arr())) == 0.0)
    assert(e.eval(InternalRow(null, arr(1.0))) == null)
  }

  test("interpreted eval: float arrays promote to double") {
    val e = VectorDot(
      BoundReference(0, ArrayType(FloatType), nullable = true),
      BoundReference(1, ArrayType(FloatType), nullable = true))
    assert(e.eval(InternalRow(farr(1f, 2f), farr(3f, 4f))) == 11.0)
  }

  test("length mismatch and element nulls yield NULL, like the HOF form") {
    val e = VectorDot(
      BoundReference(0, ArrayType(DoubleType), nullable = true),
      BoundReference(1, ArrayType(DoubleType), nullable = true))
    assert(e.eval(InternalRow(arr(1, 2, 3), arr(4, 5))) == null)
    assert(e.eval(InternalRow(
      ArrayData.toArrayData(Array[Any](1.0, null, 3.0)), arr(4, 5, 6))) == null)
    assert(e.nullable)
  }

  test("SQL path returns NULL on length mismatch and null elements") {
    import spark.implicits._
    Seq(
      (Array[java.lang.Float](1f, 2f), Array[java.lang.Float](1f)),
      (Array[java.lang.Float](1f, null), Array[java.lang.Float](1f, 2f)),
      (Array[java.lang.Float](1f, 2f), Array[java.lang.Float](3f, 4f))
    ).toDF("a", "b").createOrReplaceTempView("t_vec_null")
    val got = spark.sql("SELECT vec_dot(a, b) FROM t_vec_null").collect()
    assert(got(0).isNullAt(0) && got(1).isNullAt(0))
    assert(got(2).getDouble(0) == 11.0)
  }

  test("type check rejects non-numeric-array inputs") {
    val bad = VectorDot(
      Literal.create("x", StringType),
      Literal.create("y", StringType))
    assert(!bad.checkInputDataTypes().isSuccess)
  }

  test("SQL path (codegen) matches interpreted result") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(0.5f, 0.25f, 2.0f)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))
    ).toDF("a", "b")
    df.createOrReplaceTempView("t_vec")
    val got = spark.sql("SELECT vec_dot(a, b) FROM t_vec").collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(0.5 + 0.5 + 6.0, 0.0))
  }

  test("matches the declarative HOF formulation on fixture embeddings") {
    val e = graft.Engine.table(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(50)
    val both = e.selectExpr(
      "vec_dot(embedding, embedding) AS fast",
      "aggregate(zip_with(embedding, embedding, (x, y) -> cast(x AS double) * cast(y AS double)), 0D, (acc, v) -> acc + v) AS slow")
      .collect()
    assert(both.nonEmpty)
    // identical summation order => bitwise-equal doubles
    assert(both.forall(r => r.getDouble(0) == r.getDouble(1)))
  }
}
