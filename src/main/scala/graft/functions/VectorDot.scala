package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `vec_dot(a, b)`: sequential-order double-precision dot product of two
  * float/double arrays, as a native codegen'd Catalyst expression.
  *
  * The declarative equivalent —
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)` —
  * materializes an intermediate array and runs lambda plumbing per
  * element; this expression compiles to a bare fused multiply-add loop
  * inside whole-stage codegen, which matters when the operator above it
  * is an O(Q·N) similarity join over 100-TB-scale embedding tables.
  * Summation order (ascending index) matches the HOF form and the
  * DuckDB oracle, keeping cross-engine ranks stable.
  *
  * Mirrors the reference's one performance instinct — hand-written tight
  * loop over the hot path (`/root/reference/hashset-count.cc:49-59`) —
  * expressed the Spark-native way (codegen, not a UDF).
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => other
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _))
          if Seq(l, r).forall(t => t == FloatType || t == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"vec_dot requires array<float|double> arguments, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val getL =
        if (elemType(left) == FloatType) s"(double) $a.getFloat($i)"
        else s"$a.getDouble($i)"
      val getR =
        if (elemType(right) == FloatType) s"(double) $b.getFloat($i)"
        else s"$b.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $getL * $getR;
         |}
       """.stripMargin
    })

  override def prettyName: String = "vec_dot"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}
