package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `sorted_inter_count(a, b)`: exact intersection size of two SORTED,
  * duplicate-free string arrays, as a native codegen'd merge walk.
  *
  * The declarative equivalent — `size(array_intersect(a, b))` — builds
  * a hash set and an output array PER ROW; on the MinHash verification
  * path that is millions of candidate rows each allocating set + array
  * for a result that is immediately reduced to one integer, and that
  * transient garbage made the verification stage the measured variance
  * center of the whole bench (2.7–17s run-to-run on identical input).
  * The merge walk allocates nothing: two cursors, byte-wise
  * `UTF8String.compareTo` — the same binary ordering `sort_array`
  * produces, which is what makes the single forward pass exact.
  *
  * Inputs MUST be sorted ascending and duplicate-free (the producer
  * here is `sort_array(array_distinct(...))`); this is a verification
  * primitive, not a general set function — `array_intersect` remains
  * the right call for unsorted data. Null arrays propagate NULL;
  * null ELEMENTS are rejected by the type check (sorted word sets
  * never contain them, and silently skipping them would miscount).
  */
case class SortedInterCount(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, false), ArrayType(StringType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "sorted_inter_count requires null-free array<string> arguments " +
            "(elements must be sorted and non-null)")
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"sorted_inter_count requires array<string> arguments, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedInterCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  /** Generates a bare static call — the expression stays inside the
    * surrounding whole-stage-codegen span (no interpreted fallback on
    * the hot verification loop).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedInterCount.count($a, $b)")

  override def prettyName: String = "sorted_inter_count"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedInterCount =
    copy(left = newLeft, right = newRight)
}

object SortedInterCount {
  /** Merge-count over two sorted duplicate-free arrays. Static and
    * JVM-boxing-free so generated code can call it directly.
    */
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }
}
