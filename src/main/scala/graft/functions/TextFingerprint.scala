package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `fnv_grams(text, k) -> array<bigint>`: the FNV-1a 64 hash
  * ([[Fnv1a64]], the reference's exact hash — `hashset-count.cc:49-59`)
  * of every k-CHARACTER gram of `text`, in one pass.
  *
  * Why an expression and not `transform(sequence(...), i ->
  * fnv64(substring(...)))`: higher-order-function lambdas evaluate
  * INTERPRETED per element — sequence materialization, per-element
  * row wrapping, per-gram UTF8String allocation. For fingerprinting
  * (~hundreds of grams per document, millions per partition) that
  * machinery costs ~50 µs/gram; this loop costs nanoseconds. The
  * expression is CodegenFallback by design: the per-ROW fallback call
  * is amortized over the whole gram array, so codegen would only
  * remove a vanishing fraction of the work while the loop itself is
  * already compiled Scala.
  *
  * Contract notes: k must be a positive foldable integral; ASCII
  * strings take a zero-allocation byte-window path (byte count ==
  * char count <=> ASCII in UTF-8), others hash each char-gram's UTF-8
  * bytes via `substringSQL`. NULL or shorter-than-k text yields an
  * EMPTY array (mirrors the `CASE WHEN length(text) >= k` guard the
  * HOF formulation needed — a fingerprint set, not a scalar).
  */
case class FnvGrams(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"fnv_grams text must be STRING, got ${left.dataType.sql}")
    else if (!right.foldable ||
      !Seq(ByteType, ShortType, IntegerType, LongType).contains(right.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"fnv_grams k must be an integral literal, got ${right.dataType.sql}")
    else if (right.eval() == null ||
      right.eval().asInstanceOf[Number].longValue() < 1 ||
      right.eval().asInstanceOf[Number].longValue() > Int.MaxValue)
      TypeCheckResult.TypeCheckFailure("fnv_grams k must be in [1, 2^31)")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val k: Int = right.eval().asInstanceOf[Number].intValue()

  private val Empty = new GenericArrayData(Array.empty[Long])

  override def eval(input: InternalRow): Any = {
    val s = left.eval(input)
    if (s == null) return Empty
    val utf8 = s.asInstanceOf[UTF8String]
    val nChars = utf8.numChars()
    if (nChars < k) return Empty
    val out = new Array[Long](nChars - k + 1)
    val bytes = utf8.getBytes
    if (bytes.length == nChars) {
      // ASCII: chars are bytes; hash sliding byte windows directly
      var i = 0
      while (i < out.length) {
        var h = Fnv1a64.OffsetBasis
        var j = i
        val end = i + k
        while (j < end) { h = ((bytes(j) & 0xffL) ^ h) * Fnv1a64.Prime; j += 1 }
        out(i) = h
        i += 1
      }
    } else {
      var i = 0
      while (i < out.length) {
        out(i) = Fnv1a64.hash(utf8.substringSQL(i + 1, k).getBytes)
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "fnv_grams"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FnvGrams =
    copy(left = newLeft, right = newRight)
}

/** `sliding_min(array<bigint>, w) -> array<bigint>`: minimum of every
  * w-wide sliding window, via a monotonic deque — O(n) total, not
  * O(n*w) like `transform(sequence(...), j -> array_min(slice(...)))`,
  * and with none of the interpreted-HOF per-window slice allocation.
  *
  * Degenerate sizes follow winnowing semantics: an empty array yields
  * an empty array; 1 <= n < w yields the single min over all elements
  * (the one clamped window a short document has). NULL input yields
  * an empty array; null ELEMENTS are rejected at type-check
  * (fingerprint hash arrays are non-null by construction).
  */
case class SlidingMin(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(LongType, false) =>
      if (!right.foldable ||
        !Seq(ByteType, ShortType, IntegerType, LongType).contains(right.dataType))
        TypeCheckResult.TypeCheckFailure(
          s"sliding_min w must be an integral literal, got ${right.dataType.sql}")
      else if (right.eval() == null ||
        right.eval().asInstanceOf[Number].longValue() < 1 ||
        right.eval().asInstanceOf[Number].longValue() > Int.MaxValue)
        TypeCheckResult.TypeCheckFailure("sliding_min w must be in [1, 2^31)")
      else TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sliding_min requires ARRAY<BIGINT> with non-null elements, got ${t.sql}")
  }

  private lazy val w: Int = right.eval().asInstanceOf[Number].intValue()

  private val Empty = new GenericArrayData(Array.empty[Long])

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) return Empty
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return Empty
    if (n < w) {
      var m = arr.getLong(0)
      var i = 1
      while (i < n) { m = math.min(m, arr.getLong(i)); i += 1 }
      return new GenericArrayData(Array(m))
    }
    val out = new Array[Long](n - w + 1)
    // deque of candidate indices, values strictly increasing
    val idx = new Array[Int](n)
    var head = 0
    var tail = 0
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      while (tail > head && arr.getLong(idx(tail - 1)) >= v) tail -= 1
      idx(tail) = i
      tail += 1
      if (idx(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = arr.getLong(idx(head))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def prettyName: String = "sliding_min"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SlidingMin =
    copy(left = newLeft, right = newRight)
}
