package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `topk_agg(score, payload, k)`: bounded exact top-k as a native
  * `TypedImperativeAggregate` — the scale-right shape for distributed
  * top-k. The partial aggregate keeps AT MOST k (score, payload) pairs
  * per group per task, so only `k x partitions` rows per group ever
  * cross the exchange; a window-function top-k shuffles EVERY row of
  * the group to one task before ranking. At a 100 TB corpus the window
  * form funnels the full scan through per-group tasks; this form's
  * shuffle volume is independent of input size.
  *
  * Ordering is total and deterministic: higher score first, ties to
  * the lower payload — matching `row_number() OVER (ORDER BY score
  * DESC, payload)`, which is the oracle formulation. The result is the
  * best-first array of `struct<score double, payload bigint>`.
  *
  * Same five-callback structure as the reference's UDA
  * (`/root/reference/hashset-count.h:30-34`), with a bounded heap in
  * place of a hash set: update ≈ Update, serialize/deserialize carry a
  * framed binary buffer across the exchange like the 'D' form
  * (`/root/reference/hashset-count.cc:195-262`), merge re-bounds the
  * union, eval renders the final ordering.
  */
case class TopKAgg(
    score: Expression,
    payload: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
    with TernaryLike[Expression] {

  /** Head of the queue = current WORST retained pair (lowest score,
    * ties to the higher payload), so bounding is an O(log k) peek/swap.
    */
  private val worstFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(
      buf: mutable.PriorityQueue[(Double, Long)],
      cand: (Double, Long)): Unit =
    if (buf.size < k) buf.enqueue(cand)
    else if (worstFirst.compare(cand, buf.head) < 0) { // cand beats the worst
      buf.dequeue()
      buf.enqueue(cand)
    }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val p = payload.eval(input)
    if (s != null && p != null) {
      offer(buf, (s.asInstanceOf[Double], p.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(offer(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // ascending by worstFirst = least-worst first = best first
    val sorted = buf.toArray.sorted(worstFirst)
    new GenericArrayData(sorted.map { case (s, p) => InternalRow(s, p) })
  }

  /** Wire format: `[int32 n] ([float64 score] [int64 payload])*`. */
  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, p) => bb.putDouble(s); bb.putLong(p) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf.enqueue((bb.getDouble, bb.getLong))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("payload", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_agg score must be DOUBLE, got ${score.dataType.sql}")
    else if (payload.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_agg payload must be BIGINT, got ${payload.dataType.sql}")
    // type-check k BEFORE eval/cast: a foldable non-numeric k must fail
    // cleanly here, not ClassCastException inside analysis
    else if (!kExpr.foldable ||
      !Seq(ByteType, ShortType, IntegerType, LongType).contains(kExpr.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"topk_agg k must be an integral literal, got ${kExpr.dataType.sql}")
    else if (kExpr.eval() == null ||
      kExpr.eval().asInstanceOf[Number].longValue() < 1)
      TypeCheckResult.TypeCheckFailure("topk_agg k must be a positive literal")
    // compare at LONG width: a BIGINT k above Int.MaxValue would pass
    // the >= 1 check after intValue() truncation and silently run with
    // the wrong k — reject it instead of wrapping
    else if (kExpr.eval().asInstanceOf[Number].longValue() > Int.MaxValue)
      TypeCheckResult.TypeCheckFailure(
        s"topk_agg k must fit in INT, got ${kExpr.eval()}")
    else TypeCheckResult.TypeCheckSuccess

  override def prettyName: String = "topk_agg"

  override def first: Expression = score
  override def second: Expression = payload
  override def third: Expression = kExpr

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKAgg =
    copy(score = newFirst, payload = newSecond, kExpr = newThird)
}
