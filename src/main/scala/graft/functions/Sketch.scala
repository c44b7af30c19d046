package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** The engine's exact-distinct-set wire format, shared by the in-query
  * aggregate ([[HashSetCountDistinct]]) and the PERSISTABLE sketch
  * column surface ([[SketchAgg]]/[[SketchMergeAgg]]/[[SketchCount]]).
  *
  * Layout: `[int32 n] ([int32 len] [len bytes])*` — framed, compact,
  * order-free. The reference's serialized 'D' form kept values in
  * bucket order only so its delimited-string merge could stream
  * (`/root/reference/hashset-count.cc:226-247`, `README.md:38-41`);
  * a framed format needs no ordering invariant and is `'\0'`-safe
  * where the reference documents silent corruption (`README.md:9`).
  */
object SketchWire {

  def serialize(buf: mutable.HashSet[UTF8String]): Array[Byte] = {
    var total = 4
    buf.foreach(s => total += 4 + s.numBytes())
    val bb = ByteBuffer.allocate(total)
    bb.putInt(buf.size)
    buf.foreach { s =>
      val bytes = s.getBytes
      bb.putInt(bytes.length)
      bb.put(bytes)
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): mutable.HashSet[UTF8String] =
    mergeInto(new mutable.HashSet[UTF8String], bytes)

  /** Union a serialized set into a live buffer (no intermediate set). */
  def mergeInto(
      buf: mutable.HashSet[UTF8String],
      bytes: Array[Byte]): mutable.HashSet[UTF8String] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    buf.sizeHint(buf.size + n)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf += UTF8String.fromBytes(arr)
      i += 1
    }
    buf
  }

  /** Distinct count carried by a serialized sketch — the leading int32;
    * the values themselves are never touched. Malformed input (fewer
    * than 4 bytes) fails loudly rather than reading garbage.
    */
  def count(bytes: Array[Byte]): Int = {
    if (bytes == null || bytes.length < 4)
      throw new IllegalArgumentException(
        s"not a graft sketch: ${if (bytes == null) "null" else s"${bytes.length} bytes"}")
    ByteBuffer.wrap(bytes).getInt
  }
}

/** Shared buffer lifecycle for hash-set aggregates: empty-set init,
  * size-aware union merge, [[SketchWire]] shuffle format, and the
  * copy-on-first-sighting update (`child.eval` can return a string
  * backed by a reused row buffer, so the first sighting of each
  * distinct value is cloned — duplicates never allocate).
  */
private[functions] trait HashSetAggBase
    extends TypedImperativeAggregate[mutable.HashSet[UTF8String]] {

  override def createAggregationBuffer(): mutable.HashSet[UTF8String] =
    mutable.HashSet.empty

  override def merge(
      buf: mutable.HashSet[UTF8String],
      other: mutable.HashSet[UTF8String]): mutable.HashSet[UTF8String] =
    if (buf.size < other.size) other ++= buf else buf ++= other

  override def serialize(buf: mutable.HashSet[UTF8String]): Array[Byte] =
    SketchWire.serialize(buf)

  override def deserialize(bytes: Array[Byte]): mutable.HashSet[UTF8String] =
    SketchWire.deserialize(bytes)

  /** Add an owned copy of `s` unless already present. Not
    * `UTF8String.clone()`: when the string spans its whole backing
    * array, getBytes/clone return that array unchanged — aliasing the
    * mutable row buffer. Copy unconditionally on first sighting.
    */
  protected final def addOwned(
      buf: mutable.HashSet[UTF8String], s: UTF8String): Unit =
    if (!buf.contains(s)) {
      val arr = new Array[Byte](s.numBytes())
      s.writeToMemory(arr, Platform.BYTE_ARRAY_OFFSET)
      buf += UTF8String.fromBytes(arr)
    }
}

/** `sketch_agg(string) → binary`: the reference's distinct-count STATE
  * as a first-class, persistable column. The reference's whole reason
  * to exist is a distinct count whose state merges across nodes
  * (`/root/reference/hashset-count.cc:269-461`); the warehouse-scale
  * version of that idea is MATERIALIZING the serialized set, so
  * partial aggregates can be stored (per-day parquet), rolled up later
  * ([[SketchMergeAgg]]) and finalized ([[SketchCount]]) — per-day
  * sketches merged to month equal the direct month count, exactly
  * (this is a set, not an estimator). NULL inputs are skipped like
  * `count300k` (`hashset-count.cc:105-108`); an all-NULL or empty
  * group yields the empty sketch (n=0), which [[SketchCount]] maps to
  * NULL — the reference's empty-group rule, deferred to finalize time.
  *
  * Scale note: sketch size ∝ distinct values in the group, the same
  * law as the reference's buffer and the in-query `count300k`. For
  * unbounded-cardinality groups the bounded-size estimator siblings
  * are Spark's own `hll_sketch_agg`/`hll_union_agg`/
  * `hll_sketch_estimate` — same agg/merge/finalize shape, fixed-size
  * state, approximate answer.
  */
case class SketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends HashSetAggBase with UnaryLike[Expression] {

  override def update(
      buf: mutable.HashSet[UTF8String],
      input: InternalRow): mutable.HashSet[UTF8String] = {
    val v = child.eval(input)
    if (v != null) addOwned(buf, v.asInstanceOf[UTF8String])
    buf
  }

  override def eval(buf: mutable.HashSet[UTF8String]): Any =
    SketchWire.serialize(buf)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sketch_agg requires a STRING argument, got ${child.dataType.sql}")
  override def prettyName: String = "sketch_agg"

  override def withNewMutableAggBufferOffset(newOffset: Int): SketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SketchAgg =
    copy(child = newChild)
}

/** `sketch_merge(binary) → binary`: union stored [[SketchAgg]] sketches
  * — the rollup half of the persistable-state story (day → month is
  * one `groupBy(month).agg(sketch_merge(sk))` over sketch rows; the
  * raw fact table is never rescanned). NULL sketches are skipped;
  * merging zero sketches yields the empty sketch. The buffer IS the
  * union, so merging is associative and commutative — partition
  * layout cannot change the result.
  */
case class SketchMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends HashSetAggBase with UnaryLike[Expression] {

  override def update(
      buf: mutable.HashSet[UTF8String],
      input: InternalRow): mutable.HashSet[UTF8String] = {
    val v = child.eval(input)
    if (v != null) SketchWire.mergeInto(buf, v.asInstanceOf[Array[Byte]])
    buf
  }

  override def eval(buf: mutable.HashSet[UTF8String]): Any =
    SketchWire.serialize(buf)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sketch_merge requires a BINARY sketch argument, got ${child.dataType.sql}")
  override def prettyName: String = "sketch_merge"

  override def withNewMutableAggBufferOffset(newOffset: Int): SketchMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SketchMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(
      newChild: Expression): SketchMergeAgg =
    copy(child = newChild)
}

/** `sketch_count(binary) → string`: finalize a sketch — read the count
  * from the frame header (the values are never deserialized). Empty
  * sketch → NULL and STRING output, matching `count300k`'s
  * finalize contract (`/root/reference/hashset-count.cc:464-524`,
  * `README.md:28`). Codegen'd: a header read is one static call, so
  * the expression stays inside whole-stage codegen.
  */
case class SketchCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sketch_count requires a BINARY sketch argument, got ${child.dataType.sql}")
  override def prettyName: String = "sketch_count"

  override def nullSafeEval(input: Any): Any = {
    val n = SketchWire.count(input.asInstanceOf[Array[Byte]])
    if (n == 0) null else UTF8String.fromString(n.toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("sketchN")
      s"""
         |int $n = graft.functions.SketchWire.count($c);
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.lang.Integer.toString($n));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SketchCount =
    copy(child = newChild)
}
