package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Hot-path `count300k`: exact hashset-based distinct count as a native
  * Catalyst `TypedImperativeAggregate`. Its six callbacks are the 1:1
  * structural analogue of the reference UDA's five
  * (`/root/reference/hashset-count.h:30-34`):
  *
  *   - `createAggregationBuffer` ≈ `DistHashSetInit`
  *     (`hashset-count.cc:82-103`)
  *   - `update` ≈ `DistHashSetUpdate` incl. the NULL skip
  *     (`hashset-count.cc:105-192`)
  *   - `serialize`/`deserialize` ≈ `DistHashSetSerialize`'s 'D' form
  *     (`hashset-count.cc:195-262`) — but length-prefixed instead of
  *     NUL-delimited, so values containing '\0' are safe (the reference
  *     documents silent corruption, `README.md:9`)
  *   - `merge` ≈ `DistHashSetMerge` (`hashset-count.cc:269-461`) — a plain
  *     set union; the reference's sort-merge-over-bucket-order dance existed
  *     only because its serialized form was a flat delimited string
  *   - `eval` ≈ `DistHashSetFinalize` incl. the empty-set→NULL rule and
  *     STRING output (`hashset-count.cc:464-524`, `README.md:28`)
  *
  * Unlike the reference's fixed 300,000 buckets (`hashset-count.cc:67`),
  * the buffer grows with cardinality; `count300k` survives as a name only.
  * Spark plans the same two-phase aggregation Impala did (Partial →
  * exchange → Final) and falls back to sort-based aggregation under memory
  * pressure, replacing the reference's warn-and-hope spill handling
  * (`hashset-count.cc:200-205`).
  *
  * Values are stored as owned `UTF8String` copies: `child.eval` can return
  * a string backed by a reused row buffer, so the first sighting of each
  * distinct value is cloned (duplicates never allocate).
  */
case class HashSetCountDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashSet[UTF8String]]
    with UnaryLike[Expression] {

  override def createAggregationBuffer(): mutable.HashSet[UTF8String] =
    mutable.HashSet.empty

  override def update(
      buf: mutable.HashSet[UTF8String],
      input: InternalRow): mutable.HashSet[UTF8String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      // Not UTF8String.clone(): when the string spans its whole backing
      // array, getBytes/clone return that array unchanged — aliasing the
      // mutable row buffer. Copy unconditionally.
      if (!buf.contains(s)) {
        val arr = new Array[Byte](s.numBytes())
        s.writeToMemory(arr, Platform.BYTE_ARRAY_OFFSET)
        buf += UTF8String.fromBytes(arr)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashSet[UTF8String],
      other: mutable.HashSet[UTF8String]): mutable.HashSet[UTF8String] =
    if (buf.size < other.size) other ++= buf else buf ++= other

  override def eval(buf: mutable.HashSet[UTF8String]): Any =
    if (buf.isEmpty) null else UTF8String.fromString(buf.size.toString)

  /** Wire format: `[int32 n] ([int32 len] [len bytes])*` — framed, compact,
    * order-free (the reference's bucket-order invariant existed only to
    * make delimited-string merges streamable, `README.md:38-41`).
    */
  override def serialize(buf: mutable.HashSet[UTF8String]): Array[Byte] = {
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

  override def deserialize(bytes: Array[Byte]): mutable.HashSet[UTF8String] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new mutable.HashSet[UTF8String]
    buf.sizeHint(n)
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

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"count300k requires a STRING argument, got ${child.dataType.sql}")
  override def prettyName: String = "count300k"

  override def withNewMutableAggBufferOffset(
      newOffset: Int): HashSetCountDistinct =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(
      newOffset: Int): HashSetCountDistinct =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(
      newChild: Expression): HashSetCountDistinct =
    copy(child = newChild)
}
