package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `fnv64(string|binary) -> bigint`: the reference's exact hash function
  * — FNV-1a, 64-bit, seed 14695981039346656037, prime 1099511628211
  * (`/root/reference/hashset-count.cc:49-59`) — as a codegen'd Catalyst
  * expression. The reference reduced it `% 300000` for bucketing; here
  * the full 64-bit value is exposed (as Spark's signed BIGINT carrying
  * the unsigned bits) for fingerprinting / bucketing / salting uses.
  * Wrapping multiplication is two's-complement in both C++ uint64 and
  * JVM long, so values agree bit-for-bit with the reference.
  */
case class Fnv1a64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"fnv64 requires STRING or BINARY, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    Fnv1a64.hash(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesExpr = child.dataType match {
      case StringType => (c: String) => s"$c.getBytes()"
      case _ => (c: String) => c
    }
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = ${bytesExpr(c)};
         |long $h = ${Fnv1a64.OffsetBasis}L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = (($bytes[$i] & 0xffL) ^ $h) * ${Fnv1a64.Prime}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })
  }

  override def prettyName: String = "fnv64"

  override protected def withNewChildInternal(newChild: Expression): Fnv1a64 =
    copy(child = newChild)
}

object Fnv1a64 {
  /** 14695981039346656037 as a signed long (same bits). */
  val OffsetBasis: Long = java.lang.Long.parseUnsignedLong("14695981039346656037")
  val Prime: Long = 1099511628211L

  def hash(bytes: Array[Byte]): Long = {
    var h = OffsetBasis
    var i = 0
    while (i < bytes.length) {
      // the reference XORs the raw char (sign-extended here like C++'s
      // int promotion of uint8 would not be — but hashset-count.cc:55
      // XORs uint8 zero-extended, so mask to match)
      h = ((bytes(i) & 0xffL) ^ h) * Prime
      i += 1
    }
    h
  }
}
