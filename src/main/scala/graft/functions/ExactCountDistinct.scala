package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

import scala.collection.mutable

/** Exact, hashset-based multi-instance `COUNT(DISTINCT col)` over a STRING
  * column — the Spark-native re-expression of the reference UDA
  * (`/root/reference/hashset-count.cc:82-524`, registered as `count300k`,
  * `/root/reference/README.md:28-33`).
  *
  * Semantics preserved exactly (SURVEY.md §7.4):
  *   - NULL input rows are skipped (reference `hashset-count.cc:106`);
  *   - the empty string is a real value and counts once
  *     (`hashset-count-test.cc:39-50`);
  *   - a zero-row / all-NULL group yields NULL, not "0" — this differs from
  *     ANSI `COUNT(DISTINCT)` (`hashset-count.cc:507-510`);
  *   - the count is exact, not a sketch (`hashset-count.cc:159-172`);
  *   - the result type is STRING (`README.md:28`, `hashset-count.cc:24-33`).
  *
  * Intentional divergences (fixes, not bug-compat — SURVEY.md §7.3):
  *   - values containing '\0' are handled correctly; the reference's
  *     serialized form used NUL as a delimiter and silently corrupted counts
  *     (`README.md:9`). Spark's buffer encoder frames each element, so no
  *     delimiter exists to collide with.
  *   - the hash table grows with cardinality instead of degrading past a
  *     fixed 300,000 buckets (`hashset-count.cc:67`); the name `count300k`
  *     is kept as a name, not a limit.
  *
  * Lifecycle mapping: `zero`≈Init, `reduce`≈Update, `merge`≈Merge,
  * `finish`≈Finalize, `bufferEncoder`≈Serialize. Spark plans the same
  * two-phase (partial → shuffle → final) aggregation the reference relied on
  * Impala for, via ObjectHashAggregateExec — including sort-based fallback
  * on memory pressure, which the reference only semi-supported
  * (`hashset-count.cc:200-205`).
  *
  * This is the idiomatic-API variant; the hot path registered as `count300k`
  * is [[HashSetCountDistinct]], a TypedImperativeAggregate with a compact
  * length-prefixed wire format (the analogue of the reference's 'D' form).
  */
object ExactCountDistinct
    extends Aggregator[String, mutable.HashSet[String], String] {

  override def zero: mutable.HashSet[String] = mutable.HashSet.empty

  override def reduce(
      buf: mutable.HashSet[String],
      value: String): mutable.HashSet[String] = {
    if (value != null) buf += value
    buf
  }

  override def merge(
      b1: mutable.HashSet[String],
      b2: mutable.HashSet[String]): mutable.HashSet[String] =
    if (b1.size < b2.size) b2 ++= b1 else b1 ++= b2

  override def finish(buf: mutable.HashSet[String]): String =
    if (buf.isEmpty) null else buf.size.toString

  override def bufferEncoder: Encoder[mutable.HashSet[String]] =
    Encoders.kryo[mutable.HashSet[String]]

  override def outputEncoder: Encoder[String] = Encoders.STRING
}
