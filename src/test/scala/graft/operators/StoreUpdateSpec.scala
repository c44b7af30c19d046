package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}
import graft.sources.IndexCatalog

/** Predicate-driven UPDATE contracts (q_store_update's mechanism —
  * `updateEmbedStoreWhere`): the find phase touches only
  * stats-pruned files, matched rows take the SET expression and
  * migrate to the bucket the NEW vector hashes to (negation → the
  * complement bucket, since every plane dot flips sign), untouched
  * buckets carry forward byte-identical, the pre-update version still
  * time-travels, and replaying the same involutive UPDATE restores
  * the original content exactly (sign-flips are FP-exact).
  */
class StoreUpdateSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("update rewrites only (old ∪ new) buckets; in-range rows negate + migrate to complement; v1 intact; involutive replay restores") {
    val base = Files.createTempDirectory("graft_updspec").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base) // v1: evens
      val keyOf = (f: String) => IndexCatalog.partitionKey(f).get
      val v1 = IndexCatalog.files(base, 1)

      val (lo, hi) = (100L, 199L)
      def runUpdate(): Unit = SimilarityQueries.updateEmbedStoreWhere(
        spark, base, col("vec_id").between(lo, hi), lo, hi,
        e => transform(e, x => -x))

      runUpdate()
      assert(IndexCatalog.currentVersion(base) == 2)
      val v2 = IndexCatalog.files(base, 2)

      // the commit's tag names the replaced buckets; every OTHER
      // bucket's files carry forward by path, byte-identical
      val tag = IndexCatalog.tags(base, 2).find(_.startsWith("update ")).get
      val replaced = tag.stripPrefix("update ").split(",").toSet
      val carried = v1.filterNot(f => replaced(keyOf(f)))
      val sums = carried.map(f => f -> graft.TestHash.sha256(f)).toMap
      carried.foreach { f =>
        assert(v2.contains(f), s"update dropped untouched $f")
        assert(graft.TestHash.sha256(f) == sums(f), s"update mutated $f")
      }

      def rows(files: Seq[String]) =
        spark.read.option("basePath", s"$base/corpus").parquet(files: _*)
          .select(col("vec_id"), col("bucket").cast("long").as("bucket"),
            col("embedding"))
      val pre = rows(v1).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Float](2))).toMap
      val post = rows(v2).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Float](2))).toMap

      // UPDATE inserts nothing, deletes nothing
      assert(post.keySet == pre.keySet)
      val updIds = pre.keySet.filter(id => id >= lo && id <= hi)
      assert(updIds.nonEmpty, "fixture has no in-range evens — spec vacuous")
      updIds.foreach { t =>
        // SET applied: every component negated, FP-exactly
        assert(post(t)._2 == pre(t)._2.map(x => -x),
          s"updated $t does not hold its negated vector")
        // negation flips every plane dot's sign → complement bucket
        // within the NPlanes-bit sign pattern (random fixture dots are
        // never exactly 0, so >= 0 inverts cleanly)
        val mask = (1L << SimilarityQueries.NPlanes) - 1
        assert(post(t)._1 == (pre(t)._1 ^ mask),
          s"updated $t in bucket ${post(t)._1}, expected complement of ${pre(t)._1}")
      }
      (pre.keySet -- updIds).foreach { s =>
        assert(post(s) == pre(s), s"update touched out-of-range row $s")
      }

      // pre-update version still serves the original rows (time travel)
      assert(rows(IndexCatalog.files(base, 1)).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
        .forall { case (id, e) => e == pre(id)._2 })

      // replaying the involutive SET negates back: content == v1's
      runUpdate()
      val v3 = IndexCatalog.files(base, IndexCatalog.currentVersion(base))
      val post3 = rows(v3).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getSeq[Float](2))).toMap
      assert(post3 == pre)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("out-of-range predicate is a no-op: no new version, no files written") {
    val base = Files.createTempDirectory("graft_updnoop").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base)
      val v = IndexCatalog.currentVersion(base)
      val files = IndexCatalog.files(base, v)
      SimilarityQueries.updateEmbedStoreWhere(
        spark, base, col("vec_id").between(1000000L, 2000000L),
        1000000L, 2000000L, e => transform(e, x => -x))
      assert(IndexCatalog.currentVersion(base) == v, "no-op update committed")
      assert(IndexCatalog.files(base, v) == files)
    } finally graft.Fs.deleteRecursively(base)
  }
}
