package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}
import graft.sources.IndexCatalog

/** Row-level change-feed contracts (q_store_cdc's mechanism): an
  * append's feed is exactly its inserted rows, a compaction's feed is
  * EMPTY (every row rewritten identically — maintenance is
  * transparent with no commit-type special-casing), a merge's feed is
  * the insert set plus update pre/post pairs with migrated buckets
  * visible, and a delete's feed is the deleted ids — never a
  * rewritten survivor.
  */
class StoreCdcSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def emb = Engine.table(spark, dir, "embeddings")
    .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))

  private def feed(base: String, v: Int): Map[String, Set[Long]] =
    SimilarityQueries.storeChanges(spark, base, v)
      .select("change_type", "vec_id").collect()
      .groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(_.getLong(1)).toSet }

  test("append feeds inserts; compaction feeds nothing; merge feeds updates+inserts; delete feeds deletes") {
    val base = Files.createTempDirectory("graft_cdcspec").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base) // v1
      val batchA = emb.filter(pmod(col("vec_id"), lit(4)) === 1)
      SimilarityQueries.appendEmbedStore(spark, batchA, base) // v2
      val aIds = batchA.select("vec_id").collect().map(_.getLong(0)).toSet
      assert(feed(base, 2) == Map("insert" -> aIds))

      SimilarityQueries.compactEmbedStore(spark, base) // v3
      assert(feed(base, 3).isEmpty, "compaction leaked rows into the change feed")

      // merge: update the % 8 == 0 rows to their successor's vector,
      // insert the % 4 == 3 slice (A already holds % 4 == 1)
      val inserts = emb.filter(pmod(col("vec_id"), lit(4)) === 3)
        .select(col("vec_id"), col("embedding"), col("nrm"))
      val updates = emb.filter(pmod(col("vec_id"), lit(8)) === 0)
        .select(col("vec_id"))
        .join(emb.select((col("vec_id") - 1).as("vec_id"),
          col("embedding"), col("nrm")), Seq("vec_id"))
      SimilarityQueries.mergeIntoEmbedStore(spark, base,
        inserts.unionByName(updates)) // v4
      val insIds = inserts.select("vec_id").collect().map(_.getLong(0)).toSet
      val updIds = updates.select("vec_id").collect().map(_.getLong(0)).toSet
      val f4 = feed(base, 4)
      assert(f4("insert") == insIds)
      assert(f4("update_preimage") == updIds)
      assert(f4("update_postimage") == updIds)
      assert(!f4.contains("delete"))
      // migration is visible in the feed: at least one update's
      // preimage and postimage sit in different buckets
      val buckets = SimilarityQueries.storeChanges(spark, base, 4)
        .filter(col("change_type").startsWith("update"))
        .select("change_type", "vec_id", "bucket").collect()
        .groupBy(_.getLong(1))
        .map { case (id, rs) =>
          id -> rs.map(r => r.getString(0) -> r.getLong(2)).toMap }
      assert(buckets.values.exists(m =>
        m("update_preimage") != m("update_postimage")))

      // delete the never-updated % 8 == 4 slice
      val del = emb.filter(pmod(col("vec_id"), lit(8)) === 4)
        .select(col("vec_id"), col("embedding"))
      SimilarityQueries.deleteFromEmbedStore(spark, base, del) // v5
      val delIds = del.select("vec_id").collect().map(_.getLong(0)).toSet
      assert(feed(base, 5) == Map("delete" -> delIds))
      assert(IndexCatalog.currentVersion(base) == 5)
    } finally graft.Fs.deleteRecursively(base)
  }
}
