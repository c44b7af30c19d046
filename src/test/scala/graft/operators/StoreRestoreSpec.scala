package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}
import graft.sources.IndexCatalog

/** RESTORE contracts (q_store_restore's mechanism): the rollback is
  * pure catalog metadata (every data file on disk byte-identical
  * across it, restored manifest ≡ the target version's verbatim),
  * rolled-back versions stay readable until vacuum, later appends
  * build on the restored head, and restoring a vacuumed version
  * fails fast at manifest resolution.
  */
class StoreRestoreSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def emb(pred: org.apache.spark.sql.Column) =
    Engine.table(spark, dir, "embeddings")
      .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
      .filter(pred)

  test("restore is zero-copy, keeps rolled-back history readable, and later appends build on the restored head") {
    val base = Files.createTempDirectory("graft_restsp").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base) // v1: evens
      SimilarityQueries.appendEmbedStore(spark,
        emb(pmod(col("vec_id"), lit(4)) === 1), base) // v2: + bad batch
      val preFiles = IndexCatalog.listDataFiles(s"$base/corpus")
      val preSums = preFiles.map(f => f -> graft.TestHash.sha256(f)).toMap

      val v3 = IndexCatalog.restore(base, 1)
      assert(v3 == 3)
      // restored manifest is the target's, verbatim
      assert(IndexCatalog.files(base, 3) == IndexCatalog.files(base, 1))
      assert(IndexCatalog.tags(base, 3) == Seq("restore-of=1"))
      // zero-copy: nothing written, nothing touched — the whole store
      // is byte-identical across the restore
      val postFiles = IndexCatalog.listDataFiles(s"$base/corpus")
      assert(postFiles == preFiles)
      preFiles.foreach(f =>
        assert(graft.TestHash.sha256(f) == preSums(f), s"restore mutated $f"))

      // the rolled-back version is still readable (time travel holds
      // BETWEEN the target and the restore)
      val v2Rows = SimilarityQueries.readStoreFiles(spark,
        IndexCatalog.files(base, 2))
      assert(v2Rows.filter(pmod(col("vec_id"), lit(4)) === 1).count() > 0)

      // a later append anti-joins against the RESTORED head: a slice
      // of the rolled-back batch re-ingests fully (its rows are gone
      // from the head even though their files are still on disk)
      SimilarityQueries.appendEmbedStore(spark,
        emb(pmod(col("vec_id"), lit(8)) === 5), base) // v4
      val head = SimilarityQueries.readStoreFiles(spark,
        IndexCatalog.latestFiles(base))
      val expected = emb(
        pmod(col("vec_id"), lit(2)) === 0 || pmod(col("vec_id"), lit(8)) === 5)
      assert(head.count() == expected.count())
      assert(head.filter(pmod(col("vec_id"), lit(8)) === 1).count() == 0,
        "the rolled-back batch's other half leaked back into the head")
      assert(IndexCatalog.liveVersions(base) == Seq(1, 2, 3, 4))
    } finally graft.Fs.deleteRecursively(base)
  }

  test("restoring a vacuumed version fails fast at manifest resolution") {
    val base = Files.createTempDirectory("graft_restvac").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base) // v1
      SimilarityQueries.appendEmbedStore(spark,
        emb(pmod(col("vec_id"), lit(4)) === 1), base) // v2
      IndexCatalog.vacuum(base, retain = 1) // expires v1
      val e = intercept[Exception](IndexCatalog.restore(base, 1))
      assert(e.getMessage != null)
      // the failed restore committed nothing
      assert(IndexCatalog.currentVersion(base) == 2)
      // restoring a LIVE version still works after the vacuum
      assert(IndexCatalog.restore(base, 2) == 3)
      // set equality: the restored manifest is written sorted, while
      // an append manifest lists predecessor files before new ones
      assert(IndexCatalog.files(base, 3).toSet == IndexCatalog.files(base, 2).toSet)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("restore targets the CURRENT head, however far it advanced past the target") {
    val base = Files.createTempDirectory("graft_resthead").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base) // v1
      SimilarityQueries.appendEmbedStore(spark,
        emb(pmod(col("vec_id"), lit(4)) === 1), base) // v2
      SimilarityQueries.appendEmbedStore(spark,
        emb(pmod(col("vec_id"), lit(8)) === 3), base) // v3
      // two appends past the target: the restore reads the head (v3),
      // commits v4 = v1's list — every intermediate version stays in
      // readable history, the head is the restored list
      val v1Files = IndexCatalog.files(base, 1)
      assert(IndexCatalog.restore(base, 1) == 4)
      assert(IndexCatalog.latestFiles(base) == v1Files)
      assert(IndexCatalog.liveVersions(base) == Seq(1, 2, 3, 4))
    } finally graft.Fs.deleteRecursively(base)
  }
}
