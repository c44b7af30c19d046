package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}
import graft.sources.{FileStats, IndexCatalog}

/** Shallow-clone contracts (q_store_clone's mechanism): the clone is
  * zero-copy (v1 borrows the source's files by path), the two stores
  * diverge independently, the clone's maintenance (compaction,
  * vacuum) never touches the source's files — the foreign-root
  * ownership rule — and the stats sidecars carry so range pruning
  * works on the clone from version 1.
  */
class StoreCloneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("clone borrows by path, diverges under its own root, and its vacuum never touches the source") {
    val src = Files.createTempDirectory("graft_clsrc").toString
    val dst = Files.createTempDirectory("graft_cldst").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, src)
      val srcFiles = IndexCatalog.latestFiles(src)
      val srcSums = srcFiles.map(f => f -> graft.TestHash.sha256(f)).toMap

      SimilarityQueries.cloneEmbedStore(src, dst)
      // zero-copy: the clone's v1 IS the source's file list; nothing
      // was written under the clone's corpus root
      assert(IndexCatalog.files(dst, 1) == srcFiles)
      assert(IndexCatalog.listDataFiles(s"$dst/corpus").isEmpty)
      // stats sidecars carried: the borrowed files prune on the clone
      assert(FileStats.ranges(dst, srcFiles, "vec_id").keySet == srcFiles.toSet)

      // divergence: an append to the clone lands under the CLONE's
      // root; the source sees nothing
      val batch = Engine.table(spark, dir, "embeddings")
        .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
        .filter(pmod(col("vec_id"), lit(4)) === 1)
      SimilarityQueries.appendEmbedStore(spark, batch, dst)
      val ownFiles = IndexCatalog.files(dst, 2).toSet -- srcFiles.toSet
      assert(ownFiles.nonEmpty && ownFiles.forall(_.startsWith(dst)))
      assert(IndexCatalog.currentVersion(src) == 1)
      assert(IndexCatalog.latestFiles(src) == srcFiles)
      // the multi-root read serves the union of both roots' rows
      val n = SimilarityQueries.readStoreFiles(spark,
        IndexCatalog.latestFiles(dst)).count()
      val nExpected = spark.read.parquet(srcFiles: _*).count() + batch.count()
      assert(n == nExpected)

      // clone-side maintenance: compaction rewrites EVERYTHING into
      // the clone's own root; vacuum then reclaims the clone's own
      // superseded files but NEVER walks the source's root
      SimilarityQueries.compactEmbedStore(spark, dst)
      val compacted = IndexCatalog.latestFiles(dst)
      assert(compacted.forall(_.startsWith(dst)))
      IndexCatalog.vacuum(dst, retain = 1)
      ownFiles.foreach(f =>
        assert(!Files.exists(Paths.get(f)), s"vacuum kept superseded own $f"))
      srcFiles.foreach { f =>
        assert(Files.exists(Paths.get(f)), s"clone vacuum DELETED source $f")
        assert(graft.TestHash.sha256(f) == srcSums(f), s"clone mutated source $f")
      }
      // and the source still answers for itself
      assert(spark.read.option("basePath", s"$src/corpus")
        .parquet(IndexCatalog.latestFiles(src): _*).count()
        == srcFiles.map(f => spark.read.parquet(f).count()).sum)
    } finally {
      graft.Fs.deleteRecursively(src)
      graft.Fs.deleteRecursively(dst)
    }
  }
}
