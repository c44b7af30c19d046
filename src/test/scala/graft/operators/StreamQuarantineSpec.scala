package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{IndexCatalog, StoreConstraints}

/** Dead-letter routing contracts (q_stream_quarantine's mechanism):
  * poisoned rows never reach the store, clean rows always do, a
  * replayed micro-batch is exactly-once on BOTH sides (tag-guarded
  * store commit, idempotent batch-keyed quarantine overwrite), and a
  * store without a declared constraint fails loudly instead of
  * passing everything.
  */
class StreamQuarantineSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def emb(pred: org.apache.spark.sql.Column) =
    graft.Engine.table(spark, dir, "embeddings")
      .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
      .filter(pred)

  test("routing splits a mixed batch; replay re-commits nothing and rewrites the same dead letters") {
    val base = Files.createTempDirectory("graft_qrsp").toString
    val quar = Files.createTempDirectory("graft_qrsp_dlq").toString
    try {
      SimilarityQueries.buildEmbedStoreChecked(spark, dir, base)
      val mixed = emb(pmod(col("vec_id"), lit(4)) === 1)
        .select(col("vec_id"),
          when(pmod(col("vec_id"), lit(8)) === 5,
            expr("cast(array() as array<float>)"))
            .otherwise(col("embedding")).as("embedding"),
          when(pmod(col("vec_id"), lit(8)) === 5, lit(0.0))
            .otherwise(col("nrm")).as("nrm"))
      StreamingQueries.quarantineIngestBatch(spark, mixed, base, quar, 7L)
      assert(IndexCatalog.currentVersion(base) == 2)
      assert(IndexCatalog.tags(base, 2) == Seq("ingest-batch=7"))

      // clean half indexed, poisoned half dead-lettered — exactly
      val stored = SimilarityQueries.readStoreFiles(spark,
        IndexCatalog.latestFiles(base))
      assert(stored.filter(pmod(col("vec_id"), lit(8)) === 5).count() == 0,
        "poisoned rows reached the store")
      val nClean = emb(pmod(col("vec_id"), lit(8)) === 1).count()
      assert(stored.filter(pmod(col("vec_id"), lit(8)) === 1).count() == nClean)
      val dlqDir = s"$quar/batch=7"
      val dlqIds = spark.read.parquet(dlqDir)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val poisonedIds = emb(pmod(col("vec_id"), lit(8)) === 5)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(dlqIds == poisonedIds)

      // replay of the SAME batchId: the tag guard skips the store
      // commit, the quarantine overwrite rewrites identical content
      val verBefore = IndexCatalog.currentVersion(base)
      StreamingQueries.quarantineIngestBatch(spark, mixed, base, quar, 7L)
      assert(IndexCatalog.currentVersion(base) == verBefore, "replay re-committed")
      val dlqIds2 = spark.read.parquet(dlqDir)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      assert(dlqIds2 == poisonedIds, "replay changed the dead-letter content")
    } finally {
      graft.Fs.deleteRecursively(base)
      graft.Fs.deleteRecursively(quar)
    }
  }

  test("an all-clean batch quarantines nothing; a store without a constraint fails loudly") {
    val base = Files.createTempDirectory("graft_qrclean").toString
    val quar = Files.createTempDirectory("graft_qrclean_dlq").toString
    try {
      SimilarityQueries.buildEmbedStoreChecked(spark, dir, base)
      // a stale dead-letter dir left by a prior (non-deterministic)
      // attempt of this batchId: the clean replay must CLEAR it, so
      // replay output is independent of history
      Files.createDirectories(Paths.get(s"$quar/batch=0"))
      Files.writeString(Paths.get(s"$quar/batch=0/stale.parquet"), "stale")
      StreamingQueries.quarantineIngestBatch(spark,
        emb(pmod(col("vec_id"), lit(8)) === 1), base, quar, 0L)
      assert(!Files.exists(Paths.get(s"$quar/batch=0")),
        "an all-clean batch left a quarantine dir behind")
      assert(IndexCatalog.currentVersion(base) == 2)

      val free = Files.createTempDirectory("graft_qrfree").toString
      try {
        SimilarityQueries.buildEmbedStore(spark, dir, free)
        val e = intercept[RuntimeException] {
          StreamingQueries.quarantineIngestBatch(spark,
            emb(pmod(col("vec_id"), lit(8)) === 1), free, quar, 1L)
        }
        assert(e.getMessage.contains("no CHECK constraint"))
      } finally graft.Fs.deleteRecursively(free)
    } finally {
      graft.Fs.deleteRecursively(base)
      graft.Fs.deleteRecursively(quar)
    }
  }
}
