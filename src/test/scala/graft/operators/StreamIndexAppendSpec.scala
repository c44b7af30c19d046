package graft.operators

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}
import graft.sources.IndexCatalog

/** Exactly-once contract of the STREAMING index-ingest path
  * (`q_stream_index_append`): every micro-batch commit is tagged in
  * the manifest it publishes, a replayed batchId commits nothing, and
  * the streamed generations answer probes exactly like one batch
  * append of the same rows.
  */
class StreamIndexAppendSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def sha256(p: String): String = {
    val d = MessageDigest.getInstance("SHA-256")
    d.digest(Files.readAllBytes(Paths.get(p))).map("%02x".format(_)).mkString
  }

  private def embeddingsOf(pred: org.apache.spark.sql.Column) =
    Engine.table(spark, dir, "embeddings")
      .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
      .filter(pred)
      .select(col("vec_id"), col("embedding"), col("nrm"))

  test("ingest commit is tagged, and a REPLAYED batchId commits nothing") {
    val base = Files.createTempDirectory("graft_sia_spec").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base)
      assert(IndexCatalog.currentVersion(base) == 1)
      val batch = embeddingsOf(pmod(col("vec_id"), lit(4)) === 1)

      assert(StreamingQueries.commitIngestBatch(spark, batch, base, 7L))
      assert(IndexCatalog.currentVersion(base) == 2)
      assert(IndexCatalog.tags(base, 2) == Seq("ingest-batch=7"))
      assert(IndexCatalog.committedTags(base).contains("ingest-batch=7"))
      val v2 = IndexCatalog.files(base, 2)
      val v2Sums = v2.map(f => f -> sha256(f)).toMap

      // the at-least-once replay: same batchId arrives again after a
      // crash between sink commit and checkpoint commit — the tag
      // guard must turn it into a no-op (no version, no files, no
      // mutation of committed bytes)
      assert(!StreamingQueries.commitIngestBatch(spark, batch, base, 7L))
      assert(IndexCatalog.currentVersion(base) == 2)
      assert(IndexCatalog.files(base, 2) == v2)
      v2Sums.foreach { case (f, s) => assert(sha256(f) == s) }

      // an EMPTY micro-batch (AvailableNow bookkeeping) never commits
      assert(!StreamingQueries.commitIngestBatch(
        spark, batch.filter(lit(false)), base, 8L))
      assert(IndexCatalog.currentVersion(base) == 2)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("replay AFTER the tag's manifest expired still publishes nothing: content backstop") {
    val base = Files.createTempDirectory("graft_sia_exp").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base)
      val batch = embeddingsOf(pmod(col("vec_id"), lit(4)) === 1)
      assert(StreamingQueries.commitIngestBatch(spark, batch, base, 7L))
      // compact (v3 rewrite) then vacuum(retain=1): the tag's manifest
      // (v2) expires — the exactly-once GUARD has forgotten batch 7
      SimilarityQueries.compactEmbedStore(spark, base)
      IndexCatalog.vacuum(base, retain = 1)
      assert(!IndexCatalog.committedTags(base).contains("ingest-batch=7"))
      val v = IndexCatalog.currentVersion(base)
      // the very-late replay slips past the tag guard, but every vector
      // anti-joins against the store: no files, no version
      StreamingQueries.commitIngestBatch(spark, batch, base, 7L)
      assert(IndexCatalog.currentVersion(base) == v)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("streamed per-batch generations probe identically to one batch append") {
    val streamed = Files.createTempDirectory("graft_sia_s").toString
    val batched = Files.createTempDirectory("graft_sia_b").toString
    try {
      val slices = (0 until 3).map(i =>
        embeddingsOf(pmod(col("vec_id"), lit(4)) === 1 &&
          expr(s"pmod(vec_id div 4, 3) = $i")))

      SimilarityQueries.buildEmbedStore(spark, dir, streamed)
      slices.zipWithIndex.foreach { case (s, i) =>
        assert(StreamingQueries.commitIngestBatch(spark, s, streamed, i.toLong))
      }
      assert(IndexCatalog.currentVersion(streamed) == 4) // build + 3 batches

      SimilarityQueries.buildEmbedStore(spark, dir, batched)
      SimilarityQueries.appendEmbedStore(
        spark, embeddingsOf(pmod(col("vec_id"), lit(4)) === 1), batched)

      val probe = pmod(col("vec_id"), lit(4)) === 3 &&
        col("vec_id") >= lit(4L * SimilarityQueries.NQueries) &&
        col("vec_id") < lit(8L * SimilarityQueries.NQueries)
      val a = SimilarityQueries.probeEmbedStore(spark, dir, streamed, probe)
        .collect().map(_.toSeq).toSeq
      val b = SimilarityQueries.probeEmbedStore(spark, dir, batched, probe)
        .collect().map(_.toSeq).toSeq
      assert(a.nonEmpty)
      assert(a == b)
    } finally {
      graft.Fs.deleteRecursively(streamed)
      graft.Fs.deleteRecursively(batched)
    }
  }
}
