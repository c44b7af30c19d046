package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}
import graft.sources.IndexCatalog

/** Materialized-view maintenance contracts (q_store_matview's
  * mechanism): a delta rewrites ONLY the view partitions it touches,
  * a replayed batchId commits nothing, an empty delta commits
  * nothing, and the folded view equals the direct aggregate.
  */
class StoreMatviewSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def viewRows(mv: String): Map[Long, (Long, Long)] =
    spark.read.option("basePath", s"$mv/agg")
      .parquet(IndexCatalog.latestFiles(mv): _*)
      .select(col("bucket").cast("long"), col("n_rows"), col("id_sum"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("delta folds touch only their buckets; replay and empty deltas are no-ops; view equals direct aggregate") {
    val src = Files.createTempDirectory("graft_mvspec_src").toString
    val mv = Files.createTempDirectory("graft_mvspec_view").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, src)
      val stored = spark.read.option("basePath", s"$src/corpus")
        .parquet(IndexCatalog.latestFiles(src): _*)
        .select(col("vec_id"), col("bucket").cast("long").as("bucket"))

      // batch 0: the whole corpus
      assert(StreamingQueries.commitMvBatch(spark, stored, mv, 0L))
      val direct = stored.groupBy("bucket")
        .agg(count(lit(1)).as("n"), sum("vec_id").cast("long").as("s"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(viewRows(mv) == direct)

      // batch 1: a delta touching exactly ONE bucket — every other
      // view partition's files must carry forward byte-identical
      val hot = direct.keys.min
      val v1Files = IndexCatalog.files(mv, 1)
      val untouched = v1Files
        .filterNot(f => IndexCatalog.partitionKey(f).contains(s"bucket=$hot"))
        .map(f => f -> graft.TestHash.sha256(f)).toMap
      assert(untouched.nonEmpty)
      val delta = stored.filter(col("bucket") === hot).limit(3)
      val dCensus = delta.agg(count(lit(1)), sum("vec_id").cast("long"))
        .collect()(0)
      assert(StreamingQueries.commitMvBatch(spark, delta, mv, 1L))
      assert(IndexCatalog.currentVersion(mv) == 2)
      val v2Files = IndexCatalog.files(mv, 2)
      untouched.foreach { case (f, sum) =>
        assert(v2Files.contains(f), s"delta dropped untouched view file $f")
        assert(graft.TestHash.sha256(f) == sum, s"delta mutated view file $f")
      }
      val after = viewRows(mv)
      assert(after(hot) ==
        (direct(hot)._1 + dCensus.getLong(0), direct(hot)._2 + dCensus.getLong(1)))
      assert((after - hot) == (direct - hot))

      // replayed batchId: tag already committed, nothing happens
      assert(!StreamingQueries.commitMvBatch(spark, delta, mv, 1L))
      assert(IndexCatalog.currentVersion(mv) == 2)
      // empty delta: nothing happens
      assert(!StreamingQueries.commitMvBatch(spark, delta.limit(0), mv, 7L))
      assert(IndexCatalog.currentVersion(mv) == 2)
    } finally {
      graft.Fs.deleteRecursively(src)
      graft.Fs.deleteRecursively(mv)
    }
  }

  test("signed folds subtract, zero a bucket out of the view, and replay as no-ops") {
    import spark.implicits._
    val mv = Files.createTempDirectory("graft_mvspec_signed").toString
    try {
      // seed: two buckets via the positive path
      val seed = Seq((1L, 10L), (2L, 10L), (3L, 20L)).toDF("vec_id", "bucket")
      assert(StreamingQueries.commitMvBatch(spark, seed, mv, 0L))
      assert(viewRows(mv) == Map(10L -> (2L, 3L), 20L -> (1L, 3L)))

      // signed fold: move vec_id 2 from bucket 10 to bucket 20
      // (an update's preimage subtracts, its postimage adds)
      val move = Seq((10L, -1L, -2L), (20L, 1L, 2L))
        .toDF("bucket", "d_n", "d_sum")
      assert(StreamingQueries.commitMvDelta(spark, move, mv, 1L))
      assert(viewRows(mv) == Map(10L -> (1L, 1L), 20L -> (2L, 5L)))

      // signed fold that zeroes bucket 10: its partition must LEAVE
      // the view (no zero-count rows, no files under its key)
      val erase = Seq((10L, -1L, -1L)).toDF("bucket", "d_n", "d_sum")
      assert(StreamingQueries.commitMvDelta(spark, erase, mv, 2L))
      assert(viewRows(mv) == Map(20L -> (2L, 5L)))
      assert(IndexCatalog.latestFiles(mv)
        .forall(f => !IndexCatalog.partitionKey(f).contains("bucket=10")))

      // replayed signed batchId: tag guard holds, nothing happens
      val v = IndexCatalog.currentVersion(mv)
      assert(!StreamingQueries.commitMvDelta(spark, erase, mv, 2L))
      assert(IndexCatalog.currentVersion(mv) == v)
      // fully-cancelled delta (empty after the caller's zero-filter):
      // nothing happens
      val none = Seq.empty[(Long, Long, Long)].toDF("bucket", "d_n", "d_sum")
      assert(!StreamingQueries.commitMvDelta(spark, none, mv, 9L))
      assert(IndexCatalog.currentVersion(mv) == v)
    } finally {
      graft.Fs.deleteRecursively(mv)
    }
  }

  test("CDC matview fold survives a base-store column addition mid-stream") {
    import graft.sources.StagedWrite
    val base = Files.createTempDirectory("graft_mvevo_store").toString
    val mv = Files.createTempDirectory("graft_mvevo_view").toString
    val ckpt = Files.createTempDirectory("graft_mvevo_ckpt").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base) // v1: evens
      StreamingQueries.drainCdcMatview(spark, base, mv, ckpt)

      // EVOLVE the base store mid-stream, q_store_schema-style: a
      // generation of odd vec_ids WITH an added nullable `src` column,
      // bucketed by the store's frozen planes (writeEmbedGen's exact
      // sign formula) so the files land in the normal layout
      val planes = spark.read.parquet(s"$base/planes")
      val evolved = SimilarityQueries.embeddings(spark, dir)
        .filter(pmod(col("vec_id"), lit(2)) === 1)
        .crossJoin(planes)
        .withColumn("bit",
          when(SimilarityQueries.dot(col("embedding"), col("p_emb")) >= 0,
            expr("shiftleft(1L, cast(plane_id div 2 AS int))")).otherwise(0L))
        .groupBy(col("vec_id"), col("embedding"), col("nrm"))
        .agg(sum(col("bit")).as("bucket"))
        .withColumn("src", concat(lit("batch-"), col("vec_id") % 3))
      val newFiles = StagedWrite.partitioned(
        evolved.repartition(col("bucket")), s"$base/corpus", Seq("bucket"))
      IndexCatalog.commitFiles(base, newFiles,
        Seq("schema=vec_id BIGINT, embedding ARRAY<FLOAT>, nrm DOUBLE, src STRING"))

      // the evolution is real: the new generation's files carry `src`
      assert(spark.read.parquet(newFiles.head).columns.contains("src"))

      // the follower's next drain crosses the evolution boundary: the
      // cdc reader decodes by field name, so the widened files stream
      // through the FIXED projection and the fold commits normally
      StreamingQueries.drainCdcMatview(spark, base, mv, ckpt)

      // view == direct aggregate over the evolved store (mergeSchema
      // read: pre-evolution files NULL-fill src, which the fold and
      // this census never touch)
      val direct = spark.read.option("mergeSchema", "true")
        .option("basePath", s"$base/corpus")
        .parquet(IndexCatalog.latestFiles(base): _*)
        .groupBy(col("bucket").cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"), sum("vec_id").cast("long").as("s"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(viewRows(mv) == direct,
        "view diverged from the direct aggregate across the schema evolution")
    } finally {
      Seq(base, mv, ckpt).foreach(graft.Fs.deleteRecursively)
    }
  }
}
