package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}
import graft.sources.IndexCatalog

/** Row-level DELETE contracts (q_store_delete's mechanism): target
  * partitions derive from the hash family (no store scan to find
  * rows), untouched partitions carry forward byte-identical, a fully
  * emptied bucket is replaced with nothing, deleted rows stay
  * readable at pre-delete versions (time travel), and delete+vacuum
  * is physical erasure.
  */
class StoreDeleteSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def embeddingsOf(pred: org.apache.spark.sql.Column) =
    Engine.table(spark, dir, "embeddings")
      .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
      .filter(pred)

  test("delete rewrites only buckets holding deleted rows; an emptied bucket vanishes; v1 time-travels; vacuum erases") {
    val base = Files.createTempDirectory("graft_del").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base) // v1
      val keyOf = (f: String) => IndexCatalog.partitionKey(f).get
      val v1 = IndexCatalog.files(base, 1)
      val stored = spark.read.option("basePath", s"$base/corpus")
        .parquet(v1: _*)

      // delete set = EVERY row of one bucket plus a few rows of
      // another — exercises both the emptied-partition path and the
      // partial-rewrite path in one commit
      val buckets = stored.select(col("bucket").cast("long")).distinct()
        .collect().map(_.getLong(0)).sorted
      val emptied = buckets.head
      val partial = buckets.last
      assert(emptied != partial)
      val delIds = stored.filter(col("bucket") === emptied)
        .select("vec_id")
        .unionByName(stored.filter(col("bucket") === partial)
          .select("vec_id").limit(3))
      val del = embeddingsOf(lit(true))
        .join(delIds, Seq("vec_id"), "left_semi")
        .select(col("vec_id"), col("embedding"))
      val nDel = del.count()
      val untouched = v1
        .filterNot(f => Set(s"bucket=$emptied", s"bucket=$partial")(keyOf(f)))
        .map(f => f -> graft.TestHash.sha256(f)).toMap
      assert(untouched.nonEmpty)

      SimilarityQueries.deleteFromEmbedStore(spark, base, del)
      assert(IndexCatalog.currentVersion(base) == 2)
      val v2 = IndexCatalog.files(base, 2)
      // untouched partitions: same paths, same bytes
      untouched.foreach { case (f, sum) =>
        assert(v2.contains(f), s"delete dropped untouched $f")
        assert(graft.TestHash.sha256(f) == sum, s"delete mutated untouched $f")
      }
      // the emptied bucket has NO files at v2; its old files remain on
      // disk for v1 readers
      assert(!v2.exists(f => keyOf(f) == s"bucket=$emptied"))
      val emptiedOld = v1.filter(f => keyOf(f) == s"bucket=$emptied")
      assert(emptiedOld.nonEmpty)
      emptiedOld.foreach(f => assert(Files.exists(Paths.get(f))))
      // content: v2 = v1 minus the delete set; v1 still serves it all
      val v2Rows = spark.read.option("basePath", s"$base/corpus")
        .parquet(v2: _*)
      assert(v2Rows.count() == stored.count() - nDel)
      assert(v2Rows.join(delIds, Seq("vec_id"), "left_semi").count() == 0)
      assert(spark.read.option("basePath", s"$base/corpus")
        .parquet(IndexCatalog.files(base, 1): _*).count() == stored.count())

      // physical erasure: vacuum past the pre-delete version reclaims
      // the superseded files that still hold the deleted rows
      IndexCatalog.vacuum(base, retain = 1)
      emptiedOld.foreach(f =>
        assert(!Files.exists(Paths.get(f)), s"vacuum left deleted rows in $f"))
      assert(scala.util.Try(IndexCatalog.files(base, 1)).isFailure)
    } finally graft.Fs.deleteRecursively(base)
  }
}
