package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}
import graft.sources.IndexCatalog

/** Two concurrent ingest streams into ONE store, end to end at the
  * Spark level (IndexCatalogSpec races the commit protocol with fake
  * files; this races the real append path — staged partitioned
  * writes + optimistic-retry commits). The contract: both appends
  * land, the store's content is the exact union, and no file is ever
  * listed twice in a manifest — the double-listing hazard the staged
  * write closes (a listing-diff writer racing another could claim the
  * other's files into its own commit).
  */
class ConcurrentAppendSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def embeddingsOf(pred: org.apache.spark.sql.Column) =
    Engine.table(spark, dir, "embeddings")
      .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
      .filter(pred)

  test("racing appenders: both land, content is the exact union, no file double-listed") {
    val base = Files.createTempDirectory("graft_race_append").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base)
      assert(IndexCatalog.currentVersion(base) == 1)
      // disjoint odd-id batches — both disjoint from the even corpus,
      // so content-level conflict resolution is not in play and any
      // duplicate row can only come from the file-commit race
      val predA = pmod(col("vec_id"), lit(8)) === 1
      val predB = pmod(col("vec_id"), lit(8)) === 5
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val failures = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      val threads = Seq(predA, predB).map { p =>
        new Thread(() => {
          try {
            barrier.await(60, java.util.concurrent.TimeUnit.SECONDS)
            SimilarityQueries.appendEmbedStore(spark, embeddingsOf(p), base)
          } catch { case e: Throwable => failures.add(e.toString) }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join(120000))
      assert(failures.isEmpty, s"append failed: $failures")
      assert(IndexCatalog.currentVersion(base) == 3)

      // no manifest double-lists a file, and versions grow monotonically
      (1 to 3).foreach { v =>
        val fs = IndexCatalog.files(base, v)
        assert(fs.distinct.size == fs.size, s"v$v double-lists a file")
      }
      assert(IndexCatalog.files(base, 2).toSet
        .subsetOf(IndexCatalog.files(base, 3).toSet))

      // content = exact union: every id once, counts add up
      val stored = spark.read
        .option("basePath", s"$base/corpus")
        .parquet(IndexCatalog.latestFiles(base): _*)
      val n = stored.count()
      val nDistinct = stored.select("vec_id").distinct().count()
      val expected =
        embeddingsOf(pmod(col("vec_id"), lit(2)) === 0).count() +
          embeddingsOf(predA).count() + embeddingsOf(predB).count()
      assert(n == nDistinct, "a row was double-listed into the store")
      assert(n == expected, s"store holds $n rows, union is $expected")
    } finally graft.Fs.deleteRecursively(base)
  }
}
