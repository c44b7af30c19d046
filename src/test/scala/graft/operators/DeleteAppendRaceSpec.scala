package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}
import graft.sources.IndexCatalog

/** A row-level DELETE racing an APPEND into the same store — the
  * mixed-DML race [[ConcurrentAppendSpec]] doesn't cover: the delete's
  * partition-replacement commit and the append's file-list commit CAS
  * on the same version chain, the loser re-derives against the
  * winner's state, and the final content must be exactly
  * (corpus ∖ deleted) ∪ appended regardless of which landed first —
  * a delete losing the CAS must not resurrect rows or drop the
  * winner's appended files from the manifest, and an append losing
  * must not re-insert deleted rows' files into a stale file list.
  */
class DeleteAppendRaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def embeddingsOf(pred: org.apache.spark.sql.Column) =
    Engine.table(spark, dir, "embeddings")
      .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
      .filter(pred)

  test("delete racing append: CAS serializes them, content = corpus minus deleted plus appended") {
    val base = Files.createTempDirectory("graft_race_delapp").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base) // v1: even ids
      // disjoint sets: delete a slice of the stored evens, append odds
      val delPred = pmod(col("vec_id"), lit(8)) === 0
      val addPred = pmod(col("vec_id"), lit(8)) === 1
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val failures = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      val ops: Seq[() => Unit] = Seq(
        () => SimilarityQueries.deleteFromEmbedStore(spark, base,
          embeddingsOf(delPred).select(col("vec_id"), col("embedding"))),
        () => SimilarityQueries.appendEmbedStore(spark,
          embeddingsOf(addPred), base))
      val threads = ops.map { op =>
        new Thread(() => {
          try {
            barrier.await(60, java.util.concurrent.TimeUnit.SECONDS)
            op()
          } catch { case e: Throwable => failures.add(e.toString) }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join(120000))
      assert(failures.isEmpty, s"racing DML failed: $failures")
      assert(IndexCatalog.currentVersion(base) == 3,
        "both commits must land as distinct versions")
      (1 to 3).foreach { v =>
        val fs = IndexCatalog.files(base, v)
        assert(fs.distinct.size == fs.size, s"v$v double-lists a file")
      }
      val stored = spark.read
        .option("basePath", s"$base/corpus")
        .parquet(IndexCatalog.latestFiles(base): _*)
      val ids = stored.select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(ids.distinct.size == ids.size, "a row appears twice")
      val expected =
        (embeddingsOf(pmod(col("vec_id"), lit(2)) === 0 && !delPred)
          .select("vec_id").collect().map(_.getLong(0)) ++
          embeddingsOf(addPred).select("vec_id").collect().map(_.getLong(0)))
          .toSet
      assert(ids.toSet == expected,
        s"extra=${ids.toSet -- expected} missing=${expected -- ids.toSet}")
    } finally graft.Fs.deleteRecursively(base)
  }
}
