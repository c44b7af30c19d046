package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}
import graft.sources.{FileBloom, IndexCatalog}

/** Bloom-sidecar point-lookup contracts (q_store_lookup's mechanism):
  * no false negatives (the file physically holding an id always
  * survives its lookup's prune), real pruning on single-id lookups,
  * conservative keep for files without a sidecar, idempotent
  * recording, and sidecar death with the file under vacuum.
  */
class StoreLookupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("no false negatives, strict pruning, conservative no-sidecar keep, idempotent record") {
    val base = Files.createTempDirectory("graft_blsp").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base) // v1: evens
      SimilarityQueries.appendEmbedStore(spark,
        Engine.table(spark, dir, "embeddings")
          .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
          .filter(pmod(col("vec_id"), lit(4)) === 1), base) // v2
      val all = IndexCatalog.latestFiles(base)
      FileBloom.record(spark, base, all, "vec_id")

      // ground truth: which file physically holds each id
      val idFile = spark.read.parquet(all: _*)
        .select(col("vec_id"),
          regexp_replace(input_file_name(), "^file:(//)?", "").as("f"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

      // no false negatives: for a sample of stored ids, the holding
      // file survives that id's prune — and the prune is strict
      // (store-wide single-id lookups touch a sliver of the files)
      val sample = idFile.keys.toSeq.sorted.take(24)
      sample.foreach { id =>
        val kept = FileBloom.prunePoint(spark, base, all, "vec_id", Seq(id))
        assert(kept.contains(idFile(id)),
          s"bloom prune dropped the file holding vec_id=$id")
        assert(kept.size < all.size, s"no pruning at all for vec_id=$id")
      }

      // a file without a sidecar is always kept, whatever the keys
      val victim = all.head
      val sidecar = FileBloom.bloomPath(base, victim)
      val bytes = Files.readAllBytes(Paths.get(sidecar))
      Files.delete(Paths.get(sidecar))
      val keptNoSidecar =
        FileBloom.prunePoint(spark, base, all, "vec_id", Seq(-987654321L))
      assert(keptNoSidecar == Seq(victim),
        "an absurd key must prune every sketched file but keep the sidecar-less one")

      // idempotent record: re-recording restores the missing sidecar
      // byte-identically and leaves the others untouched
      FileBloom.record(spark, base, all, "vec_id")
      assert(Files.readAllBytes(Paths.get(sidecar)).sameElements(bytes),
        "re-recorded sidecar differs — the sketch is not deterministic")
    } finally graft.Fs.deleteRecursively(base)
  }

  test("second probe of a store reads zero sidecar bytes (parsed-sketch cache)") {
    val base = Files.createTempDirectory("graft_blcache").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base)
      val all = IndexCatalog.latestFiles(base)
      FileBloom.record(spark, base, all, "vec_id")
      // counting wrapper over the real fs; the cache is keyed per fs
      // instance, so this instance starts cold
      val reads = new java.util.concurrent.atomic.AtomicInteger
      val counting = new graft.sources.CatalogFs {
        private val d = graft.sources.LocalCatalogFs
        def listNames(x: String) = d.listNames(x)
        def listFilesRecursive(x: String, s: String) = d.listFilesRecursive(x, s)
        def readString(p: String) = { reads.incrementAndGet(); d.readString(p) }
        def exists(p: String) = d.exists(p)
        def mkdirs(x: String) = d.mkdirs(x)
        def delete(p: String) = d.delete(p)
        def mtimeMillis(p: String) = d.mtimeMillis(p)
        def publishIfAbsent(p: String, c: String) = d.publishIfAbsent(p, c)
      }
      val k1 = FileBloom.prunePoint(spark, base, all, "vec_id", Seq(42L), counting)
      val afterFirst = reads.get()
      assert(afterFirst == all.size, "first probe reads each sidecar once")
      val k2 = FileBloom.prunePoint(spark, base, all, "vec_id", Seq(42L), counting)
      assert(k1 == k2)
      assert(reads.get() == afterFirst,
        "second probe of the same store must read zero sidecar bytes")
      // a different key set still probes from the cache, zero reads
      FileBloom.prunePoint(spark, base, all, "vec_id", Seq(7L, 99L), counting)
      assert(reads.get() == afterFirst)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("sidecar capacity is per-file: re-recording one above-floor file alone is byte-identical") {
    val base = Files.createTempDirectory("graft_blcap").toString
    try {
      import spark.implicits._
      // two files with very different row counts, both above the 1024
      // floor — under subset-dependent sizing, re-recording the small
      // file alone would pick its own max instead of the pair's
      val big = s"$base/corpus/bucket=0"
      val small = s"$base/corpus/bucket=1"
      (0L until 9000L).toDF("vec_id").coalesce(1).write.parquet(big)
      (0L until 1500L).map(_ + 100000L).toDF("vec_id")
        .coalesce(1).write.parquet(small)
      val bigF = IndexCatalog.listDataFiles(big)
      val smallF = IndexCatalog.listDataFiles(small)
      FileBloom.record(spark, base, bigF ++ smallF, "vec_id")
      val p = FileBloom.bloomPath(base, smallF.head)
      val orig = Files.readAllBytes(Paths.get(p))
      Files.delete(Paths.get(p))
      FileBloom.record(spark, base, smallF, "vec_id") // subset re-record
      assert(Files.readAllBytes(Paths.get(p)).sameElements(orig),
        "re-recording a single sidecar must reproduce the original bytes " +
          "regardless of which files the recording call covers")
      // and the two capacity classes really differ (9000 → 16384,
      // 1500 → 2048), so the recording ran as two class passes
      assert(FileBloom.capacityOf(9000L) != FileBloom.capacityOf(1500L))
      // no false negatives across classes
      val kept = FileBloom.prunePoint(
        spark, base, bigF ++ smallF, "vec_id", Seq(100007L))
      assert(kept.contains(smallF.head) && !kept.contains(bigF.head))
    } finally graft.Fs.deleteRecursively(base)
  }

  test("an all-NULL column file records without error and never false-negatives") {
    val base = Files.createTempDirectory("graft_blnull").toString
    try {
      import spark.implicits._
      val fdir = s"$base/corpus/bucket=0"
      Seq[Option[Long]](None, None, None).toDF("vec_id")
        .coalesce(1).write.parquet(fdir)
      val files = graft.sources.IndexCatalog.listDataFiles(fdir)
      FileBloom.record(spark, base, files, "vec_id")
      // the file holds no real vec_id, so pruning it for any real key
      // is correct — the only contract is no crash and determinism
      val k1 = FileBloom.prunePoint(spark, base, files, "vec_id", Seq(42L))
      val k2 = FileBloom.prunePoint(spark, base, files, "vec_id", Seq(42L))
      assert(k1 == k2)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("vacuum deletes a reclaimed file's bloom sidecar with it") {
    val base = Files.createTempDirectory("graft_blvac").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base) // v1
      val v1Files = IndexCatalog.latestFiles(base)
      FileBloom.record(spark, base, v1Files, "vec_id")
      SimilarityQueries.compactEmbedStore(spark, base) // v2 supersedes v1
      IndexCatalog.vacuum(base, retain = 1)
      v1Files.foreach { f =>
        assert(!Files.exists(Paths.get(f)), s"vacuum kept superseded $f")
        assert(!Files.exists(Paths.get(FileBloom.bloomPath(base, f))),
          s"vacuum kept the dead file's bloom sidecar for $f")
      }
    } finally graft.Fs.deleteRecursively(base)
  }
}
