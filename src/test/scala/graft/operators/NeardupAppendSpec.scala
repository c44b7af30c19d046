package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}
import graft.sources.IndexCatalog

/** The append-maintained LSH store's lifecycle contracts — the three
  * properties that make incremental index maintenance trustworthy at
  * 100 TB, none of which the oracle row can see:
  *  - committed files are IMMUTABLE: an append adds a generation, it
  *    never rewrites or touches a byte of the build's files;
  *  - probe-after-append is EQUIVALENT to probing an index rebuilt
  *    from scratch over the grown corpus (same rows, not just same
  *    census);
  *  - an uncommitted generation is INVISIBLE: data files without a
  *    manifest commit change nothing for readers (crash-safety of the
  *    atomic-rename protocol).
  */
class NeardupAppendSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def sha256(p: String): String = graft.TestHash.sha256(p)

  private def storeChecksums(base: String, v: Int): Map[String, String] =
    IndexCatalog.files(base, v).map(f => f -> sha256(f)).toMap

  test("append commits a new generation; v1 files stay byte-identical") {
    val base = Files.createTempDirectory("graft_appendspec").toString
    try {
      DedupQueries.buildLshStore(spark, dir, base)
      assert(IndexCatalog.currentVersion(base) == 1)
      val v1Sums = storeChecksums(base, 1)
      assert(v1Sums.nonEmpty)

      val batchA = Engine.table(spark, dir, "documents")
        .filter(col("doc_id") % 4 === 1)
      DedupQueries.appendLshStore(spark, batchA, base)
      assert(IndexCatalog.currentVersion(base) == 2)

      // every v1 file is still listed in v2, on disk, and bit-identical
      val v2Files = IndexCatalog.files(base, 2).toSet
      v1Sums.foreach { case (f, sum) =>
        assert(v2Files.contains(f), s"v2 manifest dropped $f")
        assert(sha256(f) == sum, s"append mutated committed file $f")
      }
      // and v2 genuinely grew (the batch contributed new files)
      assert(v2Files.size > v1Sums.size)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("probe after append == probe of an index rebuilt over the grown corpus") {
    val grown = Files.createTempDirectory("graft_appendspec_g").toString
    val rebuilt = Files.createTempDirectory("graft_appendspec_r").toString
    try {
      val docs = Engine.table(spark, dir, "documents")
      DedupQueries.buildLshStore(spark, dir, grown) // evens
      DedupQueries.appendLshStore(
        spark, docs.filter(col("doc_id") % 4 === 1), grown)
      // rebuilt-from-scratch store over the SAME grown corpus: evens ∪ A
      DedupQueries.appendLshStore(
        spark,
        docs.filter(col("doc_id") % 2 === 0 || col("doc_id") % 4 === 1),
        rebuilt)
      val probeB = col("doc_id") % 4 === 3
      val a = DedupQueries.probeLshStore(spark, dir, grown, probeB).collect()
      val b = DedupQueries.probeLshStore(spark, dir, rebuilt, probeB).collect()
      assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
      assert(a.nonEmpty)
    } finally {
      graft.Fs.deleteRecursively(grown)
      graft.Fs.deleteRecursively(rebuilt)
    }
  }

  test("an uncommitted generation is invisible to readers") {
    val base = Files.createTempDirectory("graft_appendspec_u").toString
    try {
      DedupQueries.buildLshStore(spark, dir, base)
      val before = IndexCatalog.latestFiles(base)
      val probeB = col("doc_id") % 4 === 3
      val censusBefore =
        DedupQueries.probeLshStore(spark, dir, base, probeB).collect()

      // write generation data but CRASH before the manifest commit
      val gen = IndexCatalog.newGenDir(base)
      Files.writeString(Paths.get(gen, "part-orphan.parquet"), "torn write")

      assert(IndexCatalog.currentVersion(base) == 1)
      assert(IndexCatalog.latestFiles(base) == before)
      val censusAfter =
        DedupQueries.probeLshStore(spark, dir, base, probeB).collect()
      assert(censusBefore.map(_.toString).sorted
        .sameElements(censusAfter.map(_.toString).sorted))
    } finally graft.Fs.deleteRecursively(base)
  }
}
