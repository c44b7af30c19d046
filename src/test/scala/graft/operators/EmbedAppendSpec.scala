package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}
import graft.sources.IndexCatalog

/** Lifecycle contracts of the manifest-committed EMBEDDING stores
  * (sign-LSH bucket store and IVF cell store) — the same three
  * properties NeardupAppendSpec pins for the text store: committed
  * files are immutable under append, probe-after-append equals a
  * from-scratch rebuild over the grown corpus, and an uncommitted
  * generation is invisible to readers.
  */
class EmbedAppendSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def sha256(p: String): String = graft.TestHash.sha256(p)

  private def embeddingsOf(pred: org.apache.spark.sql.Column) =
    Engine.table(spark, dir, "embeddings")
      .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
      .filter(pred)

  test("embed store: append commits a generation, v1 files stay byte-identical") {
    val base = Files.createTempDirectory("graft_embapp").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base)
      assert(IndexCatalog.currentVersion(base) == 1)
      val v1Sums = IndexCatalog.files(base, 1).map(f => f -> sha256(f)).toMap
      assert(v1Sums.nonEmpty)

      SimilarityQueries.appendEmbedStore(
        spark, embeddingsOf(pmod(col("vec_id"), lit(4)) === 1), base)
      assert(IndexCatalog.currentVersion(base) == 2)
      val v2Files = IndexCatalog.files(base, 2).toSet
      v1Sums.foreach { case (f, sum) =>
        assert(v2Files.contains(f), s"v2 manifest dropped $f")
        assert(sha256(f) == sum, s"append mutated committed file $f")
      }
      assert(v2Files.size > v1Sums.size)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("as-of probe: v1 answers the pre-append question; an expired version fails fast") {
    val base = Files.createTempDirectory("graft_embasof").toString
    try {
      val probeB = pmod(col("vec_id"), lit(4)) === 3 &&
        col("vec_id") < 4 * SimilarityQueries.NQueries
      SimilarityQueries.buildEmbedStore(spark, dir, base)
      val pre = SimilarityQueries.probeEmbedStore(spark, dir, base, probeB)
        .collect().map(_.toString).sorted
      SimilarityQueries.appendEmbedStore(
        spark, embeddingsOf(pmod(col("vec_id"), lit(4)) === 1), base)
      // the versioned probe answers exactly what the store knew at v1
      val asof = SimilarityQueries
        .probeEmbedStore(spark, dir, base, probeB, version = 1)
        .collect().map(_.toString).sorted
      assert(asof.sameElements(pre))
      // retention expiry: a pre-horizon version fails at manifest
      // resolution, not by silently listing vanished files
      IndexCatalog.vacuum(base, retain = 1)
      intercept[java.nio.file.NoSuchFileException] {
        SimilarityQueries.probeEmbedStore(spark, dir, base, probeB, version = 1)
      }
    } finally graft.Fs.deleteRecursively(base)
  }

  test("embed store: probe after append == probe of a store rebuilt over the grown corpus") {
    val grown = Files.createTempDirectory("graft_embapp_g").toString
    val rebuilt = Files.createTempDirectory("graft_embapp_r").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, grown)
      SimilarityQueries.appendEmbedStore(
        spark, embeddingsOf(pmod(col("vec_id"), lit(4)) === 1), grown)
      // rebuilt: ONE generation holding the whole grown corpus — same
      // planes (the build-time even ids), a genuinely different file
      // layout, so equality is a property of the manifest+bucket
      // semantics, not of running the same steps twice
      val evens = embeddingsOf(pmod(col("vec_id"), lit(2)) === 0)
      evens.filter(col("vec_id") < 2 * SimilarityQueries.NPlanes)
        .select(col("vec_id").as("plane_id"), col("embedding").as("p_emb"))
        .coalesce(1).write.mode("overwrite").parquet(s"$rebuilt/planes")
      SimilarityQueries.writeEmbedGen(
        spark,
        embeddingsOf(pmod(col("vec_id"), lit(2)) === 0 ||
          pmod(col("vec_id"), lit(4)) === 1),
        rebuilt)
      assert(IndexCatalog.currentVersion(grown) == 2)
      assert(IndexCatalog.currentVersion(rebuilt) == 1)
      val probeB = pmod(col("vec_id"), lit(4)) === 3 &&
        col("vec_id") < 4 * SimilarityQueries.NQueries
      val a = SimilarityQueries.probeEmbedStore(spark, dir, grown, probeB)
        .collect().map(_.toString).sorted
      val b = SimilarityQueries.probeEmbedStore(spark, dir, rebuilt, probeB)
        .collect().map(_.toString).sorted
      assert(a.sameElements(b))
      assert(a.nonEmpty)
    } finally {
      graft.Fs.deleteRecursively(grown)
      graft.Fs.deleteRecursively(rebuilt)
    }
  }

  test("partition-scoped compaction rewrites only the target bucket; the rest carry forward byte-identical") {
    val base = Files.createTempDirectory("graft_embapp_pc").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base)
      SimilarityQueries.appendEmbedStore(
        spark, embeddingsOf(pmod(col("vec_id"), lit(4)) === 1), base)
      val probeB = pmod(col("vec_id"), lit(4)) === 3 &&
        col("vec_id") < 4 * SimilarityQueries.NQueries
      val pre = SimilarityQueries.probeEmbedStore(spark, dir, base, probeB)
        .collect().map(_.toString).sorted
      // the hottest bucket: most fragmented across the two generations
      val keyOf = (f: String) => IndexCatalog.partitionKey(f).get
      val v2 = IndexCatalog.files(base, 2)
      val hot = v2.groupBy(keyOf).maxBy(_._2.size)._1
      val hotBucket = hot.stripPrefix("bucket=").toLong
      val untouched = v2.filterNot(f => keyOf(f) == hot)
        .map(f => f -> sha256(f)).toMap
      assert(untouched.nonEmpty)

      SimilarityQueries.compactEmbedStorePartitions(spark, base, Seq(hotBucket))
      assert(IndexCatalog.currentVersion(base) == 3)
      val v3 = IndexCatalog.files(base, 3)
      // untouched partitions: same paths in the new manifest, same bytes
      untouched.foreach { case (f, sum) =>
        assert(v3.contains(f), s"compaction dropped untouched $f")
        assert(sha256(f) == sum, s"compaction mutated untouched $f")
      }
      // the hot bucket: all-new files in v3, old files superseded but
      // still on disk for v2 readers (time travel until vacuum)
      val oldHot = v2.filter(f => keyOf(f) == hot)
      val newHot = v3.filter(f => keyOf(f) == hot)
      assert(newHot.nonEmpty && oldHot.toSet.intersect(newHot.toSet).isEmpty)
      oldHot.foreach(f => assert(Files.exists(Paths.get(f))))
      // content invariant: the probe answers identically at v3
      val post = SimilarityQueries.probeEmbedStore(spark, dir, base, probeB)
        .collect().map(_.toString).sorted
      assert(post.sameElements(pre))
    } finally graft.Fs.deleteRecursively(base)
  }

  test("embed store: a fully-duplicate append is a no-op, not a failed commit") {
    val base = Files.createTempDirectory("graft_embapp_d").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base)
      val batch = embeddingsOf(pmod(col("vec_id"), lit(4)) === 1)
      SimilarityQueries.appendEmbedStore(spark, batch, base)
      assert(IndexCatalog.currentVersion(base) == 2)
      val v2 = IndexCatalog.files(base, 2)
      // the same batch again: every id anti-joins away, zero files are
      // written, and NO version is published (the documented skip)
      SimilarityQueries.appendEmbedStore(spark, batch, base)
      assert(IndexCatalog.currentVersion(base) == 2)
      assert(IndexCatalog.files(base, 2) == v2)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("embed store: an uncommitted generation is invisible; IVF likewise") {
    val base = Files.createTempDirectory("graft_embapp_u").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base)
      val before = IndexCatalog.latestFiles(base)
      // torn write: data lands inside an existing bucket dir but no
      // manifest commit happens
      val bucketDir = Paths.get(before.head).getParent
      Files.writeString(bucketDir.resolve("part-orphan.parquet"), "torn")
      assert(IndexCatalog.currentVersion(base) == 1)
      assert(IndexCatalog.latestFiles(base) == before)
      val plan = SimilarityQueries.probeEmbedStore(spark, dir, base)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("part-orphan"),
        "probe plan must not list uncommitted files")
    } finally graft.Fs.deleteRecursively(base)

    val ivf = Files.createTempDirectory("graft_ivfapp_u").toString
    try {
      SimilarityQueries.buildIvfIndex(spark, dir, ivf)
      val before = IndexCatalog.latestFiles(ivf)
      val cellDir = Paths.get(before.head).getParent
      Files.writeString(cellDir.resolve("part-orphan.parquet"), "torn")
      assert(IndexCatalog.latestFiles(ivf) == before)
      val rows = SimilarityQueries.probeIvfIndex(spark, ivf).collect()
      assert(rows.nonEmpty) // the torn file never parses because it is never read
    } finally graft.Fs.deleteRecursively(ivf)
  }

  test("embed store: compaction supersedes generations and vacuum reclaims them, content invariant") {
    val base = Files.createTempDirectory("graft_vac").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base)
      SimilarityQueries.appendEmbedStore(
        spark, embeddingsOf(pmod(col("vec_id"), lit(4)) === 1), base)
      val probeB = pmod(col("vec_id"), lit(4)) === 3 &&
        col("vec_id") < 4 * SimilarityQueries.NQueries
      val before = SimilarityQueries.probeEmbedStore(spark, dir, base, probeB)
        .collect().map(_.toString).sorted
      val v2Files = IndexCatalog.files(base, 2).toSet

      SimilarityQueries.compactEmbedStore(spark, base)
      assert(IndexCatalog.currentVersion(base) == 3)
      val v3Files = IndexCatalog.files(base, 3).toSet
      // a rewrite commit: the new manifest shares nothing with v2 and
      // the compacted layout is smaller than the accumulated one
      assert(v3Files.intersect(v2Files).isEmpty)
      assert(v3Files.size < v2Files.size)
      val afterCompact = SimilarityQueries
        .probeEmbedStore(spark, dir, base, probeB)
        .collect().map(_.toString).sorted
      assert(afterCompact.sameElements(before))

      val deleted = IndexCatalog.vacuum(base, retain = 1)
      assert(deleted.toSet == v2Files) // v1 ⊆ v2 by cumulative commit
      assert(v2Files.forall(f => !Files.exists(Paths.get(f))))
      assert(v3Files.forall(f => Files.exists(Paths.get(f))))
      assert(scala.util.Try(IndexCatalog.files(base, 1)).isFailure)
      assert(scala.util.Try(IndexCatalog.files(base, 2)).isFailure)
      val afterVacuum = SimilarityQueries
        .probeEmbedStore(spark, dir, base, probeB)
        .collect().map(_.toString).sorted
      assert(afterVacuum.sameElements(before))
      assert(afterVacuum.nonEmpty)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("vacuum with retain=2 keeps the in-window version's files and drops only pre-horizon manifests") {
    val base = Files.createTempDirectory("graft_vac2").toString
    try {
      SimilarityQueries.buildEmbedStore(spark, dir, base)
      SimilarityQueries.appendEmbedStore(
        spark, embeddingsOf(pmod(col("vec_id"), lit(4)) === 1), base)
      SimilarityQueries.compactEmbedStore(spark, base)
      val v2Files = IndexCatalog.files(base, 2)
      val deleted = IndexCatalog.vacuum(base, retain = 2)
      // v2 is inside the retention window: every file it references
      // survives, so nothing is reclaimed and v2 stays readable
      assert(deleted.isEmpty)
      assert(v2Files.forall(f => Files.exists(Paths.get(f))))
      assert(IndexCatalog.files(base, 2) == v2Files)
      assert(scala.util.Try(IndexCatalog.files(base, 1)).isFailure)
      // metadata written outside the catalog is never vacuum's business
      assert(Files.isDirectory(Paths.get(s"$base/planes")))
      assert(IndexCatalog.listDataFiles(s"$base/planes").nonEmpty)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("IVF store: append commits a generation, v1 files stay byte-identical") {
    val base = Files.createTempDirectory("graft_ivfapp").toString
    try {
      val even = embeddingsOf(pmod(col("vec_id"), lit(2)) === 0)
      SimilarityQueries.buildIvfStore(spark, base, even, even,
        col("vec_id") < 2 * SimilarityQueries.NList)
      assert(IndexCatalog.currentVersion(base) == 1)
      val v1Sums = IndexCatalog.files(base, 1).map(f => f -> sha256(f)).toMap
      assert(v1Sums.nonEmpty)

      SimilarityQueries.appendIvfStore(
        spark, embeddingsOf(pmod(col("vec_id"), lit(4)) === 1), base)
      assert(IndexCatalog.currentVersion(base) == 2)
      val v2Files = IndexCatalog.files(base, 2).toSet
      v1Sums.foreach { case (f, sum) =>
        assert(v2Files.contains(f), s"v2 manifest dropped $f")
        assert(sha256(f) == sum, s"append mutated committed file $f")
      }
      assert(v2Files.size > v1Sums.size)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("IVF store: probe after append == probe of a store rebuilt over the grown corpus") {
    val grown = Files.createTempDirectory("graft_ivfapp_g").toString
    val rebuilt = Files.createTempDirectory("graft_ivfapp_r").toString
    try {
      val even = embeddingsOf(pmod(col("vec_id"), lit(2)) === 0)
      val batchA = embeddingsOf(pmod(col("vec_id"), lit(4)) === 1)
      SimilarityQueries.buildIvfStore(spark, grown, even, even,
        col("vec_id") < 2 * SimilarityQueries.NList)
      SimilarityQueries.appendIvfStore(spark, batchA, grown)
      // rebuilt: ONE generation holding the whole grown corpus, with the
      // SAME frozen centroid family (trained on the even build corpus) —
      // a different file layout, so equality is a property of the
      // manifest + cell-assignment semantics, not of repeating steps
      SimilarityQueries.buildIvfStore(spark, rebuilt, even,
        even.unionByName(batchA), col("vec_id") < 2 * SimilarityQueries.NList)
      assert(IndexCatalog.currentVersion(grown) == 2)
      assert(IndexCatalog.currentVersion(rebuilt) == 1)
      val probeB = pmod(col("vec_id"), lit(4)) === 3 &&
        col("vec_id") < 4 * SimilarityQueries.NQueries
      val a = SimilarityQueries.probeIvfBatch(spark, dir, grown, probeB)
        .collect().map(_.toString).sorted
      val b = SimilarityQueries.probeIvfBatch(spark, dir, rebuilt, probeB)
        .collect().map(_.toString).sorted
      assert(a.sameElements(b))
      assert(a.nonEmpty)
    } finally {
      graft.Fs.deleteRecursively(grown)
      graft.Fs.deleteRecursively(rebuilt)
    }
  }
}
