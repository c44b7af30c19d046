package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}
import graft.sources.{FileStats, IndexCatalog}

/** File-statistics data-skipping contracts (q_store_skipping's
  * mechanism): pruning keeps exactly the files whose recorded id
  * range intersects the predicate, is CONSERVATIVE for files without
  * stats, keeps working for carried-forward files across later
  * commits, re-records across compaction rewrites, and sidecars die
  * with their data files under vacuum.
  */
class StoreSkippingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The gated query's store shape: planes + three id-ordered
    * generations over the even-id corpus.
    */
  private def buildThreeGen(base: String): Unit = {
    val e = Engine.table(spark, dir, "embeddings")
      .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
      .filter(pmod(col("vec_id"), lit(2)) === 0)
    e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("plane_id"), col("embedding").as("p_emb"))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/planes")
    SimilarityQueries.writeEmbedGen(spark, e.filter(col("vec_id") < 100), base)
    SimilarityQueries.writeEmbedGen(spark,
      e.filter(col("vec_id") >= 100 && col("vec_id") < 200), base)
    SimilarityQueries.writeEmbedGen(spark, e.filter(col("vec_id") >= 200), base)
  }

  test("range pruning keeps exactly the intersecting generation; census exact") {
    val base = Files.createTempDirectory("graft_skipspec").toString
    try {
      buildThreeGen(base)
      val all = IndexCatalog.latestFiles(base)
      val gen2 = IndexCatalog.files(base, 2).toSet --
        IndexCatalog.files(base, 1).toSet
      // every committed file has a recorded vec_id range
      val r = FileStats.ranges(base, all, "vec_id")
      assert(r.keySet == all.toSet)
      // generation ranges are disjoint by construction: pruning on
      // [120, 180] keeps ONLY generation-2 files (possibly fewer —
      // per-file ranges are tighter than the generation's, so a
      // bucket whose gen-2 ids all miss the range is skipped too)
      val kept = FileStats.prune(base, all, "vec_id", 120, 180)
      assert(kept.nonEmpty && kept.toSet.subsetOf(gen2))
      assert(kept.size < all.size)
      // the pruned scan's census equals the unpruned scan's
      def census(files: Seq[String]) =
        spark.read.option("basePath", s"$base/corpus").parquet(files: _*)
          .filter(col("vec_id").between(120, 180))
          .agg(count(lit(1)), sum("vec_id")).collect()(0)
      assert(census(kept) == census(all))
      // a disjoint range prunes everything; an all-covering range nothing
      assert(FileStats.prune(base, all, "vec_id", 2000, 3000)
        .forall(f => !r.contains(f)))
      assert(FileStats.prune(base, all, "vec_id", 0, Long.MaxValue).toSet
        == all.toSet)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("pruning is conservative: a file without a sidecar is always kept") {
    val base = Files.createTempDirectory("graft_skipspec2").toString
    try {
      buildThreeGen(base)
      val all = IndexCatalog.latestFiles(base)
      val gen1 = IndexCatalog.files(base, 1)
      // simulate a pre-stats file (an older store upgraded in place):
      // drop one gen-1 file's sidecar — a [120,180] probe must now
      // keep it even though its actual ids are all < 100
      val victim = gen1.head
      Files.delete(Paths.get(FileStats.statsPath(base, victim)))
      val kept = FileStats.prune(base, all, "vec_id", 120, 180).toSet
      assert(kept.contains(victim))
      assert(!gen1.tail.exists(kept.contains))
      // record() is idempotent and restores the sidecar
      FileStats.record(base, Seq(victim), Seq("vec_id"))
      assert(!FileStats.prune(base, all, "vec_id", 120, 180).contains(victim))
    } finally graft.Fs.deleteRecursively(base)
  }

  test("plain compaction destroys skipping; sorted compaction restores it; content invariant") {
    val base = Files.createTempDirectory("graft_skipsort").toString
    try {
      buildThreeGen(base)
      def census(files: Seq[String]) =
        spark.read.option("basePath", s"$base/corpus").parquet(files: _*)
          .filter(col("vec_id").between(120, 180))
          .agg(count(lit(1)), sum("vec_id")).collect()(0)
      val before = census(IndexCatalog.latestFiles(base))
      def frac(): Double = {
        val all = IndexCatalog.latestFiles(base)
        FileStats.prune(base, all, "vec_id", 120, 180).size.toDouble / all.size
      }
      val fIngest = frac()
      // a PLAIN compaction merges the id-ordered generations into
      // full-range files: the prune keeps (nearly) everything
      SimilarityQueries.compactEmbedStore(spark, base)
      val fPlain = frac()
      assert(fPlain > fIngest,
        f"plain compaction should widen ranges: $fIngest%.2f -> $fPlain%.2f")
      // the SORTED compaction restores tight, task-disjoint id slices
      SimilarityQueries.compactEmbedStoreSorted(spark, base)
      val fSorted = frac()
      assert(fSorted < fPlain,
        f"sorted compaction should restore skipping: $fPlain%.2f -> $fSorted%.2f")
      // layout-only: the pruned census is unchanged through both rewrites
      assert(census(FileStats.prune(base,
        IndexCatalog.latestFiles(base), "vec_id", 120, 180)) == before)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("stats follow files across carry-forward, compaction, and vacuum") {
    val base = Files.createTempDirectory("graft_skipspec3").toString
    try {
      buildThreeGen(base)
      val preCompact = IndexCatalog.latestFiles(base)
      // carried-forward files (committed at v1/v2) still have their
      // stats at v3 — sidecars are keyed by path, zero maintenance
      assert(FileStats.ranges(base, preCompact, "vec_id").keySet
        == preCompact.toSet)
      // a compaction rewrite produces fresh files with fresh stats
      SimilarityQueries.compactEmbedStore(spark, base)
      val compacted = IndexCatalog.latestFiles(base)
      assert(compacted.toSet.intersect(preCompact.toSet).isEmpty)
      assert(FileStats.ranges(base, compacted, "vec_id").keySet
        == compacted.toSet)
      // vacuum deletes superseded files AND their sidecars; live
      // files keep theirs
      IndexCatalog.vacuum(base, retain = 1)
      preCompact.foreach { f =>
        assert(!Files.exists(Paths.get(f)))
        assert(!Files.exists(Paths.get(FileStats.statsPath(base, f))),
          s"vacuum left the sidecar of deleted $f")
      }
      assert(FileStats.ranges(base, compacted, "vec_id").keySet
        == compacted.toSet)
    } finally graft.Fs.deleteRecursively(base)
  }
}
