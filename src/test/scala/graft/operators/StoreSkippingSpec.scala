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

  test("declared stats columns resolve from manifest tags; pruneAll = intersection of per-column prunes") {
    val base = Files.createTempDirectory("graft_declspec").toString
    try {
      import spark.implicits._
      // no declaration yet -> empty, recordDeclared is a no-op
      val f0 = s"$base/corpus"
      (0L until 400L).map(i => (i, i % 8, (i / 16) % 24))
        .toDF("event_id", "ub", "hr")
        .repartitionByRange(4, col("hr"), col("event_id"))
        .write.parquet(f0)
      val files = IndexCatalog.listDataFiles(f0)
      IndexCatalog.commitFiles(base, files,
        Seq(FileStats.declareTag(Seq("event_id", "hr"))))
      assert(FileStats.declaredCols(base) == Seq("event_id", "hr"))
      FileStats.recordDeclared(base, files)
      // both declared columns recorded; an undeclared one is not
      assert(FileStats.ranges(base, files, "event_id").keySet == files.toSet)
      assert(FileStats.ranges(base, files, "hr").keySet == files.toSet)
      assert(FileStats.ranges(base, files, "ub").isEmpty)
      // conjunctive prune == intersection of the per-column prunes
      val preds = Seq(("event_id", 50L, 250L), ("hr", 4L, 7L))
      val both = FileStats.pruneAll(base, files, preds).toSet
      val byId = FileStats.prune(base, files, "event_id", 50, 250).toSet
      val byHr = FileStats.prune(base, files, "hr", 4, 7).toSet
      assert(both == byId.intersect(byHr))
      // an undeclared column in the predicate is unbounded: keeps all
      assert(FileStats.pruneAll(base, files,
        preds :+ (("ub", 100L, 200L))).toSet == both)
      // a LATER commit re-declares and supersedes (newest live wins)
      val extra = s"$base/corpus2"
      (0L until 8L).map(i => (i, i, i)).toDF("event_id", "ub", "hr")
        .coalesce(1).write.parquet(extra)
      val f2 = IndexCatalog.listDataFiles(extra)
      IndexCatalog.commitFiles(base, f2,
        Seq(FileStats.declareTag(Seq("event_id", "ub", "hr"))))
      assert(FileStats.declaredCols(base) == Seq("event_id", "ub", "hr"))
      FileStats.recordDeclared(base, f2)
      assert(FileStats.ranges(base, f2, "ub").keySet == f2.toSet)
      // pre-widening files lack the new column -> conservative keep
      assert(FileStats.pruneAll(base, files :+ f2.head,
        Seq(("ub", 100L, 200L))).toSet == files.toSet)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("z-order OPTIMIZE: conjunctive kept-fraction shrinks strictly vs 1-D sort vs ingest; content invariant") {
    val base = Files.createTempDirectory("graft_zoptspec").toString
    try {
      val preds = Seq(("ub", 2L, 3L), ("hr", 4L, 7L))
      def keptFrac(v: Int): Double = {
        val files = IndexCatalog.files(base, v)
        FileStats.pruneAll(base, files, preds).size.toDouble / files.size
      }
      def census(v: Int) = {
        val files = IndexCatalog.files(base, v)
        spark.read.parquet(
          FileStats.pruneAll(base, files, preds): _*)
          .filter(col("ub").between(2, 3) && col("hr").between(4, 7))
          .agg(count(lit(1)), sum("event_id")).collect()(0)
      }
      // drive the exact gated lifecycle (build -> sort -> zorder)
      // through the shared query; its ok boolean re-checks the
      // ordering internally — here we re-derive the fractions and
      // the layout-only invariant from the store it leaves behind
      val out = SourceQueries.qStoreZorder(spark, dir).collect()
      assert(out.forall(_.getAs[Boolean]("zorder_ok")))
      // the leased store is gone (fresh temp base per call), so build
      // our own three-layout store via the same internals and verify
      // fraction ordering end-to-end
      val ev = Engine.table(spark, dir, "events")
        .select(col("event_id"), col("event_type"),
          (col("user_id") % 8).as("ub"),
          expr("hour(ts)").cast("long").as("hr"))
      import graft.sources.StagedWrite
      def commitLayout(rows: org.apache.spark.sql.DataFrame,
          key: org.apache.spark.sql.Column, rewrite: Boolean): Unit = {
        val basedOn = IndexCatalog.currentVersion(base)
        val files = StagedWrite.partitioned(
          rows.repartitionByRange(32, key, col("event_id")),
          s"$base/corpus", Seq.empty)
        if (rewrite) {
          FileStats.recordDeclared(base, files)
          IndexCatalog.commitRewrite(base, files, Seq("opt"), basedOn)
        } else {
          IndexCatalog.commitFiles(base, files,
            Seq(FileStats.declareTag(Seq("event_id", "ub", "hr"))))
          FileStats.recordDeclared(base, files)
        }
      }
      commitLayout(ev, col("event_id"), rewrite = false) // v1 ingest
      val live = () => spark.read.parquet(
        IndexCatalog.latestFiles(base): _*)
      commitLayout(live(), col("ub"), rewrite = true) // v2 1-D sort
      commitLayout(live(),
        expr(SourceQueries.sparkMorton("ub", "hr")), rewrite = true) // v3 z
      val (f1, f2, f3) = (keptFrac(1), keptFrac(2), keptFrac(3))
      assert(f1 == 1.0, s"ingest layout should keep everything: $f1")
      assert(f2 < f1, s"1-D sort should prune the user axis: $f2 vs $f1")
      assert(f3 < f2, s"z-order should strictly beat 1-D sort: $f3 vs $f2")
      // layout-only: the pruned census is identical at all three versions
      assert(census(2) == census(1) && census(3) == census(1))
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
