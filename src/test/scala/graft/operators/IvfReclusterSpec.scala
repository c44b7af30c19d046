package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.IndexCatalog

/** `OPTIMIZE ... RECLUSTER` on the IVF store: under drift the frozen
  * cell family degrades (appends crowd the nearest frozen cell);
  * recluster must measurably restore balance, flip probes and appends
  * to the new geometry atomically, answer exactly what a from-scratch
  * build answers, and keep the old geometry probe-able by time travel.
  */
class IvfReclusterSpec extends SparkSpec {

  /** Synthetic drifted corpus: the build corpus A lives in the e0/e1
    * plane (ids 0..5 seed the build); the drifted batch B arrives
    * AFTER the centroid family froze, split across two tight
    * directions e2/e3 the family never saw, with a small +e0 bias so
    * every B row deterministically lands in the SAME frozen cell.
    * Ids 6 and 7 ride with B so the standard `vec_id < NList` reseed
    * at recluster time has a seed inside each B sub-cluster.
    */
  private val dim = 6

  private def vec(hot: Int, mag: Double, jit: Long): Seq[Float] = {
    val v = Array.fill(dim)(0.0f)
    v(hot) = mag.toFloat
    v(4) = (0.01 * (jit % 7)).toFloat
    v(5) = (0.01 * (jit % 5)).toFloat
    v.toSeq
  }

  private def mkCorpus(rows: Seq[Row]): DataFrame = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false)),
      StructField("label", IntegerType)))
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      .coalesce(1)
  }

  // A: ids 0..5 and 8..29 (28 rows), evens on e0, odds on e1
  private def aRows: Seq[Row] =
    ((0L to 5L) ++ (8L to 29L)).map { i =>
      Row(i, vec(hot = (i % 2).toInt, mag = 1.0, jit = i), 0)
    }

  // B: id 6 + 48..63 on e2, id 7 + 64..79 on e3 — every row with a
  // +0.1 e0 bias so the frozen argmax sends ALL of B to the e0 cell
  private def bRows: Seq[Row] = {
    def bVec(hot: Int, jit: Long): Seq[Float] = {
      val v = vec(hot, 1.0, jit).toArray
      v(0) = 0.1f
      v.toSeq
    }
    (Seq(6L) ++ (48L to 63L)).map(i => Row(i, bVec(2, i), 0)) ++
      (Seq(7L) ++ (64L to 79L)).map(i => Row(i, bVec(3, i), 0))
  }

  private def withNrm(df: DataFrame): DataFrame = {
    graft.Engine.register(spark)
    df.withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
  }

  private def occupancy(base: String): Map[Long, Long] =
    spark.read.option("basePath", s"$base/corpus")
      .parquet(IndexCatalog.latestFiles(base): _*)
      .groupBy(col("centroid_id").cast("long").as("cell"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("recluster restores cell balance on a drifted append and equals a from-scratch build") {
    val store = Files.createTempDirectory("graft_rc_store").toString
    val fresh = Files.createTempDirectory("graft_rc_fresh").toString
    try {
      val a = withNrm(mkCorpus(aRows))
      // build on A only: centroids frozen before B exists
      SimilarityQueries.buildIvfStore(spark, store, a, a,
        col("vec_id") < SimilarityQueries.NList)
      val vBuild = IndexCatalog.currentVersion(store)
      // drifted append: the frozen family never saw a B-direction row
      val b = withNrm(mkCorpus(bRows))
      SimilarityQueries.appendIvfStore(spark, b, store)
      val before = occupancy(store)
      val vDrifted = IndexCatalog.currentVersion(store)
      // drift signature: all 34 B rows crowd ONE frozen cell
      assert(before.values.max >= 34 + 0,
        s"drift did not concentrate: $before")

      val vNew = SimilarityQueries.reclusterIvfStore(spark, store)
      assert(vNew == vDrifted + 1)
      val after = occupancy(store)
      // balance restored: the retrained family (seeds 6/7 sit inside
      // the B sub-clusters) splits B out of the hot cell
      assert(after.values.max < before.values.max,
        s"worst-cell occupancy did not improve: before=$before after=$after")
      assert(after.values.max <= 17, s"B sub-clusters not separated: $after")
      // row census is a rewrite, not a re-ingest
      assert(after.values.sum == before.values.sum)

      // probe ≡ a from-scratch build over the same corpus
      val full = withNrm(mkCorpus(aRows ++ bRows))
      SimilarityQueries.buildIvfStore(spark, fresh, full, full,
        col("vec_id") < SimilarityQueries.NList)
      val got = SimilarityQueries.probeIvfIndex(spark, store).collect().toSeq
      val want = SimilarityQueries.probeIvfIndex(spark, fresh).collect().toSeq
      assert(got == want, "post-recluster probe diverges from a from-scratch build")

      // the new centroids ride the manifest tag and resolve atomically
      // (dir name is attempt-unique — assert the version prefix)
      assert(IndexCatalog.newestTag(store, "centroids=")
        .exists(_.startsWith(f"centroids=centroids-v$vNew%05d")))
      assert(SimilarityQueries.ivfCentroidsPath(store)
        .contains(f"centroids-v$vNew%05d"))

      // old geometry stays probe-able: the pre-recluster version's
      // files still resolve (manifest time travel) and carry the OLD
      // cell layout with the drifted occupancy
      val oldFiles = IndexCatalog.files(store, vDrifted)
      val oldOcc = spark.read.option("basePath", s"$store/corpus")
        .parquet(oldFiles: _*)
        .groupBy(col("centroid_id")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(1))
      // (count is the only long here — centroid_id stays unread)
      assert(oldOcc.max == before.values.max)
      // the build-time centroid dir is untouched — the old tag chain
      // (no centroids= tag at vBuild..vDrifted) resolves to it
      assert(IndexCatalog.tags(store, vDrifted).forall(!_.startsWith("centroids=")))
      assert(new java.io.File(s"$store/centroids").isDirectory)
      assert(vBuild >= 1)
    } finally Seq(store, fresh).foreach(graft.Fs.deleteRecursively)
  }

  test("restore to a pre-recluster version rebases centroid resolution to the old geometry; vacuum then reclaims the unreferenced centroid dir") {
    val store = Files.createTempDirectory("graft_rc_store3").toString
    try {
      val a = withNrm(mkCorpus(aRows))
      SimilarityQueries.buildIvfStore(spark, store, a, a,
        col("vec_id") < SimilarityQueries.NList)
      val b = withNrm(mkCorpus(bRows))
      SimilarityQueries.appendIvfStore(spark, b, store)
      val vDrifted = IndexCatalog.currentVersion(store)
      val preProbe = SimilarityQueries.probeIvfIndex(spark, store)
        .collect().toSeq
      SimilarityQueries.reclusterIvfStore(spark, store)
      val cdir = SimilarityQueries.ivfCentroidsPath(store)
      assert(cdir.contains("centroids-v"))

      // ROLLBACK: the recluster is judged bad and the store restores
      // to the drifted (old-geometry) version — centroid resolution
      // must rebase WITH the files (newestTag follows restore-of
      // lineage), or probes would assign queries in the new family
      // against old-family rows
      IndexCatalog.restore(store, vDrifted)
      assert(SimilarityQueries.ivfCentroidsPath(store) == s"$store/centroids",
        "restored store must resolve the build-time centroid family")
      val postProbe = SimilarityQueries.probeIvfIndex(spark, store)
        .collect().toSeq
      assert(postProbe == preProbe,
        "post-restore probe must equal the pre-recluster probe")

      // the undone recluster's centroid dir is referenced only by the
      // still-live (but lineage-bypassed) recluster manifest; once
      // retention expires that manifest, vacuum reclaims the dir
      assert(new java.io.File(cdir).isDirectory)
      IndexCatalog.vacuum(store, retain = 1, orphanGraceMs = 0L)
      val leftover = Option(new java.io.File(cdir).list())
        .map(_.toSeq).getOrElse(Nil)
      assert(leftover.isEmpty,
        s"undone centroid dir not reclaimed: $cdir -> $leftover")
      // the build-time dir survives (it is the live geometry)
      assert(new java.io.File(s"$store/centroids").isDirectory)
      // and the restored store still probes identically
      assert(SimilarityQueries.probeIvfIndex(spark, store)
        .collect().toSeq == preProbe)
    } finally graft.Fs.deleteRecursively(store)
  }

  test("an append AFTER recluster assigns against the retrained centroids") {
    val store = Files.createTempDirectory("graft_rc_store2").toString
    try {
      val a = withNrm(mkCorpus(aRows))
      SimilarityQueries.buildIvfStore(spark, store, a, a,
        col("vec_id") < SimilarityQueries.NList)
      val b = withNrm(mkCorpus(bRows))
      SimilarityQueries.appendIvfStore(spark, b, store)
      SimilarityQueries.reclusterIvfStore(spark, store)
      // a LATER batch in the B2 direction must land in the retrained
      // B2 cell, not the old frozen e0 cell
      val late = withNrm(mkCorpus(
        (100L to 103L).map { i =>
          val v = vec(3, 1.0, i).toArray; v(0) = 0.1f; Row(i, v.toSeq, 0)
        }))
      SimilarityQueries.appendIvfStore(spark, late, store)
      val cells = spark.read.option("basePath", s"$store/corpus")
        .parquet(IndexCatalog.latestFiles(store): _*)
        .filter(col("vec_id") >= 100L)
        .select(col("centroid_id").cast("long")).collect()
        .map(_.getLong(0)).toSet
      val b2Cell = spark.read.option("basePath", s"$store/corpus")
        .parquet(IndexCatalog.latestFiles(store): _*)
        .filter(col("vec_id") === 7L)
        .select(col("centroid_id").cast("long")).collect().head.getLong(0)
      assert(cells == Set(b2Cell),
        s"late batch landed in $cells, expected the retrained B2 cell $b2Cell")
    } finally graft.Fs.deleteRecursively(store)
  }
}
