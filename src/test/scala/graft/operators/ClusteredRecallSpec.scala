package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sources.IndexCatalog

/** Recall on PLANTED-CLUSTER data — the measurement the isotropic
  * fixture provably cannot make (SURVEY §8: "recall can't improve, no
  * structure to learn" — on random vectors every cell family is as
  * good as any other). This spec generates a corpus of 8 tight
  * Gaussian direction clusters and measures, through the production
  * probe machinery verbatim:
  *
  *  1. learned (Lloyd) centroids beating DATA-ROW seeds — the claim
  *     `q_ivf_kmeans` exists for, made measurable by seeding the
  *     data-row family from only two of the eight clusters (the
  *     adversarial-but-realistic case: the first rows of a real
  *     corpus are never a stratified sample of it);
  *  2. RECLUSTER recovering recall (not just cell balance —
  *     IvfReclusterSpec's existing measurement) after a drifted
  *     append introduces clusters the frozen family never saw.
  *
  * Deterministic: the noise is a fixed-seed xorshift of the row id,
  * so the measured recalls are exact constants; the assertions pin
  * them with slack below the measured values (recorded in BASELINE.md
  * "Clustered-fixture recall").
  */
class ClusteredRecallSpec extends SparkSpec {

  private val Dim = 16
  private val NClusters = 8

  /** Deterministic per-(id, coord) noise in [-0.35, 0.35]: a xorshift
    * hash of the pair, mapped linearly — no RNG object, no ordering
    * sensitivity, bit-identical every run.
    */
  private def noise(id: Long, coord: Int): Float = {
    var h = id * 31L + coord + 0x9e3779b97f4a7c15L
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
    (((h & 0xffffff).toDouble / 0xffffff - 0.5) * 0.7).toFloat
  }

  /** One corpus row: unit direction e_cluster plus coordinate noise. */
  private def clusteredVec(id: Long, cluster: Int): Seq[Float] =
    (0 until Dim).map(c =>
      (if (c == cluster) 1.0f else 0.0f) + noise(id, c))

  private def mkCorpus(rows: Seq[(Long, Int)]): DataFrame = {
    graft.Engine.register(spark)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType, containsNull = false))))
    spark.createDataFrame(
      java.util.Arrays.asList(
        rows.map { case (i, c) => Row(i, clusteredVec(i, c)) }: _*),
      schema)
      .coalesce(2)
      .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
  }

  /** Exact top-K ground truth over the same frame (the qKnnBrute
    * shape, corpus-parameterized).
    */
  private def brutePairs(e: DataFrame, nq: Long): Set[(Long, Long)] = {
    val q = e.filter(col("vec_id") < nq)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val c = e.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("n_emb"), col("nrm").as("n_nrm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.crossJoin(c).filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        expr("vec_dot(q_emb, n_emb)") / (col("q_nrm") * col("n_nrm")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= SimilarityQueries.K)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def recall(got: Set[(Long, Long)], truth: Set[(Long, Long)]): Double =
    (got & truth).size.toDouble / truth.size

  test("learned centroids measurably beat data-row seeds on clustered data") {
    // ids 0..7 (the vec_id < NList data-row seed set) all come from
    // clusters 0 and 1; the body 20..499 covers all eight clusters.
    // Queries (ids 8..19) also cover all eight.
    val rows =
      (0L to 7L).map(i => (i, (i % 2).toInt)) ++
        (8L to 19L).map(i => (i, (i % NClusters).toInt)) ++
        (20L to 499L).map(i => (i, (i % NClusters).toInt))
    val e = mkCorpus(rows).localCheckpoint()
    val truth = brutePairs(e, SimilarityQueries.NQueries)
    val rData = recall(
      pairs(SimilarityQueries.probeIvfKmeansOf(e, iters = 0)), truth)
    val rLearned = recall(
      pairs(SimilarityQueries.probeIvfKmeansOf(e, SimilarityQueries.KmIters)),
      truth)
    info(f"clustered recall@5: data-row seeds $rData%.3f, " +
      f"learned (KmIters=${SimilarityQueries.KmIters}) $rLearned%.3f")
    // deterministic corpus → exact constants; pinned with slack under
    // the measured values (BASELINE.md "Clustered-fixture recall")
    assert(rLearned > rData + 0.10,
      f"learned centroids must measurably beat data-row seeds on " +
        f"clustered data: $rLearned%.3f vs $rData%.3f")
  }

  test("RECLUSTER recovers recall, not just balance, after a drifted append") {
    // build corpus A: clusters 0..3 only (seeds 0..7 inside them);
    // the drifted batch B introduces clusters 4..7 — ids 8..19 ride
    // with B so the probe's query set includes drifted-cluster queries
    val aRows = (0L to 7L).map(i => (i, (i % 4).toInt)) ++
      (20L to 259L).map(i => (i, (i % 4).toInt))
    val bRows = (8L to 19L).map(i => (i, 4 + (i % 4).toInt)) ++
      (260L to 499L).map(i => (i, 4 + (i % 4).toInt))
    val a = mkCorpus(aRows).localCheckpoint()
    val b = mkCorpus(bRows).localCheckpoint()
    val full = a.unionByName(b).localCheckpoint()
    val truth = brutePairs(full, SimilarityQueries.NQueries)
    val store = Files.createTempDirectory("graft_clus_rc").toString
    try {
      SimilarityQueries.buildIvfStore(spark, store, a, a,
        col("vec_id") < SimilarityQueries.NList)
      SimilarityQueries.appendIvfStore(spark, b, store)
      val before = recall(
        pairs(SimilarityQueries.probeIvfIndex(spark, store)), truth)
      SimilarityQueries.reclusterIvfStore(spark, store)
      val after = recall(
        pairs(SimilarityQueries.probeIvfIndex(spark, store)), truth)
      info(f"drifted-store recall@5: frozen family $before%.3f, " +
        f"post-RECLUSTER $after%.3f")
      assert(after > before,
        f"recluster must recover recall on drifted data: " +
          f"$after%.3f vs $before%.3f")
    } finally graft.Fs.deleteRecursively(store)
  }
}
