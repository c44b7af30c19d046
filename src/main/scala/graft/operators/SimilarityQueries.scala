package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine

/** Approximate-nearest-neighbor surface over the `embeddings` table
  * (`vec_id bigint, embedding array<float>, label int`).
  *
  * - qKnnBrute: exact cosine top-k — the correctness baseline. All-pairs
  *   is O(Q·N); fine when Q is small (a query batch joined against the
  *   corpus), the corpus side stays fully partitioned.
  * - qIvfKnn: IVF-style scale path — corpus is bucketed by nearest
  *   centroid (one map pass), queries probe only their centroid's
  *   bucket, turning the O(Q·N) join into a co-partitioned bucket join
  *   on centroid_id. Centroids here are data rows (vec_id < nlist) so
  *   the oracle can reproduce them; a production build would k-means.
  * - qEmbedLsh: sign-LSH scale path — hash buckets from hyperplane dot
  *   signs instead of nearest-centroid cells; same bucket-join shape.
  * - qEmbedNearDup: embedding-cosine near-duplicate pairs over a
  *   modulo-sampled corpus slice.
  *
  * All cosine math is double-precision through the codegen'd `vec_dot`
  * expression with L2 norms materialized once per vector; outputs are
  * integer ranks/ids so the oracle compare never hashes floats.
  */
object SimilarityQueries {

  private[operators] val K = 5
  private[operators] val NList = 8
  private[operators] val NQueries = 20

  /** Codegen'd sequential-order double dot product (graft `vec_dot`). */
  private[operators] def dot(a: Column, b: Column): Column =
    call_function("vec_dot", a, b)

  /** Corpus with the L2 norm materialized once per vector — every pair
    * evaluation downstream is a single dot product + one divide.
    */
  private[operators] def embeddings(spark: SparkSession, dir: String): DataFrame = {
    Engine.register(spark)
    Engine.table(spark, dir, "embeddings")
      .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
  }

  // --- exact brute-force top-k ------------------------------------------

  /** Two-stage exact top-k: a local top-k per (query, input partition)
    * — parallelism NQueries x partitions — reduces the candidate set
    * to at most K x partitions per query BEFORE the per-query ranking
    * window, so no single task ever holds a full corpus scan's scored
    * output. (The single-stage form funnels the whole scored corpus
    * through NQueries window tasks — dead at a 100x corpus.) The
    * per-partition cut is exact: the global top-K per query is a
    * subset of the union of per-partition top-Ks, and ties break
    * deterministically on neighbor_id in both stages.
    */
  def qKnnBrute(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings(spark, dir)
    val queries = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val scored = queries
      .crossJoin(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("n_emb"), col("nrm").as("n_nrm"), col("label")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
      .withColumn("pid", spark_partition_id())
    val wLocal = Window.partitionBy(col("query_id"), col("pid"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("lrk", row_number().over(wLocal))
      .filter(col("lrk") <= K)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= K)
      .select(col("query_id"), col("rk"), col("neighbor_id"), col("label"))
      .orderBy("query_id", "rk")
  }

  /** Brute-force kNN through the bounded `topk_agg` aggregate instead
    * of ranking windows: scoring stays narrow, then ONE aggregation
    * whose partial keeps at most K pairs per query per task — the
    * exchange carries K x tasks rows per query, with no window sort at
    * all. Same result as [[qKnnBrute]] (identical deterministic
    * tie-break), one less shuffle, and shuffle volume independent of
    * corpus size — the shape that wins at 100 TB.
    */
  def qKnnTopkAgg(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
    val queries = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    queries
      .crossJoin(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("n_emb"), col("nrm").as("n_nrm")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
      .groupBy(col("query_id"))
      .agg(expr(s"topk_agg(cos, neighbor_id, $K)").as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rk"),
        col("col.payload").as("neighbor_id"))
      .orderBy("query_id", "rk")
  }

  /** Candidate-pool size for [[qKnnQuantized]]'s exact re-rank: the
    * approximate stage keeps 3k candidates per query, the exact stage
    * re-ranks only those.
    */
  private[operators] val SqC = 3 * K

  /** Scalar-quantized (int8-style) kNN — the COMPRESSION axis of the
    * ANN family, orthogonal to bucketing (IVF cells, LSH signs): each
    * vector is quantized to per-dimension integer codes in [-128, 127]
    * with one per-vector scale (`127 / max|x_i|`), the approximate
    * stage ranks on the QUANTIZED dot product, and only the top
    * [[SqC]] candidates per query are re-ranked by exact cosine. At
    * 100 TB this is why production ANN serves from RAM: codes are 4×
    * smaller than float32 (8× vs float64), so the first pass streams a
    * quarter of the bytes — and composes with IVF/LSH bucketing, which
    * cut the CANDIDATE COUNT while quantization cuts the BYTES PER
    * CANDIDATE.
    *
    * Determinism note (why this is oracle-gateable at hash equality):
    * the quantized dot is a sum of small-integer products (≤ 127²·dims
    * ≪ 2⁵³), EXACT in double arithmetic in any summation order on both
    * engines — the one FP-fragile ingredient of an approximate score
    * is gone by construction. Scales and norms are computed with the
    * same expression shape on both sides; ranks (never floats) are the
    * compared output. The shuffle is bounded: `topk_agg` keeps ≤ SqC
    * candidates per query per task, and the exact stage touches
    * SqC × queries rows total.
    */
  def qKnnQuantized(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings(spark, dir)
      .withColumn("s", lit(127.0) / expr(
        "aggregate(embedding, CAST(0.0 AS DOUBLE), (m, x) -> greatest(m, abs(CAST(x AS DOUBLE))))"))
      .withColumn("qv", expr(
        // Spark floor returns BIGINT (DuckDB's returns DOUBLE); the
        // cast aligns the array element type for vec_dot — the values
        // are the same small integers either way
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * s) AS DOUBLE))"))
    val queries = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("s").as("q_s"), col("qv").as("q_qv"))
    val corpus = e.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("n_emb"), col("nrm").as("n_nrm"),
      col("s").as("n_s"), col("qv").as("n_qv"))
    // stage 1: approximate rank on the integer codes; the aggregate
    // bounds the exchange at SqC rows per query independent of corpus
    val cands = queries.crossJoin(corpus)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("acos", dot(col("q_qv"), col("n_qv")) /
        (col("q_s") * col("n_s") * col("q_nrm") * col("n_nrm")))
      .groupBy(col("query_id"))
      .agg(expr(s"topk_agg(acos, neighbor_id, $SqC)").as("tk"))
      .select(col("query_id"), explode(col("tk.payload")).as("neighbor_id"))
    // stage 2: exact re-rank of SqC × queries rows only
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cands
      .join(queries.select(col("query_id"), col("q_emb"), col("q_nrm")),
        Seq("query_id"))
      .join(corpus.select(col("neighbor_id"), col("n_emb"), col("n_nrm")),
        Seq("neighbor_id"))
      .withColumn("cos",
        dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= K)
      .select(col("query_id"), col("rk"), col("neighbor_id"))
      .orderBy("query_id", "rk")
  }

  // --- MMR diversity re-rank ----------------------------------------------

  private[operators] val NMmrQ = 8   // MMR queries: vec_id < 8
  private[operators] val MmrPool = 10 // relevance pool per query (bounded)
  private[operators] val MmrK = 3     // greedy selections per query

  /** Diversity-aware top-k — Maximal Marginal Relevance (Carbonell &
    * Goldstein, SIGIR'98) re-rank: pure-relevance top-k hands a RAG
    * prompt or a sampling batch three copies of the same passage;
    * MMR greedily selects argmax of `λ·rel(c) − (1−λ)·max_{s∈S}
    * sim(c, s)` so each pick is penalized by its similarity to what
    * is ALREADY selected (λ = 0.7, cleared to the integer weights
    * 7/3 — monotone ×10).
    *
    * Exactness across engines: rel and sim are the same
    * `dot / (nrm·nrm)` expression on both sides (`vec_dot` here,
    * `list_inner_product` in the oracle — the pair q_knn_quantized
    * already pins hash-exact), so `7·rel − 3·maxsim` is bit-identical
    * and the greedy argmax (ties on cand_id) is deterministic; the
    * emitted columns are ids and ranks, never floats.
    *
    * 100 TB shape: the ONLY corpus-sized stage is the relevance pool,
    * and it ends in a bounded `topk_agg` (≤ [[MmrPool]] per query per
    * task on the exchange — at scale the pool would come from the
    * persisted IVF/PQ probe instead, same bounded frame). Everything
    * after — pool-member pairwise sims (≤ pool² rows per query) and
    * the [[MmrK]] unrolled greedy steps — operates on constant
    * per-query frames; the greedy windows rank ≤ pool rows each.
    */
  def qMmr(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Engine.register(spark)
    val e = embeddings(spark, dir)
    val queries = e.filter(col("vec_id") < NMmrQ)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val corpus = e.select(col("vec_id").as("cand_id"),
      col("embedding").as("c_emb"), col("nrm").as("c_nrm"))
    // stage 1 (the only corpus-sized one): bounded relevance pool
    val pool = queries.crossJoin(corpus)
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("rel",
        dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
      .groupBy(col("query_id"))
      .agg(expr(s"topk_agg(rel, cand_id, $MmrPool)").as("tk"))
      .select(col("query_id"), explode(col("tk")).as("c"))
      .select(col("query_id"), col("c.payload").as("cand_id"),
        col("c.score").as("rel"))
    // pool members' pairwise sims: ≤ MmrPool² rows per query
    val cands = pool.join(corpus, "cand_id")
    val sims = cands
      .select(col("query_id"), col("cand_id").as("ca"),
        col("c_emb").as("ea"), col("c_nrm").as("na"))
      .join(cands.select(col("query_id"), col("cand_id").as("cb"),
        col("c_emb").as("eb"), col("c_nrm").as("nb")), Seq("query_id"))
      .filter(col("ca") =!= col("cb"))
      .select(col("query_id"), col("ca"), col("cb"),
        (dot(col("ea"), col("eb")) / (col("na") * col("nb"))).as("sim"))
    def top1(df: DataFrame, score: Column, as: String): DataFrame = {
      val w = Window.partitionBy(col("query_id"))
        .orderBy(score.desc, col("cand_id"))
      df.withColumn("r", row_number().over(w)).filter(col("r") === 1)
        .select(col("query_id"), col("cand_id").as(as))
    }
    // greedy, unrolled to MmrK = 3: step 1 is pure relevance
    val s1 = top1(pool, col("rel"), "s1")
    val s2 = top1(
      pool.join(s1, "query_id").filter(col("cand_id") =!= col("s1"))
        .join(sims, Seq("query_id"))
        .filter(col("ca") === col("cand_id") && col("cb") === col("s1"))
        .withColumn("mmr", lit(7) * col("rel") - lit(3) * col("sim")),
      col("mmr"), "s2")
    val s3 = top1(
      pool.join(s1, "query_id").join(s2, "query_id")
        .filter(col("cand_id") =!= col("s1") && col("cand_id") =!= col("s2"))
        .join(sims, Seq("query_id"))
        .filter(col("ca") === col("cand_id") &&
          (col("cb") === col("s1") || col("cb") === col("s2")))
        .groupBy(col("query_id"), col("cand_id"), col("rel"))
        .agg(max(col("sim")).as("maxsim"))
        .withColumn("mmr", lit(7) * col("rel") - lit(3) * col("maxsim")),
      col("mmr"), "s3")
    s1.select(col("query_id"), lit(1L).as("rk"), col("s1").as("neighbor_id"))
      .unionByName(s2.select(col("query_id"), lit(2L).as("rk"),
        col("s2").as("neighbor_id")))
      .unionByName(s3.select(col("query_id"), lit(3L).as("rk"),
        col("s3").as("neighbor_id")))
      .orderBy("query_id", "rk")
  }

  // --- IVF-style clustered ANN ------------------------------------------

  /** Probe count for [[qIvfMultiprobe]]: each query searches its
    * `NProbe` nearest cells instead of one — the standard recall/cost
    * knob of a production IVF index (recall rises because a query near
    * a cell boundary also sees the cell just across it; cost rises by
    * the extra cells' occupancy). Single-probe ([[qIvfKnn]]) is
    * `nprobe = 1` of the same pipeline.
    */
  private val NProbe = 3

  def qIvfKnn(spark: SparkSession, dir: String): DataFrame =
    ivfProbe(spark, dir, nprobe = 1)

  /** Multi-probe IVF ANN: identical index (one cell per corpus vector)
    * and identical per-cell search; only the QUERY side fans out, to
    * its `NProbe` nearest centroids. A corpus vector lives in exactly
    * one cell and the probed cells are distinct, so no (query,
    * neighbor) pair is scored twice — the candidate union needs no
    * dedup, just the final per-query rank. The join stays a cell-keyed
    * equi-join; at scale the cost is `nprobe` × single-probe scan
    * volume, the knob SimilaritySpec measures against its recall gain.
    */
  def qIvfMultiprobe(spark: SparkSession, dir: String): DataFrame =
    ivfProbe(spark, dir, nprobe = NProbe)

  private def ivfProbe(spark: SparkSession, dir: String, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings(spark, dir)
    val centroids = e.filter(col("vec_id") < NList)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("c_emb"),
        col("nrm").as("c_nrm"))
    val cw = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("centroid_id"))
    // every vector's ranked cell list, ONE crossJoin feeding both roles:
    // rank 1 is the corpus assignment, ranks <= nprobe are the probes
    val ranked = e.crossJoin(centroids)
      .withColumn("c_cos",
        dot(col("embedding"), col("c_emb")) / (col("nrm") * col("c_nrm")))
      .withColumn("c_rk", row_number().over(cw))
    val corpus = ranked.filter(col("c_rk") === 1)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"),
        col("nrm").as("n_nrm"), col("centroid_id").as("n_cent"))
    val probes = ranked.filter(col("vec_id") < NQueries && col("c_rk") <= nprobe)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("centroid_id").as("q_cent"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    probes
      .join(corpus, col("q_cent") === col("n_cent") &&
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= K)
      .select(col("query_id"), col("rk"), col("neighbor_id"))
      .orderBy("query_id", "rk")
  }

  // --- IVF with learned (k-means) centroids ------------------------------

  /** Lloyd's iterations for the learned-centroid IVF path. */
  val KmIters = 2

  /** Deterministic, oracle-reproducible k-means: centroids start from
    * data rows (vec_id < NList) and take `KmIters` Lloyd steps where
    * the new centroid coordinate is `sum(floor(x*1e6)) / (n*1e6)` —
    * integer fixed-point sums are order-independent (FP accumulation
    * is not, and would diverge between engines/runs), and the single
    * final IEEE division is bit-identical in Spark and DuckDB. Ties in
    * assignment break to the lower centroid_id. The per-coordinate
    * groupBy((centroid, pos)) distributes the mean computation; no
    * driver-side iteration state beyond the tiny centroid table.
    */
  /** Nearest-centroid assignment (argmax cosine, ties to the lower
    * centroid_id): the ONE tie-break and formula contract every Lloyd
    * step, probe, and the DuckDB oracle share — change it here or
    * nowhere. Input `cent` carries (centroid_id, c_emb double array).
    */
  private def assignToCentroids(e: DataFrame, cent: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cNorm = cent.withColumn("c_nrm", sqrt(expr("vec_dot(c_emb, c_emb)")))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("centroid_id"))
    e.crossJoin(cNorm)
      .withColumn("c_cos",
        dot(col("embedding"), col("c_emb")) / (col("nrm") * col("c_nrm")))
      .withColumn("c_rk", row_number().over(w))
      .filter(col("c_rk") === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("centroid_id"))
  }

  private def kmeansCentroids(e: DataFrame, iters: Int,
      seed: Column = col("vec_id") < NList): DataFrame = {
    var cent = e.filter(seed)
      .select(col("vec_id").as("centroid_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("c_emb"))
    for (_ <- 1 to iters) {
      cent = assignToCentroids(e, cent)
        .select(col("centroid_id"),
          posexplode(expr("transform(embedding, x -> cast(floor(cast(x AS double) * 1000000) AS bigint))")))
        .withColumnRenamed("pos", "p").withColumnRenamed("col", "fx")
        .groupBy(col("centroid_id"), col("p"))
        .agg((sum(col("fx")).cast("double") / (count(lit(1)) * lit(1000000.0))).as("cx"))
        .groupBy(col("centroid_id"))
        .agg(expr("transform(array_sort(collect_list(struct(p, cx))), s -> s.cx)").as("c_emb"))
    }
    cent
  }

  /** IVF ANN over learned centroids — same probe cost as [[qIvfKnn]]
    * (one cell), but the cells come from k-means instead of arbitrary
    * data rows, so cell occupancy is balanced by the data distribution.
    */
  def qIvfKmeans(spark: SparkSession, dir: String): DataFrame =
    probeIvfKmeans(spark, dir, KmIters)

  /** Corpus→cell assignments for an iteration count (0 = data-row
    * centroids) — the occupancy/probe-cost experiment hook.
    */
  def probeAssignments(spark: SparkSession, dir: String, iters: Int): DataFrame = {
    val e = embeddings(spark, dir)
    assignToCentroids(e, kmeansCentroids(e, iters))
      .select(col("vec_id"), col("centroid_id"))
  }

  /** Same as [[qIvfKmeans]] with an explicit iteration count — the
    * recall-vs-iterations experiment hook (only `KmIters` is wired to
    * the oracle).
    */
  def probeIvfKmeans(spark: SparkSession, dir: String, iters: Int): DataFrame =
    probeIvfKmeansOf(embeddings(spark, dir), iters)

  /** [[probeIvfKmeans]] over an ARBITRARY corpus frame — the
    * clustered-fixture experiment hook (ClusteredRecallSpec): the
    * fixture embeddings are isotropic, so "learned centroids beat
    * data-row seeds" is unmeasurable on them BY CONSTRUCTION (nothing
    * to learn — SURVEY §8's standing disclosure); the spec generates a
    * planted-cluster corpus and measures recall through this exact
    * probe machinery instead.
    */
  private[operators] def probeIvfKmeansOf(
      e: DataFrame, iters: Int, nQueries: Long = NQueries): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // materialize the tiny (NList-row) centroid table EAGERLY
    // (localCheckpoint): `a` feeds both join sides below, and without
    // this the whole nested Lloyd lineage (crossJoin per iteration) is
    // planned — and absent exchange reuse, executed — once per side.
    // localCheckpoint, not cache(): nothing stays resident per call in
    // a long-lived session (same leak-class fix as qSemDedup /
    // qSemContamination — blocks free via the ContextCleaner when the
    // caller drops the frame)
    val cent = kmeansCentroids(e, iters).localCheckpoint()
    val a = assignToCentroids(e, cent)
    val queries = a.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("centroid_id").as("q_cent"))
    val corpus = a.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("n_emb"), col("nrm").as("n_nrm"),
      col("centroid_id").as("n_cent"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    queries
      .join(corpus, col("q_cent") === col("n_cent") &&
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= K)
      .select(col("query_id"), col("rk"), col("neighbor_id"))
      .orderBy("query_id", "rk")
  }

  // --- persisted IVF index (write-once, probe-many) ----------------------

  /** Build the IVF index STORE under `base` — the warehouse posture a
    * 100 TB corpus demands: k-means runs ONCE at ingest and thousands
    * of later queries amortize it, exactly how [[CoreQueries
    * .qSketchRollup]] stores distinct-count state instead of
    * rescanning facts. Layout:
    *   - `centroids/`: the NList learned centroids (tiny, one file);
    *   - `corpus/`: every vector with its precomputed L2 norm,
    *     PARTITIONED BY its cell (`centroid_id=<c>/` directories) —
    *     a cell-restricted probe becomes a partition-PRUNED read
    *     (only that cell's files are listed/scanned), and the
    *     cell-keyed equi-join never rescans unrelated cells' bytes.
    * Centroids/assignment reuse [[kmeansCentroids]]/
    * [[assignToCentroids]] verbatim, so the stored index is
    * bit-identical to what [[qIvfKmeans]] computes inline.
    */
  private[operators] def buildIvfIndex(
      spark: SparkSession, dir: String, base: String): Unit = {
    val e = embeddings(spark, dir)
    buildIvfStore(spark, base, e, e, col("vec_id") < NList)
  }

  /** The even-id-corpus IVF template (`ivf_evens`): centroids trained
    * on — and frozen at — the even half, the base [[qIvfAppend]] grows.
    */
  private[operators] def buildIvfEvensTemplate(
      spark: SparkSession, dir: String, base: String): Unit = {
    val even = embeddings(spark, dir)
      .filter(pmod(col("vec_id"), lit(2)) === 0)
    buildIvfStore(spark, base, even, even, col("vec_id") < 2 * NList)
  }

  /** Core IVF store builder with the train/corpus roles split: k-means
    * runs over `train` (seeded by `seed`), and `corpus` is what gets
    * cell-assigned and stored. [[buildIvfIndex]] is the train = corpus
    * = whole-table instantiation; [[qIvfAppend]] trains on the build
    * corpus only, because appended batches arrive AFTER the centroid
    * family is frozen — the same fixed-at-build contract the sign-LSH
    * store keeps for its hyperplanes.
    */
  private[operators] def buildIvfStore(spark: SparkSession, base: String,
      train: DataFrame, corpus: DataFrame, seed: Column): Unit = {
    // tiny (NList-row) table; cached because assignment joins it and
    // the write below would otherwise re-plan the Lloyd lineage
    val cent = kmeansCentroids(train, KmIters, seed).cache()
    try {
      cent.coalesce(1).write.mode("overwrite").parquet(s"$base/centroids")
      // the cell-partitioned corpus commits through the catalog: the
      // manifest rename publishes the generation, so a crashed build
      // leaves nothing visible and later appends (new vectors assigned
      // to the FIXED centroids) can add files without touching these
      writeIvfGen(spark, corpus, base, cent)
    } finally cent.unpersist()
  }

  /** Resolve the store's CURRENT centroid generation: the newest
    * `centroids=` manifest tag names the directory a [[reclusterIvfStore]]
    * rewrite published; a store that has never reclustered falls back
    * to the build-time `centroids/` dir. Old versions' geometry stays
    * resolvable the same way — read the tag at that version
    * ([[graft.sources.IndexCatalog.tags]]) and the old centroid files
    * are still on disk until vacuum, which is what keeps time travel
    * probe-able at the old cell family.
    */
  private[operators] def ivfCentroidsPath(base: String): String =
    graft.sources.IndexCatalog.newestTag(base, "centroids=")
      .map(t => s"$base/${t.stripPrefix("centroids=")}")
      .getOrElse(s"$base/centroids")

  /** Append an ingest batch's vectors INTO the IVF store as a new
    * committed generation: cells come from the STORED centroids (never
    * retrained by an append — the cell family is fixed until an
    * explicit [[reclusterIvfStore]], which is what keeps every
    * generation's partitioning compatible), new files land inside the
    * existing `centroid_id=` directories, and the manifest rename
    * publishes them. Vectors already stored are skipped via an
    * anti-join on the store's id column; append cost is proportional
    * to the batch, the stored corpus is never re-assigned.
    */
  private[operators] def appendIvfStore(
      spark: SparkSession, vecs: DataFrame, base: String): Unit =
    writeIvfGen(spark, vecs, base,
      spark.read.parquet(ivfCentroidsPath(base)))

  /** Shared generation writer for [[buildIvfStore]]/[[appendIvfStore]]:
    * assign `vecs` to `cent`'s cells, stage the rows into the store's
    * `centroid_id` partitioning, and commit exactly the files this
    * write created ([[graft.sources.StagedWrite]] — concurrent-append
    * safe by construction).
    */
  private def writeIvfGen(spark: SparkSession, vecs: DataFrame,
      base: String, cent: DataFrame): Unit = {
    import graft.sources.{IndexCatalog, StagedWrite}
    val target = s"$base/corpus"
    val stored = IndexCatalog.latestFiles(base)
    val fresh = if (stored.nonEmpty) {
      val ids = readStoreFiles(spark, stored).select(col("vec_id")).distinct()
      vecs.join(ids, Seq("vec_id"), "left_anti")
    } else vecs
    val rows = assignToCentroids(fresh,
        cent.select(col("centroid_id"), col("c_emb")))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("centroid_id"))
      // key the write's one shuffle on the partition column: each cell
      // lands as one file per generation instead of
      // one-per-task-per-cell (the compaction writers' layout rule —
      // without it a 32-task write sprays |cells|×tasks tiny files and
      // every later scan/commit pays the open/footer cost)
      .repartition(col("centroid_id"))
    // a fully-duplicate batch dedups to zero rows and writes no files —
    // the documented skip, so the append is a no-op, not a failed commit
    val newFiles = StagedWrite.partitioned(rows, target, Seq("centroid_id"))
    if (newFiles.nonEmpty)
      IndexCatalog.commitWithRetry(base)(_ => (newFiles, Nil))
  }

  /** Probe the STORED index only: queries and corpus both read the
    * cell-partitioned store — no k-means job, no assignment crossJoin,
    * no touch of the raw `embeddings` table (the spec asserts the
    * probe plan's scans all point into the index). Same cell-keyed
    * equi-join + bounded rank as [[probeIvfKmeans]], so the output is
    * row-identical to [[qIvfKmeans]] and shares its oracle.
    */
  private[operators] def probeIvfIndex(
      spark: SparkSession, base: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Engine.register(spark) // vec_dot on the scoring path
    val corpus = spark.read.option("basePath", s"$base/corpus")
      .parquet(graft.sources.IndexCatalog.latestFiles(base): _*)
    val queries = corpus.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("centroid_id").as("q_cent"))
    val neighbors = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("n_emb"), col("nrm").as("n_nrm"),
      col("centroid_id").as("n_cent"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    queries
      .join(neighbors, col("q_cent") === col("n_cent") &&
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= K)
      .select(col("query_id"), col("rk"), col("neighbor_id"))
      .orderBy("query_id", "rk")
  }

  /** [[qIvfKmeans]] through the stored index: build the index store
    * once, then answer from it alone. In the gated signal the build
    * runs per invocation (the harness gives each query a fresh temp
    * dir); the point the spec pins is that the PROBE half never
    * recomputes — a production deployment calls [[buildIvfIndex]] at
    * ingest and [[probeIvfIndex]] per query batch. Result stays lazy
    * over the store ([[graft.Lease]] owns the dir lifetime).
    */
  def qIvfPersisted(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    // fixture-cached full-corpus IVF template (FixtureTemplates): the
    // probe is this query's work, the build is qIvfAppend's shared base
    try FixtureTemplates.cloneInto("ivf_full", spark, dir, base)
    catch {
      case e: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw e
    }
    graft.Lease.lease("q_ivf_persisted", Seq(base))
    probeIvfIndex(spark, base)
  }

  /** Probe the stored IVF index with an EXTERNAL query batch: the batch
    * computes its cell against the STORED centroids (an NList-row
    * broadcast — no k-means job), then equi-joins the cell-partitioned
    * manifest-resolved corpus on `centroid_id` and ranks within-cell by
    * exact cosine. The corpus side of the plan touches only the index
    * store; the only corpus-sized work ran at build/append time.
    */
  private[operators] def probeIvfBatch(
      spark: SparkSession, dir: String, base: String,
      batchFilter: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Engine.register(spark) // vec_dot on the scoring path
    val cent = spark.read.parquet(ivfCentroidsPath(base))
    val corpus = spark.read.option("basePath", s"$base/corpus")
      .parquet(graft.sources.IndexCatalog.latestFiles(base): _*)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"),
        col("nrm").as("n_nrm"), col("centroid_id").as("n_cent"))
    val q = assignToCentroids(
        embeddings(spark, dir).filter(batchFilter),
        cent.select(col("centroid_id"), col("c_emb")))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("centroid_id").as("q_cent"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(corpus, col("q_cent") === col("n_cent") &&
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= K)
      .select(col("query_id"), col("rk"), col("neighbor_id"))
      .orderBy("query_id", "rk")
  }

  /** The append-maintained form of [[qIvfPersisted]] — the third store
    * family's index lifecycle, completing the symmetry with
    * [[DedupQueries.qNeardupAppend]] (MinHash-LSH bands) and
    * [[qEmbedAppend]] (sign-LSH buckets): build the IVF store over the
    * even-id corpus (centroids trained there and FROZEN), APPEND batch
    * A (vec_id % 4 == 1) as a new committed generation assigned to the
    * stored centroids, then answer batch B's (vec_id % 4 == 3) lookup
    * from the grown store. B's neighbors draw from corpus ∪ A exactly
    * as a rebuild over the grown corpus with the same frozen centroids
    * would (spec-proven), old generations' files byte-untouched, only
    * batch vectors ever assigned at append time.
    */
  def qIvfAppend(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_ivfappend").toString
    try {
      // fixture-cached even-corpus IVF template; the APPEND + probe
      // are this query's own work
      FixtureTemplates.cloneInto("ivf_evens", spark, dir, base)
      appendIvfStore(spark,
        embeddings(spark, dir).filter(pmod(col("vec_id"), lit(4)) === 1), base)
    } catch {
      case e: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw e
    }
    graft.Lease.lease("q_ivf_append", Seq(base))
    probeIvfBatch(spark, dir, base,
      pmod(col("vec_id"), lit(4)) === 3 && col("vec_id") < 4 * NQueries)
  }

  /** `OPTIMIZE ... RECLUSTER` — the IVF store's maintenance verb, the
    * vector-index sibling of `q_store_optimize`'s sorted compaction:
    * retrain the centroid family over the CURRENT corpus (the same
    * fixed-point Lloyd's job the build runs), reassign every stored
    * row to the new cells, and publish the result as ONE rewrite
    * commit. The append contract deliberately freezes centroids so
    * generations stay partition-compatible — but under real drift a
    * year of appends degrades cell balance (batch vectors crowd the
    * nearest frozen cell) and with it probe cost and recall; this is
    * the retrain-and-reassign escape hatch, run as scheduled
    * maintenance, not per append.
    *
    * The new centroids land in a versioned `centroids-v<N>/` dir and
    * ride the manifest as a `centroids=` governing tag (the
    * `corpus_stats=` pattern — carried past vacuum horizons, resolved
    * by [[ivfCentroidsPath]]), so probes and later appends atomically
    * flip to the new geometry WITH the corpus rewrite: no reader ever
    * sees new cells with old files or vice versa. Old versions stay
    * probe-able at the OLD geometry via time travel — their manifests
    * reference the pre-rewrite files and their tag chain names the
    * pre-rewrite centroid dir (spec-pinned).
    *
    * 100 TB shape: one corpus-sized Lloyd's job (the build cost,
    * amortized over the maintenance interval) + one corpus-sized
    * partitioned rewrite — exactly what `OPTIMIZE` costs on a table
    * store, scheduled the same way. The CAS on `basedOn` makes a
    * racing append fail loudly rather than be silently dropped by the
    * rewrite; the maintenance job re-derives and retries like any
    * optimistic writer.
    */
  private[operators] def reclusterIvfStore(
      spark: SparkSession, base: String, maxAttempts: Int = 5): Int = {
    import graft.sources.{IndexCatalog, StagedWrite}
    var attempts = 0
    while (true) {
      attempts += 1
      val basedOn = IndexCatalog.currentVersion(base)
      // the store's own rows are the training corpus — the raw table is
      // never touched (drop the stored cell: it is the OLD geometry)
      val corpus = readStoreFiles(spark, IndexCatalog.files(base, basedOn))
        .select(col("vec_id"), col("embedding"), col("nrm"))
      val cent = kmeansCentroids(corpus, KmIters).cache()
      try {
        // unique per attempt (the newGenDir rationale): two racing
        // reclusters observing the same version would otherwise share
        // a dir name, and the loser's overwrite-mode write could
        // replace the winner's already-committed centroid files
        val cdir = f"centroids-v${basedOn + 1}%05d-" +
          java.util.UUID.randomUUID().toString.take(8)
        cent.coalesce(1).write.mode("overwrite").parquet(s"$base/$cdir")
        val rows = assignToCentroids(corpus,
            cent.select(col("centroid_id"), col("c_emb")))
          .select(col("vec_id"), col("embedding"), col("nrm"),
            col("centroid_id"))
          .repartition(col("centroid_id")) // one file per cell per rewrite
        val newFiles =
          StagedWrite.partitioned(rows, s"$base/corpus", Seq("centroid_id"))
        // a racing append landing after basedOn fails the CAS: the
        // WHOLE derivation re-runs against the winner's corpus (a
        // stale retrain would silently drop the appended rows from the
        // rewrite). The loser's staged corpus files and centroid dir
        // are orphan debris — vacuum reclaims both past the grace
        // window (the centroid dir is unreferenced by any live tag).
        return IndexCatalog.commitRewrite(
          base, newFiles, Seq(s"centroids=$cdir", "recluster"), basedOn)
      } catch {
        case e if IndexCatalog.isCommitConflict(e) && attempts < maxAttempts =>
          () // re-derive against the winner's version
      } finally cent.unpersist()
    }
    sys.error("unreachable")
  }

  /** The RECLUSTER lifecycle, gated: clone the even-corpus IVF store
    * (centroids trained on — and frozen at — the even half), append
    * the ENTIRE odd half (maximal drift: the frozen family never saw
    * an odd vector), then RECLUSTER and probe. Because the retrain
    * runs the standard whole-corpus k-means (seeds `vec_id <`
    * [[NList]], [[KmIters]] iterations — all fixed-point arithmetic,
    * so training over the store's rows is bit-identical to training
    * over the raw table), the post-recluster probe answers exactly
    * what a FROM-SCRATCH build over the same corpus answers — the
    * `q_ivf_kmeans` oracle, shared verbatim. The before/after cell-
    * balance measurement on the drifted store lives in
    * IvfReclusterSpec.
    */
  def qIvfRecluster(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_ivfrc").toString
    try {
      FixtureTemplates.cloneInto("ivf_evens", spark, dir, base)
      appendIvfStore(spark,
        embeddings(spark, dir).filter(pmod(col("vec_id"), lit(2)) === 1), base)
      // the maintenance step runs through the SQL verb surface — the
      // production schedule path ([[MaintenanceSql]]; it dispatches to
      // [[reclusterIvfStore]], so the Scala and SQL surfaces cannot
      // drift). Sessions without graft's extensions keep the direct
      // Scala call available.
      spark.sql(s"OPTIMIZE '$base' RECLUSTER").collect()
    } catch {
      case e: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw e
    }
    graft.Lease.lease("q_ivf_recluster", Seq(base))
    probeIvfIndex(spark, base)
  }

  // --- FILTERED ANN: metadata predicates inside the index ---------------

  /** Build the LABEL-CARRYING IVF store: same frozen k-means cell
    * family as [[buildIvfStore]], but every stored row keeps its
    * metadata label and files land under TWO-LEVEL
    * `centroid_id=/label=` partitions. That layout is what makes a
    * metadata filter a PARTITION decision instead of a row
    * post-filter: a fixed-label probe prunes `label=` directories
    * before a byte is read, and a per-query label becomes part of the
    * candidate JOIN KEY, so candidate volume shrinks by the label's
    * selectivity at zero extra plan cost. Sub-partitioning is safe
    * here because the metadata domain is small (10 labels); a
    * high-cardinality attribute would ride [[graft.sources.FileStats]]
    * min/max sidecars instead — same prune, different axis.
    */
  private[operators] def buildLabeledIvfStore(
      spark: SparkSession, dir: String, base: String): Unit = {
    import graft.sources.{IndexCatalog, StagedWrite}
    val e = embeddings(spark, dir)
    val cent = kmeansCentroids(e, KmIters, col("vec_id") < NList).cache()
    try {
      cent.coalesce(1).write.mode("overwrite").parquet(s"$base/centroids")
      // label-carrying assignment (same argmax/tie-break contract as
      // assignToCentroids, with the metadata column riding through).
      // Repartition on the partition columns before staging: without
      // it every shuffle task fans out across all cells × labels dirs
      // (tasks × dirs tiny files); with it each (cell, label) lands in
      // one task → one file per partition per generation
      val cNorm = cent.select(col("centroid_id"), col("c_emb"))
        .withColumn("c_nrm", sqrt(expr("vec_dot(c_emb, c_emb)")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("vec_id"))
        .orderBy(col("c_cos").desc, col("centroid_id"))
      val rows = e.crossJoin(cNorm)
        .withColumn("c_cos",
          dot(col("embedding"), col("c_emb")) / (col("nrm") * col("c_nrm")))
        .withColumn("c_rk", row_number().over(w))
        .filter(col("c_rk") === 1)
        .select(col("vec_id"), col("embedding"), col("nrm"),
          col("centroid_id"), col("label"))
        .repartition(col("centroid_id"), col("label"))
      val newFiles =
        StagedWrite.partitioned(rows, s"$base/corpus", Seq("centroid_id", "label"))
      IndexCatalog.commitWithRetry(base)(_ => (newFiles, Nil))
    } finally cent.unpersist()
  }

  /** Probe the labeled store with a PER-QUERY metadata filter:
    * same-label nearest neighbors ("more items in this category" — the
    * metadata-filtered search every production vector store exposes).
    * The label equality joins INTO the candidate key alongside the
    * cell, so the only corpus-sized stage is a (cell, label)-keyed
    * equi-join — never a post-filter over unfiltered candidates, and
    * never a second scan. Filtered recall is the usual caveat (a
    * selective filter thins each cell's candidates); the `nprobe`
    * dial ([[qIvfMultiprobe]], PQ's `probePqStore`) composes with
    * this join unchanged when more candidates are needed.
    */
  private[operators] def probeIvfFiltered(
      spark: SparkSession, base: String, nprobe: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Engine.register(spark) // vec_dot on the scoring path
    val corpus = spark.read.option("basePath", s"$base/corpus")
      .parquet(graft.sources.IndexCatalog.latestFiles(base): _*)
    val stored = corpus.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("centroid_id").as("q_cent"),
        col("label").as("q_label"))
    // the recall/cost dial composes with the label key unchanged: for
    // nprobe > 1 each query fans out to its nprobe nearest STORED
    // centroids (an NList-row broadcast), and the candidate join below
    // is still (cell, label)-keyed — only the query side widened
    val queries = if (nprobe <= 1) stored else {
      val cent = spark.read.parquet(s"$base/centroids")
        .withColumn("c_nrm", sqrt(expr("vec_dot(c_emb, c_emb)")))
      val cw = Window.partitionBy(col("query_id"))
        .orderBy(col("c_cos").desc, col("centroid_id"))
      stored.drop("q_cent").crossJoin(cent)
        .withColumn("c_cos",
          dot(col("q_emb"), col("c_emb")) / (col("q_nrm") * col("c_nrm")))
        .withColumn("c_rk", row_number().over(cw))
        .filter(col("c_rk") <= nprobe)
        .select(col("query_id"), col("q_emb"), col("q_nrm"),
          col("centroid_id").as("q_cent"), col("q_label"))
    }
    val neighbors = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("n_emb"), col("nrm").as("n_nrm"),
      col("centroid_id").as("n_cent"), col("label").as("n_label"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    queries
      .join(neighbors, col("q_cent") === col("n_cent") &&
        col("q_label") === col("n_label") &&
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= K)
      .select(col("query_id"), col("rk"), col("neighbor_id"))
      .orderBy("query_id", "rk")
  }

  /** Gated form: fixture-cached labeled store build, then the filtered
    * probe. Short result lists are correct behavior — a (cell, label)
    * slice can hold fewer than K candidates, and widening is the
    * nprobe dial's job, not silent unfiltered backfill.
    */
  def qIvfFiltered(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_ivflabel").toString
    try FixtureTemplates.cloneInto("ivf_labeled", spark, dir, base)
    catch {
      case e: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw e
    }
    graft.Lease.lease("q_ivf_filtered", Seq(base))
    probeIvfFiltered(spark, base)
  }

  // --- IVF-PQ: product-quantized residual codes in the IVF store --------

  /** PQ geometry over the 64-dim fixture embeddings: [[PqM]] subspaces
    * of [[PqSub]] dims, [[PqKs]] codewords each — 32 codes × 5 bits ≈
    * 20 logical bytes per vector vs 256 bytes of float32, the ~13×
    * compression that lets a production IVF-PQ serve its first pass
    * from RAM. [[PqProbe]] cells per query (the fixture has only
    * [[NList]] = 8 cells, so 6/8 is a fixture artifact — at scale
    * nlist is thousands and nprobe stays a handful), [[PqPool]]
    * ADC candidates re-ranked exactly per query (measured recall@5 vs
    * brute: 0.93–0.96 across sf0.001/0.01/0.1, spec-pinned ≥ 0.9).
    */
  private[operators] val PqM = 32
  private[operators] val PqSub = 2
  private[operators] val PqKs = 32
  private[operators] val PqProbe = 6
  private[operators] val PqPool = 45

  /** Per-(vector, subspace) RESIDUAL slices against the assigned
    * cell's centroid — the frame both codebook training and code
    * assignment consume: (vec_id, m, sr) where `sr` is the `m`-th
    * [[PqSub]]-dim slice of (embedding − centroid), double-precision.
    */
  private def pqResiduals(assigned: DataFrame, cent: DataFrame,
      ms: DataFrame): DataFrame =
    assigned.join(cent.select(col("centroid_id"), col("c_emb")),
        Seq("centroid_id"))
      .select(col("vec_id"),
        expr("zip_with(transform(embedding, x -> cast(x AS double)), c_emb, (a, b) -> a - b)")
          .as("r"))
      .crossJoin(ms) // PqM rows — bounded small side
      .select(col("vec_id"), col("m"),
        expr(s"slice(r, m * $PqSub + 1, $PqSub)").as("sr"))

  /** Nearest-codeword assignment per (vector, subspace): argmin of the
    * L2 distance to the codeword, expanded to the centroid-free form
    * `|cw|² − 2·sr·cw` (the `|sr|²` term is constant per row) — ties
    * to the lower cw_id. The ONE formula training, encoding, and the
    * DuckDB oracle share.
    */
  private def assignToCodebook(resid: DataFrame, cb: DataFrame): DataFrame =
    // argmin as a map-side-combinable aggregate: min(struct(d, cw_id))
    // orders lexicographically — distance first, lower cw_id on ties,
    // the IDENTICAL tie-break the oracle's row_number window applies —
    // and partially aggregates the (corpus × M × KS)-row join before
    // its one exchange, where a per-(vec, m) ranking window would sort
    // the whole blow-up through the shuffle. `sr` is constant per
    // (vec_id, m) group, so first() is deterministic.
    resid.join(cb, Seq("m"))
      .withColumn("d", dot(col("cw"), col("cw")) - lit(2.0) * dot(col("sr"), col("cw")))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("d"), col("cw_id"))).as("w"),
        first(col("sr")).as("sr"))
      .select(col("vec_id"), col("m"), col("sr"), col("w.cw_id").as("cw_id"))

  /** Train the per-subspace codebooks on the build corpus's residuals:
    * seeds are the first [[PqKs]] corpus vectors' residual slices
    * (data-derived, oracle-reproducible), one Lloyd step with the same
    * fixed-point mean as [[kmeansCentroids]] (`sum(floor(x·1e6)) /
    * (n·1e6)` — integer sums are order-independent, the single final
    * IEEE division bit-identical on both engines). Frozen at build,
    * exactly like the IVF centroids and LSH planes.
    */
  private def trainPqCodebooks(resid: DataFrame): DataFrame = {
    val cb0 = resid.filter(col("vec_id") < PqKs)
      .select(col("m"), col("vec_id").cast("int").as("cw_id"),
        col("sr").as("cw"))
    assignToCodebook(resid, cb0)
      .select(col("m"), col("cw_id"),
        posexplode(expr("transform(sr, x -> cast(floor(x * 1000000) AS bigint))")))
      .withColumnRenamed("pos", "p").withColumnRenamed("col", "fx")
      .groupBy(col("m"), col("cw_id"), col("p"))
      .agg((sum(col("fx")).cast("double") / (count(lit(1)) * lit(1000000.0))).as("cx"))
      .groupBy(col("m"), col("cw_id"))
      .agg(expr("transform(array_sort(collect_list(struct(p, cx))), s -> s.cx)").as("cw"))
  }

  /** Encode vectors against FROZEN centroids + codebooks: assign each
    * to its cell, quantize its residual per subspace, and pivot the
    * codes into one `array<int>` ordered by subspace — the row shape
    * the store persists (vec_id, embedding, nrm, centroid_id, codes).
    */
  private def encodePq(spark: SparkSession, vecs: DataFrame,
      cent: DataFrame, cb: DataFrame): DataFrame = {
    val ms = spark.range(PqM).select(col("id").cast("int").as("m"))
    val assigned = assignToCentroids(vecs, cent)
    val codes = assignToCodebook(pqResiduals(assigned, cent, ms), cb)
      .groupBy(col("vec_id"))
      .agg(expr("transform(array_sort(collect_list(struct(m, cw_id))), s -> s.cw_id)")
        .as("codes"))
    assigned.join(codes, Seq("vec_id"))
  }

  /** Build the IVF-PQ store under `base`: data-row cells
    * (vec_id < [[NList]], frozen), codebooks trained once on the build
    * corpus's residuals (frozen), every vector stored WITH its codes
    * in the cell-partitioned corpus; centroids and codebooks persist
    * beside the manifest like the LSH planes. Appends
    * ([[appendPqStore]]) encode new batches against the frozen
    * families only — old generations byte-untouched.
    */
  private[operators] def buildPqStore(
      spark: SparkSession, dir: String, base: String,
      corpusFilter: Column = lit(true)): Unit = {
    val e = embeddings(spark, dir).filter(corpusFilter)
    val cent = e.filter(col("vec_id") < NList)
      .select(col("vec_id").as("centroid_id"),
        expr("transform(embedding, x -> cast(x AS double))").as("c_emb"))
    cent.coalesce(1).write.mode("overwrite").parquet(s"$base/centroids")
    val ms = spark.range(PqM).select(col("id").cast("int").as("m"))
    val cb = trainPqCodebooks(
      pqResiduals(assignToCentroids(e, cent), cent, ms))
    cb.coalesce(1).write.mode("overwrite").parquet(s"$base/pq")
    writePqGen(spark, e, base)
  }

  /** Append a batch into the PQ store as a committed generation —
    * codes and cells from the STORED (frozen) families, already-stored
    * ids skipped, exact staged files committed.
    */
  private[operators] def appendPqStore(
      spark: SparkSession, vecs: DataFrame, base: String): Unit =
    writePqGen(spark, vecs, base)

  private def writePqGen(spark: SparkSession, vecs: DataFrame,
      base: String): Unit = {
    import graft.sources.{IndexCatalog, StagedWrite}
    val cent = spark.read.parquet(s"$base/centroids")
    val cb = spark.read.parquet(s"$base/pq")
    val stored = IndexCatalog.latestFiles(base)
    val fresh = if (stored.nonEmpty) {
      val ids = readStoreFiles(spark, stored).select(col("vec_id")).distinct()
      vecs.join(ids, Seq("vec_id"), "left_anti")
    } else vecs
    // the metadata label rides every stored row (joined back by id —
    // encodePq's assignment drops non-core columns), so the PQ store
    // serves label-filtered probes with no side lookup
    val rows = encodePq(spark, fresh, cent, cb)
      .join(fresh.select(col("vec_id"), col("label")), Seq("vec_id"))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("codes"),
        col("label"), col("centroid_id"))
      // one file per cell per generation, not one per task per cell
      // (same layout rule as [[writeIvfGen]]/[[writeEmbedGen]])
      .repartition(col("centroid_id"))
    val newFiles = StagedWrite.partitioned(rows, s"$base/corpus",
      Seq("centroid_id"))
    if (newFiles.nonEmpty)
      IndexCatalog.commitWithRetry(base)(_ => (newFiles, Nil))
  }

  /** Probe the PQ store with an external query batch — the
    * ASYMMETRIC-DISTANCE two-stage read every production IVF-PQ
    * serves. `nprobe` is the RECALL/COST dial (the knob every IVF
    * deployment tunes): candidate volume — and therefore ADC bytes
    * streamed — scales linearly with probed cells while recall rises
    * toward the pool ceiling; PqStoreSpec measures recall@5 at
    * nprobe ∈ {1, 3, default} against the exact brute baseline on
    * one shared store, composing PQ's 13× byte cut with cell
    * pruning's candidate cut at every dial setting.
    *  1. each query ranks the stored cells (an [[NList]]-row
    *     broadcast) and probes its `nprobe` ([[PqProbe]] default)
    *     nearest;
    *  2. FIRST PASS on codes only: the per-query LUT (query-slice ·
    *     codeword, [[PqM]]×[[PqKs]] entries — tiny, broadcast) is
    *     summed over each candidate's codes, so per candidate the
    *     pass streams ~[[PqM]] small ints instead of the full vector
    *     — the 13× byte cut that is the whole point of PQ. LUT
    *     entries are FIXED-POINT (`floor(x·1e6)` as BIGINT): the
    *     per-candidate sum is an integer sum (exact, order-free on
    *     both engines), divided once by the true norms — so the
    *     approximate ranking is bit-reproducible, which is what
    *     makes an approximate index oracle-gateable at hash equality;
    *  3. exact re-rank of the pooled top [[PqPool]] per query
    *     (`topk_agg` bounds the exchange) against the stored
    *     full-precision vectors.
    */
  /** `sameLabel = true` adds the metadata filter INSIDE the candidate
    * stage: candidates drop on the stored label BEFORE a code byte
    * streams, so the filter's selectivity multiplies PQ's 13× byte cut
    * and cell pruning's candidate cut — the three levers a production
    * filtered vector search composes. (Here the label is a data
    * column under the cell partitioning; a deployment whose filter is
    * the DOMINANT axis would sub-partition on it instead, as the
    * labeled IVF store does.)
    */
  private[operators] def probePqStore(
      spark: SparkSession, dir: String, base: String,
      batchFilter: Column = col("vec_id") < NQueries,
      nprobe: Int = PqProbe, sameLabel: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Engine.register(spark)
    val cent = spark.read.parquet(s"$base/centroids")
    val cb = spark.read.parquet(s"$base/pq")
    val corpus = spark.read.option("basePath", s"$base/corpus")
      .parquet(graft.sources.IndexCatalog.latestFiles(base): _*)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"),
        col("nrm").as("n_nrm"), col("codes"), col("label").as("n_label"),
        col("centroid_id").as("n_cent"))
    val cw = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("centroid_id"))
    val q = embeddings(spark, dir).filter(batchFilter)
      .withColumn("qd", expr("transform(embedding, x -> cast(x AS double))"))
    val probes = q.crossJoin(cent)
      .withColumn("c_nrm", sqrt(dot(col("c_emb"), col("c_emb"))))
      .withColumn("c_cos",
        dot(col("qd"), col("c_emb")) / (col("nrm") * col("c_nrm")))
      .withColumn("c_rk", row_number().over(cw))
      .filter(col("c_rk") <= nprobe)
      .select(col("vec_id").as("query_id"), col("qd"),
        col("nrm").as("q_nrm"), col("centroid_id").as("q_cent"),
        col("label").as("q_label"),
        // fixed-point query·centroid term of the ADC score
        floor(dot(col("qd"), col("c_emb")) * lit(1000000.0)).cast("long")
          .as("qc_fx"))
    // the ADC LUT: query-slice · codeword, fixed-point — PqM × PqKs
    // rows per query, broadcast-sized by construction
    val lut = q.select(col("vec_id").as("query_id"), col("qd"))
      .crossJoin(cb)
      .select(col("query_id"), col("m"), col("cw_id"),
        floor(dot(expr(s"slice(qd, m * $PqSub + 1, $PqSub)"), col("cw"))
          * lit(1000000.0)).cast("long").as("qdot_fx"))
    val baseCond = col("q_cent") === col("n_cent") &&
      col("query_id") =!= col("neighbor_id")
    val cand = probes
      .join(corpus,
        if (sameLabel) baseCond && col("q_label") === col("n_label")
        else baseCond)
      .select(col("query_id"), col("q_nrm"), col("qc_fx"),
        col("neighbor_id"), col("n_nrm"), col("codes"))
    // first pass reads CODES only: explode each candidate's PqM codes,
    // sum the LUT hits — an exact integer sum — then one division
    val adc = cand
      .select(col("query_id"), col("q_nrm"), col("qc_fx"),
        col("neighbor_id"), col("n_nrm"),
        posexplode(col("codes")).as(Seq("m", "cw_id")))
      .join(lut, Seq("query_id", "m", "cw_id"))
      .groupBy(col("query_id"), col("neighbor_id"), col("q_nrm"),
        col("qc_fx"), col("n_nrm"))
      .agg(sum(col("qdot_fx")).as("sum_fx"))
      .withColumn("ascore", (col("qc_fx") + col("sum_fx")).cast("double") /
        (col("q_nrm") * col("n_nrm")))
    val pool = adc
      .groupBy(col("query_id"))
      .agg(expr(s"topk_agg(ascore, neighbor_id, $PqPool)").as("tk"))
      .select(col("query_id"), explode(col("tk.payload")).as("neighbor_id"))
    // exact re-rank of PqPool × queries rows only, full vectors from
    // the store
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    pool
      .join(q.select(col("vec_id").as("query_id"), col("qd"),
        col("nrm").as("q_nrm")), Seq("query_id"))
      .join(corpus.select(col("neighbor_id"), col("n_emb"), col("n_nrm")),
        Seq("neighbor_id"))
      .withColumn("cos",
        dot(col("qd"), expr("transform(n_emb, x -> cast(x AS double))")) /
          (col("q_nrm") * col("n_nrm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= K)
      .select(col("query_id"), col("rk"), col("neighbor_id"))
      .orderBy("query_id", "rk")
  }

  /** The gated IVF-PQ query: build the PQ store over the whole corpus
    * (cells, codebooks, codes persisted once), then answer the query
    * batch through the asymmetric-distance probe. The result stays
    * lazy over the store ([[graft.Lease]]); recall ≥ 0.9 vs brute and
    * frozen-family appends are spec-pinned (PqStoreSpec).
    */
  def qIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_pq").toString
    // fixture-cached: the full-corpus PQ template (cells + codebooks +
    // codes) builds once per process; the probe is this query's work
    try FixtureTemplates.cloneInto("pq_full", spark, dir, base)
    catch {
      case e: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw e
    }
    graft.Lease.lease("q_ivf_pq", Seq(base))
    probePqStore(spark, dir, base)
  }

  /** FILTERED IVF-PQ: the same-label constraint composed with the
    * compressed two-stage probe — the configuration a production
    * filtered vector search actually runs (filter selectivity ×
    * cell pruning × 13× PQ bytes, all before the exact re-rank).
    * Shares `q_ivf_pq`'s store (the label is a stored column) and
    * its oracle replica with the label equality joined into the
    * candidate CTE.
    */
  def qPqFiltered(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_pqflt").toString
    try FixtureTemplates.cloneInto("pq_full", spark, dir, base)
    catch {
      case e: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw e
    }
    graft.Lease.lease("q_pq_filtered", Seq(base))
    probePqStore(spark, dir, base, sameLabel = true)
  }

  // --- LSH-bucketed ANN (random-hyperplane signs) -----------------------

  /** Sign-LSH: bucket vectors by the sign pattern of dot products
    * against `NPlanes` hyperplanes (data rows, so the oracle can
    * reproduce them), then search only within the bucket. Vectors with
    * high cosine share signs with high probability; the bucket join
    * replaces the all-pairs scan, like IVF but with hash buckets
    * instead of nearest-centroid cells.
    */
  private[operators] val NPlanes = 4

  def qEmbedLsh(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings(spark, dir)
    val planes = e.filter(col("vec_id") < NPlanes)
      .select(col("vec_id").as("plane_id"), col("embedding").as("p_emb"))
    val bucketed = e.crossJoin(planes)
      .withColumn("bit",
        when(dot(col("embedding"), col("p_emb")) >= 0,
          expr("shiftleft(1L, cast(plane_id AS int))")).otherwise(0L))
      .groupBy(col("vec_id"), col("embedding"), col("nrm"))
      .agg(sum(col("bit")).as("bucket"))
    val queries = bucketed.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("bucket").as("q_bucket"))
    val corpus = bucketed.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("n_emb"), col("nrm").as("n_nrm"),
      col("bucket").as("n_bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    queries
      .join(corpus, col("q_bucket") === col("n_bucket") &&
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= K)
      .select(col("query_id"), col("rk"), col("neighbor_id"))
      .orderBy("query_id", "rk")
  }

  // --- persisted sign-LSH store (embedding batch ingest) ----------------

  /** Build the sign-LSH bucket STORE over the even-id half of the
    * corpus (the same split [[qEmbedNearDup]] uses) — the embedding
    * sibling of [[graft.operators.DedupQueries]]'s text bucket store:
    * hyperplanes are the corpus's own first [[NPlanes]] vectors
    * (stored with the index, so probes and the oracle reproduce them),
    * and the corpus lands partitioned BY BUCKET — a probe restricted
    * to one sign pattern is a partition-pruned read of that bucket's
    * files alone. At 100 TB the bucketing runs once at ingest and
    * every later batch probes the layout.
    */
  private[operators] def buildEmbedStore(
      spark: SparkSession, dir: String, base: String): Unit = {
    val e = embeddings(spark, dir).filter(pmod(col("vec_id"), lit(2)) === 0)
    val planes = e.filter(col("vec_id") < 2 * NPlanes)
      .select(col("vec_id").as("plane_id"), col("embedding").as("p_emb"))
    planes.coalesce(1).write.mode("overwrite").parquet(s"$base/planes")
    writeEmbedGen(spark, e, base)
  }

  /** [[buildEmbedStore]] through the process-wide fixture cache
    * ([[graft.sources.StoreFixtures]]): the ~17 gated queries whose
    * lifecycle STARTS from the identical even-id store receive a
    * byte-copy of one template build instead of re-encoding the
    * corpus each — their proof value is the DML/stream/maintenance
    * choreography that FOLLOWS, and the build path stays exercised
    * by the template build plus the uncached spec suites.
    */
  private[operators] def buildEmbedStoreCached(
      spark: SparkSession, dir: String, base: String): Unit =
    FixtureTemplates.cloneInto("embed_evens", spark, dir, base)

  /** [[buildEmbedStoreChecked]] through the fixture cache — same
    * rationale, `check=` tag rides the copied v1 manifest.
    */
  private[operators] def buildEmbedStoreCheckedCached(
      spark: SparkSession, dir: String, base: String): Unit =
    FixtureTemplates.cloneInto("embed_evens_checked", spark, dir, base)

  /** Read a manifest-resolved store file list that may span MULTIPLE
    * corpus roots: a shallow clone's ([[cloneEmbedStore]]) early
    * versions reference the SOURCE store's files by path, so one
    * version's list can mix `src/corpus/bucket=…` and
    * `dst/corpus/bucket=…` files. Files are grouped by their root (the
    * path prefix above the first `k=v` segment), each group read with
    * its own `basePath` so the Hive partition column survives, and the
    * groups unioned — for the common single-root store this collapses
    * to exactly the old one-basePath read. Driver-side cost is string
    * grouping over the file list: catalog metadata, not data motion.
    */
  private[operators] def readStoreFiles(
      spark: SparkSession, files: Seq[String]): DataFrame = {
    val byRoot = files.groupBy { f =>
      val p = java.nio.file.Paths.get(f)
      val segs = (0 until p.getNameCount).map(p.getName(_).toString)
      val i = segs.indexWhere(_.contains("="))
      require(i > 0, s"no k=v partition segment in store file $f")
      (if (p.isAbsolute) "/" else "") + segs.take(i).mkString("/")
    }
    byRoot.toSeq.sortBy(_._1).map { case (root, fs) =>
      spark.read.option("basePath", root).parquet(fs: _*)
    }.reduce(_.unionByName(_))
  }

  /** Append an ingest batch's vectors INTO the store as a new committed
    * generation: sign patterns come from the STORED planes (never
    * recomputed — the hash family is fixed at build time, which is what
    * keeps every generation's buckets compatible), new files land
    * inside the existing `bucket=` directories, and the manifest rename
    * publishes them. Vectors already stored are skipped via an
    * anti-join on the store's id column. Append cost is proportional to
    * the batch; the corpus is never re-bucketed.
    */
  private[operators] def appendEmbedStore(
      spark: SparkSession, vecs: DataFrame, base: String): Unit =
    writeEmbedGen(spark, vecs, base)

  /** Shared generation writer for [[buildEmbedStore]]/
    * [[appendEmbedStore]]: bucket `vecs` against the stored planes,
    * stage the rows into the store's bucket partitioning and commit
    * exactly the files this write created
    * ([[graft.sources.StagedWrite]] — the writer's file list is its
    * own by construction, so concurrent appenders to one store can
    * never claim each other's files).
    */
  /** The embed store's FROZEN sign-hash family, in ONE place: a row's
    * bucket is its embedding's sign pattern against the stored planes
    * (bit b set iff dot(embedding, plane b) ≥ 0). Writers, probes and
    * every DML verb derive buckets through this single definition —
    * the store's compatibility contract is that the family never
    * changes within a store's lifetime, and a drifted copy (bit
    * order, sign convention, plane-id mapping) would produce
    * writer/prober buckets that silently never match: a recall
    * collapse with no error, the exact corruption class the frozen
    * generations exist to prevent.
    */
  private def signBuckets(vecs: DataFrame, planes: DataFrame,
      as: String = "bucket"): DataFrame =
    vecs.crossJoin(planes)
      .withColumn("bit",
        when(dot(col("embedding"), col("p_emb")) >= 0,
          expr("shiftleft(1L, cast(plane_id div 2 AS int))")).otherwise(0L))
      .groupBy(col("vec_id"), col("embedding"), col("nrm"))
      .agg(sum(col("bit")).as(as))

  private[operators] def writeEmbedGen(
      spark: SparkSession, vecs: DataFrame, base: String,
      commitTags: Seq[String] = Nil, assumeFresh: Boolean = false,
      fenceTag: Option[String] = None): Boolean = {
    import graft.sources.{IndexCatalog, StagedWrite}
    val target = s"$base/corpus"
    val planes = spark.read.parquet(s"$base/planes")
    val stored = IndexCatalog.latestFiles(base)
    // assumeFresh is the upstream-partitioned ingest contract: a
    // writer that KNOWS its batch is disjoint from the store (sliced
    // by key upstream, the common production shape) skips the
    // O(store) dedup anti-join — per-append cost then depends on the
    // BATCH alone, which is what lets a 100 TB store take appends at
    // ingest rate
    val fresh = if (stored.nonEmpty && !assumeFresh) {
      val ids = readStoreFiles(spark, stored).select(col("vec_id")).distinct()
      vecs.join(ids, Seq("vec_id"), "left_anti")
    } else vecs
    val rows = signBuckets(fresh, planes) // NPlanes rows — bounded small side
    // a fully-duplicate batch dedups to zero rows and writes no files —
    // the documented skip, so the append is a no-op, not a failed commit.
    // The commit rides the optimistic-retry loop: losing the version
    // CAS to a concurrent committer re-reads the store state and
    // re-publishes — both appends land as distinct versions with union
    // content. (Writers racing with OVERLAPPING vectors must partition
    // their input upstream — the anti-join above reads pre-race state.)
    // one shuffle keyed on the partition column: each bucket lands as
    // ONE file per generation instead of one-per-task-per-bucket —
    // without this a 32-task write sprays up to 32×16 tiny files per
    // commit, and every later manifest resolution, census scan,
    // footer-stats pass and hard-link clone pays that file count (the
    // rule [[compactEmbedStore]] always followed; the append path now
    // matches it)
    val newFiles = StagedWrite.partitioned(
      rows.repartition(col("bucket")), target, Seq("bucket"))
    // per-file id-range stats off the parquet footers the write just
    // produced — the data-skipping metadata q_store_skipping gates
    // (commit-visibility is the manifest's; sidecars are inert until)
    graft.sources.FileStats.record(base, newFiles, Seq("vec_id"))
    if (newFiles.isEmpty) true
    else fenceTag match {
      // streamed ingest: the replay guard re-checks inside the CAS
      // loop, so concurrent replays of one batch commit at most once
      case Some(t) =>
        IndexCatalog.commitTaggedOnce(base, t)(_ => (newFiles, commitTags))
          .isDefined
      case None =>
        IndexCatalog.commitWithRetry(base)(_ => (newFiles, commitTags))
        true
    }
  }

  /** Multi-slice BACKFILL ingest: N upstream-partitioned batches land
    * as N separate manifest generations (same protocol facts as N
    * [[writeEmbedGen]] calls — one commit, one tag set, one
    * time-travelable version per slice) from ONE Spark pass: the
    * bucket hash and the staged partitioned write run once over the
    * union (`partitionBy(slice, bucket)`), then each slice's files
    * move into the shared `bucket=` layout and commit in slice order.
    * This is how a real backfill drives a snapshot store: compute
    * cost scales with the DATA once, while commit granularity — the
    * unit of time travel, vacuum and downstream change feeds — stays
    * per slice. Requires the fresh-batch contract (slices disjoint
    * from the store and each other, partitioned upstream).
    */
  private[operators] def writeEmbedGenSliced(
      spark: SparkSession, vecs: DataFrame, sliceCol: Column, base: String,
      tagOf: Long => Seq[String]): Unit = {
    import graft.sources.{IndexCatalog, StagedWrite}
    val target = s"$base/corpus"
    val planes = spark.read.parquet(s"$base/planes")
    val rows = signBuckets(vecs, planes).withColumn("sl", sliceCol)
    val rootP = java.nio.file.Paths.get(target)
    java.nio.file.Files.createDirectories(rootP.getParent)
    val staging =
      java.nio.file.Files.createTempDirectory(rootP.getParent, ".staging-")
    try {
      // one shuffle keyed on the write's partition columns: each
      // (slice, bucket) cell lands as exactly one file — without this
      // the 32-task union write sprays a file per task per cell and
      // the backfill's NINE commits each census hundreds of KB files
      rows.repartition(col("sl"), col("bucket"))
        .write.mode("overwrite").partitionBy("sl", "bucket")
        .parquet(staging.toString)
      val bySlice = IndexCatalog.listDataFiles(staging.toString)
        .groupBy { f =>
          IndexCatalog.partitionKey(f).get.split("/").head
            .stripPrefix("sl=").toLong
        }
      bySlice.toSeq.sortBy(_._1).foreach { case (sl, fs) =>
        val moved = fs.map { f =>
          val rel = staging.relativize(java.nio.file.Paths.get(f))
          // drop the sl= segment (files land in the shared bucket=
          // layout) but keep the slice in the FILE name: one job wrote
          // every slice, so task-file names repeat across slices and
          // would otherwise collide — and silently rename()-overwrite —
          // inside a shared bucket directory
          val inner = rel.subpath(1, rel.getNameCount)
          val dest = rootP.resolve(inner.getParent)
            .resolve(s"sl$sl-${inner.getFileName}")
          java.nio.file.Files.createDirectories(dest.getParent)
          java.nio.file.Files.move(java.nio.file.Paths.get(f), dest,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          dest.toString
        }.sorted
        graft.sources.FileStats.record(base, moved, Seq("vec_id"))
        IndexCatalog.commitWithRetry(base)(_ => (moved, tagOf(sl)))
      }
    } finally scala.util.Try(graft.Fs.deleteRecursively(staging.toString))
  }

  /** Probe the stored buckets with an ingest batch (the first
    * [[NQueries]] odd-id vectors): the batch computes its sign
    * pattern against the STORED planes, equi-joins the bucket-
    * partitioned corpus on its pattern, and ranks within-bucket by
    * exact cosine — the corpus side of the plan touches only the
    * index store (spec-asserted), and the only corpus-sized work ran
    * once at build time.
    */
  private[operators] def probeEmbedStore(
      spark: SparkSession, dir: String, base: String,
      batchFilter: Column = pmod(col("vec_id"), lit(2)) === 1 &&
        col("vec_id") < 2 * NQueries,
      version: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Engine.register(spark) // vec_dot on the scoring path
    val planes = spark.read.parquet(s"$base/planes")
    // manifest-resolved read: only committed generations' files —
    // the CURRENT version's by default, or any still-live version's
    // when `version` names one (time travel: the probe answers as of
    // that commit, later appends invisible even though their files
    // sit in the same bucket dirs). The basePath option keeps the
    // bucket partition column (and pruning) over the explicit file
    // list.
    val storeFiles =
      if (version == 0) graft.sources.IndexCatalog.latestFiles(base)
      else graft.sources.IndexCatalog.files(base, version)
    val corpus = readStoreFiles(spark, storeFiles)
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"),
        col("nrm").as("n_nrm"), col("bucket").as("n_bucket"))
    val q = signBuckets(
      embeddings(spark, dir).filter(batchFilter), planes, as = "q_bucket")
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"), col("q_bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    q.join(corpus, col("q_bucket") === col("n_bucket"))
      .withColumn("cos",
        dot(col("q_emb"), col("n_emb")) / (col("q_nrm") * col("n_nrm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= K)
      .select(col("query_id"), col("rk"), col("neighbor_id"))
      .orderBy("query_id", "rk")
  }

  /** The gated ingest query: build the bucket store once, answer the
    * batch lookup from it alone ([[graft.Lease]] owns the dir
    * lifetime; production builds at ingest, probes per batch).
    * Oracle: the identical plane/bucket/rank pipeline in SQL
    * restricted to (odd batch) x (even corpus).
    */
  def qEmbedIngest(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_embstore").toString
    try buildEmbedStoreCached(spark, dir, base)
    catch {
      case e: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw e
    }
    graft.Lease.lease("q_embed_ingest", Seq(base))
    probeEmbedStore(spark, dir, base)
  }

  /** The append-maintained form of [[qEmbedIngest]] — the embedding
    * sibling of [[DedupQueries.qNeardupAppend]]'s index lifecycle:
    * build the bucket store from the even-id corpus, APPEND batch A
    * (vec_id % 4 == 1) as a new committed generation bucketed by the
    * STORED planes, then answer batch B's (vec_id % 4 == 3) lookup
    * from the grown store — B's neighbors draw from corpus ∪ A exactly
    * as a from-scratch rebuild would (spec-proven), old generations'
    * files byte-untouched, only batch vectors ever re-hashed.
    */
  def qEmbedAppend(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_embappend").toString
    try {
      buildEmbedStoreCached(spark, dir, base)
      appendEmbedStore(spark,
        embeddings(spark, dir).filter(pmod(col("vec_id"), lit(4)) === 1),
        base)
    } catch {
      case e: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw e
    }
    graft.Lease.lease("q_embed_append", Seq(base))
    probeEmbedStore(spark, dir, base,
      pmod(col("vec_id"), lit(4)) === 3 && col("vec_id") < 4 * NQueries)
  }

  /** Time travel as a QUERY ANSWER — the versioned-probe end of the
    * catalog's history surface (`q_store_history` counts rows per
    * live version; this query RANKS at one): build the store (v1),
    * append batch A (v2), then answer the SAME probe batch at both
    * versions from the one store. The v1 answer ranks against the
    * build-time corpus alone — batch A invisible even though its
    * files sit in the same `bucket=` dirs — and equals the
    * pre-append probe verbatim; the v2 answer ranks against
    * corpus ∪ A. What scopes each probe is manifest RESOLUTION
    * (driver-side catalog metadata), not data copies: both probes
    * partition-prune to their sign buckets within their version's
    * file list. 100 TB shape: an as-of probe costs the same as a
    * current probe — version selection never touches data.
    */
  def qStoreAsof(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_asof").toString
    try {
      buildEmbedStoreCached(spark, dir, base)
      appendEmbedStore(spark,
        embeddings(spark, dir).filter(pmod(col("vec_id"), lit(4)) === 1),
        base)
    } catch {
      case e: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw e
    }
    graft.Lease.lease("q_store_asof", Seq(base))
    val probeB = pmod(col("vec_id"), lit(4)) === 3 &&
      col("vec_id") < 4 * NQueries
    probeEmbedStore(spark, dir, base, probeB, version = 1)
      .withColumn("version", lit(1L))
      .unionByName(
        probeEmbedStore(spark, dir, base, probeB, version = 2)
          .withColumn("version", lit(2L)))
      .orderBy("version", "query_id", "rk")
  }

  /** RESTORE — rollback as a query answer, closing the time-travel
    * loop (`q_store_history` reads history, `q_store_asof` queries at
    * a version, this one makes a version the HEAD again): build the
    * store from the even corpus (v1), append a batch later judged bad
    * (vec_id % 4 == 1, v2), RESTORE to v1
    * ([[graft.sources.IndexCatalogOps.restore]] — v3's manifest lists
    * exactly v1's files; zero data files move, the commit is catalog
    * metadata), then append the re-vetted slice (vec_id % 8 == 5, a
    * strict subset of the rolled-back batch, v4) and answer the probe
    * batch (vec_id % 4 == 3) from the head. The ranking draws from
    * corpus ∪ the re-appended slice alone: the bad batch's other half
    * is gone from the head even though its files still sit in the
    * same `bucket=` dirs — and stays readable at v2 (rollback never
    * destroys history; vacuum does, later, on its own schedule). The
    * catalog-side contract — restored manifest ≡ v1's verbatim,
    * nothing written by the restore, history monotone 1..4 — is the
    * Spark-side `restore_ok` boolean the oracle pins TRUE.
    *
    * 100 TB shape: un-ingesting a bad batch costs one manifest write
    * regardless of store size — the alternative (row-level DELETE of
    * the batch) would rewrite every partition the batch touched; the
    * re-append then re-hashes only the re-vetted rows (the anti-join
    * sees the RESTORED head, so re-ingest after rollback needs no
    * special casing).
    */
  def qStoreRestore(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.IndexCatalog
    val base = java.nio.file.Files.createTempDirectory("graft_restore").toString
    val ok = try {
      buildEmbedStoreCached(spark, dir, base) // v1: evens
      appendEmbedStore(spark,
        embeddings(spark, dir).filter(pmod(col("vec_id"), lit(4)) === 1),
        base) // v2: + the batch later judged bad
      val before = IndexCatalog.listDataFiles(s"$base/corpus")
      // the rollback runs through the SQL verb surface
      val v3 = spark.sql(s"RESTORE '$base' TO VERSION 1")
        .collect()(0).getLong(0).toInt
      val after = IndexCatalog.listDataFiles(s"$base/corpus")
      appendEmbedStore(spark,
        embeddings(spark, dir).filter(pmod(col("vec_id"), lit(8)) === 5),
        base) // v4: the re-vetted slice, anti-joined against the RESTORED head
      v3 == 3 &&
        IndexCatalog.files(base, 3) == IndexCatalog.files(base, 1) &&
        after == before && // zero-copy: the restore wrote no data files
        IndexCatalog.tags(base, 3) == Seq("restore-of=1") &&
        IndexCatalog.liveVersions(base) == Seq(1, 2, 3, 4) // history monotone
    } catch {
      case t: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw t
    }
    graft.Lease.lease("q_store_restore", Seq(base))
    probeEmbedStore(spark, dir, base,
      pmod(col("vec_id"), lit(4)) === 3 && col("vec_id") < 4 * NQueries)
      .withColumn("restore_ok", lit(ok))
  }

  /** Incremental (change-data) read between two committed versions —
    * the consumer-side complement of the append path: WHAT CHANGED
    * from v1 to v2 is pure manifest SET ALGEBRA (files(v2) minus
    * files(v1) — driver-side catalog metadata), and the reader scans
    * exactly those files. This is how a downstream job (replica sync,
    * index refresh, a compaction planner) follows a 100 TB store:
    * each refresh reads O(delta), never O(store), with no tombstone
    * scan and no row-level diff join — append-only generations make
    * the file-level diff exact. The census is over the appended
    * generation alone; the oracle recomputes the same rows' census
    * from the raw fixture under the batch predicate.
    */
  def qStoreChanges(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.IndexCatalog
    val base = java.nio.file.Files.createTempDirectory("graft_changes").toString
    try {
      buildEmbedStoreCached(spark, dir, base) // v1
      appendEmbedStore(spark,
        embeddings(spark, dir).filter(pmod(col("vec_id"), lit(4)) === 1),
        base) // v2
    } catch {
      case e: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw e
    }
    graft.Lease.lease("q_store_changes", Seq(base))
    val added = (IndexCatalog.files(base, 2).toSet --
      IndexCatalog.files(base, 1).toSet).toSeq.sorted
    spark.read.option("basePath", s"$base/corpus").parquet(added: _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col("vec_id")).cast("long").as("id_sum"),
        countDistinct(col("bucket")).as("n_buckets"))
  }

  /** Row-level DELETE from the embed store — find-then-rewrite with
    * the store's OWN metadata: a stats-pruned skinny scan
    * ([[graft.sources.FileStats.prune]] over the per-file
    * `vec_id`-range sidecars, the [[mergeIntoEmbedStore]] step-2
    * pattern) resolves the delete ids' CURRENT buckets, so the delete
    * finds a row WHEREVER it lives. Re-hashing the caller's
    * (vec_id, embedding) pairs — the previous derivation — silently
    * missed any row whose stored embedding had since been UPDATED
    * (its bucket migrated; the hash-derived partition set pointed at
    * the old location and the "deleted" row survived): an erasure
    * must never depend on the caller holding the current embedding,
    * and the passed embeddings are now not consulted at all. Only the
    * buckets actually HOLDING deleted rows are read back (anti-joined
    * on the delete ids) and rewritten in place-by-replacement; a
    * bucket whose rows are ALL deleted is replaced with nothing
    * (`extraReplacedKeys`), and every untouched partition carries
    * forward by path, byte-identical. The commit validates against
    * the version the delete read (`basedOn`) and re-derives on
    * conflict, like the compaction paths.
    *
    * 100 TB shape: the GDPR-style erasure pattern — cost is
    * O(partitions whose id-ranges cover deleted rows), a sliver of
    * the store; time travel still serves the deleted rows at
    * pre-delete versions (by design) until
    * [[graft.sources.IndexCatalog.vacuum]] expires those manifests,
    * so PHYSICAL erasure = delete + vacuum past the retention
    * horizon, exactly as in production table formats.
    */
  private[operators] def deleteFromEmbedStore(
      spark: SparkSession, base: String, delIds: DataFrame): Unit = {
    import graft.sources.{FileStats, IndexCatalog, StagedWrite}
    val target = s"$base/corpus"
    val ids = delIds.select(col("vec_id"))
    // bounded driver read: the delete set's id RANGE drives the
    // sidecar prune (coarser than the exact set — conservative)
    val bounds = ids.agg(min(col("vec_id")), max(col("vec_id"))).collect()(0)
    if (bounds.isNullAt(0)) return // empty delete set: no-op
    val (idLo, idHi) = (bounds.getLong(0), bounds.getLong(1))
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      val basedOn = IndexCatalog.currentVersion(base)
      require(basedOn >= 1, s"nothing to delete from: $base has no version")
      val liveAll = IndexCatalog.files(base, basedOn)
      // FIND: the delete ids' CURRENT buckets from the store itself —
      // a stats-pruned skinny scan (the mergeIntoEmbedStore step-2
      // pattern), re-run per attempt against the observed version.
      // Only the buckets actually HOLDING deleted rows rewrite.
      val candidates = FileStats.prune(base, liveAll, "vec_id", idLo, idHi)
      val targetKeys =
        if (candidates.isEmpty) Set.empty[String]
        else readStoreFiles(spark, candidates)
          .select(col("vec_id"), col("bucket").cast("long").as("bucket"))
          .join(ids, Seq("vec_id"), "left_semi")
          .select(col("bucket")).distinct()
          .collect().map(r => s"bucket=${r.getLong(0)}").toSet
      val live = liveAll
        .filter(f => IndexCatalog.partitionKey(f).exists(targetKeys.contains))
      if (live.isEmpty) done = true // ids not in the store: no-op
      else {
        val remaining = readStoreFiles(spark, live)
          .join(ids, Seq("vec_id"), "left_anti")
        try {
          val rewritten = StagedWrite.partitioned(
            remaining.repartition(col("bucket")), target, Seq("bucket"))
          graft.sources.FileStats.record(base, rewritten, Seq("vec_id"))
          // the REBASING commit absorbs conflicts whose intervening
          // commits touched only OTHER partitions (no re-derivation);
          // a same-partition conflict re-raises into the outer loop
          IndexCatalog.commitReplacePartitionsRebasing(base, rewritten,
            Seq(s"delete ${targetKeys.toSeq.sorted.mkString(",")}"),
            basedOn, extraReplacedKeys = targetKeys)
          done = true
        } catch {
          case e if IndexCatalog.isCommitConflict(e) && attempts < 5 => ()
        }
      }
    }
  }

  /** The gated DELETE query: build the store over the even corpus,
    * DELETE the `vec_id % 4 == 0` half, and answer the standard
    * ingest probe from the post-delete store — rankings must equal a
    * store that never held the deleted vectors (the oracle runs the
    * ingest pipeline over the surviving `vec_id % 4 == 2` corpus).
    * The deleted rows remain visible at v1 by time-travel design
    * (spec-pinned, with vacuum as the physical-erasure step).
    */
  def qStoreDelete(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_storedel").toString
    try {
      buildEmbedStoreCached(spark, dir, base) // v1: evens
      deleteFromEmbedStore(spark, base,
        embeddings(spark, dir).filter(pmod(col("vec_id"), lit(4)) === 0)
          .select(col("vec_id"), col("embedding"))) // v2: odd-half of evens gone
    } catch {
      case e: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw e
    }
    graft.Lease.lease("q_store_delete", Seq(base))
    probeEmbedStore(spark, dir, base)
  }

  /** MERGE INTO the embed store — the upsert every CDC-fed index needs:
    * batch rows whose `vec_id` is already stored REPLACE the stored row
    * (an update), the rest INSERT, in ONE atomic commit. The twist a
    * hash-partitioned store adds over a plain table MERGE: a row's
    * partition is a FUNCTION of the row (its sign pattern), so an
    * update whose embedding changed usually MIGRATES buckets — the
    * commit must remove the row from its old partition and land it in
    * its new one atomically, which is exactly what
    * [[graft.sources.IndexCatalog.commitReplacePartitions]] over
    * (old buckets ∪ new buckets) gives. The hash FAMILY itself (the
    * stored planes) is never refit — even when an update touches a row
    * the planes were seeded from, every generation keeps hashing with
    * the build-time planes, so all buckets stay compatible.
    *
    * Work bounded in three steps, none corpus-sized:
    *  1. re-hash the batch against the stored planes → new buckets;
    *  2. locate matched ids' CURRENT buckets with an id-column scan of
    *     the candidate files — candidates cut by the
    *     [[graft.sources.FileStats]] id-range sidecars to files whose
    *     range intersects the batch's (an id-ordered ingest makes that
    *     a sliver of the store), and the scan reads only (vec_id,
    *     bucket) — the partition value rides the path, so this is one
    *     pruned skinny-column pass, not a row fetch;
    *  3. rewrite ONLY the touched buckets' live rows (survivors
    *     anti-joined on batch ids, union the re-hashed batch) and
    *     publish via a partition-replacement commit validated against
    *     the version the merge read (`basedOn`); a concurrent commit
    *     fails the CAS and the merge RE-DERIVES against the winner.
    *
    * Deleted-then-superseded rows stay readable at pre-merge versions
    * (time travel) until vacuum, as with DELETE.
    */
  private[operators] def mergeIntoEmbedStore(
      spark: SparkSession, base: String, batch: DataFrame): Unit = {
    import graft.sources.{FileStats, IndexCatalog, StagedWrite}
    val target = s"$base/corpus"
    val planes = spark.read.parquet(s"$base/planes")
    // the batch's rows under the STORED hash family — small (batch ×
    // NPlanes), checkpointed once and reused across the retry loop
    val hashed = signBuckets(batch, planes).localCheckpoint()
    // freed on every exit: a leaked checkpoint survives to session
    // teardown (the DedupQueries.freeLocalCheckpoint discipline)
    try {
    val bounds = hashed.agg(min("vec_id"), max("vec_id")).collect()(0)
    if (bounds.isNullAt(0)) return // empty batch: no-op, no commit
    val (idLo, idHi) = (bounds.getLong(0), bounds.getLong(1))
    val newKeys = hashed.select(col("bucket")).distinct()
      .collect().map(r => s"bucket=${r.getLong(0)}").toSet
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      val basedOn = IndexCatalog.currentVersion(base)
      require(basedOn >= 1, s"nothing to merge into: $base has no version")
      val files = IndexCatalog.files(base, basedOn)
      // step 2: matched ids' current buckets — stats-pruned skinny scan
      val candidates = FileStats.prune(base, files, "vec_id", idLo, idHi)
      val oldKeys = readStoreFiles(spark, candidates)
        .select(col("vec_id"), col("bucket").cast("long").as("bucket"))
        .join(hashed.select(col("vec_id")), Seq("vec_id"), "left_semi")
        .select(col("bucket")).distinct()
        .collect().map(r => s"bucket=${r.getLong(0)}").toSet
      val targetKeys = oldKeys ++ newKeys
      val live = files
        .filter(f => IndexCatalog.partitionKey(f).exists(targetKeys.contains))
      // pure-insert into so-far-empty buckets: no live files to carry
      val survivors =
        if (live.isEmpty) hashed.limit(0)
        else readStoreFiles(spark, live)
          .join(hashed.select(col("vec_id")), Seq("vec_id"), "left_anti")
          .select(col("vec_id"), col("embedding"), col("nrm"),
            col("bucket").cast("long").as("bucket"))
      try {
        val written = StagedWrite.partitioned(
          survivors.unionByName(hashed).repartition(col("bucket")),
          target, Seq("bucket"))
        FileStats.record(base, written, Seq("vec_id"))
        // rebasing commit: an interleaved commit into untouched
        // buckets rebases in place; touched-bucket conflicts re-derive
        IndexCatalog.commitReplacePartitionsRebasing(base, written,
          Seq(s"merge ${targetKeys.toSeq.sorted.mkString(",")}"),
          basedOn, extraReplacedKeys = targetKeys)
        done = true
      } catch {
        case e if IndexCatalog.isCommitConflict(e) && attempts < 5 => ()
      }
    }
    } finally graft.operators.DedupQueries.freeLocalCheckpoint(hashed)
  }

  /** The gated MERGE query: build the store over the even corpus (v1),
    * then one merge commit that UPDATES every `vec_id % 8 == 0` row to
    * hold its successor's embedding (a deterministic new vector the
    * oracle can reproduce — most such rows migrate buckets) and
    * INSERTS the `vec_id % 4 == 1` batch. The standard batch-B probe
    * against the merged store must rank exactly as an ingest over the
    * merged corpus — survivors with their original vectors, updated
    * rows with their new ones, inserts present, and the hash planes
    * still the BUILD-time ones even though vec_id 0 (a plane seed) was
    * itself updated.
    */
  def qStoreMerge(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_merge").toString
    try {
      buildEmbedStoreCached(spark, dir, base) // v1: evens
      val e = embeddings(spark, dir)
      val inserts = e.filter(pmod(col("vec_id"), lit(4)) === 1)
        .select(col("vec_id"), col("embedding"), col("nrm"))
      // update target t (t % 8 == 0) takes the embedding of row t + 1
      val updates = e.filter(pmod(col("vec_id"), lit(8)) === 0)
        .select(col("vec_id"))
        .join(e.select((col("vec_id") - 1).as("vec_id"),
          col("embedding"), col("nrm")), Seq("vec_id"))
      mergeIntoEmbedStore(spark, base, inserts.unionByName(updates))
    } catch {
      case t: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw t
    }
    graft.Lease.lease("q_store_merge", Seq(base))
    probeEmbedStore(spark, dir, base,
      pmod(col("vec_id"), lit(4)) === 3 && col("vec_id") < 4 * NQueries)
  }

  /** Predicate-driven row-level UPDATE — the DML verb MERGE doesn't
    * cover: MERGE is handed its change set (a batch of ids), UPDATE
    * must FIND it, so the one extra cost is a find-phase scan over
    * the store under the predicate. That scan is the part that must
    * be bounded at 100 TB, and the [[graft.sources.FileStats]]
    * sidecars bound it: the caller supplies the predicate's range on
    * the stats column and only files whose recorded id-range
    * intersects are read (an id-ordered ingest makes that a sliver;
    * a fully-scattered layout degrades conservatively to the full
    * list — correct either way, as in [[mergeIntoEmbedStore]]'s
    * candidate step). From there the shape is MERGE's: the SET
    * expression can change the embedding, the row's bucket is a
    * function of the row, so updated rows re-hash against the FROZEN
    * build-time planes and usually migrate partitions; survivors of
    * (old ∪ new) buckets rewrite once, untouched partitions carry
    * forward by path, and the rebasing partition-replacement commit
    * publishes atomically with CAS + re-derive on conflict. Conflict
    * detection here is STRICTER than MERGE/DELETE's key-level rule,
    * because the verb is predicate-driven — the find phase must have
    * READ every row the commit claims to govern: an intervening
    * append whose recorded `vec_id` stats range intersects
    * [statsLo, statsHi] (or carries no sidecar — conservative) may
    * hold predicate-matching rows in buckets outside the target keys,
    * so it re-raises as a content conflict and the whole
    * find+set+rewrite re-derives against the winner's state. That
    * closes the write-skew a pure key-level check permits.
    */
  private[operators] def updateEmbedStoreWhere(
      spark: SparkSession, base: String, pred: Column,
      statsLo: Long, statsHi: Long,
      setEmbedding: Column => Column): Unit = {
    import graft.sources.{FileStats, IndexCatalog, StagedWrite}
    Engine.register(spark) // vec_dot on the re-norm path
    val target = s"$base/corpus"
    val planes = spark.read.parquet(s"$base/planes")
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      val basedOn = IndexCatalog.currentVersion(base)
      require(basedOn >= 1, s"nothing to update in: $base has no version")
      val files = IndexCatalog.files(base, basedOn)
      // FIND: stats-pruned candidate files under the predicate's
      // declared id-range bound — the only store scan the verb runs
      val candidates = FileStats.prune(base, files, "vec_id", statsLo, statsHi)
      // version-dependent, so recomputed per attempt (never reused
      // across a CAS retry); checkpointed within the attempt — it
      // feeds the key census, the survivor anti-join and the rewrite
      val matched =
        if (candidates.isEmpty) null
        else readStoreFiles(spark, candidates).filter(pred)
          .select(col("vec_id"), col("embedding"), col("nrm"),
            col("bucket").cast("long").as("bucket"))
          .localCheckpoint()
      if (matched == null) done = true // no candidate files: no-op
      else if (matched.isEmpty) {
        // the per-attempt checkpoints are freed BEFORE the next
        // attempt (or exit): leaked, each CAS retry would pin another
        // snapshot until session teardown
        graft.operators.DedupQueries.freeLocalCheckpoint(matched)
        done = true // no match: no-op
      } else try {
        val oldKeys = matched.select(col("bucket")).distinct()
          .collect().map(r => s"bucket=${r.getLong(0)}").toSet
        // SET + re-norm + re-hash against the stored (frozen) planes
        val updated = signBuckets(matched
          .select(col("vec_id"), setEmbedding(col("embedding")).as("embedding"))
          .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)"))),
          planes)
          .localCheckpoint()
        try {
        val newKeys = updated.select(col("bucket")).distinct()
          .collect().map(r => s"bucket=${r.getLong(0)}").toSet
        val targetKeys = oldKeys ++ newKeys
        val live = files
          .filter(f => IndexCatalog.partitionKey(f).exists(targetKeys.contains))
        val survivors = readStoreFiles(spark, live)
          .join(matched.select(col("vec_id")), Seq("vec_id"), "left_anti")
          .select(col("vec_id"), col("embedding"), col("nrm"),
            col("bucket").cast("long").as("bucket"))
        try {
          val written = StagedWrite.partitioned(
            survivors.unionByName(
              updated.select(col("vec_id"), col("embedding"), col("nrm"),
                col("bucket"))).repartition(col("bucket")),
            target, Seq("bucket"))
          FileStats.record(base, written, Seq("vec_id"))
          IndexCatalog.commitReplacePartitionsRebasing(base, written,
            Seq(s"update ${targetKeys.toSeq.sorted.mkString(",")}"),
            basedOn, extraReplacedKeys = targetKeys,
            addConflicts = adds => {
              // an intervening add may hold predicate-matching rows
              // the find phase never read: intersecting (or
              // unstated) id range ⇒ content conflict, re-derive
              val rs = FileStats.ranges(base, adds, "vec_id")
              adds.exists(f => rs.get(f).forall {
                case (lo, hi) => lo <= statsHi && hi >= statsLo })
            })
          done = true
        } catch {
          case e if IndexCatalog.isCommitConflict(e) && attempts < 5 => ()
        }
        } finally graft.operators.DedupQueries.freeLocalCheckpoint(updated)
      } finally graft.operators.DedupQueries.freeLocalCheckpoint(matched)
    }
  }

  /** [[qStoreUpdate]]'s predicate range — absolute id bounds (every
    * fixture holds vec_ids from 0), so the oracle states the same
    * constants.
    */
  private val UpdLo = 100L
  private val UpdHi = 199L

  /** The gated UPDATE query: build the store over the even corpus
    * (v1), then `UPDATE corpus SET embedding = -embedding WHERE
    * vec_id BETWEEN 100 AND 199` (v2). Negation is the adversarial
    * SET for a sign-partitioned store — every plane dot flips sign,
    * so each updated row migrates to its complement bucket — while
    * staying FP-exact in both engines (a sign-bit flip) and
    * norm-preserving. The standard probe against the updated store
    * must rank exactly as an ingest over a corpus where the in-range
    * evens were always negated; everything else (including the
    * plane rows, ids 0–6, outside the range) is untouched.
    */
  def qStoreUpdate(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_upd").toString
    try {
      buildEmbedStoreCached(spark, dir, base) // v1: evens
      updateEmbedStoreWhere(spark, base,
        col("vec_id").between(UpdLo, UpdHi), UpdLo, UpdHi,
        e => transform(e, x => -x)) // v2: in-range evens negated
    } catch {
      case t: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw t
    }
    graft.Lease.lease("q_store_update", Seq(base))
    probeEmbedStore(spark, dir, base)
  }

  /** Row-level CHANGE-DATA feed of one commit — the CDC complement to
    * the file-level follower ([[graft.sources.StoreChangeSource]]
    * streams pure appends and must skip replacement commits, because
    * their files mix rewritten survivors with real changes; this
    * computes the ROW-level truth of exactly those commits). The diff
    * is scoped by the manifest: only the files version `v` REMOVED and
    * ADDED are read — for a DML commit that's the touched partitions,
    * O(changed partitions) never O(store) — and a full-outer join on
    * the row key classifies:
    *  - key only on the new side → `insert`;
    *  - key only on the old side → `delete`;
    *  - both sides, row changed  → `update_preimage` (the old row)
    *    + `update_postimage` (the new row);
    *  - both sides, row identical → nothing: a rewritten SURVIVOR.
    * That last row makes maintenance transparent by construction — a
    * compaction rewrites every row identically, so its change feed is
    * EMPTY (spec-pinned), with no special-casing of commit types: the
    * classification falls out of content, the manifest only bounds
    * what's read. This is the change-data-feed contract production
    * table formats expose (`table_changes`), derived here entirely
    * from the catalog's immutable commits — no change log is written
    * at commit time, so CDC costs nothing until someone asks.
    */
  /** The row-level CDC classification shared by the batch
    * `table_changes` probe ([[storeChanges]]) and the streaming cdc
    * feed (`q_stream_store_cdc` over
    * [[graft.sources.StoreChangeSource]]'s cdc mode): full-outer join
    * pre-state (`oldRows`) against post-state (`newRows`) on
    * `extraKeys :+ vec_id` — batch passes no extra key (one commit at
    * a time), streaming passes `version` so one join classifies every
    * commit in a micro-batch. Both frames carry
    * (extraKeys…, vec_id, embedding, bucket); the output is
    * (extraKeys…, change_type, vec_id, bucket). Sharing the function
    * is what makes "the drained stream equals the batch feed" true by
    * construction, not by parallel maintenance.
    */
  private[operators] def classifyChanges(
      oldRows: DataFrame, newRows: DataFrame,
      extraKeys: Seq[String] = Nil): DataFrame = {
    val keyCols = extraKeys.map(col)
    val o = oldRows.select(keyCols ++ Seq(col("vec_id"),
      col("embedding").as("o_emb"), col("bucket").as("o_bucket")): _*)
    val n = newRows.select(keyCols ++ Seq(col("vec_id"),
      col("embedding").as("n_emb"), col("bucket").as("n_bucket")): _*)
    val j = o.join(n, extraKeys :+ "vec_id", "full_outer")
    def out(kind: String, bucket: Column): Seq[Column] =
      keyCols ++ Seq(lit(kind).as("change_type"), col("vec_id"),
        bucket.as("bucket"))
    val inserts = j.filter(col("o_emb").isNull && col("o_bucket").isNull)
      .select(out("insert", col("n_bucket")): _*)
    val deletes = j.filter(col("n_emb").isNull && col("n_bucket").isNull)
      .select(out("delete", col("o_bucket")): _*)
    val changed = j.filter(col("o_bucket").isNotNull &&
      col("n_bucket").isNotNull &&
      (col("o_bucket") =!= col("n_bucket") || col("o_emb") =!= col("n_emb")))
    val pre = changed.select(out("update_preimage", col("o_bucket")): _*)
    val post = changed.select(out("update_postimage", col("n_bucket")): _*)
    inserts.unionByName(deletes).unionByName(pre).unionByName(post)
  }

  private[operators] def storeChanges(
      spark: SparkSession, base: String, v: Int): DataFrame = {
    import graft.sources.IndexCatalog
    val prev = if (v <= 1) Seq.empty else IndexCatalog.files(base, v - 1)
    val cur = IndexCatalog.files(base, v)
    val removed = prev.filterNot(cur.toSet)
    val added = cur.filterNot(prev.toSet)
    def rowsOf(files: Seq[String]): DataFrame =
      if (files.isEmpty)
        spark.emptyDataFrame
          .select(lit(0L).as("vec_id"),
            lit(null).cast("array<float>").as("embedding"),
            lit(0L).as("bucket")).limit(0)
      else readStoreFiles(spark, files)
        .select(col("vec_id"), col("embedding"),
          col("bucket").cast("long").as("bucket"))
    classifyChanges(rowsOf(removed), rowsOf(added))
  }

  /** The gated CDC query: run the store's full DML lifecycle — build
    * (v1: evens), MERGE (v2: update the `% 8 == 0` rows to their
    * successor's vector, insert the `% 4 == 1` batch), row-level
    * DELETE (v3: the never-updated `% 8 == 4` rows) — then read each
    * commit's row-level change feed and report the per-(version,
    * change_type) census. The oracle recomputes every census from the
    * fixture's id algebra alone: v2 = inserts + the update pair over
    * the same ids, v3 = deletes; the rewritten SURVIVORS sharing
    * files with real changes must contribute NOTHING.
    */
  /** The `embed_dml` template: the identical three-commit DML
    * lifecycle `q_store_cdc`, `q_stream_store_cdc` and
    * `q_stream_cdc_matview` all OPEN with — build (v1: evens), MERGE
    * (v2: update the `% 8 == 0` rows to their successor's vector,
    * insert the `% 4 == 1` batch), row-level DELETE (v3: the
    * never-updated `% 8 == 4` rows). Those queries' proof value is
    * what they READ from this history (batch diff, cdc stream, IVM
    * fold), not the DML itself, which stays exercised by this one
    * template build plus the uncached StoreMergeSpec / StoreDeleteSpec
    * / StoreCdcSpec suites. The copied store carries the full
    * manifest chain, so versions 1–3 stay individually resolvable.
    */
  private[operators] def buildEmbedDmlTemplate(
      spark: SparkSession, dir: String, base: String): Unit = {
    buildEmbedStore(spark, dir, base) // v1: evens
    val e = embeddings(spark, dir)
    val inserts = e.filter(pmod(col("vec_id"), lit(4)) === 1)
      .select(col("vec_id"), col("embedding"), col("nrm"))
    val updates = e.filter(pmod(col("vec_id"), lit(8)) === 0)
      .select(col("vec_id"))
      .join(e.select((col("vec_id") - 1).as("vec_id"),
        col("embedding"), col("nrm")), Seq("vec_id"))
    mergeIntoEmbedStore(spark, base, inserts.unionByName(updates)) // v2
    // delete ids whose stored vector is still the fixture's (the
    // % 8 == 4 slice was never updated), so the delete set re-hashes
    // to the right buckets from the raw table
    deleteFromEmbedStore(spark, base,
      e.filter(pmod(col("vec_id"), lit(8)) === 4)
        .select(col("vec_id"), col("embedding"))) // v3
  }

  def qStoreCdc(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    try FixtureTemplates.cloneInto("embed_dml", spark, dir, base)
    catch {
      case t: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw t
    }
    graft.Lease.lease("q_store_cdc", Seq(base))
    storeChanges(spark, base, 2).withColumn("version", lit(2L))
      .unionByName(storeChanges(spark, base, 3).withColumn("version", lit(3L)))
      .groupBy(col("version"), col("change_type"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("vec_id")).cast("long").as("id_sum"))
      .orderBy("version", "change_type")
  }

  /** SHALLOW CLONE of the embed store — a new store whose v1 manifest
    * references the source's current data files BY PATH: zero data
    * motion (the commit is one manifest write plus copying the store's
    * small metadata — planes and stats sidecars), after which the two
    * stores diverge independently — appends to the clone land under
    * the CLONE's own corpus root and the source never sees them. This
    * is the dev/test-branch primitive production table formats ship as
    * `CREATE TABLE ... SHALLOW CLONE`: branch a 100 TB index in
    * milliseconds, experiment (append, compact, probe), throw away.
    *
    * Ownership contract (as in those formats): borrowed files belong
    * to the SOURCE — the clone's [[graft.sources.IndexCatalog.vacuum]]
    * never touches a foreign root, and vacuuming the source past the
    * clone point can orphan the clone's early versions (the documented
    * shallow-clone hazard everywhere; deep-copy or re-clone if the
    * source must be vacuumed). Reads spanning both roots are
    * [[readStoreFiles]]'s multi-root grouping.
    */
  private[operators] def cloneEmbedStore(src: String, dst: String): Unit = {
    import graft.sources.{FileStats, IndexCatalog, LocalCatalogFs}
    val files = IndexCatalog.latestFiles(src)
    require(files.nonEmpty, s"nothing to clone: $src has no committed version")
    // store metadata (the hash planes) is copied — tiny, and the clone
    // must keep hashing with the SOURCE's family or its buckets would
    // be incompatible with the borrowed files' partitioning
    val planes = IndexCatalog.listDataFiles(s"$src/planes")
    LocalCatalogFs.mkdirs(s"$dst/planes")
    planes.foreach { f =>
      java.nio.file.Files.copy(java.nio.file.Paths.get(f),
        java.nio.file.Paths.get(s"$dst/planes",
          java.nio.file.Paths.get(f).getFileName.toString))
    }
    // stats sidecars are keyed by the data file's path, which the
    // clone references verbatim — copy the metadata so range pruning
    // works on the clone from version 1
    LocalCatalogFs.mkdirs(java.nio.file.Paths
      .get(FileStats.statsPath(dst, files.head)).getParent.toString)
    files.foreach { f =>
      val sp = FileStats.statsPath(src, f)
      if (LocalCatalogFs.exists(sp))
        LocalCatalogFs.publishIfAbsent(
          FileStats.statsPath(dst, f), LocalCatalogFs.readString(sp))
    }
    IndexCatalog.commitFiles(dst, files, Seq(s"clone-of $src"))
  }

  /** The gated CLONE query: build the source store over the even
    * corpus, shallow-clone it, append batch A to the CLONE, and answer
    * batch B's probe from the clone — rankings must equal
    * [[qEmbedAppend]]'s (corpus ∪ A; same oracle text), while the
    * SOURCE store is untouched by the whole episode: still at v1, same
    * file list, no clone files under its roots — pinned in the
    * `clone_ok` boolean the oracle asserts TRUE (byte-identity of the
    * borrowed files is spec-pinned with checksums).
    */
  def qStoreClone(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.IndexCatalog
    val src = java.nio.file.Files.createTempDirectory("graft_clonesrc").toString
    val dst = java.nio.file.Files.createTempDirectory("graft_clonedst").toString
    val ok = try {
      buildEmbedStoreCached(spark, dir, src) // source v1: evens
      val srcFiles = IndexCatalog.latestFiles(src)
      cloneEmbedStore(src, dst) // clone v1: borrowed paths, zero copy
      appendEmbedStore(spark,
        embeddings(spark, dir).filter(pmod(col("vec_id"), lit(4)) === 1),
        dst) // clone v2: own files under dst/corpus
      val v2New = IndexCatalog.files(base = dst, 2).toSet --
        IndexCatalog.files(base = dst, 1).toSet
      // the clone borrowed exactly the source's files, appended only
      // under its own root, and the source never moved
      IndexCatalog.files(dst, 1) == srcFiles &&
        v2New.nonEmpty && v2New.forall(_.startsWith(dst)) &&
        IndexCatalog.currentVersion(src) == 1 &&
        IndexCatalog.latestFiles(src) == srcFiles &&
        IndexCatalog.listDataFiles(s"$src/corpus").toSet == srcFiles.toSet
    } catch {
      case t: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(src))
        scala.util.Try(graft.Fs.deleteRecursively(dst))
        throw t
    }
    graft.Lease.lease("q_store_clone", Seq(src, dst))
    probeEmbedStore(spark, dir, dst,
      pmod(col("vec_id"), lit(4)) === 3 && col("vec_id") < 4 * NQueries)
      .withColumn("clone_ok", lit(ok))
  }

  // --- manifest file-statistics data skipping ---------------------------

  /** Id-range constants for [[qStoreSkipping]] — fixed absolute ids so
    * the oracle text is scale-independent (every fixture holds ids
    * 0..499 at minimum): three ingest generations with disjoint id
    * ranges, probed on a range strictly inside the middle one.
    */
  private[operators] val SkipT1 = 100L
  private[operators] val SkipT2 = 200L
  private[operators] val SkipLo = 120L
  private[operators] val SkipHi = 180L

  /** FILE-statistics data skipping — the metadata axis partition
    * pruning can't cover: the store is hash-partitioned by `bucket=`
    * (a content hash — useless against an id predicate), but an
    * id-ORDERED ingest gives every generation's files a tight id
    * range, recorded per file at commit time from the parquet footers
    * ([[graft.sources.FileStats]] — the min/max sidecars production
    * table formats keep in their manifests). A range probe then
    * prunes the manifest's file list BEFORE the engine lists or opens
    * anything: here three generations land with ids [0,T1), [T1,T2),
    * [T2,∞), the census over ids [[SkipLo]]..[[SkipHi]] keeps only
    * generation 2's files (driver-side set logic pinned in `skip_ok`),
    * and the answer must still be exact — if skipping dropped a
    * needed file the oracle's census catches it.
    *
    * 100 TB shape: stats live with the manifest (bytes per file, read
    * driver-side); a time- or sequence-scoped query over years of
    * ingest touches the few files whose range intersects, exactly as
    * partition pruning touches the few buckets a hash probe names —
    * the two prune axes compose on the same file list. Pruning is
    * conservative by contract: a file without a recorded range is
    * always scanned (spec-pinned).
    */
  def qStoreSkipping(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.{FileStats, IndexCatalog}
    val base = java.nio.file.Files.createTempDirectory("graft_skip").toString
    val (pruned, ok) = try {
      val e = embeddings(spark, dir).filter(pmod(col("vec_id"), lit(2)) === 0)
      val planes = e.filter(col("vec_id") < 2 * NPlanes)
        .select(col("vec_id").as("plane_id"), col("embedding").as("p_emb"))
      planes.coalesce(1).write.mode("overwrite").parquet(s"$base/planes")
      // id-ordered ingest: three generations with disjoint id ranges —
      // the layout a sequence/time-ordered production ingest produces
      writeEmbedGen(spark, e.filter(col("vec_id") < SkipT1), base) // v1
      writeEmbedGen(spark,
        e.filter(col("vec_id") >= SkipT1 && col("vec_id") < SkipT2), base) // v2
      writeEmbedGen(spark, e.filter(col("vec_id") >= SkipT2), base) // v3
      val all = IndexCatalog.latestFiles(base)
      val gen2 = IndexCatalog.files(base, 2).toSet --
        IndexCatalog.files(base, 1).toSet
      val kept = FileStats.prune(base, all, "vec_id", SkipLo, SkipHi)
      // the probe must keep STRICTLY fewer files than the store holds,
      // and nothing outside generation 2 — the skipping contract
      (kept, kept.nonEmpty && kept.size < all.size &&
        kept.forall(gen2.contains))
    } catch {
      case t: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw t
    }
    graft.Lease.lease("q_store_skipping", Seq(base))
    spark.read.option("basePath", s"$base/corpus").parquet(pruned: _*)
      .filter(col("vec_id").between(SkipLo, SkipHi))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("vec_id")).cast("long").as("id_sum"))
      .withColumn("skip_ok", lit(ok))
  }

  /** Fixed lookup keys for [[qStoreLookup]] — absolute ids so the
    * oracle text is scale-independent (every fixture holds ids
    * 0..499): three build-corpus evens, two appended-batch ids
    * (% 4 == 1), and one id the store never held (7: odd, % 4 == 3 —
    * the miss path the sketch should prune to nothing).
    */
  private[operators] val LookupIds = Seq(0L, 42L, 101L, 200L, 333L, 7L)

  /** BLOOM-FILTER file skipping — the POINT-LOOKUP axis, orthogonal
    * to both prune axes the store already has: partition pruning
    * needs the partition VALUE (here a content-hash bucket a caller
    * can't derive from an id), and [[qStoreSkipping]]'s min/max
    * ranges need the files to be range-CLUSTERED on the column (here
    * every file of a generation spans essentially the whole id
    * domain). A per-file membership sketch
    * ([[graft.sources.FileBloom]] — Spark's own `bloom_agg` bits,
    * recorded once per generation in one pass over the new files,
    * probed driver-side from the manifest) answers "which files can
    * hold these ids?" regardless of layout: the lookup census scans
    * only the surviving files, the sketch contract guarantees no
    * false negatives (the census must still be EXACT — the oracle
    * recomputes it from the raw fixture, so a dropped needed file is
    * a wrong answer, not a slow one), and the never-ingested key
    * relies on that same contract to return zero rows through
    * whatever files false-positive it in. The file-set contract —
    * strictly fewer files scanned than the store holds — is the
    * Spark-side `lookup_ok` boolean pinned TRUE.
    *
    * 100 TB shape: needle queries (is doc X ingested? fetch ids
    * {…}) probe O(files) sketch bits in catalog metadata and open
    * ~|ids| files, instead of scanning every file of an unknown
    * bucket; the sidecars cost ~1 byte/row, written at ingest over
    * data the writer just produced.
    */
  def qStoreLookup(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.{FileBloom, IndexCatalog}
    val base = java.nio.file.Files.createTempDirectory("graft_lookup").toString
    val (kept, ok) = try {
      buildEmbedStoreCached(spark, dir, base) // v1: evens
      appendEmbedStore(spark,
        embeddings(spark, dir).filter(pmod(col("vec_id"), lit(4)) === 1),
        base) // v2: + batch A — lookups span both generations
      val all = IndexCatalog.latestFiles(base)
      FileBloom.record(spark, base, all, "vec_id")
      val kept = FileBloom.prunePoint(spark, base, all, "vec_id", LookupIds)
      (kept, kept.nonEmpty && kept.size < all.size)
    } catch {
      case t: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw t
    }
    graft.Lease.lease("q_store_lookup", Seq(base))
    spark.read.option("basePath", s"$base/corpus").parquet(kept: _*)
      .filter(col("vec_id").isin(LookupIds: _*))
      .select(col("vec_id"), col("bucket").cast("long").as("bucket"))
      .withColumn("lookup_ok", lit(ok))
      .orderBy("vec_id")
  }

  /** The embed store's CHECK constraint for [[qStoreConstraint]]:
    * every ingested vector must be non-empty with a positive norm —
    * the rows the cosine pipeline would otherwise divide-by-zero on.
    */
  private[operators] val EmbedCheck = "nrm > 0 AND size(embedding) > 0"

  /** CHECK-constraint enforcement at commit — the WRITE-side quality
    * gate paired with the read-side schema surface (`q_store_schema`):
    * the constraint is DECLARED ON THE STORE at build (a `check=`
    * manifest tag riding the v1 commit —
    * [[graft.sources.StoreConstraints]]), so every writer discovers it
    * from catalog metadata instead of each ingest stream hard-coding
    * its own idea of valid. A poisoned batch (same ids, emptied
    * vectors — rows the cosine pipeline would divide by zero on) is
    * rejected BEFORE anything is written: no committed version, no
    * data files, no debris; the clean batch then commits normally and
    * the probe answers from corpus ∪ batch exactly as
    * `q_embed_append`. The enforcement contract — violating append
    * raised with the store unchanged, clean append committed,
    * constraint resolvable from the store — is the Spark-side
    * `constraint_ok` boolean the oracle pins TRUE.
    *
    * 100 TB shape: the gate is one map-side pass over rows the writer
    * is about to hash anyway — O(batch), never O(store) — and the
    * predicate travels with the store, so a fleet of independent
    * ingest streams cannot drift on what "valid" means.
    */
  /** [[buildEmbedStore]] with [[EmbedCheck]] declared on the v1
    * commit — the checked-store build `q_store_constraint` and the
    * streaming quarantine path share.
    */
  private[operators] def buildEmbedStoreChecked(
      spark: SparkSession, dir: String, base: String): Unit = {
    val e = embeddings(spark, dir).filter(pmod(col("vec_id"), lit(2)) === 0)
    val planes = e.filter(col("vec_id") < 2 * NPlanes)
      .select(col("vec_id").as("plane_id"), col("embedding").as("p_emb"))
    planes.coalesce(1).write.mode("overwrite").parquet(s"$base/planes")
    writeEmbedGen(spark, e, base,
      Seq(graft.sources.StoreConstraints.declareTag(EmbedCheck)))
  }

  def qStoreConstraint(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.{IndexCatalog, StoreConstraints}
    val base = java.nio.file.Files.createTempDirectory("graft_chk").toString
    val ok = try {
      // build: the v1 commit declares the constraint on the store
      buildEmbedStoreCheckedCached(spark, dir, base)

      val batchA =
        embeddings(spark, dir).filter(pmod(col("vec_id"), lit(4)) === 1)
      // the poisoned form of the same batch: every row violates
      val bad = batchA
        .withColumn("embedding", expr("cast(array() as array<float>)"))
        .withColumn("nrm", lit(0.0))
      val before = IndexCatalog.listDataFiles(s"$base/corpus")
      val rejected =
        try {
          writeEmbedGen(spark, StoreConstraints.enforce(bad, base), base)
          false
        } catch {
          case v: IllegalArgumentException =>
            v.getMessage.contains("CHECK constraint violated")
        }
      val unchanged = IndexCatalog.currentVersion(base) == 1 &&
        IndexCatalog.listDataFiles(s"$base/corpus") == before
      // the clean batch passes the same gate and commits
      writeEmbedGen(spark, StoreConstraints.enforce(batchA, base), base)
      rejected && unchanged && IndexCatalog.currentVersion(base) == 2 &&
        StoreConstraints.constraintOf(base).contains(EmbedCheck)
    } catch {
      case t: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw t
    }
    graft.Lease.lease("q_store_constraint", Seq(base))
    probeEmbedStore(spark, dir, base,
      pmod(col("vec_id"), lit(4)) === 3 && col("vec_id") < 4 * NQueries)
      .withColumn("constraint_ok", lit(ok))
  }

  // --- store compaction + retention vacuum ------------------------------

  /** Compact the embed store: rewrite the CURRENT version's live rows
    * into a fresh file set under the same `bucket=` partitioning (one
    * shuffle keyed on the partition column, so each bucket lands in ~1
    * file instead of one-per-generation-per-task) and publish it as a
    * [[graft.sources.IndexCatalog.commitRewrite]] — the manifest now
    * lists ONLY the compacted files, superseding every prior
    * generation's. Old files stay on disk for older manifests (time
    * travel) until [[graft.sources.IndexCatalog.vacuum]] reclaims them.
    * Content is untouched: probes before and after compaction are
    * row-identical (spec-pinned).
    */
  private[operators] def compactEmbedStore(
      spark: SparkSession, base: String): Unit = {
    import graft.sources.{IndexCatalog, StagedWrite}
    val target = s"$base/corpus"
    // conflict-safe rewrite: the commit validates against the version
    // the rewrite READ (basedOn) — an append landing mid-compaction
    // fails the CAS instead of having its rows silently superseded,
    // and the loser RE-DERIVES the whole rewrite against the winner's
    // state (a failed attempt's staged files become vacuum-grace
    // orphans, the documented crash-debris path)
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      val basedOn = IndexCatalog.currentVersion(base)
      require(basedOn >= 1, s"nothing to compact: $base has no committed version")
      val live = readStoreFiles(spark, IndexCatalog.files(base, basedOn))
      try {
        val compacted = StagedWrite.partitioned(
          live.repartition(col("bucket")), target, Seq("bucket"))
        graft.sources.FileStats.record(base, compacted, Seq("vec_id"))
        IndexCatalog.commitRewrite(base, compacted, Seq("compaction"), basedOn)
        done = true
      } catch {
        case e if IndexCatalog.isCommitConflict(e) && attempts < 5 => ()
      }
    }
  }

  /** Range-partition count for [[compactEmbedStoreSorted]]: the sorted
    * rewrite spreads the store over this many disjoint id ranges (at
    * scale: proportional to store size / target file size).
    */
  private[operators] val SortedCompactTasks = 8

  /** SORTED compaction — `OPTIMIZE ... ZORDER/SORT BY (id)` for the
    * store: identical commit semantics to [[compactEmbedStore]], but
    * the live rows are RANGE-partitioned on `vec_id` before the
    * bucket-partitioned write, so every rewritten file covers a tight,
    * task-disjoint id slice instead of the whole domain. Why it
    * matters: a PLAIN compaction is where data skipping goes to die —
    * merging id-ordered generations gives every output file the full
    * id range, so the [[graft.sources.FileStats]] prune keeps
    * everything. Sorting on compact RESTORES (and tightens) the
    * skipping that ingest order had provided, which is exactly why
    * production table formats pair OPTIMIZE with a sort/Z-order
    * clause. Layout changes only; content is untouched (same oracle
    * as the unsorted path would give), and the commit still validates
    * against the version it read.
    */
  private[operators] def compactEmbedStoreSorted(
      spark: SparkSession, base: String): Unit = {
    import graft.sources.{FileStats, IndexCatalog, StagedWrite}
    val target = s"$base/corpus"
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      val basedOn = IndexCatalog.currentVersion(base)
      require(basedOn >= 1, s"nothing to compact: $base has no committed version")
      val live = readStoreFiles(spark, IndexCatalog.files(base, basedOn))
      try {
        val compacted = StagedWrite.partitioned(
          live.repartitionByRange(SortedCompactTasks, col("vec_id")),
          target, Seq("bucket"))
        FileStats.record(base, compacted, Seq("vec_id"))
        IndexCatalog.commitRewrite(base, compacted,
          Seq("compaction sort=vec_id"), basedOn)
        done = true
      } catch {
        case e if IndexCatalog.isCommitConflict(e) && attempts < 5 => ()
      }
    }
  }

  /** The gated OPTIMIZE query: build the store as ONE generation —
    * every file spans essentially the whole id domain, so the range
    * probe's file prune keeps everything — then run the SORTED
    * compaction and prune again: strictly fewer files survive, and
    * the census over the pruned scan is still exact (the oracle
    * recomputes it from the fixture). The layout-only contract and
    * the strict improvement are pinned in `optimize_ok`.
    */
  def qStoreOptimize(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.{FileStats, IndexCatalog}
    val base = java.nio.file.Files.createTempDirectory("graft_opt").toString
    val (pruned, ok) = try {
      buildEmbedStoreCached(spark, dir, base) // v1: one full-range generation
      val all1 = IndexCatalog.latestFiles(base)
      val kept1 = FileStats.prune(base, all1, "vec_id", SkipLo, SkipHi)
      // the layout rewrite runs through the SQL verb surface (the
      // bucketed store routes SORT BY vec_id to the sorted compaction)
      spark.sql(s"OPTIMIZE '$base' SORT BY vec_id").collect() // v2
      val all2 = IndexCatalog.latestFiles(base)
      val kept2 = FileStats.prune(base, all2, "vec_id", SkipLo, SkipHi)
      // sorting trades file count for range tightness (more, smaller
      // files), so the skipping win is the kept FRACTION — the share
      // of the store a range scan must touch — dropping strictly
      (kept2, kept2.nonEmpty && kept2.size < all2.size &&
        kept2.size.toLong * all1.size < kept1.size.toLong * all2.size)
    } catch {
      case t: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw t
    }
    graft.Lease.lease("q_store_optimize", Seq(base))
    spark.read.option("basePath", s"$base/corpus").parquet(pruned: _*)
      .filter(col("vec_id").between(SkipLo, SkipHi))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("vec_id")).cast("long").as("id_sum"))
      .withColumn("optimize_ok", lit(ok))
  }

  /** PARTITION-SCOPED compaction — `OPTIMIZE ... WHERE` for the
    * store: rewrite ONLY the named buckets' live rows into fresh
    * files inside their own `bucket=` partitions and publish via
    * [[graft.sources.IndexCatalog.commitReplacePartitions]]; every
    * other partition's files carry forward BY PATH, byte-untouched
    * (spec-pinned). This is how a 100 TB store compacts under
    * continuous ingest: hot partitions (skewed buckets fragmented by
    * many small appends) are rewritten in place-by-replacement while
    * the cold ones — almost all of the store — cost the commit
    * nothing but a manifest line. The scan reads only the target
    * partitions' files (manifest-filtered before Spark ever lists).
    */
  private[operators] def compactEmbedStorePartitions(
      spark: SparkSession, base: String, buckets: Seq[Long]): Unit = {
    import graft.sources.{IndexCatalog, StagedWrite}
    val target = s"$base/corpus"
    val keys = buckets.map(b => s"bucket=$b").toSet
    // same conflict loop as [[compactEmbedStore]]: the replacement is
    // valid only against the version it read — an append into a
    // target bucket mid-rewrite fails the CAS, and the re-attempt
    // reads the winner's state (so the appended rows are in the
    // rewrite, not dropped)
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      val basedOn = IndexCatalog.currentVersion(base)
      val live =
        if (basedOn == 0) Seq.empty
        else IndexCatalog.files(base, basedOn)
          .filter(f => IndexCatalog.partitionKey(f).exists(keys.contains))
      if (live.isEmpty) done = true
      else {
        try {
          val rewritten = StagedWrite.partitioned(
            readStoreFiles(spark, live)
              .repartition(col("bucket")),
            target, Seq("bucket"))
          graft.sources.FileStats.record(base, rewritten, Seq("vec_id"))
          // rebasing commit: appends into non-target buckets no longer
          // force a rewrite re-derivation, only same-bucket commits do
          IndexCatalog.commitReplacePartitionsRebasing(base, rewritten,
            Seq(s"compaction ${keys.toSeq.sorted.mkString(",")}"), basedOn)
          done = true
        } catch {
          case e if IndexCatalog.isCommitConflict(e) && attempts < 5 => ()
        }
      }
    }
  }

  /** The retention end of the index lifecycle: build → append →
    * COMPACT (partition-scoped rewrite commit) → VACUUM (retention GC)
    * → probe. The compaction runs through the SQL verb surface as
    * `OPTIMIZE … WHERE bucket IN (0..7)` — the PRODUCTION shape:
    * the append fragmented every bucket, the hot half gets rewritten
    * in place-by-replacement, the cold half's files carry forward in
    * the manifest BY PATH, and the rewrite reads/writes half the store
    * instead of all of it. After vacuum, superseded hot-bucket
    * generation files, pre-horizon manifests, and a planted STALE
    * torn-write orphan are all gone — the carried-forward cold-bucket
    * files stay, because the live manifest still references them —
    * while a FRESH uncommitted file (an in-flight append racing the
    * vacuum) outlives the default orphan grace; the probe is
    * row-identical to [[qEmbedAppend]]'s (the store's content is
    * invariant under compaction + vacuum). The superseded set is
    * COMPUTED from the manifests (`referencedFiles − live`), so the
    * reclaimed-count assertion is exact whatever the compaction's
    * scope. The filesystem facts are checked eagerly driver-side (a
    * few dozen paths — catalog metadata, not data motion) and pinned
    * as the `vacuum_ok` boolean the oracle asserts TRUE, the same
    * gating pattern as q_hll_rollup's `hll_ok`.
    */
  def qStoreVacuum(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.IndexCatalog
    val base = java.nio.file.Files.createTempDirectory("graft_vacuum").toString
    val ok = try {
      buildEmbedStoreCached(spark, dir, base)
      appendEmbedStore(spark,
        embeddings(spark, dir).filter(pmod(col("vec_id"), lit(4)) === 1), base)
      // the sign-hash domain is 0..15 ([[NPlanes]] = 4 planes); the
      // "hot" half compacts via the SQL maintenance verb
      spark.sql(
        s"OPTIMIZE '$base' WHERE bucket IN (0, 1, 2, 3, 4, 5, 6, 7)")
        .collect()
      val preVacuumLive = IndexCatalog.latestFiles(base)
      val superseded = IndexCatalog.referencedFiles(base, 1) -- preVacuumLive
      // a STALE torn write that never committed (aged past the orphan
      // grace) — vacuum must sweep it too ...
      val orphan = java.nio.file.Paths.get(preVacuumLive.head).getParent
        .resolve("part-orphan-torn.parquet")
      java.nio.file.Files.writeString(orphan, "torn")
      java.nio.file.Files.setLastModifiedTime(orphan,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 2 * IndexCatalog.DefaultOrphanGraceMs))
      // ... while a FRESH uncommitted file — an in-flight append racing
      // this vacuum — must survive the default grace
      val inflight = java.nio.file.Paths.get(preVacuumLive.head).getParent
        .resolve("part-inflight-append.parquet")
      java.nio.file.Files.writeString(inflight, "in-flight")
      // retention runs through the SQL verb surface (the production
      // schedule path — MaintenanceSql dispatches to IndexCatalog.vacuum,
      // so the surfaces cannot drift); the command reports the
      // reclaimed-file count, and the file-level facts are checked
      // directly below
      val reclaimed =
        spark.sql(s"VACUUM '$base' RETAIN 1").collect()(0).getLong(0)
      def gone(p: String) = !java.nio.file.Files.exists(java.nio.file.Paths.get(p))
      superseded.forall(gone) && gone(orphan.toString) &&
        !gone(inflight.toString) &&
        java.nio.file.Files.deleteIfExists(inflight) &&
        reclaimed == superseded.size + 1 &&
        IndexCatalog.currentVersion(base) == 3 &&
        IndexCatalog.latestFiles(base) == preVacuumLive &&
        preVacuumLive.forall(f => !gone(f)) &&
        // pre-horizon manifests are dropped: version 1 fails at resolution
        scala.util.Try(IndexCatalog.files(base, 1)).isFailure
    } catch {
      case e: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw e
    }
    graft.Lease.lease("q_store_vacuum", Seq(base))
    probeEmbedStore(spark, dir, base,
      pmod(col("vec_id"), lit(4)) === 3 && col("vec_id") < 4 * NQueries)
      .withColumn("vacuum_ok", lit(ok))
  }

  /** The catalog's DESCRIBE-HISTORY surface: run the sign-LSH store's
    * full lifecycle (build → tagged ingest append → compaction rewrite
    * → retention vacuum), then report one row per LIVE version — its
    * manifest tags and the store's ROW COUNT at that version, computed
    * by scanning exactly that manifest's file list (time travel as a
    * query). The whole maintenance half runs through the SQL verb
    * surface: plain `OPTIMIZE` is the compaction rewrite (v3), `VACUUM`
    * the retention step, and the version/tag rows the census joins
    * against come from `DESCRIBE HISTORY` itself — the operator's
    * workflow is SQL end-to-end, Scala touches only the per-version
    * time-travel scans. Deterministic and oracle-pinned:
    * vacuum(retain=2) expires v1 (the build), and v2 (the append) and
    * v3 (the compaction) both hold corpus ∪ batch, so both counts
    * equal the DuckDB census over the same id predicates. File-count
    * columns are deliberately absent — they reflect the writer's task
    * layout, not content.
    */
  def qStoreHistory(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.IndexCatalog
    val base = java.nio.file.Files.createTempDirectory("graft_storehist").toString
    val hist = try {
      buildEmbedStoreCached(spark, dir, base) // v1
      writeEmbedGen(spark,
        embeddings(spark, dir).filter(pmod(col("vec_id"), lit(4)) === 1),
        base, Seq("ingest-batch=0")) // v2
      spark.sql(s"OPTIMIZE '$base'").collect() // v3: compaction rewrite
      spark.sql(s"VACUUM '$base' RETAIN 2").collect() // v1 expires
      spark.sql(s"DESCRIBE HISTORY '$base'").collect() // (version, tags)
    } catch {
      case e: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw e
    }
    graft.Lease.lease("q_store_history", Seq(base))
    hist.toSeq.map { r =>
      val v = r.getLong(0)
      spark.read.parquet(IndexCatalog.files(base, v.toInt): _*)
        .agg(count(lit(1)).as("n_rows"))
        .select(lit(v).as("version"), lit(r.getString(1)).as("tags"),
          col("n_rows"))
    }.reduce(_.unionByName(_)).orderBy("version")
  }

  /** The INCREMENTAL-MANIFEST protocol as a gated query — the catalog
    * property that keeps a 100 TB store's metadata honest: every
    * append commit writes a DELTA manifest (O(batch) bytes, never the
    * live-file list), resolution replays from the nearest snapshot —
    * a periodic checkpoint every
    * [[graft.sources.IndexCatalogOps.CheckpointInterval]] commits, or
    * the one [[graft.sources.IndexCatalogOps.vacuum]] materializes at
    * its horizon so expiring the pre-horizon delta chain never
    * strands the surviving versions. Without this, a million-file
    * store's ten-thousandth commit writes (and every read parses) the
    * full listing — the exact failure mode incremental-log +
    * checkpoint table formats exist to avoid.
    *
    * Lifecycle: build (v1, evens) then EIGHT appends (the odd
    * `% 16` slices, v2..v9) — crossing the periodic-checkpoint
    * boundary at v8 — then vacuum(retain=3), whose horizon (v7) sits
    * mid-chain and forces the horizon snapshot. The output is the
    * content census at three resolution postures: v5 (pure delta
    * replay, read before it expires), v7 (resolved from the vacuum's
    * horizon checkpoint), v9 (resolved from the periodic v8
    * checkpoint + one delta). The oracle recomputes all three from
    * the fixture's id algebra; the protocol facts — delta commits,
    * checkpoint placement, byte-identical resolution across the
    * vacuum, fail-fast on expired versions — ride the `inc_ok`
    * boolean (CatalogFsSpec pins the O(batch)-bytes contract with an
    * instrumented filesystem).
    */
  def qStoreIncremental(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.IndexCatalog
    val base = java.nio.file.Files.createTempDirectory("graft_inc").toString
    val (n5, s5, ok) = try {
      buildEmbedStoreCached(spark, dir, base) // v1: evens
      val e = embeddings(spark, dir)
      // v2..v9: odd % 16 slices — a BACKFILL, so the eight disjoint
      // batches hash + stage in ONE pass and commit per slice
      // ([[writeEmbedGenSliced]]): eight protocol-identical versions
      // (one tag, one delta manifest each) at one Spark job's compute
      writeEmbedGenSliced(spark,
        e.filter(pmod(col("vec_id"), lit(2)) === 1),
        pmod(col("vec_id"), lit(16)), base, sl => Seq(s"slice=$sl"))
      // protocol facts before the vacuum: nine commits, the periodic
      // snapshot exactly at the interval boundary, v9 a delta commit
      // (its manifest records touched keys, not the live list)
      val preOk = IndexCatalog.currentVersion(base) == 9 &&
        IndexCatalog.hasCheckpoint(base, IndexCatalog.CheckpointInterval) &&
        !IndexCatalog.hasCheckpoint(base, 7) &&
        IndexCatalog.touchedKeys(base, 9).isDefined
      // v5's census, read NOW — the pure delta-replay posture; the
      // version expires at the vacuum below (fail-fast spec'd there)
      val r5 = readStoreFiles(spark, IndexCatalog.files(base, 5))
        .agg(count(lit(1)), sum(col("vec_id"))).collect()(0)
      val head = IndexCatalog.files(base, 9)
      IndexCatalog.vacuum(base, retain = 3) // horizon v7: mid-chain
      val postOk = IndexCatalog.liveVersions(base) == Seq(7, 8, 9) &&
        IndexCatalog.hasCheckpoint(base, 7) && // the horizon snapshot
        scala.util.Try(IndexCatalog.files(base, 6)).isFailure &&
        scala.util.Try(IndexCatalog.files(base, 5)).isFailure &&
        IndexCatalog.files(base, 9) == head // resolution invariant
      (r5.getLong(0), r5.getLong(1), preOk && postOk)
    } catch {
      case t: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw t
    }
    graft.Lease.lease("q_store_incremental", Seq(base))
    def census(v: Int): DataFrame =
      readStoreFiles(spark, IndexCatalog.files(base, v))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("vec_id")).cast("long").as("id_sum"))
        .select(lit(v.toLong).as("version"), col("n_rows"), col("id_sum"))
    spark.range(1)
      .select(lit(5L).as("version"), lit(n5).as("n_rows"), lit(s5).as("id_sum"))
      .unionByName(census(7)).unionByName(census(9))
      .withColumn("inc_ok", lit(ok))
      .orderBy("version")
  }

  // --- embedding-cosine near-duplicate pairs ----------------------------

  /** Block count for the balanced block-pair (triangle) self-join. At a
    * larger scale B grows ~sqrt(cluster cores) so each of the
    * B*(B+1)/2 buckets holds an (N/B)^2 comparison tile that fits one
    * task.
    */
  private val NDBlocks = 8

  /** All pairs with cosine >= 0.35, as a balanced block-pair
    * partitioned equi-join — the scalable EXACT shape for a
    * low-threshold all-pairs similarity join.
    *
    * Why not LSH blocking: at threshold 0.35 the angle is ~69.5°, so a
    * random hyperplane separates a qualifying pair with probability
    * ~0.39; any band scheme driving the miss rate to ~0 (required —
    * the oracle is exact, and this fixture's qualifying pairs start at
    * cos 0.3501 with thousands more just below threshold) generates
    * more candidates than the N^2/2 all-pairs total. Sign-LSH blocking
    * is a top-k/high-threshold tool (see [[qEmbedLsh]]); an exact
    * low-threshold join is inherently quadratic, and the scalable form
    * distributes that quadratic evenly:
    *
    * Each vector lands in block g; block-PAIR key (p,q), p <= q, gets
    * the tile {block p} x {block q}. A row in block g replicates to
    * keys (g, q>=g) on the left and (p<=g, g) on the right, so every
    * unordered pair meets in exactly one bucket (twice, both
    * orientations, when p = q — deduped by id order). The join is a
    * pure equi-join on (p,q): shuffle-partitioned, no broadcast of the
    * corpus, no BroadcastNestedLoopJoin/CartesianProduct (asserted by
    * PlanQualitySpec), parallelism B*(B+1)/2 with each task scanning
    * an (N/B)^2 tile.
    */
  def qEmbedNearDup(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
      .filter(pmod(col("vec_id"), lit(2)) === 0)
      .withColumn("g", expr(s"pmod(vec_id div 2, $NDBlocks)"))
    val l = e.select(col("vec_id").as("li"), col("embedding").as("a_emb"),
        col("nrm").as("a_nrm"), col("g").as("lg"))
      .withColumn("kq", explode(expr(s"sequence(lg, ${NDBlocks - 1})")))
    val r = e.select(col("vec_id").as("rj"), col("embedding").as("b_emb"),
        col("nrm").as("b_nrm"), col("g").as("rg"))
      .withColumn("kp", explode(expr("sequence(0, rg)")))
    l.join(r,
        col("lg") === col("kp") && col("kq") === col("rg") &&
          (col("lg") =!= col("kq") || col("li") < col("rj")))
      .withColumn("cos",
        dot(col("a_emb"), col("b_emb")) / (col("a_nrm") * col("b_nrm")))
      .filter(col("cos") >= 0.35)
      .select(least(col("li"), col("rj")).as("i"),
        greatest(col("li"), col("rj")).as("j"))
      .orderBy("i", "j")
  }

  // --- SemDeDup: cluster-bounded semantic deduplication -----------------

  /** Cosine threshold for the SemDeDup pass. Shares [[qEmbedNearDup]]'s
    * 0.35 regime; the fixture's within-cell cosines keep a float margin
    * around the boundary (audited in SemDedupSpec) so the `>=` compare
    * never straddles an ulp between engines.
    */
  private val SemThr = 0.35

  /** SemDeDup (Abbas et al., 2023): semantic deduplication with the
    * quadratic bounded by k-means cells — the documented SCALE PATH for
    * what [[qEmbedNearDup]] computes exactly. Pipeline: assign every
    * vector to its learned centroid (the [[kmeansCentroids]] /
    * [[assignToCentroids]] machinery [[qIvfKmeans]] already oracle-pins),
    * then compare pairs only WITHIN a cell — a cell-keyed equi-join, so
    * the comparison count is sum(cell^2), not N^2, and the join
    * shuffle-partitions on centroid_id with no corpus broadcast. A
    * vector is removed when an earlier (lower-id) vector in its cell is
    * within the threshold — an index-ordered greedy, the deterministic
    * stand-in for the paper's arbitrary which-one-to-keep choice — and
    * reports its best keeper (max cosine, ties to the lower id).
    *
    * At 100 TB the cell count grows with the corpus (cells of ~10k
    * vectors keep each tile task-sized, exactly [[NDBlocks]]'s role in
    * the exact join), so per-cell work stays constant while cells
    * parallelize; a skewed giant cell splits by sub-blocking the same
    * way. The fixture keeps [[NList]] cells so the DuckDB oracle can
    * replay the identical k-means.
    */
  def qSemDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings(spark, dir)
    // tiny NList-row table, materialized EAGERLY (localCheckpoint): the
    // Lloyd lineage is computed once instead of replanned per join
    // side, and — unlike the cache() this replaces — nothing stays
    // resident per gated call in a long-lived session (the
    // probeLshStore release pattern; its blocks free via the
    // ContextCleaner when the caller drops the frame)
    val cent = kmeansCentroids(e, KmIters).localCheckpoint()
    val a = assignToCentroids(e, cent)
    val keep = a.select(col("centroid_id"), col("vec_id").as("keeper_id"),
      col("embedding").as("k_emb"), col("nrm").as("k_nrm"))
    val cand = a.select(col("centroid_id"), col("vec_id").as("removed_id"),
      col("embedding").as("r_emb"), col("nrm").as("r_nrm"))
    val w = Window.partitionBy(col("removed_id"))
      .orderBy(col("cos").desc, col("keeper_id"))
    keep.join(cand,
        Seq("centroid_id"))
      .filter(col("keeper_id") < col("removed_id"))
      .withColumn("cos",
        dot(col("k_emb"), col("r_emb")) / (col("k_nrm") * col("r_nrm")))
      .filter(col("cos") >= SemThr)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("removed_id"), col("keeper_id"), col("centroid_id"))
      .orderBy("removed_id")
  }

  /** SEMANTIC train→eval contamination gate — the embedding-level
    * firewall the shingle-ratio (`q_contamination`) and verbatim-span
    * (`q_span_contamination`) gates cannot provide: a paraphrased or
    * translated eval item shares no n-grams with its source, but its
    * embedding still lies within cosine [[SemThr]] of the train doc it
    * leaks from. Composition of two existing halves: [[qSemDedup]]'s
    * cell-bounded cross-similarity and `q_train_split`'s content-hash
    * split coin ([[DedupQueries.splitFlagged]], applied to the raw
    * documents table exactly as the `q_train_split` oracle spells it).
    *
    * Pipeline: learn the SAME k-means cells over the whole corpus as
    * [[qSemDedup]] (cells bound the cross product; restricting pairs to
    * eval×train only SHRINKS each cell's tile), assign every vector,
    * attach the split flag by id (embeddings and documents share the id
    * space), and compare eval rows against train rows WITHIN a cell
    * only. An eval doc is flagged when any same-cell train doc is
    * within the threshold, reporting its closest source (max cosine,
    * ties to the lower train id) — the row a curation pipeline uses to
    * either drop the eval item or trace the leak.
    *
    * 100 TB shape: identical to [[qSemDedup]] — the only corpus-sized
    * shuffles are the assignment and the cell-keyed equi-join, the
    * comparison count is Σ(|cell_eval|·|cell_train|) ≤ Σ(cell²), and
    * the split-flag attach is an id equi-join, no text ever read at
    * compare time. Cell-bounding is the gate's documented recall
    * contract (a cross-cell leak needs the multiprobe posture —
    * ARCHITECTURE.md §3.1), the same trade [[qSemDedup]] ships.
    */
  def qSemContamination(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = embeddings(spark, dir)
    val flags = DedupQueries.splitFlagged(
        Engine.table(spark, dir, "documents").select(
          col("doc_id"), col("text")))
      .select(col("doc_id").as("vec_id"), col("is_train"))
    // eager centroid cut, not cache(): see [[qSemDedup]] — a cached
    // frame here leaked one resident entry per gated call
    val cent = kmeansCentroids(e, KmIters).localCheckpoint()
    val a = assignToCentroids(e, cent).join(flags, "vec_id")
    val train = a.filter(col("is_train"))
      .select(col("centroid_id"), col("vec_id").as("train_id"),
        col("embedding").as("t_emb"), col("nrm").as("t_nrm"))
    val ev = a.filter(!col("is_train"))
      .select(col("centroid_id"), col("vec_id").as("eval_id"),
        col("embedding").as("e_emb"), col("nrm").as("e_nrm"))
    val w = Window.partitionBy(col("eval_id"))
      .orderBy(col("cos").desc, col("train_id"))
    train.join(ev, Seq("centroid_id"))
      .withColumn("cos",
        dot(col("t_emb"), col("e_emb")) / (col("t_nrm") * col("e_nrm")))
      .filter(col("cos") >= SemThr)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("eval_id"), col("train_id"), col("centroid_id"))
      .orderBy("eval_id")
  }

  // --- registry ----------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_knn_brute" -> (qKnnBrute _),
    "q_knn_topk_agg" -> (qKnnTopkAgg _),
    "q_knn_quantized" -> (qKnnQuantized _),
    "q_mmr" -> (qMmr _),
    "q_ivf_knn" -> (qIvfKnn _),
    "q_ivf_multiprobe" -> (qIvfMultiprobe _),
    "q_ivf_kmeans" -> (qIvfKmeans _),
    "q_ivf_pq" -> (qIvfPq _),
    "q_pq_filtered" -> (qPqFiltered _),
    "q_ivf_persisted" -> (qIvfPersisted _),
    "q_ivf_filtered" -> (qIvfFiltered _),
    "q_ivf_append" -> (qIvfAppend _),
    "q_ivf_recluster" -> (qIvfRecluster _),
    "q_embed_lsh" -> (qEmbedLsh _),
    "q_embed_ingest" -> (qEmbedIngest _),
    "q_embed_append" -> (qEmbedAppend _),
    "q_store_vacuum" -> (qStoreVacuum _),
    "q_store_history" -> (qStoreHistory _),
    "q_store_incremental" -> (qStoreIncremental _),
    "q_store_asof" -> (qStoreAsof _),
    "q_store_restore" -> (qStoreRestore _),
    "q_store_changes" -> (qStoreChanges _),
    "q_store_delete" -> (qStoreDelete _),
    "q_store_merge" -> (qStoreMerge _),
    "q_store_update" -> (qStoreUpdate _),
    "q_store_cdc" -> (qStoreCdc _),
    "q_store_clone" -> (qStoreClone _),
    "q_store_skipping" -> (qStoreSkipping _),
    "q_store_lookup" -> (qStoreLookup _),
    "q_store_constraint" -> (qStoreConstraint _),
    "q_store_optimize" -> (qStoreOptimize _),
    "q_embed_neardup" -> (qEmbedNearDup _),
    "q_semdedup" -> (qSemDedup _),
    "q_sem_contamination" -> (qSemContamination _)
  )

  private val duckCos =
    "list_cosine_similarity(CAST(%s AS DOUBLE[]), CAST(%s AS DOUBLE[]))"

  /** The plane/bucket/rank ingest-lookup pipeline in SQL, parametrized
    * by which vec_ids form the probe batch and which the indexed corpus
    * (shared by q_embed_ingest / q_embed_append). Planes are always the
    * build-time ones (first [[NPlanes]] even ids) — append uses the
    * stored planes, never refits them.
    */
  private[operators] def duckEmbedIngestSql(batchPred: String, corpusPred: String): String =
      s"""WITH planes AS (SELECT vec_id AS plane_id, embedding AS p_emb FROM embeddings
         |                WHERE vec_id % 2 = 0 AND vec_id < ${2 * NPlanes}),
         |bucketed AS (
         |  SELECT e.vec_id, e.embedding,
         |         CAST(sum(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
         |                                               CAST(p.p_emb AS DOUBLE[])) >= 0
         |                  THEN power(2, p.plane_id // 2) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM embeddings e CROSS JOIN planes p
         |  GROUP BY e.vec_id, e.embedding),
         |q AS (SELECT vec_id AS query_id, embedding AS q_emb, bucket AS q_bucket
         |      FROM bucketed WHERE $batchPred),
         |c AS (SELECT vec_id, embedding, bucket FROM bucketed WHERE $corpusPred),
         |scored AS (
         |  SELECT query_id, c.vec_id AS neighbor_id,
         |         ${duckCos.format("q_emb", "c.embedding")} AS cos
         |  FROM q JOIN c ON q.q_bucket = c.bucket),
         |ranked AS (SELECT query_id, neighbor_id,
         |                  row_number() OVER (PARTITION BY query_id
         |                                     ORDER BY cos DESC, neighbor_id) AS rk
         |           FROM scored)
         |SELECT query_id, rk, neighbor_id FROM ranked
         |WHERE rk <= $K ORDER BY query_id, rk""".stripMargin

  /** One unrolled Lloyd step in DuckDB SQL: assign to nearest centroid
    * (explicit dot/(nrm*nrm) — bit-identical to the Spark formula, not
    * list_cosine_similarity), then the fixed-point coordinate mean.
    * `prev` names the incoming centroid CTE; emits CTE `c$i`.
    */
  private def duckKmIter(i: Int, prev: String): String =
    s"""cn$i AS (SELECT centroid_id, c, sqrt(list_inner_product(c, c)) AS cn FROM $prev),
       |a$i AS (SELECT vec_id, emb, centroid_id,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY
       |           list_inner_product(emb, c) / (nrm * cn) DESC, centroid_id) AS rk
       |       FROM tr CROSS JOIN cn$i),
       |m$i AS (SELECT centroid_id, emb FROM a$i WHERE rk = 1),
       |u$i AS (SELECT centroid_id, i AS p, CAST(floor(emb[i] * 1000000) AS BIGINT) AS fx
       |       FROM m$i, unnest(generate_series(1, len(emb))) AS t(i)),
       |s$i AS (SELECT centroid_id, p, CAST(sum(fx) AS DOUBLE) / (count(*) * 1000000.0) AS cx
       |       FROM u$i GROUP BY 1, 2),
       |c$i AS (SELECT centroid_id, list(cx ORDER BY p) AS c FROM s$i GROUP BY 1)""".stripMargin

  /** The learned-centroid IVF pipeline in SQL, parameterized by which
    * rows seed and train the k-means (`seedPred` / `trainPred` — the
    * build corpus), which rows are index MEMBERS at probe time
    * (`memberPred` — build corpus plus any appended generations), and
    * which form the query batch (`queryPred`). The whole-table
    * single-generation form ([[duckIvfKmeansSql]]) and the
    * append-maintained form (q_ivf_append) are two instantiations of
    * this one text, mirroring how the Spark side shares
    * [[buildIvfStore]]/[[writeIvfGen]] across both.
    */
  private def duckIvfSql(seedPred: String, trainPred: String,
      memberPred: String, queryPred: String,
      labelFiltered: Boolean = false): String = {
    // the per-query metadata filter (q_ivf_filtered): the label is a
    // function of vec_id, so the oracle joins it back from the raw
    // table — the Spark side reads it off the store's label= partition
    val labelJoin =
      if (labelFiltered)
        "\n       JOIN embeddings ql ON ql.vec_id = q.query_id" +
          "\n       JOIN embeddings nl ON nl.vec_id = a.vec_id AND nl.label = ql.label"
      else ""
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
       |en AS (SELECT vec_id, emb, sqrt(list_inner_product(emb, emb)) AS nrm FROM e),
       |tr AS (SELECT * FROM en WHERE $trainPred),
       |c0 AS (SELECT vec_id AS centroid_id, emb AS c FROM e WHERE $seedPred),
       |${(1 to KmIters).map(i => duckKmIter(i, s"c${i - 1}")).mkString(",\n")},
       |cnf AS (SELECT centroid_id, c, sqrt(list_inner_product(c, c)) AS cn FROM c$KmIters),
       |mem AS (SELECT * FROM en WHERE ($memberPred) OR ($queryPred)),
       |af AS (SELECT vec_id, emb, nrm, centroid_id,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY
       |           list_inner_product(emb, c) / (nrm * cn) DESC, centroid_id) AS rk
       |       FROM mem CROSS JOIN cnf),
       |asg AS (SELECT vec_id, emb, nrm, centroid_id FROM af WHERE rk = 1),
       |q AS (SELECT vec_id AS query_id, emb AS qe, nrm AS qn, centroid_id AS qc
       |      FROM asg WHERE $queryPred),
       |cps AS (SELECT vec_id, emb, nrm, centroid_id FROM asg WHERE $memberPred),
       |scored AS (
       |  SELECT query_id, a.vec_id AS neighbor_id,
       |         list_inner_product(qe, a.emb) / (qn * a.nrm) AS cos
       |  FROM q JOIN cps a ON q.qc = a.centroid_id AND q.query_id <> a.vec_id$labelJoin),
       |ranked AS (SELECT query_id, neighbor_id,
       |                  row_number() OVER (PARTITION BY query_id
       |                                     ORDER BY cos DESC, neighbor_id) AS rk
       |           FROM scored)
       |SELECT query_id, rk, neighbor_id FROM ranked
       |WHERE rk <= $K ORDER BY query_id, rk""".stripMargin
  }

  private lazy val duckIvfKmeansSql: String =
    duckIvfSql(s"vec_id < $NList", "TRUE", "TRUE", s"vec_id < $NQueries")

  private lazy val duckIvfFilteredSql: String =
    duckIvfSql(s"vec_id < $NList", "TRUE", "TRUE", s"vec_id < $NQueries",
      labelFiltered = true)

  /** The full IVF-PQ two-stage replica (assignment → residual
    * codebooks → codes → fixed-point ADC → bounded exact re-rank) —
    * shared by `q_ivf_pq` and, with the label equality joined into the
    * candidate CTE (pre-ADC, exactly where the Spark probe filters),
    * `q_pq_filtered`.
    */
  private def duckPqSql(labelFiltered: Boolean): String = {
    val labelJoin =
      if (labelFiltered)
        "\n           JOIN embeddings ql ON ql.vec_id = p.qid" +
          "\n           JOIN embeddings nl ON nl.vec_id = mbr.vec_id AND nl.label = ql.label"
      else ""
    s"""WITH cent AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS c
       |             FROM embeddings WHERE vec_id < $NList),
       |en AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
       |       sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
       |                               CAST(embedding AS DOUBLE[]))) AS nrm
       |       FROM embeddings),
       |a AS (SELECT vec_id, emb, nrm, cid,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY
       |        list_inner_product(emb, c) / (nrm * sqrt(list_inner_product(c, c))) DESC,
       |        cid) AS rk
       |      FROM en CROSS JOIN cent),
       |asg AS (SELECT vec_id, emb, nrm, cid FROM a WHERE rk = 1),
       |ms AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS m),
       |res AS (SELECT s.vec_id, s.nrm, s.cid, ms.m,
       |        list_transform(generate_series(1, $PqSub),
       |          i -> s.emb[ms.m * $PqSub + i] - c.c[ms.m * $PqSub + i]) AS sr
       |        FROM asg s JOIN cent c ON s.cid = c.cid CROSS JOIN ms),
       |cb0 AS (SELECT m, vec_id AS cw_id, sr AS cw FROM res WHERE vec_id < $PqKs),
       |a1 AS (SELECT r.vec_id, r.m, r.sr, cb.cw_id,
       |       row_number() OVER (PARTITION BY r.vec_id, r.m ORDER BY
       |         list_inner_product(cb.cw, cb.cw) - 2 * list_inner_product(r.sr, cb.cw) ASC,
       |         cb.cw_id) AS ark
       |       FROM res r JOIN cb0 cb ON r.m = cb.m),
       |m1 AS (SELECT vec_id, m, sr, cw_id FROM a1 WHERE ark = 1),
       |u1 AS (SELECT m, cw_id, i AS p, CAST(floor(sr[i] * 1000000) AS BIGINT) AS fx
       |       FROM m1, unnest(generate_series(1, $PqSub)) AS t(i)),
       |s1 AS (SELECT m, cw_id, p, CAST(sum(fx) AS DOUBLE) / (count(*) * 1000000.0) AS cx
       |       FROM u1 GROUP BY 1, 2, 3),
       |cb1 AS (SELECT m, cw_id, list(cx ORDER BY p) AS cw FROM s1 GROUP BY 1, 2),
       |a2 AS (SELECT r.vec_id, r.m, cb.cw_id,
       |       row_number() OVER (PARTITION BY r.vec_id, r.m ORDER BY
       |         list_inner_product(cb.cw, cb.cw) - 2 * list_inner_product(r.sr, cb.cw) ASC,
       |         cb.cw_id) AS ark
       |       FROM res r JOIN cb1 cb ON r.m = cb.m),
       |codes AS (SELECT vec_id, m, cw_id FROM a2 WHERE ark = 1),
       |probes AS (SELECT a.vec_id AS qid, a.emb AS qe, a.nrm AS qn, a.cid,
       |           CAST(floor(list_inner_product(a.emb, c.c) * 1000000) AS BIGINT) AS qc_fx
       |           FROM a JOIN cent c ON a.cid = c.cid
       |           WHERE a.vec_id < $NQueries AND a.rk <= $PqProbe),
       |lut AS (SELECT p.qid, cb.m, cb.cw_id,
       |        CAST(floor(list_inner_product(
       |          list_transform(generate_series(1, $PqSub), i -> p.qe[cb.m * $PqSub + i]),
       |          cb.cw) * 1000000) AS BIGINT) AS qdot_fx
       |        FROM (SELECT DISTINCT qid, qe FROM probes) p CROSS JOIN cb1 cb),
       |cand AS (SELECT p.qid, p.qn, p.qc_fx, mbr.vec_id AS nid, mbr.nrm AS n_nrm
       |         FROM probes p JOIN asg mbr
       |           ON p.cid = mbr.cid AND p.qid <> mbr.vec_id$labelJoin),
       |adc AS (SELECT c.qid, c.nid,
       |        CAST(c.qc_fx + sum(l.qdot_fx) AS DOUBLE) / (c.qn * c.n_nrm) AS ascore
       |        FROM cand c
       |        JOIN codes cd ON cd.vec_id = c.nid
       |        JOIN lut l ON l.qid = c.qid AND l.m = cd.m AND l.cw_id = cd.cw_id
       |        GROUP BY c.qid, c.nid, c.qc_fx, c.qn, c.n_nrm),
       |pool AS (SELECT qid, nid FROM (
       |           SELECT qid, nid, row_number() OVER (PARTITION BY qid
       |             ORDER BY ascore DESC, nid) AS ark FROM adc)
       |         WHERE ark <= $PqPool),
       |exact AS (SELECT p.qid, p.nid,
       |          row_number() OVER (PARTITION BY p.qid ORDER BY
       |            list_inner_product(q.emb, e.emb) / (q.nrm * e.nrm) DESC, p.nid) AS rk
       |          FROM pool p
       |          JOIN en q ON q.vec_id = p.qid
       |          JOIN en e ON e.vec_id = p.nid)
       |SELECT qid AS query_id, CAST(rk AS BIGINT) AS rk, nid AS neighbor_id
       |FROM exact WHERE rk <= $K ORDER BY query_id, rk""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q_knn_brute" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
         |           WHERE vec_id < $NQueries),
         |scored AS (
         |  SELECT query_id, e.vec_id AS neighbor_id, e.label,
         |         ${duckCos.format("q_emb", "e.embedding")} AS cos
         |  FROM q JOIN embeddings e ON q.query_id <> e.vec_id),
         |ranked AS (SELECT query_id, neighbor_id, label,
         |                  row_number() OVER (PARTITION BY query_id
         |                                     ORDER BY cos DESC, neighbor_id) AS rk
         |           FROM scored)
         |SELECT query_id, rk, neighbor_id, label FROM ranked
         |WHERE rk <= $K ORDER BY query_id, rk""".stripMargin,
    "q_knn_topk_agg" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
         |           WHERE vec_id < $NQueries),
         |scored AS (
         |  SELECT query_id, e.vec_id AS neighbor_id,
         |         ${duckCos.format("q_emb", "e.embedding")} AS cos
         |  FROM q JOIN embeddings e ON q.query_id <> e.vec_id),
         |ranked AS (SELECT query_id, neighbor_id,
         |                  row_number() OVER (PARTITION BY query_id
         |                                     ORDER BY cos DESC, neighbor_id) AS rk
         |           FROM scored)
         |SELECT query_id, rk, neighbor_id FROM ranked
         |WHERE rk <= $K ORDER BY query_id, rk""".stripMargin,
    // the identical two-stage quantize/approx-rank/exact-re-rank
    // pipeline in SQL; the approximate scores are integer-exact sums
    // in double arithmetic on both engines (codes ≤ 127²·dims ≪ 2⁵³),
    // so candidate sets — not just final ranks — coincide exactly
    // the greedy MMR unroll in SQL — rel/sim use the identical
    // dot/(nrm·nrm) formulation as the engine (the list_inner_product
    // pair q_knn_quantized pins hash-exact), so 7·rel − 3·maxsim is
    // bit-identical and the per-step argmax (ties on cand_id) selects
    // the same ids
    "q_mmr" ->
      s"""WITH en AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |m AS (SELECT vec_id, emb, sqrt(list_inner_product(emb, emb)) AS nrm FROM en),
         |q AS (SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm FROM m
         |      WHERE vec_id < $NMmrQ),
         |relv AS (SELECT query_id, c.vec_id AS cand_id, c.emb AS c_emb,
         |                c.nrm AS c_nrm,
         |                list_inner_product(q_emb, c.emb) / (q_nrm * c.nrm) AS rel
         |         FROM q JOIN m c ON query_id <> c.vec_id),
         |pool AS (SELECT * FROM (SELECT *, row_number() OVER (
         |             PARTITION BY query_id ORDER BY rel DESC, cand_id) AS prk
         |           FROM relv) t WHERE prk <= $MmrPool),
         |sims AS (SELECT a.query_id, a.cand_id AS ca, b.cand_id AS cb,
         |                list_inner_product(a.c_emb, b.c_emb)
         |                  / (a.c_nrm * b.c_nrm) AS sim
         |         FROM pool a JOIN pool b ON a.query_id = b.query_id
         |                               AND a.cand_id <> b.cand_id),
         |s1 AS (SELECT query_id, cand_id AS s1 FROM (
         |         SELECT query_id, cand_id, row_number() OVER (
         |             PARTITION BY query_id ORDER BY rel DESC, cand_id) r
         |         FROM pool) t WHERE r = 1),
         |c2 AS (SELECT p.query_id, p.cand_id, 7 * p.rel - 3 * s.sim AS mmr
         |       FROM pool p JOIN s1 USING (query_id)
         |       JOIN sims s ON s.query_id = p.query_id AND s.ca = p.cand_id
         |                  AND s.cb = s1.s1
         |       WHERE p.cand_id <> s1.s1),
         |s2 AS (SELECT query_id, cand_id AS s2 FROM (
         |         SELECT query_id, cand_id, row_number() OVER (
         |             PARTITION BY query_id ORDER BY mmr DESC, cand_id) r
         |         FROM c2) t WHERE r = 1),
         |c3 AS (SELECT p.query_id, p.cand_id, 7 * p.rel - 3 * max(s.sim) AS mmr
         |       FROM pool p JOIN s1 USING (query_id) JOIN s2 USING (query_id)
         |       JOIN sims s ON s.query_id = p.query_id AND s.ca = p.cand_id
         |                  AND (s.cb = s1.s1 OR s.cb = s2.s2)
         |       WHERE p.cand_id <> s1.s1 AND p.cand_id <> s2.s2
         |       GROUP BY p.query_id, p.cand_id, p.rel),
         |s3 AS (SELECT query_id, cand_id AS s3 FROM (
         |         SELECT query_id, cand_id, row_number() OVER (
         |             PARTITION BY query_id ORDER BY mmr DESC, cand_id) r
         |         FROM c3) t WHERE r = 1)
         |SELECT query_id, CAST(1 AS BIGINT) AS rk, s1 AS neighbor_id FROM s1
         |UNION ALL SELECT query_id, CAST(2 AS BIGINT), s2 FROM s2
         |UNION ALL SELECT query_id, CAST(3 AS BIGINT), s3 FROM s3
         |ORDER BY query_id, rk""".stripMargin,
    "q_knn_quantized" ->
      s"""WITH en AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |m AS (SELECT vec_id, emb,
         |             sqrt(list_inner_product(emb, emb)) AS nrm,
         |             127.0 / list_max(list_transform(emb, x -> abs(x))) AS s
         |      FROM en),
         |qz AS (SELECT vec_id, emb, nrm, s,
         |              list_transform(emb, x -> floor(x * s)) AS qv FROM m),
         |q AS (SELECT vec_id AS query_id, emb AS q_emb, nrm AS q_nrm,
         |             s AS q_s, qv AS q_qv
         |      FROM qz WHERE vec_id < $NQueries),
         |approx AS (
         |  SELECT query_id, c.vec_id AS neighbor_id, q.q_emb, q.q_nrm,
         |         c.emb AS n_emb, c.nrm AS n_nrm,
         |         list_inner_product(q.q_qv, c.qv)
         |           / (q.q_s * c.s * q.q_nrm * c.nrm) AS acos
         |  FROM q JOIN qz c ON q.query_id <> c.vec_id),
         |cand AS (SELECT *, row_number() OVER (PARTITION BY query_id
         |                     ORDER BY acos DESC, neighbor_id) AS ark
         |         FROM approx),
         |exact AS (SELECT query_id, neighbor_id,
         |                 list_inner_product(q_emb, n_emb) / (q_nrm * n_nrm) AS cos
         |          FROM cand WHERE ark <= $SqC),
         |ranked AS (SELECT query_id, neighbor_id,
         |                  row_number() OVER (PARTITION BY query_id
         |                                     ORDER BY cos DESC, neighbor_id) AS rk
         |           FROM exact)
         |SELECT query_id, rk, neighbor_id FROM ranked
         |WHERE rk <= $K ORDER BY query_id, rk""".stripMargin,
    "q_ivf_knn" ->
      s"""WITH cent AS (SELECT vec_id AS centroid_id, embedding AS c_emb FROM embeddings
         |              WHERE vec_id < $NList),
         |scored_c AS (
         |  SELECT e.vec_id, e.embedding, e.label, c.centroid_id,
         |         row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${duckCos.format("e.embedding", "c.c_emb")} DESC,
         |                      c.centroid_id) AS c_rk
         |  FROM embeddings e CROSS JOIN cent c),
         |assigned AS (SELECT vec_id, embedding, label, centroid_id
         |             FROM scored_c WHERE c_rk = 1),
         |q AS (SELECT vec_id AS query_id, embedding AS q_emb, centroid_id AS q_cent
         |      FROM assigned WHERE vec_id < $NQueries),
         |scored AS (
         |  SELECT query_id, a.vec_id AS neighbor_id,
         |         ${duckCos.format("q_emb", "a.embedding")} AS cos
         |  FROM q JOIN assigned a ON q.q_cent = a.centroid_id
         |                        AND q.query_id <> a.vec_id),
         |ranked AS (SELECT query_id, neighbor_id,
         |                  row_number() OVER (PARTITION BY query_id
         |                                     ORDER BY cos DESC, neighbor_id) AS rk
         |           FROM scored)
         |SELECT query_id, rk, neighbor_id FROM ranked
         |WHERE rk <= $K ORDER BY query_id, rk""".stripMargin,
    "q_ivf_multiprobe" ->
      s"""WITH cent AS (SELECT vec_id AS centroid_id, embedding AS c_emb FROM embeddings
         |              WHERE vec_id < $NList),
         |scored_c AS (
         |  SELECT e.vec_id, e.embedding, c.centroid_id,
         |         row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${duckCos.format("e.embedding", "c.c_emb")} DESC,
         |                      c.centroid_id) AS c_rk
         |  FROM embeddings e CROSS JOIN cent c),
         |assigned AS (SELECT vec_id, embedding, centroid_id
         |             FROM scored_c WHERE c_rk = 1),
         |probes AS (SELECT vec_id AS query_id, embedding AS q_emb,
         |                  centroid_id AS q_cent
         |           FROM scored_c WHERE vec_id < $NQueries AND c_rk <= $NProbe),
         |scored AS (
         |  SELECT query_id, a.vec_id AS neighbor_id,
         |         ${duckCos.format("q_emb", "a.embedding")} AS cos
         |  FROM probes q JOIN assigned a ON q.q_cent = a.centroid_id
         |                             AND q.query_id <> a.vec_id),
         |ranked AS (SELECT query_id, neighbor_id,
         |                  row_number() OVER (PARTITION BY query_id
         |                                     ORDER BY cos DESC, neighbor_id) AS rk
         |           FROM scored)
         |SELECT query_id, rk, neighbor_id FROM ranked
         |WHERE rk <= $K ORDER BY query_id, rk""".stripMargin,
    "q_ivf_kmeans" -> duckIvfKmeansSql,
    // the full IVF-PQ pipeline in SQL: data-row cells, residual
    // slices per subspace, codebooks = one fixed-point Lloyd step
    // from data-row seeds, codes by nearest codeword, ADC first pass
    // as an exact integer LUT sum (order-free on both engines),
    // bounded exact re-rank — candidate sets, not just final ranks,
    // coincide exactly
    "q_ivf_pq" -> duckPqSql(labelFiltered = false),
    // the same two-stage PQ replica with the label equality joined
    // into the candidate CTE — candidates thin BEFORE the ADC stage,
    // exactly where the Spark probe applies the filter
    "q_pq_filtered" -> duckPqSql(labelFiltered = true),
    // the stored-index probe is row-identical to the inline pipeline
    // (same centroids, same assignment, same rank) — one oracle text,
    // two execution postures (recompute-inline vs write-once/probe-many)
    "q_ivf_persisted" -> duckIvfKmeansSql,
    // recluster over evens ∪ odds = the whole table, retrained with
    // the standard seed/iteration family — a from-scratch build, so
    // the probe shares q_ivf_kmeans's oracle verbatim
    "q_ivf_recluster" -> duckIvfKmeansSql,
    // the same replica with the per-query label equality joined into
    // the candidate set — the Spark side's (cell, label) join key
    "q_ivf_filtered" -> duckIvfFilteredSql,
    // append form: centroids seeded+trained on the even-id build corpus
    // only (frozen at build), members = build corpus ∪ appended batch A,
    // queries = batch B assigned to the same frozen centroids
    "q_ivf_append" -> duckIvfSql(
      s"vec_id % 2 = 0 AND vec_id < ${2 * NList}",
      "vec_id % 2 = 0",
      "vec_id % 2 = 0 OR vec_id % 4 = 1",
      s"vec_id % 4 = 3 AND vec_id < ${4 * NQueries}"),
    "q_embed_lsh" ->
      s"""WITH planes AS (SELECT vec_id AS plane_id, embedding AS p_emb FROM embeddings
         |                WHERE vec_id < $NPlanes),
         |bucketed AS (
         |  SELECT e.vec_id, e.embedding,
         |         CAST(sum(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
         |                                               CAST(p.p_emb AS DOUBLE[])) >= 0
         |                  THEN power(2, p.plane_id) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM embeddings e CROSS JOIN planes p
         |  GROUP BY e.vec_id, e.embedding),
         |q AS (SELECT vec_id AS query_id, embedding AS q_emb, bucket AS q_bucket
         |      FROM bucketed WHERE vec_id < $NQueries),
         |scored AS (
         |  SELECT query_id, b.vec_id AS neighbor_id,
         |         ${duckCos.format("q_emb", "b.embedding")} AS cos
         |  FROM q JOIN bucketed b ON q.q_bucket = b.bucket
         |                        AND q.query_id <> b.vec_id),
         |ranked AS (SELECT query_id, neighbor_id,
         |                  row_number() OVER (PARTITION BY query_id
         |                                     ORDER BY cos DESC, neighbor_id) AS rk
         |           FROM scored)
         |SELECT query_id, rk, neighbor_id FROM ranked
         |WHERE rk <= $K ORDER BY query_id, rk""".stripMargin,
    // same plane/bucket/rank pipeline, planes = the corpus's first
    // NPlanes even vectors (stored with the index), candidates
    // restricted to (odd batch) x (even corpus)
    "q_embed_ingest" ->
      duckEmbedIngestSql(
        batchPred = s"vec_id % 2 = 1 AND vec_id < ${2 * NQueries}",
        corpusPred = "vec_id % 2 = 0"),
    // the lifecycle variant: batch A (vec_id % 4 = 1) appended into
    // the store, batch B ranked against corpus ∪ A
    "q_embed_append" ->
      duckEmbedIngestSql(
        batchPred = s"vec_id % 4 = 3 AND vec_id < ${4 * NQueries}",
        corpusPred = "(vec_id % 2 = 0 OR vec_id % 4 = 1)"),
    // compaction + vacuum never change content: the probe algebra is
    // q_embed_append's verbatim, and the filesystem contract (expired
    // generations + torn writes reclaimed, live files intact) is the
    // Spark-side vacuum_ok boolean the oracle pins TRUE
    "q_store_vacuum" ->
      s"""SELECT t.*, TRUE AS vacuum_ok FROM (${duckEmbedIngestSql(
        batchPred = s"vec_id % 4 = 3 AND vec_id < ${4 * NQueries}",
        corpusPred = "(vec_id % 2 = 0 OR vec_id % 4 = 1)")}) t""",
    // versioned probe: one batch answered at v1 (build-time corpus
    // only — the pre-append probe verbatim) and at v2 (corpus ∪ A);
    // the SQL is the ingest pipeline at each version's corpus scope
    "q_store_asof" -> {
      val b = s"vec_id % 4 = 3 AND vec_id < ${4 * NQueries}"
      s"""SELECT CAST(1 AS BIGINT) AS version, t1.*
         |FROM (${duckEmbedIngestSql(b, "vec_id % 2 = 0")}) t1
         |UNION ALL
         |SELECT CAST(2 AS BIGINT) AS version, t2.*
         |FROM (${duckEmbedIngestSql(b,
               "(vec_id % 2 = 0 OR vec_id % 4 = 1)")}) t2
         |ORDER BY version, query_id, rk""".stripMargin
    },
    // post-restore probe: the head holds corpus ∪ the re-appended
    // vec_id % 8 == 5 slice — the rolled-back batch's other half
    // (vec_id % 8 == 1) must NOT rank, which is what distinguishes a
    // real rollback from a no-op (those files still sit in the bucket
    // dirs); the catalog contract rides the restore_ok boolean
    "q_store_restore" ->
      s"""SELECT t.*, TRUE AS restore_ok FROM (${duckEmbedIngestSql(
        batchPred = s"vec_id % 4 = 3 AND vec_id < ${4 * NQueries}",
        corpusPred = "(vec_id % 2 = 0 OR vec_id % 8 = 5)")}) t""",
    // post-delete probe: rankings equal a store that never held the
    // deleted vectors — the ingest pipeline over the surviving
    // vec_id % 4 = 2 corpus (planes unaffected: stored outside the
    // manifest-governed roots)
    "q_store_delete" ->
      duckEmbedIngestSql(
        batchPred = s"vec_id % 2 = 1 AND vec_id < ${2 * NQueries}",
        corpusPred = "vec_id % 4 = 2"),
    // the v1→v2 delta census: the appended generation holds exactly
    // the batch-A rows (disjoint from the corpus by id parity), so the
    // oracle recomputes their (count, id-sum, distinct-bucket) census
    // from the raw fixture under the same sign/bucket pipeline
    "q_store_changes" ->
      s"""WITH planes AS (SELECT vec_id AS plane_id, embedding AS p_emb FROM embeddings
         |                WHERE vec_id % 2 = 0 AND vec_id < ${2 * NPlanes}),
         |bucketed AS (
         |  SELECT e.vec_id,
         |         CAST(sum(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
         |                                               CAST(p.p_emb AS DOUBLE[])) >= 0
         |                  THEN power(2, p.plane_id // 2) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM embeddings e CROSS JOIN planes p
         |  WHERE e.vec_id % 4 = 1
         |  GROUP BY e.vec_id)
         |SELECT count(*) AS n_rows, CAST(sum(vec_id) AS BIGINT) AS id_sum,
         |       CAST(count(DISTINCT bucket) AS BIGINT) AS n_buckets
         |FROM bucketed""".stripMargin,
    // the DML lifecycle's row-level change feed, recomputed from id
    // algebra alone: the MERGE commit (v2) yields the insert batch and
    // the update pair over the % 8 == 0 targets (each update once as
    // preimage, once as postimage — same ids), the DELETE commit (v3)
    // yields the % 8 == 4 rows; rewritten survivors sharing files with
    // the changes contribute nothing, and change row COUNTS are what
    // pins that (a survivor leak would inflate them)
    "q_store_cdc" ->
      """WITH upd AS (SELECT t.vec_id FROM embeddings t
        |            JOIN embeddings s ON s.vec_id = t.vec_id + 1
        |            WHERE t.vec_id % 8 = 0),
        |ins AS (SELECT vec_id FROM embeddings WHERE vec_id % 4 = 1),
        |del AS (SELECT vec_id FROM embeddings WHERE vec_id % 8 = 4)
        |SELECT CAST(2 AS BIGINT) AS version, 'insert' AS change_type,
        |       count(*) AS n_rows, CAST(sum(vec_id) AS BIGINT) AS id_sum FROM ins
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'update_postimage', count(*),
        |       CAST(sum(vec_id) AS BIGINT) FROM upd
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'update_preimage', count(*),
        |       CAST(sum(vec_id) AS BIGINT) FROM upd
        |UNION ALL
        |SELECT CAST(3 AS BIGINT), 'delete', count(*),
        |       CAST(sum(vec_id) AS BIGINT) FROM del
        |ORDER BY version, change_type""".stripMargin,
    // probe of the appended CLONE: rankings equal q_embed_append's
    // (corpus ∪ batch A — one oracle text, two store layouts: the
    // clone answers from borrowed source files plus its own appended
    // generation); source-untouched is the Spark-side clone_ok
    // boolean pinned TRUE (byte-identity spec-pinned)
    "q_store_clone" ->
      s"""SELECT t.*, TRUE AS clone_ok FROM (${duckEmbedIngestSql(
        batchPred = s"vec_id % 4 = 3 AND vec_id < ${4 * NQueries}",
        corpusPred = "(vec_id % 2 = 0 OR vec_id % 4 = 1)")}) t""",
    // post-merge probe: rankings equal an ingest over the MERGED
    // corpus — survivors (evens except the % 8 == 0 targets) with
    // their original vectors, each update target holding its
    // successor's embedding, the % 4 == 1 batch inserted — while the
    // hash planes stay the BUILD-time ones (vec_id 0 is both a plane
    // seed and an update target; the family is frozen, so the planes
    // CTE reads the RAW fixture)
    "q_store_merge" -> {
      val batchPred = s"vec_id % 4 = 3 AND vec_id < ${4 * NQueries}"
      s"""WITH src AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  WHERE (vec_id % 2 = 0 AND vec_id % 8 <> 0) OR vec_id % 4 = 1
         |  UNION ALL
         |  SELECT t.vec_id, s.embedding
         |  FROM embeddings t JOIN embeddings s ON s.vec_id = t.vec_id + 1
         |  WHERE t.vec_id % 8 = 0),
         |planes AS (SELECT vec_id AS plane_id, embedding AS p_emb FROM embeddings
         |           WHERE vec_id % 2 = 0 AND vec_id < ${2 * NPlanes}),
         |c AS (
         |  SELECT e.vec_id, e.embedding,
         |         CAST(sum(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
         |                                               CAST(p.p_emb AS DOUBLE[])) >= 0
         |                  THEN power(2, p.plane_id // 2) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM src e CROSS JOIN planes p
         |  GROUP BY e.vec_id, e.embedding),
         |q AS (
         |  SELECT e.vec_id AS query_id, e.embedding AS q_emb,
         |         CAST(sum(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
         |                                               CAST(p.p_emb AS DOUBLE[])) >= 0
         |                  THEN power(2, p.plane_id // 2) ELSE 0 END) AS BIGINT) AS q_bucket
         |  FROM embeddings e CROSS JOIN planes p
         |  WHERE $batchPred
         |  GROUP BY e.vec_id, e.embedding),
         |scored AS (
         |  SELECT query_id, c.vec_id AS neighbor_id,
         |         ${duckCos.format("q_emb", "c.embedding")} AS cos
         |  FROM q JOIN c ON q.q_bucket = c.bucket),
         |ranked AS (SELECT query_id, neighbor_id,
         |                  row_number() OVER (PARTITION BY query_id
         |                                     ORDER BY cos DESC, neighbor_id) AS rk
         |           FROM scored)
         |SELECT query_id, rk, neighbor_id FROM ranked
         |WHERE rk <= $K ORDER BY query_id, rk""".stripMargin
    },
    // post-update probe: rankings equal an ingest over a corpus where
    // the in-range evens were ALWAYS negated (list_transform's -x is a
    // float sign-bit flip — FP-exact in both engines); planes read the
    // RAW fixture because the family is frozen and the plane ids lie
    // outside the updated range anyway
    "q_store_update" -> {
      val batchPred = s"vec_id % 2 = 1 AND vec_id < ${2 * NQueries}"
      s"""WITH src AS (
         |  SELECT vec_id,
         |         CASE WHEN vec_id BETWEEN $UpdLo AND $UpdHi
         |              THEN list_transform(embedding, x -> -x)
         |              ELSE embedding END AS embedding
         |  FROM embeddings WHERE vec_id % 2 = 0),
         |planes AS (SELECT vec_id AS plane_id, embedding AS p_emb FROM embeddings
         |           WHERE vec_id % 2 = 0 AND vec_id < ${2 * NPlanes}),
         |c AS (
         |  SELECT e.vec_id, e.embedding,
         |         CAST(sum(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
         |                                               CAST(p.p_emb AS DOUBLE[])) >= 0
         |                  THEN power(2, p.plane_id // 2) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM src e CROSS JOIN planes p
         |  GROUP BY e.vec_id, e.embedding),
         |q AS (
         |  SELECT e.vec_id AS query_id, e.embedding AS q_emb,
         |         CAST(sum(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
         |                                               CAST(p.p_emb AS DOUBLE[])) >= 0
         |                  THEN power(2, p.plane_id // 2) ELSE 0 END) AS BIGINT) AS q_bucket
         |  FROM embeddings e CROSS JOIN planes p
         |  WHERE $batchPred
         |  GROUP BY e.vec_id, e.embedding),
         |scored AS (
         |  SELECT query_id, c.vec_id AS neighbor_id,
         |         ${duckCos.format("q_emb", "c.embedding")} AS cos
         |  FROM q JOIN c ON q.q_bucket = c.bucket),
         |ranked AS (SELECT query_id, neighbor_id,
         |                  row_number() OVER (PARTITION BY query_id
         |                                     ORDER BY cos DESC, neighbor_id) AS rk
         |           FROM scored)
         |SELECT query_id, rk, neighbor_id FROM ranked
         |WHERE rk <= $K ORDER BY query_id, rk""".stripMargin
    },
    // the stats-pruned census must be EXACT (skipping removes provably
    // irrelevant files, never rows) — the oracle recomputes it from the
    // raw fixture; the file-set contract (only generation-2 files kept,
    // strictly fewer than the store holds) is the Spark-side skip_ok
    // boolean pinned TRUE
    "q_store_skipping" ->
      s"""SELECT count(*) AS n_rows, CAST(sum(vec_id) AS BIGINT) AS id_sum,
         |       TRUE AS skip_ok
         |FROM embeddings
         |WHERE vec_id % 2 = 0 AND vec_id BETWEEN $SkipLo AND $SkipHi""".stripMargin,
    // the constraint gate never changes committed content — the
    // poisoned batch commits nothing, the clean batch commits fully,
    // so the probe algebra is q_embed_append's verbatim; the
    // enforcement contract rides the constraint_ok boolean
    "q_store_constraint" ->
      s"""SELECT t.*, TRUE AS constraint_ok FROM (${duckEmbedIngestSql(
        batchPred = s"vec_id % 4 = 3 AND vec_id < ${4 * NQueries}",
        corpusPred = "(vec_id % 2 = 0 OR vec_id % 4 = 1)")}) t""",
    // the sketch-pruned lookup must be EXACT (no false negatives by
    // the bloom contract; the never-ingested key 7 returns no row) —
    // the oracle recomputes each stored id's bucket from the raw
    // fixture through the sign/plane pipeline; the strictly-fewer-
    // files contract is the Spark-side lookup_ok boolean pinned TRUE
    "q_store_lookup" ->
      s"""WITH planes AS (SELECT vec_id AS plane_id, embedding AS p_emb FROM embeddings
         |                WHERE vec_id % 2 = 0 AND vec_id < ${2 * NPlanes}),
         |bucketed AS (
         |  SELECT e.vec_id,
         |         CAST(sum(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
         |                                               CAST(p.p_emb AS DOUBLE[])) >= 0
         |                  THEN power(2, p.plane_id // 2) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM embeddings e CROSS JOIN planes p
         |  WHERE e.vec_id % 2 = 0 OR e.vec_id % 4 = 1
         |  GROUP BY e.vec_id)
         |SELECT vec_id, bucket, TRUE AS lookup_ok FROM bucketed
         |WHERE vec_id IN (${LookupIds.mkString(", ")})
         |ORDER BY vec_id""".stripMargin,
    // sorted compaction is layout-only: the pruned census equals the
    // raw fixture's under the same predicate; the strict skipping
    // improvement over the pre-sort layout is the Spark-side
    // optimize_ok boolean pinned TRUE
    "q_store_optimize" ->
      s"""SELECT count(*) AS n_rows, CAST(sum(vec_id) AS BIGINT) AS id_sum,
         |       TRUE AS optimize_ok
         |FROM embeddings
         |WHERE vec_id % 2 = 0 AND vec_id BETWEEN $SkipLo AND $SkipHi""".stripMargin,
    "q_embed_neardup" ->
      s"""SELECT a.vec_id AS i, b.vec_id AS j
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE a.vec_id % 2 = 0 AND b.vec_id % 2 = 0
         |  AND ${duckCos.format("a.embedding", "b.embedding")} >= 0.35
         |ORDER BY i, j""".stripMargin,
    // the same k-means CTE chain q_ivf_kmeans replays, then in-cell
    // pairs only; cosines in the explicit inner_product/sqrt form so
    // both the threshold compare and the keeper ranking see the same
    // doubles Spark's vec_dot produces
    "q_semdedup" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |en AS (SELECT vec_id, emb, sqrt(list_inner_product(emb, emb)) AS nrm FROM e),
         |tr AS (SELECT * FROM en),
         |c0 AS (SELECT vec_id AS centroid_id, emb AS c FROM e WHERE vec_id < $NList),
         |${(1 to KmIters).map(i => duckKmIter(i, s"c${i - 1}")).mkString(",\n")},
         |cnf AS (SELECT centroid_id, c, sqrt(list_inner_product(c, c)) AS cn FROM c$KmIters),
         |af AS (SELECT vec_id, emb, nrm, centroid_id,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY
         |           list_inner_product(emb, c) / (nrm * cn) DESC, centroid_id) AS rk
         |       FROM en CROSS JOIN cnf),
         |asg AS (SELECT vec_id, emb, nrm, centroid_id FROM af WHERE rk = 1),
         |pairs AS (
         |  SELECT x.vec_id AS keeper_id, y.vec_id AS removed_id,
         |         y.centroid_id AS centroid_id,
         |         list_inner_product(x.emb, y.emb) / (x.nrm * y.nrm) AS cos
         |  FROM asg x JOIN asg y
         |    ON x.centroid_id = y.centroid_id AND x.vec_id < y.vec_id),
         |ranked AS (SELECT removed_id, keeper_id, centroid_id,
         |                  row_number() OVER (PARTITION BY removed_id
         |                                     ORDER BY cos DESC, keeper_id) AS rk
         |           FROM pairs WHERE cos >= $SemThr)
         |SELECT removed_id, keeper_id, centroid_id FROM ranked WHERE rk = 1
         |ORDER BY removed_id""".stripMargin,
    // the q_semdedup replica CTE with the q_train_split content-hash
    // coin restricting pairs to eval×train: x = train side (its dot
    // orientation and the keeper-rank tiebreak mirror the Spark plan)
    "q_sem_contamination" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |en AS (SELECT vec_id, emb, sqrt(list_inner_product(emb, emb)) AS nrm FROM e),
         |tr AS (SELECT * FROM en),
         |c0 AS (SELECT vec_id AS centroid_id, emb AS c FROM e WHERE vec_id < $NList),
         |${(1 to KmIters).map(i => duckKmIter(i, s"c${i - 1}")).mkString(",\n")},
         |cnf AS (SELECT centroid_id, c, sqrt(list_inner_product(c, c)) AS cn FROM c$KmIters),
         |af AS (SELECT vec_id, emb, nrm, centroid_id,
         |         row_number() OVER (PARTITION BY vec_id ORDER BY
         |           list_inner_product(emb, c) / (nrm * cn) DESC, centroid_id) AS rk
         |       FROM en CROSS JOIN cnf),
         |asg AS (SELECT vec_id, emb, nrm, centroid_id FROM af WHERE rk = 1),
         |flags AS (SELECT doc_id AS vec_id,
         |                 substr(md5('split1|' || text), 1, 1) < 'd' AS is_train
         |          FROM documents),
         |pairs AS (
         |  SELECT y.vec_id AS eval_id, x.vec_id AS train_id,
         |         y.centroid_id AS centroid_id,
         |         list_inner_product(x.emb, y.emb) / (x.nrm * y.nrm) AS cos
         |  FROM asg x JOIN flags fx ON x.vec_id = fx.vec_id AND fx.is_train
         |       JOIN asg y ON x.centroid_id = y.centroid_id
         |       JOIN flags fy ON y.vec_id = fy.vec_id AND NOT fy.is_train),
         |ranked AS (SELECT eval_id, train_id, centroid_id,
         |                  row_number() OVER (PARTITION BY eval_id
         |                                     ORDER BY cos DESC, train_id) AS rk
         |           FROM pairs WHERE cos >= $SemThr)
         |SELECT eval_id, train_id, centroid_id FROM ranked WHERE rk = 1
         |ORDER BY eval_id""".stripMargin,
    // the catalog history after build → append → compact →
    // vacuum(retain=2): v1 expired, v2/v3 both hold corpus ∪ batch —
    // the row counts are the content census, the tags are the
    // lifecycle's commit metadata
    // three resolution postures of the incremental-manifest chain —
    // v5 = build ∪ the first four odd slices (delta replay), v7 = +
    // slices 9,11 (the vacuum's horizon checkpoint), v9 = every slice
    // appended, i.e. the whole fixture (periodic checkpoint + one
    // delta); the protocol facts ride inc_ok
    "q_store_incremental" ->
      """SELECT CAST(5 AS BIGINT) AS version, count(*) AS n_rows,
        |       CAST(sum(vec_id) AS BIGINT) AS id_sum, TRUE AS inc_ok
        |FROM embeddings WHERE vec_id % 2 = 0 OR vec_id % 16 IN (1, 3, 5, 7)
        |UNION ALL
        |SELECT CAST(7 AS BIGINT), count(*), CAST(sum(vec_id) AS BIGINT), TRUE
        |FROM embeddings
        |WHERE vec_id % 2 = 0 OR vec_id % 16 IN (1, 3, 5, 7, 9, 11)
        |UNION ALL
        |SELECT CAST(9 AS BIGINT), count(*), CAST(sum(vec_id) AS BIGINT), TRUE
        |FROM embeddings
        |ORDER BY version""".stripMargin,
    "q_store_history" ->
      """WITH n AS (
        |  SELECT (SELECT count(*) FROM embeddings WHERE vec_id % 2 = 0)
        |       + (SELECT count(*) FROM embeddings WHERE vec_id % 4 = 1) AS n_rows)
        |SELECT CAST(2 AS BIGINT) AS version, 'ingest-batch=0' AS tags, n_rows FROM n
        |UNION ALL
        |SELECT CAST(3 AS BIGINT) AS version, 'compaction' AS tags, n_rows FROM n
        |ORDER BY version""".stripMargin
  )
}
