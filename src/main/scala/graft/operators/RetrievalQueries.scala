package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine

/** Ranked-retrieval operators — the query side of a training-data
  * pipeline (contamination probes, quality-by-relevance filtering,
  * RAG-corpus serving all rank documents against queries):
  *
  * - qBm25: BM25 term-at-a-time ranked retrieval over the inverted
  *   posting lists the token explode induces.
  * - qHybridRrf: hybrid lexical+vector retrieval — BM25 and cosine-kNN
  *   rankings fused by reciprocal-rank fusion, the standard hybrid
  *   search combiner (Cormack et al., SIGIR'09: 1/(k+rank) with k=60).
  *
  * Both keep every score in scaled BIGINT arithmetic so results are
  * bit-identical across engines (the repo's oracle discipline): BM25's
  * `ln`-based idf is replaced by its rational pre-log odds
  * `(N - df + 0.5) / (df + 0.5)` — the log only dampens, and dampening
  * constants are a per-engine IEEE hazard — and the k1/b saturation
  * term is cleared to integers (k1 = 1.2, b = 0.75 exactly, scaled
  * ×10). RRF is exactly rational already (`1e6 div (60 + rank)`).
  *
  * Scale shape (the part that must survive 100 TB): the token stream
  * is filtered to the query vocabulary BEFORE its only shuffle — what
  * reaches the exchange is the posting lists of the query terms, never
  * the corpus token stream; document frequency and the query-term map
  * are vocabulary-sized broadcasts; final top-k runs through the
  * bounded `topk_agg` (map-side cut, ≤ k rows per query per task on
  * the exchange — no corpus-sized ranking window anywhere).
  */
object RetrievalQueries {

  /** Per-query search terms, fixed literals over the fixture's
    * vocabulary — query 1 pairs two common terms, query 2 pairs a
    * common term with the one rare term (`dup`, df ≈ 5% of docs) so
    * the idf axis visibly reorders, query 3 is a three-term query.
    */
  private[operators] val Bm25Terms: Seq[(Long, String)] = Seq(
    1L -> "spark", 1L -> "join",
    2L -> "vector", 2L -> "dup",
    3L -> "hash", 3L -> "merge", 3L -> "sort")

  /** Hybrid queries: vector = embeddings row `vec_id == query_id`
    * (the corpus-as-queries convention every kNN query here uses),
    * lexical = two fixed terms per query. doc_id and vec_id identify
    * the same corpus item (the fixture convention: `embeddings` is
    * the vector index over `documents`).
    */
  private val HybridTerms: Seq[(Long, String)] = Seq(
    0L -> "spark", 0L -> "join",
    1L -> "vector", 1L -> "dup",
    2L -> "hash", 2L -> "merge",
    3L -> "scan", 3L -> "filter",
    4L -> "window", 4L -> "group",
    5L -> "sort", 5L -> "order",
    6L -> "batch", 6L -> "stream",
    7L -> "key", 7L -> "value")

  private val NHybridQueries = 8
  private val ArmK = 20 // per-arm depth feeding the fusion
  private[operators] val TopK = 10 // emitted fused/bm25 depth

  /** BM25 partial scores per (query_id, doc_id, term), integer-exact.
    *
    * idf1000 = 1000 · (N - df + ½)/(df + ½)            (halves cleared ×2)
    * tf1e6   = 1e6 · 2.2·tf / (tf + 0.3 + 0.9·dl/avgdl) (cleared ×10;
    *           avgdl ≈ avg10/10 with avg10 = (10·Σdl) div N)
    * partial = (idf1000 · tf1e6) div 1000               (≈ idf·sat ×1e6)
    *
    * All operands are positive BIGINTs; `div` truncates identically to
    * DuckDB's `//` floor on positives. Bounds: tf ≤ dl ≤ doc tokens,
    * idf1000 < 2000·N/df — products stay far under 2^63 at any SF here;
    * a corpus past ~10^12 docs would move this to DECIMAL(38,0), same
    * plan.
    */
  private def bm25Partials(rawDocs: DataFrame, qterms: DataFrame,
      termList: Seq[String]): DataFrame = {
    // a NULL-text row is not a document of the retrieval corpus: it
    // contributes no postings (explode of NULL yields nothing), so
    // counting it in n_docs would skew idf/avgdl — and would let the
    // persisted index's running stats diverge from this direct
    // ranking on feeds that carry NULL rows (the ingest side filters
    // identically in writeTextIndexGen)
    val docs = rawDocs.filter(col("text").isNotNull)
    val stats = docs
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " "))).cast("long").as("n_toks"))
      .withColumn("avg10", expr("(10 * n_toks) div n_docs"))
    // cached: dfreq forks from tf and Spark does not share subplans
    // across DataFrame forks — without this the corpus is exploded and
    // aggregated twice (the qTfidf precedent). Lazy; session owners
    // clearCache per query (Bench/Verify).
    val tf = docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("dl"),
        explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok").isin(termList: _*)) // posting lists only cross the shuffle
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .cache()
    // df derives from the pruned tf frame: each (doc, tok) row is one
    // containing document. ≤ |terms| rows — broadcast.
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "tok")
      .join(broadcast(qterms), col("tok") === col("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf1000",
        expr("((2 * n_docs - 2 * df + 1) * 1000) div (2 * df + 1)"))
      .withColumn("tf1e6",
        expr("(22 * tf * 1000000) div (10 * tf + 3 + (90 * dl) div avg10)"))
      .withColumn("partial", expr("(idf1000 * tf1e6) div 1000"))
  }

  /** (query_id, doc_id, score, rank ≤ k) through the bounded top-k
    * aggregate — scores sum exactly per document, then one `topk_agg`
    * whose partials carry ≤ k pairs per query per task. The BIGINT
    * score round-trips the aggregate's DOUBLE slot losslessly (< 2^53).
    */
  private def bm25TopK(docs: DataFrame, terms: Seq[(Long, String)],
      k: Int)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val qterms = terms.toDF("query_id", "term")
    bm25Partials(docs, qterms, terms.map(_._2).distinct)
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("partial")).as("score"))
      .groupBy(col("query_id"))
      .agg(expr(s"topk_agg(cast(score as double), doc_id, $k)").as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rk"),
        col("col.payload").as("doc_id"), col("col.score").cast("long").as("score"))
  }

  /** BM25 ranked retrieval: top-10 documents per query with the scaled
    * integer score. See [[bm25Partials]] for the exact formula and
    * the object scaladoc for the plan shape.
    */
  def qBm25(spark: SparkSession, dir: String): DataFrame = {
    Engine.register(spark)
    val docs = Engine.table(spark, dir, "documents")
    bm25TopK(docs, Bm25Terms, TopK)(spark)
      .orderBy("query_id", "rk")
  }

  /** Hybrid retrieval with reciprocal-rank fusion: for each of the 8
    * hybrid queries, the BM25 top-20 (lexical arm) and the cosine
    * top-20 (vector arm, self excluded) fuse by
    * `rrf1e6 = Σ_arms 1e6 div (60 + rank)` — an id missing from an arm
    * contributes 0 (the full-outer join keeps it rankable from the
    * other arm). Emits the fused top-10 with both arm ranks (NULL where
    * the arm missed the id).
    *
    * Scale shape: both arms end in bounded `topk_agg`s, so the fusion
    * join and the final ranking window see ≤ 2·20 rows per query BY
    * CONSTRUCTION — the window is ranking a constant-sized frame, not
    * the corpus. The vector arm's crossJoin is the exact-scoring
    * baseline shape shared with q_knn_topk_agg (the IVF/LSH stores are
    * the at-scale variant; fusion is indifferent to which arm feeds it).
    */
  def qHybridRrf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Engine.register(spark)
    val docs = Engine.table(spark, dir, "documents")
    val lex = bm25TopK(docs, HybridTerms, ArmK)(spark)
      .select(col("query_id"), col("doc_id"), col("rk").as("lex_rk"))

    val e = SimilarityQueries.embeddings(spark, dir)
    val queries = e.filter(col("vec_id") < NHybridQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val vec = queries
      .crossJoin(e.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("n_emb"), col("nrm").as("n_nrm")))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        call_function("vec_dot", col("q_emb"), col("n_emb")) /
          (col("q_nrm") * col("n_nrm")))
      .groupBy(col("query_id"))
      .agg(expr(s"topk_agg(cos, neighbor_id, $ArmK)").as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("vec_rk"),
        col("col.payload").as("doc_id"))

    val fused = lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf1e6",
        coalesce(expr("1000000 div (60 + lex_rk)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + vec_rk)"), lit(0L)))
    // ≤ 40 candidates per query reach this window — constant frame.
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf1e6").desc, col("doc_id"))
    fused
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= TopK)
      .select(col("query_id"), col("rk"), col("doc_id"), col("rrf1e6"),
        col("lex_rk"), col("vec_rk"))
      .orderBy("query_id", "rk")
  }

  // --- persisted inverted index (posting-list store) --------------------

  /** Corpus-statistics manifest tag (`corpus_stats=<n_docs>:<n_toks>`)
    * — the BM25 globals ride the catalog like `stats_cols=` does
    * (newest live version's tag wins), so a probe needs ONE manifest
    * read, never a corpus pass, and an append supersedes the stats
    * with one tag on the same atomic publish as its postings.
    */
  private val StatsTagPrefix = "corpus_stats="

  /** Batch-df threshold above which [[writeTextIndexGen]] splits a
    * token's posting build across `ceil(df/hotDf)` salted tasks. The
    * default keeps every fixture token on the single-task path (no
    * plan change below web scale); TextIndexSpec drives the guard
    * with a low cap over a synthetic hot token.
    */
  private[operators] val DefaultHotTokenDf = 2000000L

  private def storedStats(base: String): (Long, Long) =
    graft.sources.IndexCatalog.newestTag(base, StatsTagPrefix)
      // newestTag resolves vacuum-carried tags too, so compaction
      // chains + retention past the last stats-bearing commit cannot
      // un-declare the globals while postings survive
      .map { t =>
        val parts = t.drop(StatsTagPrefix.length).split(":")
        (parts(0).toLong, parts(1).toLong) }
      .getOrElse(sys.error(s"no $StatsTagPrefix tag on text index $base"))

  /** One generation of the TEXT INDEX: the batch's posting lists
    * (tok, doc_id, dl, tf, pos) land `tok=`-partitioned — the
    * inverted-index layout, where a probe's partition pruning IS the
    * posting-list lookup — and the commit carries the superseding
    * corpus-stats tag (running totals: stored + this batch). `pos` is
    * the POSITIONAL payload (1-based token ordinals, ascending): it
    * rides every posting row so [[probePhrase]] can answer exact-phrase
    * queries, while BM25 probes never pay for it — [[probeTextIndex]]
    * selects (tok, doc_id, dl, tf) and parquet column pruning leaves
    * the position bytes on disk (PLANS.md `q_text_delete`'s posting
    * scan reads `struct<doc_id,dl,tf>`; only `q_phrase`'s reads
    * `pos`). Append contract matches `writeEmbedGen`'s
    * `assumeFresh` ingest shape: batches are NEW doc_ids (partitioned
    * upstream), so document frequency stays `count(*)` within a term's
    * partitions across generations and per-append cost depends on the
    * BATCH alone — never the corpus. The stats aggregate is one 1-row
    * driver read (catalog metadata, the repo's bounded-collect
    * convention).
    *
    * SKEW GUARD (`hotDf`): `repartition(tok)` alone puts a stopword's
    * ENTIRE posting list in one shuffle task — fine for a query-vocab
    * probe store, a straggler when building over a web corpus where
    * "the" is 5% of all tokens. Tokens whose batch df exceeds `hotDf`
    * are repartitioned on `(tok, salt)` with `ceil(df/hotDf)` salts,
    * so a hot term's list is built by many tasks and lands as several
    * files inside its one `tok=` partition — which the manifest and
    * every probe already treat as the normal multi-generation layout
    * (probes union a partition's files; df is `count(*)` across them).
    * The census that finds hot tokens is one aggregate over the
    * BATCH's postings, and the hot set is stopword-sized → broadcast.
    */
  private[operators] def writeTextIndexGen(
      spark: SparkSession, rawDocs: DataFrame, base: String,
      extraTags: Seq[String] = Nil, hotDf: Long = DefaultHotTokenDf,
      fenceTag: Option[String] = None): Boolean = {
    import graft.sources.{IndexCatalog, StagedWrite}
    // corpus = non-NULL-text docs, exactly as [[bm25Partials]] counts
    // them: a NULL row stages no postings, so counting it in the
    // stats census would bump n_docs with no commit to carry the tag
    // when a batch is ALL NULLs (the commit below is skipped when no
    // posting files staged) — filtered here, the no-op is total and
    // the running stats never diverge from the direct ranking
    val docs = rawDocs.filter(col("text").isNotNull)
    val posts = docs
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("dl"),
        posexplode(split(col("text"), " ")).as(Seq("p0", "tok")))
      .groupBy(col("tok"), col("doc_id"), col("dl"))
      // collect_list order within a group is the scan order of an
      // already doc-local stream, but sort_array makes ascending
      // positions a CONTRACT, not an artifact of the plan
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list((col("p0") + 1).cast("int"))).as("pos"))
    // coalesce: an all-NULL-text (or empty) batch sums to NULL, and an
    // empty batch must be a no-op append, not a driver NPE
    val agg = docs.agg(count(lit(1)).cast("long"),
      coalesce(sum(size(split(col("text"), " "))).cast("long"), lit(0L)))
      .collect()(0)
    if (agg.getLong(0) == 0L) return true
    // cached: the batch postings feed the hot census (a broadcast
    // subplan) AND the write — uncached the explode+groupBy runs twice
    // in the one write job; O(batch) rows, freed right after
    posts.cache()
    val newFiles = try {
      val hot = posts.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        .filter(col("df") > lit(hotDf))
        .select(col("tok"),
          ceil(col("df").cast("double") / lit(hotDf.toDouble)).cast("int")
            .as("nsplit"))
      val salted = posts.join(broadcast(hot), Seq("tok"), "left")
        .withColumn("salt", when(col("nsplit").isNotNull,
          pmod(hash(col("doc_id")), col("nsplit"))).otherwise(lit(0)))
      StagedWrite.partitioned(
        salted.repartition(col("tok"), col("salt")).drop("nsplit", "salt"),
        s"$base/postings", Seq("tok"))
    } finally posts.unpersist()
    // the predecessor stats are read INSIDE prepare: on a lost CAS the
    // retry re-reads the winner's totals, so two RACING appenders both
    // land with the true running sum — reading them once up front
    // would let the loser's tag silently drop the winner's batch
    if (newFiles.isEmpty) return true
    def prepare(cur: Int): (Seq[String], Seq[String]) =
      (newFiles, {
        val (n0, t0) = if (cur == 0) (0L, 0L) else storedStats(base)
        statsTagOf(n0 + agg.getLong(0), t0 + agg.getLong(1)) +: extraTags
      })
    fenceTag match {
      // streamed ingest: the replay guard re-checks inside the CAS
      // loop (commitTaggedOnce), so a concurrent replay of the same
      // batch can neither double-commit its postings nor double-count
      // the running corpus_stats= totals
      case Some(t) =>
        IndexCatalog.commitTaggedOnce(base, t)(prepare).isDefined
      case None =>
        IndexCatalog.commitWithRetry(base)(prepare)
        true
    }
  }

  private def statsTagOf(nDocs: Long, nToks: Long): String =
    s"$StatsTagPrefix$nDocs:$nToks"

  /** Tombstoned DELETE from the inverted index — the deletion-vector
    * pattern (Lucene's deleted-docs bitmap, Delta's deletion vectors):
    * removing documents from a tok-partitioned posting store can NOT
    * rewrite eagerly, because a document's tokens are scattered across
    * (potentially) every partition — the one layout where row-level
    * copy-on-write is O(store) by construction. Instead the delete
    * commit writes the doomed doc_ids as a TOMBSTONE file under its
    * own `del=1` partition (invisible to posting reads, which filter
    * to `tok=` keys) plus a superseding `corpus_stats=` tag with the
    * batch's (n_docs, n_toks) subtracted — one atomic manifest
    * publish, cost O(deleted ids), never O(store). Probes subtract
    * tombstones with a broadcast anti-join BEFORE document frequency
    * is counted, so df, the globals, and the ranking are all exactly
    * the post-delete corpus. Physical purge is compaction's job:
    * [[compactTextIndexPartitions]] drops tombstoned rows when it
    * rewrites a partition (the only time those bytes move anyway).
    *
    * The deltas come from re-tokenizing the doomed docs (the caller
    * passes the doc rows, as every ingest call here does) — the store
    * never needs a doc→tokens reverse index. Re-issued deletes are
    * idempotent: already-tombstoned ids are anti-joined away before
    * the deltas are computed, so a replay neither re-subtracts the
    * stats nor publishes a version — and the recheck runs INSIDE the
    * CAS retry, so two CONCURRENT deletes of the same ids serialize
    * correctly: the loser re-derives against the winner's tombstones,
    * its overlap drops out, and the stats are subtracted exactly once
    * (a fully-overlapped loser becomes a version-less no-op).
    * Contract: the rows passed must be documents currently in the
    * index (deleting a never-indexed doc would subtract counts that
    * were never added — same caller contract as the append side's
    * fresh-batch requirement).
    */
  private[operators] def deleteTextDocs(
      spark: SparkSession, rawDocs: DataFrame, base: String): Unit = {
    import graft.sources.{IndexCatalog, StagedWrite}
    // same corpus-membership rule as the append side: a NULL-text row
    // was never indexed or counted, so it must not subtract either
    val docs = rawDocs.filter(col("text").isNotNull)
    // the whole delta — tombstone recheck, census, staged file — is
    // derived inside prepare, against the exact version the CAS
    // validates: a lost race re-runs all of it on the winner's state.
    // (A loser's abandoned staged file is crash debris for vacuum's
    // orphan GC, like any torn write.)
    object NothingFresh extends Exception
    try {
      IndexCatalog.commitWithRetry(base) { _ =>
        // drop already-tombstoned ids: a replayed OR racing DELETE
        // must not subtract its (n_docs, n_toks) twice
        val fresh = docs.join(broadcast(tombstones(spark, base)),
          Seq("doc_id"), "left_anti")
        val agg = fresh.agg(count(lit(1)).cast("long"),
          coalesce(sum(size(split(col("text"), " "))).cast("long"), lit(0L)))
          .collect()(0)
        if (agg.getLong(0) == 0L) throw NothingFresh
        val newFiles = StagedWrite.partitioned(
          fresh.select(col("doc_id"), lit(1).as("del")).repartition(1),
          s"$base/tombstones", Seq("del"))
        val (n0, t0) = storedStats(base)
        (newFiles, Seq(statsTagOf(n0 - agg.getLong(0), t0 - agg.getLong(1))))
      }
      ()
    } catch { case NothingFresh => () }
  }

  /** The live tombstone set (doc_id), empty frame if none. */
  private def tombstones(spark: SparkSession, base: String): DataFrame = {
    import spark.implicits._
    import graft.sources.IndexCatalog
    val dels = IndexCatalog.latestFiles(base)
      .filter(f => IndexCatalog.partitionKey(f).exists(_.startsWith("del=")))
    if (dels.isEmpty) Seq.empty[Long].toDF("doc_id")
    else spark.read.option("basePath", s"$base/tombstones").parquet(dels: _*)
      .select(col("doc_id"))
  }

  /** Probe the stored index: the manifest's file list filtered to the
    * query terms' `tok=` partitions — the probe reads ONLY those
    * posting lists (spec-asserted census), df is `count(*)` within
    * them, and the BM25 globals come from the stats tag; scoring and
    * the bounded top-k are [[bm25Partials]]' exact arithmetic, so a
    * probe of a (build ∪ appends) store is bit-equal to [[qBm25]]
    * over the union corpus — one oracle text serves both. Tombstoned
    * documents ([[deleteTextDocs]]) are subtracted by a broadcast
    * anti-join before df is counted.
    */
  private[operators] def probeTextIndex(spark: SparkSession, base: String,
      terms: Seq[(Long, String)], k: Int): DataFrame = {
    import spark.implicits._
    import graft.sources.IndexCatalog
    Engine.register(spark) // topk_agg on the ranking path
    val keys = terms.map { case (_, t) => s"tok=$t" }.toSet
    val files = IndexCatalog.latestFiles(base)
      .filter(f => IndexCatalog.partitionKey(f).exists(keys.contains))
    val (nDocs, nToks) = storedStats(base)
    // an EMPTIED corpus (every doc tombstoned: the stats tag reads
    // 0:0 while posting files stay live) must answer the empty
    // ranking, not divide by zero — checked before avg10, and before
    // the files guard (which an emptied store never trips)
    if (files.isEmpty || nDocs == 0L)
      return Seq.empty[(Long, Long, Long, Long)]
        .toDF("query_id", "rk", "doc_id", "score")
    val avg10 = (10L * nToks) / nDocs
    // cached for the same fork reason as bm25Partials' tf frame —
    // though here the double-read would only re-touch the PRUNED
    // posting lists, not a corpus
    val posts = spark.read.option("basePath", s"$base/postings")
      .parquet(files: _*)
      .select(col("tok"), col("doc_id"), col("dl"), col("tf"))
      .join(broadcast(tombstones(spark, base)), Seq("doc_id"), "left_anti")
      .cache()
    val qterms = terms.toDF("query_id", "term")
    val dfreq = posts.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    posts.join(broadcast(dfreq), "tok")
      .join(broadcast(qterms), col("tok") === col("term"))
      .withColumn("idf1000",
        expr(s"((2 * ${nDocs}L - 2 * df + 1) * 1000) div (2 * df + 1)"))
      .withColumn("tf1e6",
        expr(s"(22 * tf * 1000000) div (10 * tf + 3 + (90 * dl) div ${avg10}L)"))
      .withColumn("partial", expr("(idf1000 * tf1e6) div 1000"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("partial")).as("score"))
      .groupBy(col("query_id"))
      .agg(expr(s"topk_agg(cast(score as double), doc_id, $k)").as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rk"),
        col("col.payload").as("doc_id"),
        col("col.score").cast("long").as("score"))
  }

  /** BM25 served from the PERSISTED inverted index — the text sibling
    * of the IVF/sign-LSH stores, through the same manifest catalog:
    * build indexes 90% of the corpus (`doc_id % 10 <> 7`), an append
    * lands the held-out decile as a second committed generation with
    * a superseding stats tag, and the probe answers [[Bm25Terms]]
    * reading ONLY the query terms' partitions. The gated output is
    * bit-equal to [[qBm25]] over the full corpus (one oracle text),
    * which pins the whole protocol: partition-pruned posting reads,
    * cross-generation df, tag-carried globals.
    *
    * 100 TB shape: the index is built once (one corpus pass), appends
    * cost O(batch), and a query touches |terms| partitions of
    * posting-list rows — the inverted-index promise, delivered by
    * catalog partition pruning instead of a bespoke index format;
    * probes are versioned/time-travelable because the postings are a
    * catalog store like any other.
    */
  /** The standard two-generation fixture index — build 90%
    * (`doc_id % 10 <> 7`) then append the held-out decile — through
    * the process-wide fixture cache ([[graft.sources.StoreFixtures]]):
    * qBm25Persisted / qPhrase / qTextOptimize all OPEN with this
    * identical store and differ only in what they do to their copy
    * next, so each receives a byte-copy of one template instead of
    * re-tokenizing the corpus (the build path stays exercised by the
    * template build and the uncached TextIndexSpec suites).
    */
  private def textIndexBuildAppendCached(
      spark: SparkSession, dir: String, base: String): Unit =
    FixtureTemplates.cloneInto("text_ba", spark, dir, base)

  /** The `text_ba` template body: build 90% (v1), append the held-out
    * decile (v2).
    */
  private[operators] def buildTextBaTemplate(
      spark: SparkSession, dir: String, d: String): Unit = {
    val docs = Engine.table(spark, dir, "documents")
    writeTextIndexGen(spark,
      docs.filter(pmod(col("doc_id"), lit(10)) =!= 7), d) // v1: build
    writeTextIndexGen(spark,
      docs.filter(pmod(col("doc_id"), lit(10)) === 7), d) // v2: append
  }

  /** Full-corpus single-generation fixture index via the same cache
    * (qTextDelete's starting point).
    */
  private def textIndexFullCached(
      spark: SparkSession, dir: String, base: String): Unit =
    FixtureTemplates.cloneInto("text_full", spark, dir, base)

  /** The `text_full` template body. */
  private[operators] def buildTextFullTemplate(
      spark: SparkSession, dir: String, d: String): Unit =
    writeTextIndexGen(spark, Engine.table(spark, dir, "documents"), d)

  /** 70%-corpus build (`doc_id % 10 < 7`) via the same cache —
    * qStreamTextIndex's starting point before its streamed deciles.
    */
  private[operators] def textIndex70Cached(
      spark: SparkSession, dir: String, base: String): Unit =
    FixtureTemplates.cloneInto("text_70", spark, dir, base)

  /** The `text_70` template body. */
  private[operators] def buildText70Template(
      spark: SparkSession, dir: String, d: String): Unit =
    writeTextIndexGen(spark, Engine.table(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(10)) < 7), d)

  def qBm25Persisted(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_textidx").toString
    try textIndexBuildAppendCached(spark, dir, base)
    catch {
      case e: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw e
    }
    graft.Lease.lease("q_bm25_persisted", Seq(base))
    probeTextIndex(spark, base, Bm25Terms, TopK)
      .orderBy("query_id", "rk")
  }

  /** Phrase queries over the positional index — query 1 and 2 are
    * common bigrams of the fixture vocabulary, query 3 is a REPEATED
    * token ("table table"), which pins the self-overlap path: one
    * `tok=` partition read, the position list intersected with its
    * own shift.
    */
  private[operators] val PhraseTerms: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("fast", "spark"),
    2L -> Seq("sort", "order"),
    3L -> Seq("table", "table"))

  /** Exact-phrase ranked retrieval from the PERSISTED positional
    * index — the contamination-probe upgrade over bag-of-words BM25:
    * "did this exact benchmark sentence leak into the corpus" needs
    * adjacency, not co-occurrence.
    *
    * Plan per phrase: the manifest's file list pruned to the phrase
    * terms' `tok=` partitions (the posting-list lookup), tombstones
    * subtracted, then one doc_id join per successive term where the
    * accumulator is the array of START positions whose prefix still
    * matches — step i keeps start s iff `s+i` is in term i's position
    * list (`filter` + `array_contains`, codegen'd array kernels, no
    * explode). The candidate set only SHRINKS along the chain, every
    * frame is posting-list-sized (never corpus-sized), and phrase tf
    * = the surviving start count — integer-exact, so the ranking
    * (ptf DESC, doc_id — `topk_agg`'s native tie order) is
    * bit-reproducible against the oracle's lambda recount over the
    * raw text. 100 TB shape: |terms| pruned partition reads + |terms|-1
    * joins keyed on doc_id + a bounded top-k; the corpus and its
    * token stream are never touched.
    */
  /** The shared scaffolding of BOTH positional probes (phrase and
    * proximity): the manifest's file list pruned to `keys`' `tok=`
    * partitions — the posting-list lookup — read with the positional
    * payload, tombstones subtracted. None when no live partition
    * holds any key (a probe for never-indexed terms).
    */
  private def prunedPostings(spark: SparkSession, base: String,
      keys: Set[String], dead: DataFrame): Option[DataFrame] = {
    import graft.sources.IndexCatalog
    val files = IndexCatalog.latestFiles(base)
      .filter(f => IndexCatalog.partitionKey(f).exists(keys.contains))
    if (files.isEmpty) None
    else Some(spark.read.option("basePath", s"$base/postings")
      .parquet(files: _*)
      .select(col("tok"), col("doc_id"), col("pos"))
      .join(broadcast(dead), Seq("doc_id"), "left_anti"))
  }

  private def emptyPtf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Long)].toDF("query_id", "doc_id", "ptf")
  }

  /** The shared ranking tail of both positional probes: per-query
    * (doc_id, ptf) frames → the bounded `topk_agg` top-k (ptf DESC,
    * doc_id — the aggregate's native tie order), 1-based rank.
    */
  private def rankPtf(perQuery: Seq[DataFrame], k: Int): DataFrame =
    perQuery.reduce(_ unionByName _)
      .groupBy(col("query_id"))
      .agg(expr(s"topk_agg(cast(ptf as double), doc_id, $k)").as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rk"),
        col("col.payload").as("doc_id"),
        col("col.score").cast("long").as("ptf"))

  private[operators] def probePhrase(spark: SparkSession, base: String,
      phrases: Seq[(Long, Seq[String])], k: Int): DataFrame = {
    Engine.register(spark) // topk_agg on the ranking path
    val dead = tombstones(spark, base)
    val perQuery = phrases.map { case (qid, terms) =>
      prunedPostings(spark, base, terms.map(t => s"tok=$t").toSet, dead)
        .map { posts =>
          val head = posts.filter(col("tok") === terms.head)
            .select(col("doc_id"), col("pos").as("acc"))
          val matched = terms.zipWithIndex.drop(1).foldLeft(head) {
            case (cur, (t, i)) =>
              val next = posts.filter(col("tok") === t)
                .select(col("doc_id"), col("pos").as(s"p$i"))
              cur.join(next, "doc_id")
                .withColumn("acc", filter(col("acc"),
                  s => array_contains(col(s"p$i"), s + lit(i))))
                .drop(s"p$i")
                .filter(size(col("acc")) > 0)
          }
          matched.select(lit(qid).as("query_id"), col("doc_id"),
            size(col("acc")).cast("long").as("ptf"))
        }.getOrElse(emptyPtf(spark))
    }
    rankPtf(perQuery, k)
  }

  /** Phrase search gated end-to-end: build (90%) + append (held-out
    * decile) commit two positional generations, and the pruned probe
    * must rank exactly as the oracle's from-scratch adjacency count
    * over the full raw corpus — one oracle text pins the positional
    * payload through the write, the append union, and the
    * start-position intersection. (Tombstone and compaction
    * interaction with positions is TextIndexSpec's contract.)
    */
  def qPhrase(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_phrase").toString
    try textIndexBuildAppendCached(spark, dir, base)
    catch {
      case e: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw e
    }
    graft.Lease.lease("q_phrase", Seq(base))
    probePhrase(spark, base, PhraseTerms, TopK)
      .orderBy("query_id", "rk")
  }

  /** Proximity queries over the positional index — (anchor, follower,
    * window): query 3 pairs a common anchor with the RAREST fixture
    * token ("dup", df ≈ 3% of the common terms'), pinning the
    * asymmetric-posting-list path where one side of the doc_id join
    * is tiny.
    */
  private[operators] val ProximityTerms: Seq[(Long, String, String, Int)] =
    Seq((1L, "hash", "join", 5), (2L, "scan", "filter", 3),
      (3L, "data", "dup", 6))

  /** WITHIN-k PROXIMITY ranked retrieval from the positional index —
    * the relaxation between bag-of-words BM25 (any distance) and
    * exact phrase (distance exactly 1): "anchor followed by follower
    * within w tokens". Proximity tf = the count of ORDERED position
    * pairs (s ∈ pos(a), p ∈ pos(b)) with s < p ≤ s + w — integer-
    * exact, so the ranking (ptf DESC, doc_id) is bit-reproducible
    * against the oracle's from-scratch pair recount over the raw
    * text.
    *
    * Plan per query: the manifest's file list pruned to the TWO
    * terms' `tok=` partitions, tombstones subtracted, ONE doc_id join
    * between the two posting lists, then the pair count as nested
    * array kernels — `aggregate` over the anchor's positions of
    * `size(filter(follower positions within (s, s+w]))` — no explode,
    * map-side, codegen'd. 100 TB shape: two pruned partition reads +
    * one posting-list-sized equi-join + a bounded top-k; the corpus
    * token stream is never touched (same law as the phrase probe,
    * with the |terms|-chain replaced by one pair join).
    */
  private[operators] def probeProximity(spark: SparkSession, base: String,
      queries: Seq[(Long, String, String, Int)], k: Int): DataFrame = {
    Engine.register(spark) // topk_agg on the ranking path
    val dead = tombstones(spark, base)
    val perQuery = queries.map { case (qid, a, b, w) =>
      prunedPostings(spark, base, Set(s"tok=$a", s"tok=$b"), dead)
        .map { posts =>
          posts.filter(col("tok") === a).select(col("doc_id"), col("pos").as("pa"))
            .join(posts.filter(col("tok") === b)
              .select(col("doc_id"), col("pos").as("pb")), "doc_id")
            .select(lit(qid).as("query_id"), col("doc_id"),
              aggregate(col("pa"), lit(0L), (acc, s) =>
                acc + size(filter(col("pb"),
                  p => p > s && p <= s + lit(w))).cast("long")).as("ptf"))
            .filter(col("ptf") > 0)
        }.getOrElse(emptyPtf(spark))
    }
    rankPtf(perQuery, k)
  }

  /** Proximity search gated end-to-end over the SAME two-generation
    * fixture index as the phrase probe (cached — the marginal bench
    * cost is the probe alone): the pruned within-window pair count
    * must rank exactly as the oracle's lambda recount over the raw
    * corpus. (Tombstone interaction is TextIndexSpec's contract.)
    */
  def qProximity(spark: SparkSession, dir: String): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_prox").toString
    try textIndexBuildAppendCached(spark, dir, base)
    catch {
      case e: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw e
    }
    graft.Lease.lease("q_proximity", Seq(base))
    probeProximity(spark, base, ProximityTerms, TopK)
      .orderBy("query_id", "rk")
  }

  /** PARTITION-SCOPED posting-list compaction — `OPTIMIZE ... WHERE`
    * for the TEXT index: rewrite ONLY the named terms' live posting
    * rows, doc-ordered (`sortWithinPartitions(doc_id)` — the classic
    * doc-id-sorted posting-list layout, so a merged partition reads
    * sequentially and min/max footer stats stay tight), into fresh
    * files inside their own `tok=` partitions, published via the
    * rebasing partition-replacement commit. Every other term's files
    * carry forward BY PATH, byte-untouched; no stats tag is written,
    * so the newest prior `corpus_stats=` keeps governing (compaction
    * must not perturb the BM25 globals).
    *
    * 100 TB shape: continuous ingest fragments each hot term into
    * one-file-per-generation; this rewrite is O(target partitions)
    * while the manifest line is all the cold ones cost — the same
    * contract as the embedding store's partition-scoped OPTIMIZE,
    * proven here on the inverted-index layout.
    */
  private[operators] def compactTextIndexPartitions(
      spark: SparkSession, base: String, toks: Seq[String]): Unit = {
    import graft.sources.{IndexCatalog, StagedWrite}
    val keys = toks.map(t => s"tok=$t").toSet
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
          // tombstoned rows are PURGED here — compaction is the only
          // time a partition's bytes move, so it is where logical
          // deletes ([[deleteTextDocs]]) become physical; the
          // tombstone files themselves stay live for the partitions
          // not being rewritten (re-dropping an already-purged id is
          // a no-op anti-join miss)
          val rewritten = StagedWrite.partitioned(
            spark.read.option("basePath", s"$base/postings").parquet(live: _*)
              .select(col("tok").cast("string").as("tok"), col("doc_id"),
                col("dl"), col("tf"), col("pos"))
              .join(broadcast(tombstones(spark, base)), Seq("doc_id"), "left_anti")
              .repartition(col("tok"))
              .sortWithinPartitions(col("doc_id")),
            s"$base/postings", Seq("tok"))
          // a partition whose every row was tombstoned rewrites to NO
          // file — its key must still supersede the old files
          val emptied = live.flatMap(IndexCatalog.partitionKey).toSet --
            rewritten.flatMap(IndexCatalog.partitionKey).toSet
          IndexCatalog.commitReplacePartitionsRebasing(base, rewritten,
            Seq(s"compaction ${keys.toSeq.sorted.mkString(",")}"), basedOn,
            extraReplacedKeys = emptied)
          done = true
        } catch {
          case e if IndexCatalog.isCommitConflict(e) && attempts < 5 => ()
        }
      }
    }
  }

  /** OPTIMIZE on the persisted inverted index, gated end-to-end:
    * build (90%) + append (held-out decile) fragment every query
    * term's partition into one file per generation; compacting the
    * [[Bm25Terms]] partitions must (a) leave each target partition
    * exactly ONE live file, (b) carry every non-target file forward
    * by path — the manifest line is all the cold partitions pay —
    * and (c) leave the probe bit-equal to the direct full-corpus
    * ranking (same oracle text as `q_bm25`, now pinning that
    * compaction moved bytes without moving results). The filesystem
    * facts fold into `optimize_ok`, which the oracle asserts TRUE.
    */
  def qTextOptimize(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.IndexCatalog
    val base = java.nio.file.Files.createTempDirectory("graft_topt").toString
    val docs = Engine.table(spark, dir, "documents")
    val toks = Bm25Terms.map(_._2).distinct
    val keys = toks.map(t => s"tok=$t").toSet
    val ok = try {
      textIndexBuildAppendCached(spark, dir, base) // v1: build, v2: append
      val before = IndexCatalog.latestFiles(base)
      val (tgt0, cold0) = before.partition(
        f => IndexCatalog.partitionKey(f).exists(keys.contains))
      compactTextIndexPartitions(spark, base, toks)
      val after = IndexCatalog.latestFiles(base)
      val (tgt1, cold1) = after.partition(
        f => IndexCatalog.partitionKey(f).exists(keys.contains))
      val onePerKey = tgt1.groupBy(IndexCatalog.partitionKey)
        .forall(_._2.size == 1)
      // fragmentation really dropped, cold partitions carried by path
      tgt0.size > tgt1.size && onePerKey && cold0.toSet == cold1.toSet
    } catch {
      case e: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw e
    }
    graft.Lease.lease("q_text_optimize", Seq(base))
    probeTextIndex(spark, base, Bm25Terms, TopK)
      .withColumn("optimize_ok", lit(ok))
      .orderBy("query_id", "rk")
  }

  /** Row-level DELETE on the inverted index, gated end-to-end: index
    * the FULL corpus, tombstone the `doc_id % 10 == 7` decile
    * ([[deleteTextDocs]] — O(deleted ids)); the probe must equal the
    * direct BM25 ranking over the SURVIVING 90% — document frequency,
    * the `corpus_stats=` globals and the ranking all reflect the
    * post-delete corpus exactly (the oracle ranks `documents WHERE
    * doc_id % 10 <> 7` directly). `delete_ok` pins the O(tombstone)
    * commit shape from the manifests alone: every pre-delete posting
    * file is still live by path, and the only files the delete added
    * sit under the `del=` partition — no Spark job, just two file
    * censuses. The PHYSICAL purge on compaction is TextIndexSpec's
    * contract (byte-level: rewritten partitions drop tombstoned rows,
    * probe unchanged) — re-running the whole compaction inside the
    * gated query would re-prove the spec at bench cost.
    */
  def qTextDelete(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.IndexCatalog
    val base = java.nio.file.Files.createTempDirectory("graft_tdel").toString
    val docs = Engine.table(spark, dir, "documents")
    val ok = try {
      textIndexFullCached(spark, dir, base) // v1: full corpus
      val before = IndexCatalog.latestFiles(base).toSet
      deleteTextDocs(spark,
        docs.filter(pmod(col("doc_id"), lit(10)) === 7), base) // v2: tombstones
      val after = IndexCatalog.latestFiles(base).toSet
      val added = after -- before
      before.subsetOf(after) && added.nonEmpty && added.forall(f =>
        IndexCatalog.partitionKey(f).exists(_.startsWith("del=")))
    } catch {
      case e: Throwable =>
        scala.util.Try(graft.Fs.deleteRecursively(base)); throw e
    }
    graft.Lease.lease("q_text_delete", Seq(base))
    probeTextIndex(spark, base, Bm25Terms, TopK)
      .withColumn("delete_ok", lit(ok))
      .orderBy("query_id", "rk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bm25" -> (qBm25 _),
    "q_bm25_persisted" -> (qBm25Persisted _),
    "q_text_optimize" -> (qTextOptimize _),
    "q_text_delete" -> (qTextDelete _),
    "q_hybrid_rrf" -> (qHybridRrf _),
    "q_phrase" -> (qPhrase _),
    "q_proximity" -> (qProximity _)
  )

  /** DuckDB phrase-tf recount for one phrase: count the start indices
    * whose window matches, via a list lambda over the split token
    * array — the from-scratch formulation of what the probe computes
    * by intersecting stored position lists.
    */
  private def duckPhrase(qid: Long, terms: Seq[String]): String = {
    val n = terms.size
    val cond = terms.zipWithIndex
      .map { case (t, j) => s"toks[i + $j] = '$t'" }.mkString(" AND ")
    s"""SELECT CAST($qid AS BIGINT) AS query_id, doc_id,
       |       CAST(len(list_filter(range(1, len(toks) - ${n - 2}),
       |                            i -> $cond)) AS BIGINT) AS ptf FROM t""".stripMargin
  }

  /** DuckDB proximity-tf recount for one (anchor, follower, window):
    * positions from the split token array via list lambdas, pair
    * count = Σ over anchor positions of the follower positions in
    * (s, s+w] — the from-scratch formulation of what the probe
    * computes from the stored position lists.
    */
  private def duckProximity(qid: Long, a: String, b: String, w: Int): String =
    s"""SELECT CAST($qid AS BIGINT) AS query_id, doc_id,
       |       CAST(coalesce(list_sum(list_transform(
       |              list_filter(range(1, len(toks) + 1), i -> toks[i] = '$a'),
       |              s -> len(list_filter(
       |                     list_filter(range(1, len(toks) + 1),
       |                                 i -> toks[i] = '$b'),
       |                     p -> p > s AND p <= s + $w)))), 0)
       |            AS BIGINT) AS ptf FROM t""".stripMargin

  private def duckValues(terms: Seq[(Long, String)]): String =
    terms.map { case (q, t) => s"(CAST($q AS BIGINT), '$t')" }.mkString(", ")

  /** The BM25 pipeline in DuckDB SQL up to a `ranked` CTE of
    * (query_id, doc_id, score, rk) — shared by both oracles. `//`
    * floors where Spark's `div` truncates: identical on the
    * all-positive operands throughout.
    */
  private def duckBm25(terms: Seq[(Long, String)], k: Int,
      docsPred: String = "true"): String =
    // text IS NOT NULL mirrors the engine's NULL-corpus rule (a
    // NULL-text row contributes no postings, so it is not a document
    // of the retrieval corpus — bm25Partials/writeTextIndexGen filter
    // identically); without it n_docs would diverge on NULL-bearing
    // feeds. The current fixtures carry no NULL rows, so this changes
    // nothing there — it pins the DEFINITION, not today's numbers.
    s"""qt(query_id, term) AS (VALUES ${duckValues(terms)}),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |                 CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_toks
       |          FROM documents WHERE text IS NOT NULL AND ($docsPred)),
       |s2 AS (SELECT n_docs, (10 * n_toks) // n_docs AS avg10 FROM stats),
       |tok AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
       |               unnest(string_split(text, ' ')) AS tok
       |        FROM documents WHERE text IS NOT NULL AND ($docsPred)),
       |tf AS (SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf FROM tok
       |       WHERE tok IN (SELECT term FROM qt) GROUP BY 1, 2, 3),
       |dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
       |scored AS (
       |  SELECT q.query_id, t.doc_id,
       |         ((2 * n_docs - 2 * df + 1) * 1000) // (2 * df + 1) AS idf1000,
       |         (22 * tf * 1000000) // (10 * tf + 3 + (90 * dl) // avg10) AS tf1e6
       |  FROM tf t JOIN dfreq USING (tok) JOIN qt q ON t.tok = q.term
       |  CROSS JOIN s2),
       |agg AS (SELECT query_id, doc_id,
       |               CAST(sum((idf1000 * tf1e6) // 1000) AS BIGINT) AS score
       |        FROM scored GROUP BY 1, 2),
       |ranked AS (SELECT query_id, doc_id, score,
       |                  row_number() OVER (PARTITION BY query_id
       |                                     ORDER BY score DESC, doc_id) AS rk
       |           FROM agg)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_bm25" ->
      s"""WITH ${duckBm25(Bm25Terms, TopK)}
         |SELECT query_id, rk, doc_id, score FROM ranked
         |WHERE rk <= $TopK ORDER BY query_id, rk""".stripMargin,
    // the persisted probe is bit-equal to the direct ranking over the
    // union corpus — one oracle text pins build + append + pruned probe
    "q_bm25_persisted" ->
      s"""WITH ${duckBm25(Bm25Terms, TopK)}
         |SELECT query_id, rk, doc_id, score FROM ranked
         |WHERE rk <= $TopK ORDER BY query_id, rk""".stripMargin,
    // compaction moves bytes, never results: the probe stays bit-equal
    // to the direct ranking, and the file-census facts ride optimize_ok
    "q_text_optimize" ->
      s"""WITH ${duckBm25(Bm25Terms, TopK)}
         |SELECT query_id, rk, doc_id, score, true AS optimize_ok FROM ranked
         |WHERE rk <= $TopK ORDER BY query_id, rk""".stripMargin,
    // post-delete the index must answer as if the decile never
    // existed: the oracle ranks the surviving corpus directly
    "q_text_delete" ->
      s"""WITH ${duckBm25(Bm25Terms, TopK, "doc_id % 10 <> 7")}
         |SELECT query_id, rk, doc_id, score, true AS delete_ok FROM ranked
         |WHERE rk <= $TopK ORDER BY query_id, rk""".stripMargin,
    "q_hybrid_rrf" ->
      s"""WITH ${duckBm25(HybridTerms, ArmK)},
         |lex AS (SELECT query_id, doc_id, rk AS lex_rk FROM ranked
         |        WHERE rk <= $ArmK),
         |qv AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
         |       WHERE vec_id < $NHybridQueries),
         |vs AS (SELECT query_id, e.vec_id AS doc_id,
         |              list_cosine_similarity(CAST(q_emb AS DOUBLE[]),
         |                                     CAST(e.embedding AS DOUBLE[])) AS cos
         |       FROM qv JOIN embeddings e ON query_id <> e.vec_id),
         |vr AS (SELECT query_id, doc_id,
         |              row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY cos DESC, doc_id) AS vec_rk
         |       FROM vs),
         |vec AS (SELECT query_id, doc_id, vec_rk FROM vr WHERE vec_rk <= $ArmK),
         |fused AS (SELECT coalesce(l.query_id, v.query_id) AS query_id,
         |                 coalesce(l.doc_id, v.doc_id) AS doc_id,
         |                 l.lex_rk, v.vec_rk,
         |                 coalesce(1000000 // (60 + l.lex_rk), 0)
         |                   + coalesce(1000000 // (60 + v.vec_rk), 0) AS rrf1e6
         |          FROM lex l FULL OUTER JOIN vec v
         |            ON l.query_id = v.query_id AND l.doc_id = v.doc_id),
         |rr AS (SELECT query_id, doc_id, rrf1e6, lex_rk, vec_rk,
         |              row_number() OVER (PARTITION BY query_id
         |                                 ORDER BY rrf1e6 DESC, doc_id) AS rk
         |       FROM fused)
         |SELECT query_id, rk, doc_id, rrf1e6, lex_rk, vec_rk FROM rr
         |WHERE rk <= $TopK ORDER BY query_id, rk""".stripMargin,
    // the pruned positional probe is bit-equal to a from-scratch
    // adjacency recount over the raw corpus — one text pins write,
    // append union, and start-position intersection
    "q_phrase" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
         |           FROM documents WHERE text IS NOT NULL),
         |p AS (${PhraseTerms.map { case (q, ts) => duckPhrase(q, ts) }
             .mkString("\n UNION ALL ")}),
         |ranked AS (SELECT query_id, doc_id, ptf,
         |                  row_number() OVER (PARTITION BY query_id
         |                                     ORDER BY ptf DESC, doc_id) AS rk
         |           FROM p WHERE ptf > 0)
         |SELECT query_id, rk, doc_id, ptf FROM ranked
         |WHERE rk <= $TopK ORDER BY query_id, rk""".stripMargin,
    // the pruned within-window pair count is bit-equal to a
    // from-scratch recount over the raw corpus — one text pins the
    // positional payload through build + append and the ordered-pair
    // window algebra
    "q_proximity" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
         |           FROM documents WHERE text IS NOT NULL),
         |p AS (${ProximityTerms.map { case (q, a, b, w) =>
               duckProximity(q, a, b, w) }.mkString("\n UNION ALL ")}),
         |ranked AS (SELECT query_id, doc_id, ptf,
         |                  row_number() OVER (PARTITION BY query_id
         |                                     ORDER BY ptf DESC, doc_id) AS rk
         |           FROM p WHERE ptf > 0)
         |SELECT query_id, rk, doc_id, ptf FROM ranked
         |WHERE rk <= $TopK ORDER BY query_id, rk""".stripMargin
  )
}
