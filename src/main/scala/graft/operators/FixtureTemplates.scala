package graft.operators

import org.apache.spark.sql.SparkSession

/** The CANONICAL builder per fixture-template kind — the single place
  * a `(kind, sfDir)` template's content is defined, consumed by both
  * the gated queries (via [[cloneInto]]) and [[graft.Bench]]'s untimed
  * warm-up (via [[prewarm]]).
  *
  * Why a registry: [[graft.sources.StoreFixtures]] requires each
  * builder to be a pure function of `(kind, sfDir)`; with builders
  * inlined at call sites, two queries sharing a kind could silently
  * drift, and the bench harness had no way to pre-build templates it
  * cannot enumerate — so the one-time build cost landed inside
  * whichever measured query ran first (alphabetical order), and a
  * rerun of that query reported the template-WARM time, a disclosed
  * but annoying min-of-k asymmetry (BASELINE.md). One registry closes
  * both: a kind has exactly one builder, and the harness pre-builds
  * them all, reporting template seconds as their own JSON field.
  *
  * Builders here only NAME functions owned by the operator objects
  * (the build logic stays beside the operators it serves). Each entry
  * also enumerates its CONSUMERS — the gated query names whose
  * execution clones (or probes) the template — so a restricted run
  * ([[graft.Bench]]'s `SPARK_GRAFT_ONLY` iteration loop) pre-builds
  * only the templates its selected queries will actually open,
  * instead of paying every store build to time one query.
  */
object FixtureTemplates {

  /** One registered template kind: its single canonical builder
    * (pure in `(kind, sfDir)` — the [[graft.sources.StoreFixtures]]
    * cache contract) and the gated queries that consume it.
    */
  final case class Template(
      kind: String,
      consumers: Set[String],
      build: (SparkSession, String, String) => Unit)

  val all: Seq[Template] = Seq(
    Template("cluster_base",
      Set("q_cluster_append", "q_stream_cluster_append"),
      DedupQueries.buildClusterBaseTemplate _),
    Template("embed_dml",
      Set("q_store_cdc", "q_stream_store_cdc", "q_stream_cdc_matview"),
      SimilarityQueries.buildEmbedDmlTemplate _),
    Template("embed_evens",
      Set("q_embed_append", "q_embed_ingest", "q_store_asof",
        "q_store_changes", "q_store_clone", "q_store_delete",
        "q_store_history", "q_store_incremental", "q_store_lookup",
        "q_store_matview", "q_store_merge", "q_store_optimize",
        "q_store_restore", "q_store_update", "q_store_vacuum",
        "q_stream_index_append", "q_stream_store_follow"),
      SimilarityQueries.buildEmbedStore _),
    Template("embed_evens_checked",
      Set("q_store_constraint", "q_stream_quarantine"),
      SimilarityQueries.buildEmbedStoreChecked _),
    Template("ivf_evens", Set("q_ivf_append", "q_ivf_recluster"),
      SimilarityQueries.buildIvfEvensTemplate _),
    Template("ivf_full", Set("q_ivf_persisted"),
      SimilarityQueries.buildIvfIndex _),
    Template("ivf_labeled", Set("q_ivf_filtered"),
      SimilarityQueries.buildLabeledIvfStore _),
    Template("lsh_bands", Set("q_neardup_append", "q_neardup_ingest"),
      DedupQueries.buildLshStore _),
    Template("pq_full", Set("q_ivf_pq", "q_pq_filtered"),
      (s: SparkSession, dir: String, d: String) =>
        SimilarityQueries.buildPqStore(s, dir, d)),
    Template("sub_windows",
      Set("q_substring_dedup", "q_substring_scrub", "q_substring_rewrite",
        "q_span_contamination", "q_stream_contamination"),
      DedupQueries.buildSubWindowsTemplate _),
    Template("sub_windows_w50",
      Set("q_substring_dedup_w50", "q_span_contamination_w50"),
      DedupQueries.buildSubWindows50Template _),
    // FEED templates: the slice-partitioned parquet a streamed-ingest
    // query's simulated unbounded source consumes — input ARRIVAL, a
    // pure function of (kind, sfDir) like every store template, built
    // untimed here and copied (KB–MB) into each run's own feed dir
    Template("feed_cluster",
      Set("q_stream_cluster_append", "q_cluster_append"),
      StreamingQueries.buildClusterFeedTemplate _),
    Template("feed_contam", Set("q_stream_contamination"),
      StreamingQueries.buildContamFeedTemplate _),
    Template("feed_embed_a", Set("q_stream_index_append"),
      StreamingQueries.buildEmbedFeedTemplate _),
    Template("feed_quarantine", Set("q_stream_quarantine"),
      StreamingQueries.buildQuarantineFeedTemplate _),
    Template("feed_text70", Set("q_stream_text_index"),
      StreamingQueries.buildText70FeedTemplate _),
    Template("feed_txn_docs", Set("q_stream_txn"),
      StreamingQueries.buildTxnFeedTemplate _),
    Template("text_70", Set("q_stream_text_index"),
      RetrievalQueries.buildText70Template _),
    Template("text_ba",
      Set("q_bm25_persisted", "q_phrase", "q_proximity", "q_text_optimize"),
      RetrievalQueries.buildTextBaTemplate _),
    Template("text_full", Set("q_text_delete"),
      RetrievalQueries.buildTextFullTemplate _))

  private val byKind = all.map(t => t.kind -> t).toMap

  /** The query-side entry: copy `(kind, sfDir)`'s template into `dest`
    * (building it first iff this process hasn't), using the ONE
    * registered builder — call sites cannot drift from the registry.
    * ADDING A CALL SITE: declare the calling query in this kind's
    * `consumers` set above, or a `SPARK_GRAFT_ONLY` run of that query
    * will skip the prewarm and pay the template build inside its
    * timed measurement (FixtureTemplatesSpec pins what is statically
    * checkable; this direction is the review contract).
    */
  def cloneInto(kind: String, spark: SparkSession, sfDir: String,
      dest: String): Unit =
    graft.sources.StoreFixtures.cloneInto(kind, sfDir, dest)(
      d => byKind(kind).build(spark, sfDir, d))

  /** The `(kind, sfDir)` template path for READ-ONLY consumers —
    * probes that never commit against the store read the shared
    * template in place ([[graft.sources.StoreFixtures.readOnlyTemplate]]'s
    * immutability contract) instead of paying a byte-copy per query.
    */
  def readOnlyPath(kind: String, spark: SparkSession, sfDir: String): String =
    graft.sources.StoreFixtures.readOnlyTemplate(kind, sfDir)(
      d => byKind(kind).build(spark, sfDir, d))

  /** Pre-build the registered templates for `sfDir`, returning
    * per-kind build seconds (0 when already cached). [[graft.Bench]]
    * runs this in its untimed warm-up and discloses the seconds as a
    * separate JSON field — template cost is real, reported, and
    * outside every per-query measurement.
    *
    * `selected`, when present (a `SPARK_GRAFT_ONLY`-restricted run),
    * limits the warm-up to kinds at least one selected query
    * consumes: a single-query optimization loop must not pay every
    * other store's one-time build (~43 s at sf0.1 / ~126 s at sf1 of
    * untimed wall per iteration). An unrestricted run (`None`)
    * pre-builds everything, keeping the full bench's uniform
    * template-warm policy.
    */
  def prewarm(spark: SparkSession, sfDir: String,
      selected: Option[Set[String]] = None): Seq[(String, Double)] =
    all.filter(t => selected.forall(q => (q & t.consumers).nonEmpty))
      .map { t =>
        val t0 = System.nanoTime()
        graft.sources.StoreFixtures.ensureTemplate(t.kind, sfDir)(
          d => t.build(spark, sfDir, d))
        (t.kind, (System.nanoTime() - t0) / 1e9)
      }
}
