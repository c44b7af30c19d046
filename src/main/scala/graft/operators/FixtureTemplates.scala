package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
  * (the build logic stays beside the operators it serves); the kinds
  * and their consumers:
  *  - `ivf_full`    — full-corpus IVF store (q_ivf_persisted)
  *  - `ivf_evens`   — even-id-corpus IVF store, centroids frozen there
  *                    (q_ivf_append)
  *  - `ivf_labeled` — label-partitioned IVF store (q_ivf_filtered)
  *  - `pq_full`     — IVF-PQ cells + codebooks + codes (q_ivf_pq,
  *                    q_pq_filtered)
  *  - `embed_evens[, _checked]` — even-id sign-LSH store (the ~17
  *                    store-lifecycle queries; checked variant carries
  *                    the `check=` tag)
  *  - `embed_dml`   — the evens store taken through MERGE + DELETE
  *                    (q_store_cdc, q_stream_store_cdc,
  *                    q_stream_cdc_matview — their work is READING
  *                    this history, not producing it)
  *  - `cluster_base` — even-id connected-components assignment
  *                    (q_cluster_append, q_stream_cluster_append)
  *  - `lsh_bands`   — even-corpus MinHash band store (q_neardup_ingest,
  *                    q_neardup_append)
  *  - `text_ba` / `text_full` / `text_70` — positional inverted-index
  *                    stores at 90%+decile / 100% / 70% corpus slices
  *                    (q_bm25_persisted, q_phrase, q_text_optimize,
  *                    q_text_delete, q_stream_text_index)
  */
object FixtureTemplates {

  /** kind -> builder(spark, sfDir, templateDir). Each builder is pure
    * in `(kind, sfDir)` — the [[graft.sources.StoreFixtures]] cache
    * contract.
    */
  val all: Seq[(String, (SparkSession, String, String) => Unit)] = Seq(
    "cluster_base" -> (DedupQueries.buildClusterBaseTemplate _),
    "embed_dml" -> (SimilarityQueries.buildEmbedDmlTemplate _),
    "embed_evens" -> (SimilarityQueries.buildEmbedStore _),
    "embed_evens_checked" -> (SimilarityQueries.buildEmbedStoreChecked _),
    "ivf_evens" -> (SimilarityQueries.buildIvfEvensTemplate _),
    "ivf_full" -> (SimilarityQueries.buildIvfIndex _),
    "ivf_labeled" -> (SimilarityQueries.buildLabeledIvfStore _),
    "lsh_bands" -> (DedupQueries.buildLshStore _),
    "pq_full" -> ((s: SparkSession, dir: String, d: String) =>
      SimilarityQueries.buildPqStore(s, dir, d)),
    "text_70" -> (RetrievalQueries.buildText70Template _),
    "text_ba" -> (RetrievalQueries.buildTextBaTemplate _),
    "text_full" -> (RetrievalQueries.buildTextFullTemplate _))

  private val byKind = all.toMap

  /** The query-side entry: copy `(kind, sfDir)`'s template into `dest`
    * (building it first iff this process hasn't), using the ONE
    * registered builder — call sites cannot drift from the registry.
    */
  def cloneInto(kind: String, spark: SparkSession, sfDir: String,
      dest: String): Unit =
    graft.sources.StoreFixtures.cloneInto(kind, sfDir, dest)(
      d => byKind(kind)(spark, sfDir, d))

  /** Pre-build every registered template for `sfDir`, returning
    * per-kind build seconds (0 when already cached). [[graft.Bench]]
    * runs this in its untimed warm-up and discloses the seconds as a
    * separate JSON field — template cost is real, reported, and
    * outside every per-query measurement.
    */
  def prewarm(spark: SparkSession, sfDir: String): Seq[(String, Double)] =
    all.map { case (kind, b) =>
      val t0 = System.nanoTime()
      graft.sources.StoreFixtures.ensureTemplate(kind, sfDir)(
        d => b(spark, sfDir, d))
      (kind, (System.nanoTime() - t0) / 1e9)
    }
}
