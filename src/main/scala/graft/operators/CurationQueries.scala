package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine

/** Corpus-curation operators a training-data pipeline runs between raw
  * ingest and tokenization: PII scrubbing, train→eval contamination
  * detection, degenerate-repetition scoring, and deterministic domain
  * mixture sampling. All outputs are integer-only (oracle-discipline:
  * no FP accumulation crosses the engine boundary) and every random
  * choice is an md5-prefix coin — bit-identical in Spark and DuckDB.
  */
object CurationQueries {

  /** Regexes shared by query and oracle. Written WITHOUT backslash
    * escapes (`[.]`, not `\.`): Spark SQL string literals process
    * backslashes while standard SQL strings do not, so an escaped
    * regex would silently differ between the two engines.
    */
  private val EmailRe = "[a-z0-9]+@[a-z]+[.][a-z]+"
  private val PhoneRe = "555-[0-9]+"

  /** Shard count for [[qEpochShuffle]] — the loader-visible unit of
    * the shuffled corpus (a worker reads one shard, a shard's rows
    * arrive in the epoch's deterministic order).
    */
  private val NEpochShards = 8

  /** EPOCH SHUFFLE — the deterministic reshuffle a training loader
    * applies between epochs, as an engine operator: each (epoch, doc)
    * gets a key `fnv64('e<epoch>:<doc_id>')` (the reference's own hash,
    * bit-parity proven by `q_fnv_bucket`), the SHARD is the key mod
    * [[NEpochShards]], and the within-shard ORDER is the key itself.
    * Changing the epoch changes every key, so both the shard placement
    * and the order reshuffle; replaying an epoch reproduces them
    * bit-identically (resumable training without persisting an order).
    *
    * The 100 TB point is what ISN'T here: no global sort. Sharding is
    * a hash mod (map-side), ordering is WITHIN-shard — one exchange on
    * (epoch, shard) and a shard-local sort, the hash-sharded layout
    * production loaders use precisely because a corpus-wide order-by
    * would funnel everything through one range boundary negotiation.
    * The census emits an order-sensitive integer signature per shard
    * (Σ (rank mod 7)·doc_id) so the oracle pins the ORDER, not just
    * membership — plus each shard's first-in-order doc and size
    * balance. Two epochs run here to pin the cross-epoch reshuffle; a
    * real loader streams one epoch at a time at no extra cost.
    */
  def qEpochShuffle(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Engine.register(spark) // fnv64
    val docs = Engine.table(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"))
    val epochs = spark.range(2).select(col("id").as("epoch"))
    val keyed = docs.crossJoin(epochs)
      .withColumn("h", expr("fnv64(concat('e', epoch, ':', doc_id))"))
      // unsigned view of the signed 64-bit hash — same DECIMAL(38)
      // bridge q_fnv_bucket pins hash-exact against DuckDB's UHUGEINT
      .withColumn("hu", expr(
        """CAST(h AS DECIMAL(38,0)) +
          |CASE WHEN h < 0 THEN CAST(18446744073709551616 AS DECIMAL(38,0))
          |     ELSE CAST(0 AS DECIMAL(38,0)) END""".stripMargin))
      .withColumn("shard", expr(s"CAST(hu % $NEpochShards AS BIGINT)"))
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("hu"), col("doc_id"))
    keyed
      .withColumn("rk", row_number().over(w).cast("long"))
      .groupBy(col("epoch"), col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("chars_sum"),
        sum(pmod(col("rk"), lit(7)) * col("doc_id")).cast("long").as("order_sig"),
        min(when(col("rk") === 1, col("doc_id"))).as("first_doc"))
      .orderBy("epoch", "shard")
  }

  /** PII scrub census. The fixture vocabulary contains no emails or
    * digits, so deterministic PII is INJECTED first (docs ≡ 0 mod 5
    * get an email, ≡ 1 mod 5 a phone number — both derived from
    * doc_id), then scrubbed with the shared regexes; the output is
    * the per-doc redaction census plus before/after lengths, which
    * the oracle reproduces by applying the same injection + scrub in
    * SQL. Redaction itself is a narrow map (regexp_replace is
    * codegen'd); nothing shuffles but the final sort.
    */
  def qPiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val docs = Engine.table(spark, dir, "documents")
    val injected = docs.withColumn("t2", concat(col("text"),
      when(col("doc_id") % 5 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com now")))
        .when(col("doc_id") % 5 === 1,
          concat(lit(" call 555-"), col("doc_id").cast("string"), lit(" today")))
        .otherwise(lit(""))))
    injected.select(
        col("doc_id"),
        size(expr(s"regexp_extract_all(t2, '$EmailRe', 0)")).cast("long").as("n_emails"),
        size(expr(s"regexp_extract_all(t2, '$PhoneRe', 0)")).cast("long").as("n_phones"),
        length(col("t2")).cast("long").as("len_raw"),
        length(
          regexp_replace(
            regexp_replace(col("t2"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>")).cast("long").as("len_scrubbed"))
      .orderBy("doc_id")
  }

  /** Train→eval contamination: for every EVAL document (the same
    * content-hash split as `q_train_split`, so the two queries agree
    * on membership), how many of its distinct 3-token shingles also
    * occur anywhere in the TRAIN corpus. An eval doc sharing most of
    * its shingles with training data is a leaked benchmark item — the
    * check every LLM data pipeline runs before publishing eval
    * numbers.
    *
    * Scale shape: the train side reduces to ONE distinct-shingle set
    * (shuffle keyed on shingle, map-side combined), and the shared
    * count comes from an INNER join of that set with the eval
    * shingles — deliberately not a left-outer from the eval side,
    * which could only ever build-broadcast the huge train set (Spark
    * cannot broadcast the left/streamed side of a LeftOuter join).
    * With the inner formulation the planner is free to broadcast the
    * small held-out eval side and stream the train set past it; eval
    * docs sharing nothing reappear via the left join against the
    * per-doc totals, which is eval-sized on both sides. The
    * per-shingle df cap of the capped-Jaccard query applies here too
    * if a hot shingle ever dominates (not needed at fixture scale).
    */
  def qContamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Engine.table(spark, dir, "documents")
    val isTrain = substring(md5(concat(lit("split1|"), col("text"))), 1, 1) < "d"
    val trainSh = DedupQueries.shingles(docs.filter(isTrain))
      .select(col("s")).distinct()
    val evalSh = DedupQueries.shingles(docs.filter(!isTrain))
    val totals = evalSh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"))
    val shared = evalSh.join(trainSh, "s")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("shared_n"))
    totals.join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("shared_n"), lit(0L)).as("n_shared"))
      .withColumn("contam_pct",
        floor(lit(100.0) * col("n_shared") / col("n_shingles")).cast("long"))
      .orderBy("doc_id")
  }

  /** Degenerate-repetition score: per doc, total 3-gram occurrences,
    * the count of the most-repeated 3-gram, and their ratio — the
    * standard quality filter for looping/boilerplate text (a doc whose
    * single hottest n-gram covers a large share of all n-grams is
    * degenerate output, not prose). Two keyed aggregations, linear in
    * corpus size; docs under 3 tokens drop out (no 3-grams), exactly
    * as in the Jaccard family.
    */
  def qRepetition(spark: SparkSession, dir: String): DataFrame = {
    val docs = Engine.table(spark, dir, "documents")
    val grams = docs
      .withColumn("tk", split(col("text"), " "))
      .filter(size(col("tk")) >= 3)
      .select(col("doc_id"),
        explode(expr("transform(sequence(1, size(tk)-2), i -> concat_ws(' ', slice(tk, i, 3)))")).as("s"))
    grams.groupBy(col("doc_id"), col("s")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_grams"),
        max(col("c")).cast("long").as("max_rep"),
        count(lit(1)).as("n_distinct_grams"))
      .withColumn("rep_pct",
        floor(lit(100.0) * col("max_rep") / col("n_grams")).cast("long"))
      .orderBy("doc_id")
  }

  /** Deterministic domain-mixture sampling: each source gets a target
    * acceptance rate of `(4 + srcnum % 8)/16` (25%–68.75%), and a doc
    * is kept iff the first hex char of a salted content md5 is below
    * the rate's hex threshold — the hash-coin idiom of
    * `q_train_split`, extended to per-stratum rates. Content-keyed
    * sampling means re-ingestion keeps the same docs, and exact
    * duplicates are kept or dropped TOGETHER across sources with the
    * same rate. One aggregate over the corpus; the census output is
    * what a mixture tuner consumes.
    */
  def qDomainMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Engine.table(spark, dir, "documents")
    // 'srcN' → N; rate threshold = hex digit at (4 + N % 8) + 1 (1-based).
    // Source-name contract: 'src' + decimal digits (the fixture's
    // generator invariant). The UNBOUNDED substring matches the oracle's
    // substr(source, 4) exactly, so any-length suffixes agree; a source
    // violating the contract yields NULL here (Spark's lenient cast)
    // but a hard cast error in DuckDB — loud on the oracle side, which
    // is where a contract break should surface.
    val thr = expr("substring('0123456789abcdef', 5 + cast(substring(source, 4) as int) % 8, 1)")
    val keep = substring(md5(concat(lit("mix|"), col("text"))), 1, 1) < thr
    docs.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(keep, 1L).otherwise(0L)).cast("long").as("n_sampled"),
        sum(when(keep, col("n_chars")).otherwise(0L)).cast("long").as("sampled_chars"))
      .withColumn("target_sixteenths",
        (lit(4) + expr("cast(substring(source, 4) as int) % 8")).cast("long"))
      .orderBy("source")
  }

  /** Temperature-weighted mixture sampling — the standard LLM data-mix
    * recipe (alpha-sampling over domains): a source's target share is
    * proportional to n_docs^alpha with alpha = 1/2, upweighting small
    * domains relative to proportional sampling. Exact-integer
    * discipline throughout: weight = floor(sqrt(n_docs)) is an exact
    * integer sqrt for BIGINT counts (IEEE correctly-rounded sqrt can't
    * cross an integer boundary below 2^52), the corpus budget is
    * `n_total div 4` docs, and each source's quota is
    * `(budget * weight) div sum(weight)`. Selection is a deterministic
    * hash-rank: docs rank by (salted md5, doc_id) within source and
    * the first `quota` win — re-ingestion reproduces the same sample
    * bit-for-bit. The rank is the honest cost of an EXACT quota (a
    * per-stratum sort); `q_domain_mix`'s rate-coin is the
    * constant-memory approximation when quota exactness isn't needed.
    * The per-source quota table is tiny at any corpus size →
    * broadcast; the only big exchange is the per-source rank shuffle.
    */
  def qMixTemperature(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Engine.table(spark, dir, "documents")
    val perSrc = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("weight", floor(sqrt(col("n_docs"))).cast("long"))
    val budgets = perSrc
      .crossJoin(broadcast(perSrc.agg(
        sum(col("weight")).as("sum_w"), sum(col("n_docs")).as("n_total"))))
      .withColumn("quota", expr("((n_total div 4) * weight) div sum_w"))
      .select(col("source").as("b_source"),
        col("n_docs"), col("weight"), col("quota"))
    val rk = Window.partitionBy(col("source"))
      .orderBy(md5(concat(lit("temp|"), col("text"))), col("doc_id"))
    docs
      .withColumn("rk", row_number().over(rk))
      .join(broadcast(budgets), col("source") === col("b_source"))
      .groupBy(col("source"))
      .agg(
        min(col("n_docs")).as("n_docs"),
        min(col("weight")).as("weight"),
        min(col("quota")).as("quota"),
        sum(when(col("rk") <= col("quota"), 1L).otherwise(0L))
          .cast("long").as("n_sampled"),
        sum(when(col("rk") <= col("quota"), col("n_chars")).otherwise(0L))
          .cast("long").as("sampled_chars"))
      .orderBy("source")
  }

  /** Quality gate against a GLOBAL data-derived threshold — the
    * curation pattern none of the fixed-rule filters above cover:
    * "keep documents at or above the corpus median length" requires a
    * statistic of the WHOLE corpus before any row can be judged. Two
    * passes, both scale-shaped: (1) the exact lower median of the
    * per-doc token count via the counting form — the corpus collapses
    * map-side to one row per DISTINCT token-count value (bounded by
    * the document-length domain, never by corpus size), a cumulative
    * window walks that bounded series, and the threshold is a ONE-ROW
    * frame; (2) the census joins that row back by broadcast — the
    * corpus is never re-shuffled, and no driver action materializes
    * the threshold (it stays a lazy 1-row broadcast, the same shape
    * as a dimension join). Threshold definition is pinned explicitly
    * on BOTH sides (smallest v with 2·count(≤v) ≥ n) rather than
    * trusting two engines' quantile functions to agree on ties.
    */
  def qQualityGate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Engine.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val counts = toks.groupBy(col("n_tokens")).agg(count(lit(1)).as("c"))
    // single-task window over DISTINCT length values only — the
    // document-length DOMAIN, same bounded-walk argument as q_median.
    // Both the running total AND the corpus size come out of the SAME
    // ordered window pass (n = the running total's final value), so
    // the counts subtree is referenced once and the threshold pass is
    // structurally one corpus scan — no reliance on exchange reuse.
    val ordered = Window.orderBy(col("n_tokens"))
    val cum = counts
      .withColumn("cum", sum(col("c")).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("c")).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val thr = cum
      .filter(col("cum") * 2 >= col("n"))
      .agg(min(col("n_tokens")).as("thr"))
    toks.crossJoin(broadcast(thr))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_tokens") >= col("thr"), 1L).otherwise(0L))
          .cast("long").as("n_kept"),
        sum(when(col("n_tokens") >= col("thr"), col("n_tokens"))
          .otherwise(0L)).cast("long").as("kept_tokens"))
      .orderBy("source")
  }

  /** The TRAINING-LOADER dataflow as ONE gated composition — token-
    * budget selection → context packing in subword units → epoch
    * shuffle, each stage's algebra individually oracle-pinned
    * elsewhere ([[TextQueries.qTokenBudget]], [[TextQueries.qPackTokens]],
    * [[qEpochShuffle]]); this query gates their COMPOSITION, which is
    * where loaders actually break:
    *  - pack boundaries are computed over the SELECTED docs only — a
    *    dropped document must not shift any later boundary (packing
    *    the raw corpus and filtering after gives different packs);
    *  - the shuffle's unit is the PACK, not the document (the loader
    *    ships context windows), keyed `fnv64('e0:<source>:<pack_id>')`
    *    so placement and order derive from the pack's identity;
    *  - the census pins every stage at once: `n_tokens` re-counts the
    *    budget cut, `n_packs`/`n_docs` pin the boundaries, `order_sig`
    *    (Σ (rank mod 7)·first_doc) pins the within-shard ORDER, and
    *    `first_pack_doc` pins each shard's head — a one-document
    *    disagreement anywhere in the chain shifts a row.
    *
    * 100 TB shape = the sum of its stages, all strata-parallel: one
    * rank window per source for the budget cut, one running sum per
    * source for packing, then a hash-mod shard (map-side) + within-
    * shard sort — no global pass anywhere; the corpus text leaves the
    * map side only as subword COUNTS.
    */
  def qLoaderPipeline(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Engine.register(spark) // fnv64
    // stage 1: per-source greedy token-budget cut (q_token_budget's algebra)
    val docs = Engine.table(spark, dir, "documents")
      .withColumn("n_tok",
        length(regexp_replace(expr(TextQueries.bpeSql("text")), " ", ""))
          .cast("long"))
      .withColumn("toks", split(col("text"), " "))
      .withColumn("quality",
        floor(lit(100.0) * size(array_distinct(col("toks"))) / size(col("toks")))
          .cast("long"))
    val wSel = Window.partitionBy(col("source"))
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = docs
      .withColumn("cum_sel", sum(col("n_tok")).over(wSel))
      .filter(col("cum_sel") - col("n_tok") < TextQueries.SourceTokenBudget)
      .select(col("doc_id"), col("source"), col("n_tok"))
    // stage 2: pack boundaries over the kept docs only (q_pack_tokens'
    // algebra, source-stratified to reuse stage 1's partitioning)
    val wPack = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packs = kept
      .withColumn("cum_pack", sum(col("n_tok")).over(wPack))
      .withColumn("pack_id",
        expr(s"(cum_pack - n_tok) div ${TextQueries.CtxTokens}"))
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("p_docs"),
        sum(col("n_tok")).cast("long").as("p_tokens"),
        min(col("doc_id")).as("first_doc"))
    // stage 3: epoch-0 shuffle of the packs (q_epoch_shuffle's algebra)
    val keyed = packs
      .withColumn("h", expr("fnv64(concat('e0:', source, ':', pack_id))"))
      .withColumn("hu", expr(
        """CAST(h AS DECIMAL(38,0)) +
          |CASE WHEN h < 0 THEN CAST(18446744073709551616 AS DECIMAL(38,0))
          |     ELSE CAST(0 AS DECIMAL(38,0)) END""".stripMargin))
      .withColumn("shard", expr(s"CAST(hu % $NEpochShards AS BIGINT)"))
    val wShard = Window.partitionBy(col("shard"))
      .orderBy(col("hu"), col("first_doc"))
    keyed
      .withColumn("rk", row_number().over(wShard).cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_packs"),
        sum(col("p_docs")).cast("long").as("n_docs"),
        sum(col("p_tokens")).cast("long").as("n_tokens"),
        sum(pmod(col("rk"), lit(7)) * col("first_doc")).cast("long")
          .as("order_sig"),
        min(when(col("rk") === 1, col("first_doc"))).as("first_pack_doc"))
      .orderBy("shard")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_loader_pipeline" -> (qLoaderPipeline _),
    "q_quality_gate" -> (qQualityGate _),
    "q_epoch_shuffle" -> (qEpochShuffle _),
    "q_pii_scrub" -> (qPiiScrub _),
    "q_contamination" -> (qContamination _),
    "q_repetition" -> (qRepetition _),
    "q_domain_mix" -> (qDomainMix _),
    "q_mix_temperature" -> (qMixTemperature _)
  )

  val oracles: Map[String, String] = Map(
    // the three loader stages as staged CTEs — the same BPE replace
    // chain, the same greedy budget rule, pack boundaries over kept
    // docs only, the same fnv64 UHUGEINT bridge and (hu, first_doc)
    // tie-break, the same order-sensitive shard signature
    "q_loader_pipeline" ->
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |         length(replace(${TextQueries.bpeSql("text")}, ' ', '')) AS n_tok,
         |         CAST(floor(100.0 * len(list_distinct(string_split(text, ' ')))
         |              / len(string_split(text, ' '))) AS BIGINT) AS quality
         |  FROM documents),
         |sel AS (
         |  SELECT doc_id, source, n_tok,
         |         sum(n_tok) OVER (PARTITION BY source
         |                          ORDER BY quality DESC, doc_id
         |                          ROWS UNBOUNDED PRECEDING) AS cum_sel
         |  FROM t),
         |kept AS (SELECT doc_id, source, n_tok FROM sel
         |         WHERE cum_sel - n_tok < ${TextQueries.SourceTokenBudget}),
         |pk AS (
         |  SELECT doc_id, source, n_tok,
         |         sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |                          ROWS UNBOUNDED PRECEDING) AS cum_pack
         |  FROM kept),
         |packs AS (
         |  SELECT source, (cum_pack - n_tok) // ${TextQueries.CtxTokens} AS pack_id,
         |         count(*) AS p_docs, sum(n_tok) AS p_tokens,
         |         min(doc_id) AS first_doc
         |  FROM pk GROUP BY 1, 2),
         |keyed AS (
         |  SELECT p_docs, p_tokens, first_doc,
         |         list_reduce(
         |           list_prepend(CAST(14695981039346656037 AS UHUGEINT),
         |             list_transform(range(1, length(s)+1),
         |                            i -> CAST(ord(s[i]) AS UHUGEINT))),
         |           (acc, c) -> (xor(acc, c) * 1099511628211) % 18446744073709551616
         |         ) AS hu
         |  FROM (SELECT *, concat('e0:', source, ':', CAST(pack_id AS VARCHAR)) AS s
         |        FROM packs)),
         |sharded AS (
         |  SELECT p_docs, p_tokens, first_doc,
         |         CAST(hu % $NEpochShards AS BIGINT) AS shard,
         |         row_number() OVER (PARTITION BY hu % $NEpochShards
         |                            ORDER BY hu, first_doc) AS rk
         |  FROM keyed)
         |SELECT shard, count(*) AS n_packs,
         |       CAST(sum(p_docs) AS BIGINT) AS n_docs,
         |       CAST(sum(p_tokens) AS BIGINT) AS n_tokens,
         |       CAST(sum((rk % 7) * first_doc) AS BIGINT) AS order_sig,
         |       min(CASE WHEN rk = 1 THEN first_doc END) AS first_pack_doc
         |FROM sharded GROUP BY shard ORDER BY shard""".stripMargin,
    // the threshold definition (smallest v with 2*count(<=v) >= n) is
    // spelled out identically on both sides — no quantile-function
    // tie-semantics are trusted across engines
    // the identical fnv64/shard/rank pipeline in SQL — UHUGEINT
    // list_reduce for the hash (the q_fnv_bucket bridge), the same
    // (hu, doc_id) tie-break, the same order-sensitive signature; a
    // placement, order, or balance divergence shifts a row
    "q_epoch_shuffle" ->
      """WITH base AS (
        |  SELECT doc_id, n_chars, epoch,
        |         concat('e', epoch, ':', doc_id) AS s
        |  FROM documents
        |  CROSS JOIN (SELECT unnest([0, 1]) AS epoch) e),
        |keyed AS (
        |  SELECT doc_id, n_chars, epoch,
        |         list_reduce(
        |           list_prepend(CAST(14695981039346656037 AS UHUGEINT),
        |             list_transform(range(1, length(s)+1),
        |                            i -> CAST(ord(s[i]) AS UHUGEINT))),
        |           (acc, c) -> (xor(acc, c) * 1099511628211) % 18446744073709551616
        |         ) AS hu
        |  FROM base),
        |sharded AS (
        |  SELECT epoch, doc_id, n_chars, hu,
        |         CAST(hu % 8 AS BIGINT) AS shard,
        |         row_number() OVER (PARTITION BY epoch, hu % 8
        |                            ORDER BY hu, doc_id) AS rk
        |  FROM keyed)
        |SELECT CAST(epoch AS BIGINT) AS epoch, shard,
        |       count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS chars_sum,
        |       CAST(sum((rk % 7) * doc_id) AS BIGINT) AS order_sig,
        |       min(CASE WHEN rk = 1 THEN doc_id END) AS first_doc
        |FROM sharded GROUP BY 1, 2 ORDER BY epoch, shard""".stripMargin,
    "q_quality_gate" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT n_tokens, count(*) AS c FROM t GROUP BY 1),
        |cum AS (SELECT n_tokens,
        |               sum(c) OVER (ORDER BY n_tokens
        |                            ROWS UNBOUNDED PRECEDING) AS cum
        |        FROM c),
        |n AS (SELECT count(*) AS n FROM t),
        |thr AS (SELECT min(n_tokens) AS thr FROM cum, n WHERE cum * 2 >= n)
        |SELECT source, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN n_tokens >= thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |       CAST(sum(CASE WHEN n_tokens >= thr THEN n_tokens ELSE 0 END) AS BIGINT) AS kept_tokens
        |FROM t, thr GROUP BY source ORDER BY source""".stripMargin,
    "q_pii_scrub" ->
      s"""WITH inj AS (
         |  SELECT doc_id, text ||
         |    CASE WHEN doc_id % 5 = 0
         |           THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
         |         WHEN doc_id % 5 = 1
         |           THEN ' call 555-' || CAST(doc_id AS VARCHAR) || ' today'
         |         ELSE '' END AS t2
         |  FROM documents)
         |SELECT doc_id,
         |       CAST(len(regexp_extract_all(t2, '$EmailRe')) AS BIGINT) AS n_emails,
         |       CAST(len(regexp_extract_all(t2, '$PhoneRe')) AS BIGINT) AS n_phones,
         |       CAST(length(t2) AS BIGINT) AS len_raw,
         |       CAST(length(regexp_replace(
         |              regexp_replace(t2, '$EmailRe', '<EMAIL>', 'g'),
         |              '$PhoneRe', '<PHONE>', 'g')) AS BIGINT) AS len_scrubbed
         |FROM inj ORDER BY doc_id""".stripMargin,
    "q_contamination" ->
      """WITH sp AS (
        |  SELECT doc_id, text,
        |         substr(md5('split1|' || text), 1, 1) < 'd' AS is_train
        |  FROM documents),
        |toks AS (SELECT doc_id, is_train, string_split(text, ' ') AS tk FROM sp
        |         WHERE len(string_split(text, ' ')) >= 3),
        |sh AS (SELECT DISTINCT doc_id, is_train, array_to_string(tk[i:i+2], ' ') AS s
        |       FROM toks, unnest(generate_series(1, len(tk)-2)) AS u(i)),
        |tr AS (SELECT DISTINCT s FROM sh WHERE is_train),
        |ev AS (SELECT doc_id, s FROM sh WHERE NOT is_train)
        |SELECT ev.doc_id, count(*) AS n_shingles, count(tr.s) AS n_shared,
        |       CAST(floor(100.0 * count(tr.s) / count(*)) AS BIGINT) AS contam_pct
        |FROM ev LEFT JOIN tr USING (s)
        |GROUP BY ev.doc_id ORDER BY doc_id""".stripMargin,
    "q_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
        |              WHERE len(string_split(text, ' ')) >= 3),
        |sh AS (SELECT doc_id, array_to_string(tk[i:i+2], ' ') AS s
        |       FROM toks, unnest(generate_series(1, len(tk)-2)) AS u(i)),
        |c AS (SELECT doc_id, s, count(*) AS c FROM sh GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_grams,
        |       CAST(max(c) AS BIGINT) AS max_rep,
        |       count(*) AS n_distinct_grams,
        |       CAST(floor(100.0 * max(c) / sum(c)) AS BIGINT) AS rep_pct
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_domain_mix" ->
      """SELECT source, count(*) AS n_docs,
        |       CAST(sum(CASE WHEN substr(md5('mix|' || text), 1, 1) <
        |                          substr('0123456789abcdef', 5 + CAST(substr(source, 4) AS INT) % 8, 1)
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        |       CAST(sum(CASE WHEN substr(md5('mix|' || text), 1, 1) <
        |                          substr('0123456789abcdef', 5 + CAST(substr(source, 4) AS INT) % 8, 1)
        |                     THEN n_chars ELSE 0 END) AS BIGINT) AS sampled_chars,
        |       CAST(4 + CAST(substr(source, 4) AS INT) % 8 AS BIGINT) AS target_sixteenths
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // alpha = 1/2 temperature weights, integer quota arithmetic, and
    // the same (salted md5, doc_id) rank — one sampling definition,
    // two engines
    "q_mix_temperature" ->
      """WITH ps AS (SELECT source, count(*) AS n_docs,
        |                   CAST(floor(sqrt(count(*))) AS BIGINT) AS weight
        |            FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(weight) AS BIGINT) AS sum_w,
        |             CAST(sum(n_docs) AS BIGINT) AS n_total FROM ps),
        |b AS (SELECT source, n_docs, weight,
        |             ((n_total // 4) * weight) // sum_w AS quota
        |      FROM ps CROSS JOIN t),
        |r AS (SELECT source, doc_id, n_chars,
        |             row_number() OVER (PARTITION BY source
        |                                ORDER BY md5('temp|' || text), doc_id) AS rk
        |      FROM documents)
        |SELECT r.source, CAST(min(b.n_docs) AS BIGINT) AS n_docs,
        |       min(b.weight) AS weight, CAST(min(b.quota) AS BIGINT) AS quota,
        |       CAST(sum(CASE WHEN rk <= quota THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
        |       CAST(sum(CASE WHEN rk <= quota THEN n_chars ELSE 0 END) AS BIGINT) AS sampled_chars
        |FROM r JOIN b ON r.source = b.source
        |GROUP BY r.source ORDER BY r.source""".stripMargin
  )
}
