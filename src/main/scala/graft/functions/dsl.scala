package graft.functions

import org.apache.spark.sql.{Column, functions => F}

/** Column-DSL for graft's custom functions, so DataFrame-API users get
  * typed entry points instead of `expr("count300k(...)")` strings.
  * Requires the functions to be registered on the session
  * ([[graft.Engine.register]] or `spark.sql.extensions`).
  */
object dsl {

  /** Exact multi-instance distinct count (the reference's operator);
    * non-string inputs are cast like the SQL surface does.
    */
  def count300k(c: Column): Column =
    F.call_function("count300k", c)

  /** Codegen'd double dot product over float/double arrays. */
  def vec_dot(a: Column, b: Column): Column =
    F.call_function("vec_dot", a, b)

  /** The reference's FNV-1a 64 hash (hashset-count.cc:49-59). */
  def fnv64(c: Column): Column =
    F.call_function("fnv64", c)

  /** Cosine similarity from one dot product given precomputed norms. */
  def cosine(a: Column, aNorm: Column, b: Column, bNorm: Column): Column =
    vec_dot(a, b) / (aNorm * bNorm)

  /** L2 norm of a vector column. */
  def vec_norm(c: Column): Column = F.sqrt(vec_dot(c, c))

  /** Exact intersection size of two sorted, duplicate-free string
    * arrays (zero-allocation merge walk; see
    * [[graft.functions.SortedInterCount]] for the input contract).
    */
  def sorted_inter_count(a: Column, b: Column): Column =
    F.call_function("sorted_inter_count", a, b)

  /** Exact edit distance when <= cap, cap + 1 beyond it — trim +
    * banded DP, O(cap * L) per pair instead of the built-in
    * `levenshtein`'s full O(L^2) (see
    * [[graft.functions.LevenshteinCapped]]). The edit-dedup verify
    * primitive.
    */
  def levenshtein_capped(a: Column, b: Column, cap: Int): Column =
    F.call_function("levenshtein_capped", a, b, F.lit(cap))

  /** Threshold-gated [[sorted_inter_count]] with early exit: the exact
    * intersection size when the pair's Jaccard reaches `tn/td`, else
    * -1 after touching only an array prefix (see
    * [[graft.functions.SortedInterAtLeast]]). The verification
    * primitive for high-threshold near-dup pipelines.
    */
  def sorted_inter_atleast(a: Column, b: Column, tn: Int, td: Int): Column =
    F.call_function("sorted_inter_atleast", a, b, F.lit(tn), F.lit(td))

  /** Exact distinct-set sketch over a string column (BINARY,
    * [[SketchWire]] format) — count300k's mergeable state as a
    * persistable column. Size ∝ distinct values in the group.
    */
  def sketch_agg(c: Column): Column =
    F.call_function("sketch_agg", c)

  /** Union stored [[sketch_agg]] sketches (the day → month rollup). */
  def sketch_merge(c: Column): Column =
    F.call_function("sketch_merge", c)

  /** Finalize a sketch: exact distinct count as STRING, NULL for the
    * empty sketch — `count300k`'s finalize contract over stored state.
    */
  def sketch_count(c: Column): Column =
    F.call_function("sketch_count", c)

  /** Fixed-size Bloom sketch over a key column (Spark's own
    * BloomFilterAggregate behind XxHash64 — the runtime-filter build
    * side, made explicit). Returns BINARY.
    */
  def bloom_agg(key: Column, nItems: Long, nBits: Long): Column =
    F.call_function("bloom_agg", key, F.lit(nItems), F.lit(nBits))

  /** Probe a [[bloom_agg]] sketch (false positives possible, no false
    * negatives) — pair with an exact semi-join to verify.
    */
  def bloom_contains(sketch: Column, key: Column): Column =
    F.call_function("bloom_contains", sketch, key)

  /** Misra–Gries heavy hitters: bounded mergeable frequency summary,
    * `array<struct<item,est,err>>` best-first with
    * `est ≤ true ≤ est + err`; exact (err 0) while per-group distinct
    * ≤ k. Non-string items are cast like the SQL surface does.
    */
  def mg_topk(item: Column, k: Int): Column =
    F.call_function("mg_topk", item, F.lit(k))
}
