package graft.operators

import graft.SparkSpec

/** Short-document degeneracy of the winnowing fingerprint: texts under
  * 8 chars must yield an empty fingerprint set and texts with fewer
  * than 16 grams the single clamped-window min — the contract the
  * fnv_grams/sliding_min expressions encode (and that the original HOF
  * formulation needed explicit CASE guards for, because Spark's
  * `sequence(1, n)` DESCENDS when n < 1).
  */
class WinnowSpec extends SparkSpec {

  private def winnow(texts: (Long, String)*) = {
    import spark.implicits._
    TextQueries.winnowFingerprints(
      texts.toDF("doc_id", "text")).collect()
  }

  test("documents shorter than one 8-gram produce an empty fingerprint set") {
    val rows = winnow((1L, ""), (2L, "short"), (3L, "1234567"))
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(1) == 0L, s"n_fp for doc ${r.getLong(0)}")
      assert(r.isNullAt(2) && r.isNullAt(3))
    }
  }

  test("documents with fewer than 16 8-grams winnow to the single global min") {
    val rows = winnow((1L, "exactly8"), (2L, "a bit longer text"))
    rows.foreach { r =>
      assert(r.getLong(1) == 1L, s"n_fp for doc ${r.getLong(0)}")
      assert(r.getLong(2) == r.getLong(3)) // min_fp == max_fp
    }
  }

  test("long documents keep the standard sliding-window fingerprints") {
    val long = ("the quick brown fox jumps over the lazy dog " * 4).trim
    val rows = winnow((1L, long))
    assert(rows.head.getLong(1) > 1L)
  }
}
