package graft.operators

import graft.SparkSpec

/** SemDeDup semantics: the cluster-bounded greedy must equal an
  * independent in-memory recomputation (assignment + cosines + the
  * index-ordered rule), and the quadratic must stay inside cells.
  */
class SemDedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("semdedup equals the independently recomputed index-ordered greedy") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val cell = SimilarityQueries
      .probeAssignments(spark, dir, SimilarityQueries.KmIters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var i = 0; var d = 0.0; var na = 0.0; var nb = 0.0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    // index-ordered greedy: removed iff ANY earlier same-cell vector is
    // within threshold; keeper = the max-cos such vector (ties: lower id)
    val expected = (for {
      y <- e.keys.toSeq
      quals = e.keys.toSeq
        .filter(x => x < y && cell(x) == cell(y) && cos(e(x), e(y)) >= 0.35)
      if quals.nonEmpty
    } yield {
      val keeper = quals.maxBy(x => (cos(e(x), e(y)), -x))
      (y, keeper, cell(y))
    }).toSet

    val got = SimilarityQueries.qSemDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty, "fixture must exercise the removal path")
    assert(got == expected,
      s"greedy mismatch: extra=${got -- expected} missing=${expected -- got}")
  }

  test("removed fraction is a proper subset and keepers are never removed ids' successors") {
    val rows = SimilarityQueries.qSemDedup(spark, dir).collect()
    val removed = rows.map(_.getLong(0)).toSet
    // the greedy guarantees a keeper precedes what it removes; it does
    // NOT guarantee the keeper itself survived (the paper's rule) — but
    // id order still bounds chains: keeper < removed always
    assert(rows.forall(r => r.getLong(1) < r.getLong(0)))
    assert(removed.size < 500, "must keep something")
  }
}
