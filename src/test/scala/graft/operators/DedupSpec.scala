package graft.operators

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}

/** Semantics of the near-dup family beyond execution: LSH recall against
  * the exact all-pairs baseline, and SimHash fingerprint invariants.
  */
class DedupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** Exact word-Jaccard >= 0.9 pairs (brute force, the LSH ground truth). */
  private lazy val truePairs: Set[(Long, Long)] = {
    val s = Engine.table(spark, dir, "documents")
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
    val sizes = s.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    s.as("a").join(s.as("b"), col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.as("ci"), col("i") === col("ci.doc_id"))
      .join(sizes.as("cj"), col("j") === col("cj.doc_id"))
      .filter(col("inter") * 10 >= (col("ci.n") + col("cj.n") - col("inter")) * 9)
      .select(col("i"), col("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private lazy val lshPairs: Set[(Long, Long)] =
    DedupQueries.qMinhashLsh(spark, dir)
      .select(col("i"), col("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("LSH verified pairs are a subset of the exact >=0.9 pairs") {
    assert((lshPairs -- truePairs).isEmpty)
  }

  test("LSH recall >= 0.9 of exact >=0.9-Jaccard pairs (4x4 banding: ~0.986 expected)") {
    assert(truePairs.nonEmpty, "fixture should contain near-dup pairs")
    val recall = lshPairs.size.toDouble / truePairs.size
    assert(recall >= 0.9, s"recall=$recall (${lshPairs.size}/${truePairs.size})")
  }

  test("simhash fingerprints are 16-bit and cover every doc") {
    val rows = DedupQueries.qSimhash(spark, dir).collect()
    val nDocs = Engine.table(spark, dir, "documents").count()
    assert(rows.length == nDocs)
    assert(rows.forall { r =>
      val fp = r.getLong(1); fp >= 0 && fp < (1L << 16)
    })
  }

  test("identical docs get identical simhash (hash is content-deterministic)") {
    val fps = DedupQueries.qSimhash(spark, dir)
      .select("doc_id", "simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val again = DedupQueries.qSimhash(spark, dir)
      .select("doc_id", "simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps == again)
  }
}
