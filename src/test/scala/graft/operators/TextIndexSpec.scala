package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}
import graft.sources.IndexCatalog

/** Persisted inverted-index contracts (q_bm25_persisted's mechanism):
  * probes read ONLY the query terms' partitions, appends supersede the
  * corpus-stats tag without touching prior generations, and the pruned
  * probe over build ∪ append equals the direct BM25 ranking.
  */
class TextIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("build + append: stats tag supersedes, old generation files byte-identical") {
    val base = Files.createTempDirectory("graft_tidx_spec").toString
    try {
      val docs = Engine.table(spark, dir, "documents")
      RetrievalQueries.writeTextIndexGen(spark,
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 7), base)
      assert(IndexCatalog.currentVersion(base) == 1)
      val v1Files = IndexCatalog.files(base, 1)
      val v1Sums = v1Files.map(f => f -> graft.TestHash.sha256(f)).toMap
      val v1Tags = IndexCatalog.tags(base, 1)
      assert(v1Tags.exists(_.startsWith("corpus_stats=")))

      RetrievalQueries.writeTextIndexGen(spark,
        docs.filter(pmod(col("doc_id"), lit(10)) === 7), base)
      assert(IndexCatalog.currentVersion(base) == 2)
      // append = strictly additive generation; prior files untouched
      val v2Files = IndexCatalog.files(base, 2)
      v1Sums.foreach { case (f, sum) =>
        assert(v2Files.contains(f), s"append dropped $f")
        assert(graft.TestHash.sha256(f) == sum, s"append mutated $f")
      }
      // superseding stats equal the WHOLE corpus census
      val tag = IndexCatalog.tags(base, 2)
        .find(_.startsWith("corpus_stats=")).get
      val Array(n, t) = tag.stripPrefix("corpus_stats=").split(":")
      val direct = docs.agg(count(lit(1)),
        sum(size(split(col("text"), " "))).cast("long")).collect()(0)
      assert(n.toLong == direct.getLong(0) && t.toLong == direct.getLong(1))

      // an empty append batch is a no-op, not a new version or an NPE
      RetrievalQueries.writeTextIndexGen(spark, docs.limit(0), base)
      assert(IndexCatalog.currentVersion(base) == 2)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("probe reads only the query terms' partitions and equals the direct ranking") {
    val base = Files.createTempDirectory("graft_tidx_spec2").toString
    try {
      val docs = Engine.table(spark, dir, "documents")
      RetrievalQueries.writeTextIndexGen(spark,
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 7), base)
      RetrievalQueries.writeTextIndexGen(spark,
        docs.filter(pmod(col("doc_id"), lit(10)) === 7), base)

      // file-census pruning: the probe's input files are a strict
      // subset keyed by exactly the query terms
      val terms = Seq(2L -> "vector", 2L -> "dup")
      val all = IndexCatalog.latestFiles(base)
      val touched = all.filter(f => IndexCatalog.partitionKey(f)
        .exists(Set("tok=vector", "tok=dup").contains))
      assert(touched.nonEmpty && touched.size < all.size,
        s"pruning must cut the file census (${touched.size}/${all.size})")

      // the pruned probe equals the direct (unpersisted) ranking on
      // the SAME corpus — bit-equal integers, same tie-breaks
      val probed = RetrievalQueries.probeTextIndex(spark, base, terms, 10)
        .orderBy("query_id", "rk").collect().toSeq
      val direct = RetrievalQueries.qBm25(spark, dir)
        .filter(col("query_id") === 2).orderBy("rk").collect().toSeq
      assert(probed.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))) ==
        direct.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))))
    } finally graft.Fs.deleteRecursively(base)
  }

  test("a probe of never-indexed terms returns an empty, well-typed frame") {
    val base = Files.createTempDirectory("graft_tidx_spec3").toString
    try {
      val docs = Engine.table(spark, dir, "documents")
      RetrievalQueries.writeTextIndexGen(spark, docs, base)
      val out = RetrievalQueries.probeTextIndex(spark, base,
        Seq(1L -> "nosuchterm"), 10)
      assert(out.columns.toSeq == Seq("query_id", "rk", "doc_id", "score"))
      assert(out.count() == 0)
    } finally graft.Fs.deleteRecursively(base)
  }
}
