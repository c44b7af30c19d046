package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}
import graft.sources.IndexCatalog

/** Schema evolution through the catalog (q_store_schema's mechanism):
  * adding a column is a manifest commit, never a data rewrite — the
  * pre-evolution generation's files stay byte-identical, the
  * pre-evolution VERSION resolves to a schema without the column at
  * all, and the post-evolution version NULL-fills it across old files
  * via mergeSchema.
  */
class StoreSchemaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def sha256(p: String): String = graft.TestHash.sha256(p)

  test("evolving a store adds a column without touching committed files; v1 schema lacks it") {
    val base = Files.createTempDirectory("graft_schevo").toString
    try {
      val docs = Engine.table(spark, dir, "documents")
      val g1 = IndexCatalog.newGenDir(base)
      docs.filter(col("doc_id") % 2 === 0)
        .select(col("doc_id"), md5(col("text")).as("digest"))
        .write.mode("overwrite").parquet(g1)
      IndexCatalog.commitFiles(base, IndexCatalog.listDataFiles(g1),
        Seq("schema=doc_id BIGINT, digest STRING"))
      val v1Sums = IndexCatalog.files(base, 1).map(f => f -> sha256(f)).toMap
      assert(v1Sums.nonEmpty)

      val g2 = IndexCatalog.newGenDir(base)
      docs.filter(col("doc_id") % 2 === 1)
        .select(col("doc_id"), md5(col("text")).as("digest"),
          length(col("text")).cast("long").as("doc_chars"))
        .write.mode("overwrite").parquet(g2)
      IndexCatalog.commitFiles(base, IndexCatalog.listDataFiles(g2),
        Seq("schema=doc_id BIGINT, digest STRING, doc_chars BIGINT"))

      // evolution rewrote nothing: v1's files are byte-identical and
      // still listed by v2 (append semantics, not copy-on-write)
      val v2Files = IndexCatalog.files(base, 2).toSet
      v1Sums.foreach { case (f, sum) =>
        assert(v2Files.contains(f), s"v2 manifest dropped $f")
        assert(sha256(f) == sum, s"evolution mutated committed file $f")
      }

      // the v1 snapshot's resolved schema has NO doc_chars — absence,
      // not NULL-fill: pre-evolution readers see the shape they wrote
      val v1 = spark.read.option("mergeSchema", "true")
        .parquet(IndexCatalog.files(base, 1): _*)
      assert(!v1.columns.contains("doc_chars"))

      // the v2 snapshot NULL-fills across generations: nulls exactly on
      // the pre-evolution (even doc_id) rows
      val v2 = spark.read.option("mergeSchema", "true")
        .parquet(IndexCatalog.files(base, 2): _*)
      assert(v2.columns.contains("doc_chars"))
      val fill = v2.groupBy((col("doc_id") % 2 === 0).as("pre_evolution"))
        .agg(count(lit(1)).as("n"), count(col("doc_chars")).as("n_filled"))
        .collect()
        .map(r => r.getBoolean(0) -> (r.getLong(1), r.getLong(2))).toMap
      val (nPre, fPre) = fill(true)
      val (nPost, fPost) = fill(false)
      assert(nPre > 0 && fPre == 0, "pre-evolution rows must be NULL-filled")
      assert(nPost > 0 && fPost == nPost, "evolved rows must carry the column")

      // the schema history is catalog metadata: one tag per commit
      assert(IndexCatalog.tags(base, 1) == Seq("schema=doc_id BIGINT, digest STRING"))
      assert(IndexCatalog.tags(base, 2) ==
        Seq("schema=doc_id BIGINT, digest STRING, doc_chars BIGINT"))
    } finally graft.Fs.deleteRecursively(base)
  }
}
