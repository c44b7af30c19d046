package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}
import graft.sources.{IndexCatalog, StoreConstraints}

/** CHECK-constraint contracts (q_store_constraint's mechanism): a
  * violating batch is rejected atomically before anything is written,
  * one bad row poisons the whole batch, NULL predicates are
  * violations, an unconstrained store accepts anything, and a later
  * declaration supersedes (newest live version wins).
  */
class StoreConstraintSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def emb(pred: org.apache.spark.sql.Column) =
    Engine.table(spark, dir, "embeddings")
      .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
      .filter(pred)

  private def buildChecked(base: String): Unit =
    SimilarityQueries.buildEmbedStoreChecked(spark, dir, base)

  test("a violating batch is rejected atomically: store byte-identical, nothing committed") {
    val base = Files.createTempDirectory("graft_chksp").toString
    try {
      buildChecked(base)
      val files = IndexCatalog.latestFiles(base)
      val sums = files.map(f => f -> graft.TestHash.sha256(f)).toMap
      val batch = emb(pmod(col("vec_id"), lit(4)) === 1)
      val n = batch.count()
      val bad = batch
        .withColumn("embedding", expr("cast(array() as array<float>)"))
        .withColumn("nrm", lit(0.0))
      val e = intercept[IllegalArgumentException] {
        SimilarityQueries.writeEmbedGen(spark,
          StoreConstraints.enforce(bad, base), base)
      }
      assert(e.getMessage.contains("CHECK constraint violated"))
      assert(e.getMessage.contains(s"$n row(s)"), e.getMessage)
      assert(IndexCatalog.currentVersion(base) == 1)
      assert(IndexCatalog.listDataFiles(s"$base/corpus").toSet == files.toSet)
      files.foreach(f =>
        assert(graft.TestHash.sha256(f) == sums(f), s"rejected append touched $f"))

      // one bad row poisons the whole batch — commit is all-or-nothing
      val oneBad = batch
        .withColumn("embedding", when(col("vec_id") === 1,
          expr("cast(array() as array<float>)")).otherwise(col("embedding")))
        .withColumn("nrm",
          when(col("vec_id") === 1, lit(0.0)).otherwise(col("nrm")))
      val e2 = intercept[IllegalArgumentException] {
        SimilarityQueries.writeEmbedGen(spark,
          StoreConstraints.enforce(oneBad, base), base)
      }
      assert(e2.getMessage.contains("1 row(s)"))
      assert(IndexCatalog.currentVersion(base) == 1)

      // the clean batch passes the same gate and commits
      SimilarityQueries.writeEmbedGen(spark,
        StoreConstraints.enforce(batch, base), base)
      assert(IndexCatalog.currentVersion(base) == 2)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("NULL predicates are violations; unconstrained stores accept anything") {
    val base = Files.createTempDirectory("graft_chknull").toString
    try {
      buildChecked(base)
      // a NULL norm makes `nrm > 0` evaluate NULL — strict CHECK
      // semantics count that as a violation, not a pass
      val nullBatch = emb(pmod(col("vec_id"), lit(4)) === 1)
        .withColumn("nrm", lit(null).cast("double"))
      val e = intercept[IllegalArgumentException] {
        StoreConstraints.enforce(nullBatch, base)
      }
      assert(e.getMessage.contains("CHECK constraint violated"))

      // no declaration, no gate: the same batch passes enforce verbatim
      val free = Files.createTempDirectory("graft_chkfree").toString
      try {
        SimilarityQueries.buildEmbedStore(spark, dir, free)
        assert(StoreConstraints.constraintOf(free).isEmpty)
        assert(StoreConstraints.enforce(nullBatch, free) eq nullBatch)
      } finally graft.Fs.deleteRecursively(free)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("re-declaration supersedes: the newest live version's constraint governs") {
    val base = Files.createTempDirectory("graft_chkre").toString
    try {
      buildChecked(base)
      assert(StoreConstraints.constraintOf(base)
        .contains(SimilarityQueries.EmbedCheck))
      // a later commit relaxes the constraint; enforcement follows it
      SimilarityQueries.writeEmbedGen(spark,
        emb(pmod(col("vec_id"), lit(4)) === 1), base,
        Seq(StoreConstraints.declareTag("size(embedding) >= 0")))
      assert(StoreConstraints.constraintOf(base)
        .contains("size(embedding) >= 0"))
      val zeroNrm = emb(pmod(col("vec_id"), lit(8)) === 3)
        .withColumn("nrm", lit(0.0))
      // passes the relaxed constraint (would fail the original)
      StoreConstraints.enforce(zeroNrm, base)
    } finally graft.Fs.deleteRecursively(base)
  }
}
