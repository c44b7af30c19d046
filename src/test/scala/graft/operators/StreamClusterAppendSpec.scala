package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}
import graft.sources.IndexCatalog

/** Exactly-once and convergence contracts of the STREAMED
  * cluster-assignment maintenance (`q_stream_cluster_append`): each
  * micro-batch publishes one tagged rewrite-commit, a replayed
  * batchId changes nothing, and the per-batch merges finalize to the
  * same assignment a from-scratch solve produces.
  */
class StreamClusterAppendSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def docs = Engine.table(spark, dir, "documents")

  private def slicedFeed() = {
    val es = DedupQueries.cappedPairs(docs).select(col("i"), col("j"))
      .withColumn("sl", greatest(
        expr("CASE WHEN i % 2 = 0 THEN -1 ELSE pmod(i div 2, 3) END"),
        expr("CASE WHEN j % 2 = 0 THEN -1 ELSE pmod(j div 2, 3) END")))
      .localCheckpoint()
    val oddNodes = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id").as("i"), expr("CAST(NULL AS BIGINT)").as("j"),
        expr("pmod(doc_id div 2, 3)").as("sl"))
    (es, oddNodes)
  }

  private def baseStore(es: org.apache.spark.sql.DataFrame): String = {
    val store = Files.createTempDirectory("graft_sca_spec").toString
    val (baseLabels, _) = DedupQueries.starComponents(
      docs.filter(col("doc_id") % 2 === 0).select(col("doc_id").as("node")),
      es.filter(col("sl") === -1).select(col("i"), col("j")))
    StreamingQueries.commitClusterBase(baseLabels, store)
    store
  }

  private def sha(p: String): String = graft.TestHash.sha256(p)

  private def partOf(f: String): String =
    IndexCatalog.partitionKey(f).getOrElse(fail(s"unpartitioned file $f"))

  test("a micro-batch publishes one tagged rewrite; a REPLAY publishes nothing") {
    val (es, oddNodes) = slicedFeed()
    val store = baseStore(es)
    try {
      val batch0 = oddNodes.filter(col("sl") === 0).select(col("i"), col("j"))
        .unionByName(es.filter(col("sl") === 0).select(col("i"), col("j")))
        .localCheckpoint() // stable across the replay below
      assert(StreamingQueries.commitClusterBatch(spark, batch0, store, 0L))
      assert(IndexCatalog.currentVersion(store) == 2)
      assert(IndexCatalog.tags(store, 2) == Seq("ingest-batch=0"))
      val v2 = IndexCatalog.files(store, 2)

      assert(!StreamingQueries.commitClusterBatch(spark, batch0, store, 0L))
      assert(IndexCatalog.currentVersion(store) == 2)
      assert(IndexCatalog.files(store, 2) == v2)

      assert(!StreamingQueries.commitClusterBatch(
        spark, batch0.filter(lit(false)), store, 1L))
      assert(IndexCatalog.currentVersion(store) == 2)
    } finally graft.Fs.deleteRecursively(store)
  }

  test("replay AFTER the tag expired re-commits identical content, no duplicate nodes") {
    val (es, oddNodes) = slicedFeed()
    val store = baseStore(es)
    try {
      val batch0 = oddNodes.filter(col("sl") === 0).select(col("i"), col("j"))
        .unionByName(es.filter(col("sl") === 0).select(col("i"), col("j")))
        .localCheckpoint()
      assert(StreamingQueries.commitClusterBatch(spark, batch0, store, 0L))
      // a later batch supersedes batch 0's manifest, then retain=1
      // expires it — the guard forgets batch 0
      val batch1 = oddNodes.filter(col("sl") === 1).select(col("i"), col("j"))
        .unionByName(es.filter(col("sl") === 1).select(col("i"), col("j")))
      assert(StreamingQueries.commitClusterBatch(spark, batch1, store, 1L))
      val assigned = spark.read
        .parquet(IndexCatalog.latestFiles(store): _*)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      IndexCatalog.vacuum(store, retain = 1)
      assert(!IndexCatalog.committedTags(store).contains("ingest-batch=0"))
      // the stale replay slips past the guard; the node anti-join and
      // self-loop contraction make the published content IDENTICAL —
      // one redundant version, zero duplicate assignment rows
      assert(StreamingQueries.commitClusterBatch(spark, batch0, store, 0L))
      val rows = spark.read
        .parquet(IndexCatalog.latestFiles(store): _*)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      assert(rows.length == rows.map(_._1).distinct.length)
      assert(rows.toMap == assigned)
    } finally graft.Fs.deleteRecursively(store)
  }

  test("a batch touching one component rewrites only its partitions; the rest carry forward byte-identical") {
    val (es, _) = slicedFeed()
    val store = baseStore(es)
    try {
      val v1 = IndexCatalog.files(store, 1)
      // even-only base: exactly the even node-hash partitions exist
      assert(v1.map(partOf).toSet == Set(0L, 2L, 4L, 6L).map(p => s"part=$p"))
      val v1Sha = v1.map(f => f -> sha(f)).toMap
      // one stored even node in a SINGLETON component + one brand-new
      // node: the merge touches exactly those two nodes' partitions
      val singleton = spark.read.parquet(v1: _*)
        .groupBy(col("comp")).agg(count(lit(1)).as("n"), min(col("node")).as("m"))
        .filter(col("n") === 1).agg(min(col("m"))).collect()(0).getLong(0)
      val fresh = spark.read.parquet(v1: _*)
        .agg(max(col("node"))).collect()(0).getLong(0) + 1001 // odd: evens + odd offset
      val batch = spark.createDataFrame(java.util.Arrays.asList(
        org.apache.spark.sql.Row(fresh, null.asInstanceOf[java.lang.Long]),
        org.apache.spark.sql.Row(fresh, java.lang.Long.valueOf(singleton))),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("i", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("j", org.apache.spark.sql.types.LongType))))
      assert(StreamingQueries.commitClusterBatch(spark, batch, store, 0L))

      val v2 = IndexCatalog.files(store, 2)
      val touched = Set(fresh % StreamingQueries.ClusterParts,
        singleton % StreamingQueries.ClusterParts).map(p => s"part=$p")
      // only the touched partitions' files are new; every other
      // partition carries forward BY PATH and byte-identical
      val (replaced, carried) = v2.partition(f => touched.contains(partOf(f)))
      assert(replaced.nonEmpty && replaced.forall(f => !v1.contains(f)))
      // the new node's odd partition is created, the singleton's even
      // partition is replaced — both appear only among the new files
      assert(replaced.map(partOf).toSet == touched)
      assert(carried.nonEmpty)
      assert(carried.toSet == v1.filterNot(f => touched.contains(partOf(f))).toSet)
      assert(carried.forall(f => sha(f) == v1Sha(f)))
      // content: the new node joined the singleton's component
      val merged = spark.read.parquet(v2: _*)
      assert(merged.filter(col("node") === fresh)
        .collect()(0).getAs[Long]("comp") == singleton)
      assert(merged.count() == spark.read.parquet(v1: _*).count() + 1)
    } finally graft.Fs.deleteRecursively(store)
  }

  test("three streamed merges finalize to the from-scratch assignment") {
    val (es, oddNodes) = slicedFeed()
    val store = baseStore(es)
    try {
      (0 until 3).foreach { s =>
        val batch = oddNodes.filter(col("sl") === s).select(col("i"), col("j"))
          .unionByName(es.filter(col("sl") === s).select(col("i"), col("j")))
        assert(StreamingQueries.commitClusterBatch(spark, batch, store, s.toLong))
      }
      assert(IndexCatalog.currentVersion(store) == 4) // base + 3 batches
      val streamed = spark.read
        .parquet(IndexCatalog.latestFiles(store): _*)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val (full, _) = DedupQueries.starComponents(
        docs.select(col("doc_id").as("node")),
        es.select(col("i"), col("j")))
      val scratch = full.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == scratch)
    } finally graft.Fs.deleteRecursively(store)
  }
}
