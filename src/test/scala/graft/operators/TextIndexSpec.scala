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

  test("compaction: one file per target partition, cold files byte-identical, probe unchanged") {
    val base = Files.createTempDirectory("graft_tidx_opt").toString
    try {
      val docs = Engine.table(spark, dir, "documents")
      RetrievalQueries.writeTextIndexGen(spark,
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 7), base)
      RetrievalQueries.writeTextIndexGen(spark,
        docs.filter(pmod(col("doc_id"), lit(10)) === 7), base)
      val toks = Seq("vector", "dup")
      val keys = toks.map(t => s"tok=$t").toSet
      val terms = Seq(2L -> "vector", 2L -> "dup")
      val before = RetrievalQueries.probeTextIndex(spark, base, terms, 10)
        .collect().map(_.toSeq).toSeq
      val (tgt0, cold0) = IndexCatalog.latestFiles(base)
        .partition(f => IndexCatalog.partitionKey(f).exists(keys.contains))
      assert(tgt0.groupBy(IndexCatalog.partitionKey).exists(_._2.size > 1),
        "fixture must fragment the target partitions for this test to bite")
      val coldSums = cold0.map(f => f -> graft.TestHash.sha256(f)).toMap

      RetrievalQueries.compactTextIndexPartitions(spark, base, toks)

      val (tgt1, cold1) = IndexCatalog.latestFiles(base)
        .partition(f => IndexCatalog.partitionKey(f).exists(keys.contains))
      assert(tgt1.groupBy(IndexCatalog.partitionKey).forall(_._2.size == 1),
        s"each compacted partition must hold ONE live file: $tgt1")
      assert(cold1.toSet == cold0.toSet, "cold partitions must carry by path")
      coldSums.foreach { case (f, sum) =>
        assert(graft.TestHash.sha256(f) == sum, s"compaction mutated cold $f")
      }
      val after = RetrievalQueries.probeTextIndex(spark, base, terms, 10)
        .collect().map(_.toSeq).toSeq
      assert(after == before, "compaction moved results, not just bytes")
    } finally graft.Fs.deleteRecursively(base)
  }

  test("delete: tombstone commit leaves postings untouched; probe equals a fresh index; compaction purges") {
    val base = Files.createTempDirectory("graft_tidx_del").toString
    val fresh = Files.createTempDirectory("graft_tidx_fresh").toString
    try {
      val docs = Engine.table(spark, dir, "documents")
      RetrievalQueries.writeTextIndexGen(spark, docs, base)
      val postSums = IndexCatalog.latestFiles(base)
        .map(f => f -> graft.TestHash.sha256(f)).toMap

      RetrievalQueries.deleteTextDocs(spark,
        docs.filter(pmod(col("doc_id"), lit(10)) === 7), base)

      // O(tombstone): every pre-delete posting file is live and byte-identical;
      // the only new file is the del=1 tombstone list
      val nowLive = IndexCatalog.latestFiles(base)
      postSums.foreach { case (f, sum) =>
        assert(nowLive.contains(f) && graft.TestHash.sha256(f) == sum,
          s"delete touched posting file $f")
      }
      val dels = nowLive.filterNot(postSums.contains)
      assert(dels.nonEmpty && dels.forall(f =>
        IndexCatalog.partitionKey(f).exists(_.startsWith("del="))),
        s"expected only del= tombstone files to be new: $dels")

      // the tombstoned probe answers as a fresh index over survivors would
      val terms = Seq(2L -> "vector", 2L -> "dup")
      RetrievalQueries.writeTextIndexGen(spark,
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 7), fresh)
      val probe = RetrievalQueries.probeTextIndex(spark, base, terms, 10)
      // the tombstone subtraction must be a broadcast anti-join — the
      // posting side streams, the (bounded) tombstone list ships
      val planStr = probe.queryExecution.executedPlan.toString
      assert(planStr.contains("BroadcastHashJoin") && planStr.contains("LeftAnti"),
        s"tombstones must anti-join by broadcast:\n$planStr")
      val got = probe.collect().map(_.toSeq).toSeq
      val want = RetrievalQueries.probeTextIndex(spark, fresh, terms, 10)
        .collect().map(_.toSeq).toSeq
      assert(got == want, "tombstoned probe diverged from the fresh index")

      // compaction makes the delete physical in the rewritten partitions
      RetrievalQueries.compactTextIndexPartitions(spark, base, Seq("vector", "dup"))
      val tgt = IndexCatalog.latestFiles(base).filter(f =>
        IndexCatalog.partitionKey(f).exists(Set("tok=vector", "tok=dup").contains))
      val purged = spark.read.option("basePath", s"$base/postings")
        .parquet(tgt: _*).filter(pmod(col("doc_id"), lit(10)) === 7)
      assert(purged.isEmpty, "compaction must purge tombstoned rows")
    } finally {
      graft.Fs.deleteRecursively(base); graft.Fs.deleteRecursively(fresh)
    }
  }

  test("streamed text micro-batch replay commits nothing (tag guard)") {
    val base = Files.createTempDirectory("graft_tidx_replay").toString
    try {
      val docs = Engine.table(spark, dir, "documents")
      RetrievalQueries.writeTextIndexGen(spark,
        docs.filter(pmod(col("doc_id"), lit(10)) < 7), base)
      val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 7)
        .select(col("doc_id"), col("text"))
      assert(StreamingQueries.commitTextBatch(spark, batch, base, 0L))
      val v = IndexCatalog.currentVersion(base)
      val stats = IndexCatalog.tags(base, v).find(_.startsWith("corpus_stats=")).get
      // the at-least-once replay window: same batchId arrives again
      assert(!StreamingQueries.commitTextBatch(spark, batch, base, 0L))
      assert(IndexCatalog.currentVersion(base) == v, "replay must not commit")
      assert(IndexCatalog.tags(base, v).find(_.startsWith("corpus_stats="))
        .contains(stats), "replay must not perturb the stats tag")
    } finally graft.Fs.deleteRecursively(base)
  }

  test("two RACING appends both land and the stats tag is the true running sum") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val base = Files.createTempDirectory("graft_tidx_race").toString
    try {
      val docs = Engine.table(spark, dir, "documents")
      RetrievalQueries.writeTextIndexGen(spark,
        docs.filter(pmod(col("doc_id"), lit(10)) < 6), base)
      // the race: two appenders prepare against the same predecessor;
      // the CAS loser must re-derive its superseding stats against the
      // winner's totals or the tag silently drops a batch
      val fs = Seq(
        docs.filter(pmod(col("doc_id"), lit(10)).isin(6, 7)),
        docs.filter(pmod(col("doc_id"), lit(10)).isin(8, 9))
      ).map(b => Future(RetrievalQueries.writeTextIndexGen(spark, b, base)))
      fs.foreach(Await.result(_, 120.seconds))
      assert(IndexCatalog.currentVersion(base) == 3)
      val tag = IndexCatalog.tags(base, 3)
        .find(_.startsWith("corpus_stats=")).get
      val Array(n, t) = tag.stripPrefix("corpus_stats=").split(":")
      val direct = docs.agg(count(lit(1)),
        sum(size(split(col("text"), " "))).cast("long")).collect()(0)
      assert(n.toLong == direct.getLong(0) && t.toLong == direct.getLong(1),
        s"racing appends lost a batch in the stats tag: $tag vs $direct")
    } finally graft.Fs.deleteRecursively(base)
  }

  test("re-issued DELETE is idempotent: no new version, stats tag unchanged") {
    val base = Files.createTempDirectory("graft_tidx_redel").toString
    try {
      val docs = Engine.table(spark, dir, "documents")
      RetrievalQueries.writeTextIndexGen(spark, docs, base)
      val doomed = docs.filter(pmod(col("doc_id"), lit(10)) === 7)
      RetrievalQueries.deleteTextDocs(spark, doomed, base)
      val v = IndexCatalog.currentVersion(base)
      val stats = IndexCatalog.tags(base, v).find(_.startsWith("corpus_stats=")).get
      RetrievalQueries.deleteTextDocs(spark, doomed, base) // replay
      assert(IndexCatalog.currentVersion(base) == v,
        "a replayed delete must not commit")
      assert(IndexCatalog.tags(base, v).find(_.startsWith("corpus_stats="))
        .contains(stats), "a replayed delete must not re-subtract stats")
    } finally graft.Fs.deleteRecursively(base)
  }

  test("two CONCURRENT deletes of overlapping ids subtract the stats exactly once") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val base = Files.createTempDirectory("graft_tidx_delrace").toString
    try {
      val docs = Engine.table(spark, dir, "documents")
      RetrievalQueries.writeTextIndexGen(spark, docs, base)
      // overlapping doom sets: mod-10 {7} and {7, 8} — the CAS loser's
      // prepare re-runs against the winner's tombstones, so the
      // overlap must drop out of its census instead of double-
      // subtracting from the stats tag
      val dooms = Seq(
        docs.filter(pmod(col("doc_id"), lit(10)) === 7),
        docs.filter(pmod(col("doc_id"), lit(10)).isin(7, 8)))
      dooms.map(d => Future(RetrievalQueries.deleteTextDocs(spark, d, base)))
        .foreach(Await.result(_, 120.seconds))
      val v = IndexCatalog.currentVersion(base)
      val tag = IndexCatalog.tags(base, v)
        .find(_.startsWith("corpus_stats=")).get
      val Array(n, t) = tag.stripPrefix("corpus_stats=").split(":")
      val direct = docs.filter(!pmod(col("doc_id"), lit(10)).isin(7, 8))
        .agg(count(lit(1)),
          sum(size(split(col("text"), " "))).cast("long")).collect()(0)
      assert(n.toLong == direct.getLong(0) && t.toLong == direct.getLong(1),
        s"overlapping concurrent deletes corrupted the stats tag: $tag")
      // and the live tombstone set holds each doomed id exactly once
      val dels = IndexCatalog.latestFiles(base)
        .filter(f => IndexCatalog.partitionKey(f).exists(_.startsWith("del=")))
      val ids = spark.read.option("basePath", s"$base/tombstones")
        .parquet(dels: _*).select("doc_id").collect().map(_.getLong(0))
      assert(ids.length == ids.distinct.length,
        "duplicate tombstone rows committed")
      val expected = docs.filter(pmod(col("doc_id"), lit(10)).isin(7, 8))
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids.toSet == expected)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("NULL-text rows neither index nor count: all-NULL batch is a total no-op") {
    val base = Files.createTempDirectory("graft_tidx_null").toString
    try {
      val docs = Engine.table(spark, dir, "documents")
      val half = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      RetrievalQueries.writeTextIndexGen(spark, half, base)
      val v1 = IndexCatalog.currentVersion(base)
      val stats1 = IndexCatalog.tags(base, v1)
        .find(_.startsWith("corpus_stats=")).get
      // an ALL-NULL-text micro-batch must be a version-less no-op —
      // before round 12 it skipped the commit but would have counted
      // its rows, so a later commit's running stats would diverge
      val nulls = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
        .withColumn("text", lit(null).cast("string"))
      RetrievalQueries.writeTextIndexGen(spark, nulls, base)
      assert(IndexCatalog.currentVersion(base) == v1, "all-NULL batch committed")
      // a MIXED batch indexes and counts only its non-NULL rows
      val mixed = docs.filter(pmod(col("doc_id"), lit(4)) === 1)
        .unionByName(docs.filter(pmod(col("doc_id"), lit(4)) === 3)
          .withColumn("text", lit(null).cast("string")))
      RetrievalQueries.writeTextIndexGen(spark, mixed, base)
      val v2 = IndexCatalog.currentVersion(base)
      assert(v2 == v1 + 1)
      val tag = IndexCatalog.tags(base, v2)
        .find(_.startsWith("corpus_stats=")).get
      val Array(n, t) = tag.stripPrefix("corpus_stats=").split(":")
      val direct = half.unionByName(docs.filter(pmod(col("doc_id"), lit(4)) === 1))
        .agg(count(lit(1)),
          sum(size(split(col("text"), " "))).cast("long")).collect()(0)
      assert(n.toLong == direct.getLong(0) && t.toLong == direct.getLong(1),
        s"mixed-batch stats counted NULL rows: $tag vs $direct")
    } finally graft.Fs.deleteRecursively(base)
  }

  test("DELETE interleaved with a streamed ingest replay: tag guard holds, stats stay the true sum") {
    val base = Files.createTempDirectory("graft_tidx_interleave").toString
    try {
      val docs = Engine.table(spark, dir, "documents")
      RetrievalQueries.writeTextIndexGen(spark,
        docs.filter(pmod(col("doc_id"), lit(10)) < 7), base)
      val batch = docs.filter(pmod(col("doc_id"), lit(10)) === 7)
        .select(col("doc_id"), col("text"))
      assert(StreamingQueries.commitTextBatch(spark, batch, base, 0L))
      // tombstone docs FROM THE STREAMED BATCH, then replay the batch
      // (the at-least-once window): the ingest-batch tag guard must
      // still skip it — the batch WAS committed; its docs being
      // deleted afterwards is history, not grounds to re-append
      val doomed = docs.filter(pmod(col("doc_id"), lit(20)) === 7)
      RetrievalQueries.deleteTextDocs(spark, doomed, base)
      val v = IndexCatalog.currentVersion(base)
      val stats = IndexCatalog.tags(base, v)
        .find(_.startsWith("corpus_stats=")).get
      assert(!StreamingQueries.commitTextBatch(spark, batch, base, 0L),
        "replay after delete re-committed the batch")
      assert(IndexCatalog.currentVersion(base) == v)
      assert(IndexCatalog.tags(base, v).find(_.startsWith("corpus_stats="))
        .contains(stats), "replay after delete perturbed the stats tag")
      // the stats tag equals the whole surviving corpus census
      val Array(n, t) = stats.stripPrefix("corpus_stats=").split(":")
      val direct = docs.filter(pmod(col("doc_id"), lit(10)) <= 7)
        .filter(pmod(col("doc_id"), lit(20)) =!= 7)
        .agg(count(lit(1)),
          sum(size(split(col("text"), " "))).cast("long")).collect()(0)
      assert(n.toLong == direct.getLong(0) && t.toLong == direct.getLong(1),
        s"stats tag drifted under delete+replay: $stats vs $direct")
      // and a re-issued delete of the SAME docs after the replay stays
      // a no-op — the tag mechanisms compose
      RetrievalQueries.deleteTextDocs(spark, doomed, base)
      assert(IndexCatalog.currentVersion(base) == v)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("compactions + vacuum past the stats-bearing commit: the carried tag still serves probes") {
    val base = Files.createTempDirectory("graft_tidx_vactag").toString
    try {
      val docs = Engine.table(spark, dir, "documents")
      RetrievalQueries.writeTextIndexGen(spark, docs, base) // v1: the only stats-bearing commit
      val direct = RetrievalQueries.probeTextIndex(spark, base,
        Seq(1L -> "vector", 2L -> "data"), 10).collect().toSeq
      // two tagless compaction commits push v1 out of a retain=1 window
      RetrievalQueries.compactTextIndexPartitions(spark, base, Seq("vector"))
      RetrievalQueries.compactTextIndexPartitions(spark, base, Seq("data"))
      assert(IndexCatalog.currentVersion(base) == 3)
      IndexCatalog.vacuum(base, retain = 1, orphanGraceMs = 0L)
      assert(IndexCatalog.liveVersions(base) == Seq(3))
      // before round 12 this sys.errored: no live manifest carried
      // corpus_stats=, though every posting byte survived
      val after = RetrievalQueries.probeTextIndex(spark, base,
        Seq(1L -> "vector", 2L -> "data"), 10).collect().toSeq
      assert(after == direct,
        "probe after compaction+vacuum diverged from the pre-vacuum ranking")
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

  /** Brute-force phrase tf straight off the raw text (1-based
    * element_at, start index i matches iff every term j sits at i+j) —
    * the spec-side mirror of the DuckDB oracle lambda.
    */
  private def brutePhrase(docs: org.apache.spark.sql.DataFrame,
      qid: Long, terms: Seq[String]): org.apache.spark.sql.DataFrame = {
    val cond = terms.zipWithIndex
      .map { case (t, j) => s"element_at(toks, cast(i + $j as int)) = '$t'" }
      .mkString(" AND ")
    docs.filter(col("text").isNotNull)
      .withColumn("toks", split(col("text"), " "))
      // if-guard: sequence(1, n) DESCENDS when n < 1 (a doc shorter
      // than the phrase), which would probe out-of-bounds ordinals
      .withColumn("ptf", expr(
        s"""if(size(toks) < ${terms.size}, 0L,
           |size(filter(sequence(1L, size(toks) - ${terms.size - 1}L),
           |            i -> $cond)))""".stripMargin)
        .cast("long"))
      .filter(col("ptf") > 0)
      .select(lit(qid).as("query_id"), col("doc_id"), col("ptf"))
  }

  test("phrase probe equals the brute-force adjacency recount, incl. a repeated-token phrase") {
    val base = Files.createTempDirectory("graft_tidx_phrase").toString
    try {
      val docs = Engine.table(spark, dir, "documents")
      RetrievalQueries.writeTextIndexGen(spark,
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 7), base)
      RetrievalQueries.writeTextIndexGen(spark,
        docs.filter(pmod(col("doc_id"), lit(10)) === 7), base)
      val phrases = Seq(1L -> Seq("fast", "spark"), 2L -> Seq("table", "table"),
        3L -> Seq("hash", "merge", "sort"))
      val got = RetrievalQueries.probePhrase(spark, base, phrases, 10)
        .orderBy("query_id", "rk").collect().toSeq
      import org.apache.spark.sql.expressions.Window
      val want = phrases.map { case (q, ts) => brutePhrase(docs, q, ts) }
        .reduce(_ unionByName _)
        .withColumn("rk", row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("ptf").desc, col("doc_id"))).cast("long"))
        .filter(col("rk") <= 10)
        .select(col("query_id"), col("rk"), col("doc_id"), col("ptf"))
        .orderBy("query_id", "rk").collect().toSeq
      assert(got == want, "phrase probe diverged from brute-force recount")
    } finally graft.Fs.deleteRecursively(base)
  }

  test("positions survive DELETE and compaction: tombstoned docs leave the phrase ranking; purge keeps it") {
    val base = Files.createTempDirectory("graft_tidx_phrase2").toString
    try {
      val docs = Engine.table(spark, dir, "documents")
      RetrievalQueries.writeTextIndexGen(spark, docs, base)
      val phrases = Seq(1L -> Seq("fast", "spark"))
      val before = RetrievalQueries.probePhrase(spark, base, phrases, 10)
        .orderBy("query_id", "rk").collect().toSeq
      assert(before.nonEmpty)
      // tombstone the top-ranked doc: the phrase probe must drop it
      val doomedId = before.head.getLong(2)
      RetrievalQueries.deleteTextDocs(spark,
        docs.filter(col("doc_id") === doomedId), base)
      val after = RetrievalQueries.probePhrase(spark, base, phrases, 10)
        .orderBy("query_id", "rk").collect().toSeq
      assert(!after.exists(_.getLong(2) == doomedId),
        "tombstoned doc still in the phrase ranking")
      import org.apache.spark.sql.expressions.Window
      val want = brutePhrase(docs.filter(col("doc_id") =!= doomedId),
        1L, Seq("fast", "spark"))
        .withColumn("rk", row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(col("ptf").desc, col("doc_id"))).cast("long"))
        .filter(col("rk") <= 10)
        .select(col("query_id"), col("rk"), col("doc_id"), col("ptf"))
        .orderBy("query_id", "rk").collect().toSeq
      assert(after == want, "post-delete phrase ranking diverged")
      // compaction rewrites the phrase partitions (purging the
      // tombstoned rows) and must carry the positional payload
      RetrievalQueries.compactTextIndexPartitions(spark, base,
        Seq("fast", "spark"))
      val purged = RetrievalQueries.probePhrase(spark, base, phrases, 10)
        .orderBy("query_id", "rk").collect().toSeq
      assert(purged == want, "phrase ranking changed across compaction")
      // byte-level: the rewritten files really dropped the doomed rows
      val tgt = IndexCatalog.latestFiles(base).filter(f =>
        IndexCatalog.partitionKey(f).exists(Set("tok=fast", "tok=spark")))
      val rows = spark.read.option("basePath", s"$base/postings")
        .parquet(tgt: _*).filter(col("doc_id") === doomedId)
      assert(rows.count() == 0, "compaction kept tombstoned posting rows")
    } finally graft.Fs.deleteRecursively(base)
  }

  /** Brute-force proximity tf straight off the raw text: the count of
    * ordered position pairs (s ∈ pos(a), p ∈ pos(b)) with
    * s < p ≤ s + w — the spec-side mirror of the DuckDB oracle lambda.
    */
  private def bruteProximity(docs: org.apache.spark.sql.DataFrame,
      qid: Long, a: String, b: String, w: Int): org.apache.spark.sql.DataFrame = {
    def positions(t: String) =
      s"""filter(sequence(1L, cast(size(toks) as long)),
         |       i -> element_at(toks, cast(i as int)) = '$t')""".stripMargin
    docs.filter(col("text").isNotNull)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("ptf", expr(
        s"""aggregate(${positions(a)}, 0L,
           |  (acc, s) -> acc + size(filter(${positions(b)},
           |                               p -> p > s AND p <= s + $w)))""".stripMargin)
        .cast("long"))
      .filter(col("ptf") > 0)
      .select(lit(qid).as("query_id"), col("doc_id"), col("ptf"))
  }

  test("proximity probe equals the brute-force pair recount; tombstoned docs leave the ranking") {
    val base = Files.createTempDirectory("graft_tidx_prox").toString
    try {
      val docs = Engine.table(spark, dir, "documents")
      RetrievalQueries.writeTextIndexGen(spark,
        docs.filter(pmod(col("doc_id"), lit(10)) =!= 7), base)
      RetrievalQueries.writeTextIndexGen(spark,
        docs.filter(pmod(col("doc_id"), lit(10)) === 7), base)
      // incl. the asymmetric pair (rare "dup": one side of the doc_id
      // join is a posting list ~3% the other's size)
      val qs = Seq((1L, "hash", "join", 5), (2L, "data", "dup", 6))
      import org.apache.spark.sql.expressions.Window
      def want(d: org.apache.spark.sql.DataFrame) =
        qs.map { case (q, a, b, w) => bruteProximity(d, q, a, b, w) }
          .reduce(_ unionByName _)
          .withColumn("rk", row_number().over(Window.partitionBy(col("query_id"))
            .orderBy(col("ptf").desc, col("doc_id"))).cast("long"))
          .filter(col("rk") <= 10)
          .select(col("query_id"), col("rk"), col("doc_id"), col("ptf"))
          .orderBy("query_id", "rk").collect().toSeq
      val got = RetrievalQueries.probeProximity(spark, base, qs, 10)
        .orderBy("query_id", "rk").collect().toSeq
      assert(got.nonEmpty && got == want(docs),
        "proximity probe diverged from brute-force pair recount")
      // tombstone the top-ranked doc: the probe must re-rank as if the
      // doc never existed
      val doomedId = got.head.getLong(2)
      RetrievalQueries.deleteTextDocs(spark,
        docs.filter(col("doc_id") === doomedId), base)
      val after = RetrievalQueries.probeProximity(spark, base, qs, 10)
        .orderBy("query_id", "rk").collect().toSeq
      assert(!after.exists(_.getLong(2) == doomedId),
        "tombstoned doc still in the proximity ranking")
      assert(after == want(docs.filter(col("doc_id") =!= doomedId)),
        "post-delete proximity ranking diverged")
    } finally graft.Fs.deleteRecursively(base)
  }

  test("hot-token build splits across salted files; BM25 and phrase probes are unchanged") {
    val salted = Files.createTempDirectory("graft_tidx_salt").toString
    val plain = Files.createTempDirectory("graft_tidx_plain").toString
    try {
      val docs = Engine.table(spark, dir, "documents")
      // df('table') ≈ 380 at this fixture: a 100-df cap forces
      // ceil(df/100) ≥ 2 salts for the common tokens. AQE's partition
      // coalescing is off for the salted build ONLY because the whole
      // fixture fits one coalesced task at this size — at real scale
      // the salted groups exceed the coalesce target and split anyway;
      // the file census below observes the exchange AQE would keep.
      val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
      val prev = spark.conf.get(coalesceKey)
      try {
        spark.conf.set(coalesceKey, "false")
        RetrievalQueries.writeTextIndexGen(spark, docs, salted, hotDf = 100L)
      } finally spark.conf.set(coalesceKey, prev)
      RetrievalQueries.writeTextIndexGen(spark, docs, plain)
      val hotFiles = IndexCatalog.latestFiles(salted)
        .filter(f => IndexCatalog.partitionKey(f).contains("tok=table"))
      assert(hotFiles.size > 1,
        s"hot token built ${hotFiles.size} file(s); expected a salted split")
      // rare tokens stay single-file: no blowup on the cold path
      val coldFiles = IndexCatalog.latestFiles(salted)
        .filter(f => IndexCatalog.partitionKey(f).contains("tok=dup"))
      assert(coldFiles.size == 1, "cold token fragmented by the salt guard")
      val terms = Seq(1L -> "table", 2L -> "dup")
      val a = RetrievalQueries.probeTextIndex(spark, salted, terms, 10)
        .orderBy("query_id", "rk").collect().toSeq
      val b = RetrievalQueries.probeTextIndex(spark, plain, terms, 10)
        .orderBy("query_id", "rk").collect().toSeq
      assert(a == b, "salted build changed the BM25 ranking")
      val pa = RetrievalQueries.probePhrase(spark, salted,
        Seq(1L -> Seq("table", "table")), 10)
        .orderBy("query_id", "rk").collect().toSeq
      val pb = RetrievalQueries.probePhrase(spark, plain,
        Seq(1L -> Seq("table", "table")), 10)
        .orderBy("query_id", "rk").collect().toSeq
      assert(pa == pb, "salted build changed the phrase ranking")
    } finally {
      graft.Fs.deleteRecursively(salted); graft.Fs.deleteRecursively(plain)
    }
  }
}
