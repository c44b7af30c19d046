package graft.operators

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.{Engine, SparkSpec}
import graft.sources.IndexCatalog

/** Exactly-once contract of the streaming ATOMIC FAN-OUT
  * ([[StreamingQueries.commitTxnBatch]] — `q_stream_txn`): one
  * micro-batch lands in every store or in none, under crash replay,
  * a crashed coordinator's in-doubt debris, and pre-fenced attempts.
  */
class StreamTxnSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def sha256(p: String): String = {
    val d = MessageDigest.getInstance("SHA-256")
    d.digest(Files.readAllBytes(Paths.get(p))).map("%02x".format(_)).mkString
  }

  private def docs(pred: org.apache.spark.sql.Column) =
    Engine.table(spark, dir, "documents")
      .select(col("doc_id"), col("lang")).filter(pred)

  private def parts(root: String,
      batch: org.apache.spark.sql.DataFrame) = Seq(
    s"$root/docs" -> batch,
    s"$root/stats" -> batch.groupBy("lang")
      .agg(count(lit(1)).cast("long").as("n_docs")))

  private def census(base: String): Long = {
    val live = IndexCatalog.latestFiles(base)
    if (live.isEmpty) 0L
    else spark.read.parquet(live: _*).count()
  }

  test("a batch lands in both stores atomically; a replayed batchId commits nothing, byte-identical") {
    val root = Files.createTempDirectory("graft_stx_spec").toString
    try {
      val batch = docs(col("doc_id") % 3 === 1)
      assert(StreamingQueries.commitTxnBatch(spark, 7L, s"$root/txn",
        parts(root, batch)))
      assert(IndexCatalog.committedTags(s"$root/docs").contains("ingest-batch=7"))
      assert(IndexCatalog.committedTags(s"$root/stats").contains("ingest-batch=7"))
      val nDocs = census(s"$root/docs")
      assert(nDocs == batch.count())
      val sums = (IndexCatalog.latestFiles(s"$root/docs") ++
        IndexCatalog.latestFiles(s"$root/stats")).map(f => f -> sha256(f)).toMap

      // at-least-once replay: same batchId after a crash between sink
      // commit and checkpoint commit — nothing commits, nothing mutates
      assert(!StreamingQueries.commitTxnBatch(spark, 7L, s"$root/txn",
        parts(root, batch)))
      assert(census(s"$root/docs") == nDocs)
      sums.foreach { case (f, s) => assert(sha256(f) == s) }

      // an EMPTY micro-batch never commits
      assert(!StreamingQueries.commitTxnBatch(spark, 8L, s"$root/txn",
        parts(root, batch.filter(lit(false)))))
    } finally graft.Fs.deleteRecursively(root)
  }

  test("a crashed coordinator's in-doubt prepare is fenced by the replay: exactly one copy lands") {
    val root = Files.createTempDirectory("graft_stx_crash").toString
    try {
      val batch = docs(col("doc_id") % 3 === 1)
      // simulate the crash: attempt a0 prepared the DOCS store only,
      // the coordinator died before preparing stats or deciding
      val gen = IndexCatalog.newGenDir(s"$root/docs")
      batch.write.mode("overwrite").parquet(gen)
      IndexCatalog.prepareTxn(s"$root/docs", IndexCatalog.listDataFiles(gen),
        Seq("ingest-batch=7"), s"$root/txn/batch-7-a0.decision")
      assert(census(s"$root/docs") == 0L) // in doubt: invisible

      // the stream restarts and replays batch 7: the tag guard sees
      // nothing (in-doubt tags are invisible), its prepare fences a0
      // to abort, and the retry commits on a fresh marker
      assert(StreamingQueries.commitTxnBatch(spark, 7L, s"$root/txn",
        parts(root, batch)))
      assert(IndexCatalog.txnDecision(s"$root/txn/batch-7-a0.decision")
        == Some("abort"))
      // exactly ONE copy in each store — the crashed attempt's rows
      // never became visible
      assert(census(s"$root/docs") == batch.count())
      assert(spark.read.parquet(IndexCatalog.latestFiles(s"$root/stats"): _*)
        .agg(sum("n_docs")).collect()(0).getLong(0) == batch.count())
      // a SECOND replay is the plain tag-guard no-op
      assert(!StreamingQueries.commitTxnBatch(spark, 7L, s"$root/txn",
        parts(root, batch)))
    } finally graft.Fs.deleteRecursively(root)
  }

  test("pre-decided attempt markers advance the retry: abort skips to a fresh marker, commit means a racer won") {
    val root = Files.createTempDirectory("graft_stx_mark").toString
    try {
      val batch = docs(col("doc_id") % 3 === 2)
      // attempt 0 already fenced (e.g. by vacuum) before we ran
      IndexCatalog.decideTxn(s"$root/txn/batch-9-a0.decision", "abort")
      assert(StreamingQueries.commitTxnBatch(spark, 9L, s"$root/txn",
        parts(root, batch)))
      // committed under a FRESH marker, not the dead one
      assert(IndexCatalog.txnDecision(s"$root/txn/batch-9-a1.decision")
        == Some("commit"))
      assert(census(s"$root/docs") == batch.count())

      // the MARKER backstop: compaction + vacuum expire the tag's
      // manifests (the guard forgets batch 9), but the very-late
      // replay finds its attempt marker decided COMMIT and commits
      // nothing — without it the batch would land twice
      Seq(s"$root/docs", s"$root/stats").foreach { b =>
        IndexCatalog.commitRewrite(b, IndexCatalog.latestFiles(b), Nil,
          basedOn = IndexCatalog.currentVersion(b))
        IndexCatalog.vacuum(b, retain = 1, orphanGraceMs = 0L)
        assert(!IndexCatalog.committedTags(b).contains("ingest-batch=9"))
      }
      val v = IndexCatalog.currentVersion(s"$root/docs")
      assert(!StreamingQueries.commitTxnBatch(spark, 9L, s"$root/txn",
        parts(root, batch)))
      assert(IndexCatalog.currentVersion(s"$root/docs") == v)
      assert(census(s"$root/docs") == batch.count())
    } finally graft.Fs.deleteRecursively(root)
  }

  test("consistentSnapshot + as-of reads never straddle a racing txn ON DISK: both stores census pre or both post") {
    val root = Files.createTempDirectory("graft_stx_snap").toString
    val (d, s) = (s"$root/docs", s"$root/stats")
    // an as-of census over REAL parquet at a version vector — the read
    // path a reporting job runs against a transacted store pair
    def asOf(vec: Seq[Int]): (Long, Long) = {
      val nd = spark.read.parquet(IndexCatalog.files(d, vec(0)): _*).count()
      val ns = spark.read.parquet(IndexCatalog.files(s, vec(1)): _*)
        .agg(sum("n_docs")).collect()(0).getLong(0)
      (nd, ns)
    }
    try {
      val base = docs(col("doc_id") % 3 === 0)
      assert(StreamingQueries.commitTxnBatch(spark, 0L, s"$root/txn",
        parts(root, base)))
      val n0 = base.count()
      assert(asOf(IndexCatalog.consistentSnapshot(Seq(d, s))) == (n0, n0))

      // a txn lands EXACTLY in the capture→validate window: the cut
      // must retry and return the post-txn vector for BOTH stores —
      // the as-of censuses agree (docs rows == stats sum), which a
      // torn (pre, post) cut would break
      val batch = docs(col("doc_id") % 3 === 1)
      var fired = false
      val cut = IndexCatalog.consistentSnapshot(Seq(d, s),
        beforeValidate = () => {
          if (!fired) {
            fired = true
            assert(StreamingQueries.commitTxnBatch(spark, 1L, s"$root/txn",
              parts(root, batch)))
          }
        })
      val (nd, ns) = asOf(cut)
      assert(nd == ns, s"torn cut: docs=$nd stats=$ns at $cut")
      assert(nd == n0 + batch.count(), s"stale cut: $nd at $cut")

      // an in-doubt prepare at the head: the cut resolves BELOW it in
      // both stores and its as-of census excludes the in-doubt content;
      // after the decision a fresh cut includes it — in both
      val m = s"$root/txn/manual.decision"
      val late = docs(col("doc_id") % 3 === 2)
      val staged = parts(root, late).map { case (b, df) =>
        val gen = IndexCatalog.newGenDir(b)
        df.write.mode("overwrite").parquet(gen)
        (b, IndexCatalog.listDataFiles(gen))
      }
      staged.foreach { case (b, fs) => IndexCatalog.prepareTxn(b, fs, Nil, m) }
      val doubt = IndexCatalog.consistentSnapshot(Seq(d, s))
      assert(asOf(doubt) == (nd, nd), s"in-doubt content leaked at $doubt")
      IndexCatalog.decideTxn(m, "commit",
        staged.map(_._1).zip(doubt.map(_ + 1)))
      val after = asOf(IndexCatalog.consistentSnapshot(Seq(d, s)))
      assert(after == (nd + late.count(), nd + late.count()),
        s"post-decision cut wrong: $after")
    } finally graft.Fs.deleteRecursively(root)
  }
}
