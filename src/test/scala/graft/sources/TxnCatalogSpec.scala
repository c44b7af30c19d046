package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM contracts of the MULTI-STORE TRANSACTION protocol
  * ([[IndexCatalogOps.prepareTxn]] / [[IndexCatalogOps.commitTxn]] /
  * [[IndexCatalogOps.decideTxn]]): one decision-file CAS flips every
  * participant store visible at once; an abort (coordinator's, or a
  * fence by any later writer) leaves every participant a permanent
  * no-op; resolution, tag lookups, rebasing and vacuum all read
  * THROUGH the decision. No Spark — the protocol is pure metadata.
  */
class TxnCatalogSpec extends AnyFunSuite {

  private def tmp(): String =
    Files.createTempDirectory("graft_txn_spec").toString

  private def fakeFile(base: String, rel: String): String = {
    val f = Paths.get(base, rel)
    Files.createDirectories(f.getParent)
    Files.writeString(f, rel)
    f.toString
  }

  test("one decision CAS flips both stores visible atomically; in-doubt prepares are invisible everywhere") {
    val root = tmp()
    val (a, b) = (s"$root/docs", s"$root/stats")
    val marker = s"$root/txn/t1.decision"
    try {
      IndexCatalog.commitFiles(a, Seq(fakeFile(a, "g1/lang=en/p0.parquet")))
      IndexCatalog.commitFiles(b, Seq(fakeFile(b, "g1/lang=en/s0.parquet")),
        Seq("corpus_stats=1"))
      val fa = fakeFile(a, "g2/lang=de/p1.parquet")
      val fb = fakeFile(b, "g2/lang=de/s1.parquet")
      assert(IndexCatalog.prepareTxn(a, Seq(fa), Seq("batch=t1"), marker) == 2)
      assert(IndexCatalog.prepareTxn(b, Seq(fb), Seq("corpus_stats=2"), marker) == 2)

      // in doubt: slots reserved, nothing readable changed in EITHER store
      assert(IndexCatalog.currentVersion(a) == 2)
      assert(IndexCatalog.readableVersion(a) == 1)
      assert(IndexCatalog.latestFiles(a) == Seq(fakeFile(a, "g1/lang=en/p0.parquet")))
      assert(IndexCatalog.readableVersion(b) == 1)
      assert(!IndexCatalog.committedTags(a).contains("batch=t1"))
      assert(IndexCatalog.newestTag(b, "corpus_stats=") == Some("corpus_stats=1"))
      // resolving the in-doubt slot itself refuses to guess
      val e = intercept[IllegalStateException](IndexCatalog.files(a, 2))
      assert(e.getMessage.contains("in doubt"))

      // ONE create-if-absent decides: both stores flip together
      assert(IndexCatalog.decideTxn(marker, "commit") == "commit")
      assert(IndexCatalog.readableVersion(a) == 2)
      assert(IndexCatalog.readableVersion(b) == 2)
      assert(IndexCatalog.latestFiles(a).contains(fa))
      assert(IndexCatalog.latestFiles(b).contains(fb))
      assert(IndexCatalog.committedTags(a).contains("batch=t1"))
      assert(IndexCatalog.newestTag(b, "corpus_stats=") == Some("corpus_stats=2"))
    } finally graft.Fs.deleteRecursively(root)
  }

  test("abort is a permanent no-op slot: later commits build past it, time travel skips it, tags never leak") {
    val root = tmp()
    val a = s"$root/docs"
    val marker = s"$root/txn/t2.decision"
    try {
      val f1 = fakeFile(a, "g1/lang=en/p0.parquet")
      IndexCatalog.commitFiles(a, Seq(f1), Seq("corpus_stats=1"))
      val dead = fakeFile(a, "g2/lang=en/dead.parquet")
      assert(IndexCatalog.prepareTxn(a, Seq(dead), Seq("corpus_stats=99"), marker) == 2)
      assert(IndexCatalog.decideTxn(marker, "abort") == "abort")
      // a late coordinator learns the fence's verdict, not its own wish
      assert(IndexCatalog.decideTxn(marker, "commit") == "abort")

      val f3 = fakeFile(a, "g3/lang=de/p2.parquet")
      assert(IndexCatalog.commitFiles(a, Seq(f3)) == 3)
      assert(IndexCatalog.files(a, 3).toSet == Set(f1, f3)) // v2 contributed nothing
      assert(IndexCatalog.files(a, 2) == Seq(f1)) // time travel: aborted slot = predecessor
      assert(IndexCatalog.newestTag(a, "corpus_stats=") == Some("corpus_stats=1"))
      assert(!IndexCatalog.committedTags(a).contains("corpus_stats=99"))
    } finally graft.Fs.deleteRecursively(root)
  }

  test("any writer landing after an undecided prepare fences the txn to abort — a crashed coordinator cannot wedge the store") {
    val root = tmp()
    val (a, b) = (s"$root/docs", s"$root/stats")
    val marker = s"$root/txn/t3.decision"
    try {
      IndexCatalog.commitFiles(a, Seq(fakeFile(a, "g1/lang=en/p0.parquet")))
      IndexCatalog.commitFiles(b, Seq(fakeFile(b, "g1/lang=en/s0.parquet")))
      val deadA = fakeFile(a, "g2/lang=en/dead.parquet")
      val deadB = fakeFile(b, "g2/lang=en/dead.parquet")
      IndexCatalog.prepareTxn(a, Seq(deadA), Nil, marker)
      IndexCatalog.prepareTxn(b, Seq(deadB), Nil, marker)
      // an ordinary single-store append lands on A — the publish fences
      // the in-doubt predecessor before occupying its successor slot
      val f3 = fakeFile(a, "g3/lang=de/p2.parquet")
      assert(IndexCatalog.commitFiles(a, Seq(f3)) == 3)
      assert(IndexCatalog.txnDecision(marker) == Some("abort"))
      // the coordinator's commit attempt reports the loss cleanly...
      assert(IndexCatalog.decideTxn(marker, "commit") == "abort")
      // ...and NEITHER participant ever shows the txn's content — store
      // B aborted with A even though no writer ever touched B
      assert(!IndexCatalog.latestFiles(a).contains(deadA))
      assert(IndexCatalog.latestFiles(a).contains(f3))
      assert(IndexCatalog.latestFiles(b) == Seq(fakeFile(b, "g1/lang=en/s0.parquet")))
      assert(IndexCatalog.readableVersion(b) == 2) // decided, resolves as a no-op
    } finally graft.Fs.deleteRecursively(root)
  }

  test("commitTxn orchestration: all-or-nothing across prepare failure, and versions on success") {
    val root = tmp()
    val (a, b) = (s"$root/docs", s"$root/stats")
    try {
      IndexCatalog.commitFiles(a, Seq(fakeFile(a, "g1/lang=en/p0.parquet")))
      IndexCatalog.commitFiles(b, Seq(fakeFile(b, "g1/lang=en/s0.parquet")))
      // happy path: both participants commit at their own next slots
      val m1 = s"$root/txn/ok.decision"
      val got = IndexCatalog.commitTxn(m1, Seq(
        (a, Seq(fakeFile(a, "g2/lang=de/p1.parquet")), Seq("batch=1")),
        (b, Seq(fakeFile(b, "g2/lang=de/s1.parquet")), Seq("batch=1"))))
      assert(got == Some(Seq(2, 2)))
      assert(IndexCatalog.latestFiles(a).size == 2)

      // a participant whose prepare cannot succeed (empty file list)
      // aborts the WHOLE txn: the first store's already-prepared slot
      // can never become visible
      val m2 = s"$root/txn/fail.decision"
      intercept[IllegalArgumentException] {
        IndexCatalog.commitTxn(m2, Seq(
          (a, Seq(fakeFile(a, "g3/lang=en/p2.parquet")), Nil),
          (b, Seq.empty, Nil)))
      }
      assert(IndexCatalog.txnDecision(m2) == Some("abort"))
      assert(IndexCatalog.latestFiles(a).size == 2) // g3 file invisible
      // the decided-abort slot is readable (it resolves as a no-op)
      assert(IndexCatalog.readableVersion(a) == 3)
      assert(IndexCatalog.files(a, 3) == IndexCatalog.files(a, 2))
    } finally graft.Fs.deleteRecursively(root)
  }

  test("a same-marker prepare published AFTER the commit decision is a permanent no-op — participant enumeration closes the replay TOCTOU") {
    val root = tmp()
    val (a, b) = (s"$root/docs", s"$root/stats")
    val marker = s"$root/txn/toctou.decision"
    try {
      val base0 = fakeFile(a, "g1/lang=en/p0.parquet")
      IndexCatalog.commitFiles(a, Seq(base0))
      IndexCatalog.commitFiles(b, Seq(fakeFile(b, "g1/lang=en/s0.parquet")))
      val fa = fakeFile(a, "g2/lang=de/p1.parquet")
      val fb = fakeFile(b, "g2/lang=de/s1.parquet")
      // coordinator ONE commits the batch; the decision file now
      // ENUMERATES exactly (a,2) and (b,2)
      assert(IndexCatalog.commitTxn(marker, Seq(
        (a, Seq(fa), Seq("ingest-batch=3")),
        (b, Seq(fb), Seq("ingest-batch=3")))) == Some(Seq(2, 2)))
      assert(IndexCatalog.txnParticipants(marker)
        .exists(_.map(_._2) == Set(2)))
      // coordinator TWO — a concurrent replay of the SAME batch — read
      // the marker as undecided (passing prepareTxn's check), then its
      // manifest publish landed after the decision: simulate the late
      // publish directly. publishManifest's fence can't help (it only
      // aborts UNDECIDED predecessors), so before enumeration this slot
      // was born-decided-commit — an instantly visible duplicate.
      val dup = fakeFile(a, "g3/lang=de/dup.parquet")
      assert(IndexCatalog.fs.publishIfAbsent(s"$a/manifests/v3.txt",
        Seq("#ingest-batch=3", s"?txn:$marker", s"+$dup").mkString("\n")))
      // (a,3) is outside the decision's participant list: a permanent
      // no-op everywhere — resolution, latest reads, tags, time travel
      assert(IndexCatalog.readableVersion(a) == 3)
      assert(IndexCatalog.files(a, 3) == IndexCatalog.files(a, 2))
      assert(!IndexCatalog.latestFiles(a).contains(dup))
      assert(IndexCatalog.files(a, 2).contains(fa)) // the real commit holds
      // later commits build past the dead slot without resurrecting it
      val f4 = fakeFile(a, "g4/lang=fr/p4.parquet")
      assert(IndexCatalog.commitFiles(a, Seq(f4)) == 4)
      assert(IndexCatalog.latestFiles(a).toSet == Set(base0, fa, f4))
    } finally graft.Fs.deleteRecursively(root)
  }

  test("racing commit and abort deciders: exactly one verdict, both observers agree") {
    val root = tmp()
    val marker = s"$root/txn/race.decision"
    try {
      val verdicts = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val threads = Seq("commit", "abort").map { w =>
        new Thread(() => {
          barrier.await(30, java.util.concurrent.TimeUnit.SECONDS)
          verdicts.add(IndexCatalog.decideTxn(marker, w))
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      assert(verdicts.size() == 1, s"split decision: $verdicts")
      assert(IndexCatalog.txnDecision(marker).contains(verdicts.iterator().next()))
    } finally graft.Fs.deleteRecursively(root)
  }

  test("rebasing replacement treats a prepared txn as a normal racer: fence, then rebase over the aborted no-op") {
    val root = tmp()
    val a = s"$root/store"
    val marker = s"$root/txn/t4.decision"
    try {
      IndexCatalog.commitFiles(a,
        Seq(fakeFile(a, "g1/bucket=0/p0.parquet"), fakeFile(a, "g1/bucket=1/p1.parquet")))
      // an in-doubt prepare occupies slot 2 (touching bucket=9)...
      IndexCatalog.prepareTxn(a, Seq(fakeFile(a, "g2/bucket=9/dead.parquet")), Nil, marker)
      // ...and a replacement of bucket=1 derived against v1 arrives: it
      // loses the CAS at slot 2, fences the txn, sees disjoint keys on
      // the aborted no-op, and rebases onto slot 3
      val repl = fakeFile(a, "g3/bucket=1/p1b.parquet")
      val v = IndexCatalog.commitReplacePartitionsRebasing(a, Seq(repl), Nil, basedOn = 1)
      assert(v == 3)
      assert(IndexCatalog.txnDecision(marker) == Some("abort"))
      assert(IndexCatalog.latestFiles(a).toSet ==
        Set(fakeFile(a, "g1/bucket=0/p0.parquet"), repl))
    } finally graft.Fs.deleteRecursively(root)
  }

  test("vacuum reclaims an aborted txn's staged files as orphans and fences an in-doubt head; carried tags skip aborted manifests") {
    val root = tmp()
    val a = s"$root/store"
    try {
      val f1 = fakeFile(a, "g1/bucket=0/p0.parquet")
      IndexCatalog.commitFiles(a, Seq(f1), Seq("corpus_stats=1"))
      val deadMarker = s"$root/txn/t5.decision"
      val dead = fakeFile(a, "g1/bucket=1/dead.parquet") // same root as committed files
      IndexCatalog.prepareTxn(a, Seq(dead), Seq("corpus_stats=99"), deadMarker)
      IndexCatalog.decideTxn(deadMarker, "abort")
      (3 to 5).foreach { i =>
        IndexCatalog.commitFiles(a, Seq(fakeFile(a, s"g$i/bucket=0/p$i.parquet")))
      }
      // head prepare left in doubt: vacuum (a writer) fences it first
      val hmarker = s"$root/txn/t6.decision"
      IndexCatalog.prepareTxn(a, Seq(fakeFile(a, "g6/bucket=2/late.parquet")), Nil, hmarker)
      val deleted = IndexCatalog.vacuum(a, retain = 2, orphanGraceMs = 0L)
      assert(IndexCatalog.txnDecision(hmarker) == Some("abort"))
      // the aborted prepares' staged files are applied by NO manifest —
      // orphan debris, reclaimed once past the grace window
      assert(deleted.contains(dead))
      assert(!Files.exists(Paths.get(dead)))
      // survivors resolve; the aborted governing tag was never carried
      assert(IndexCatalog.latestFiles(a).nonEmpty)
      assert(IndexCatalog.newestTag(a, "corpus_stats=") == Some("corpus_stats=1"))
    } finally graft.Fs.deleteRecursively(root)
  }

  test("marker hygiene: decided markers refuse reuse, and the marker GC deletes only unreferenced decided ones") {
    val root = tmp()
    val (a, b) = (s"$root/docs", s"$root/stats")
    val mdir = s"$root/txn"
    try {
      IndexCatalog.commitFiles(a, Seq(fakeFile(a, "g1/lang=en/p0.parquet")))
      IndexCatalog.commitFiles(b, Seq(fakeFile(b, "g1/lang=en/s0.parquet")))
      // committed txn: its marker is REFERENCED by live manifests
      val mLive = s"$mdir/live.decision"
      IndexCatalog.commitTxn(mLive, Seq(
        (a, Seq(fakeFile(a, "g2/lang=de/p1.parquet")), Nil),
        (b, Seq(fakeFile(b, "g2/lang=de/s1.parquet")), Nil)))
      // a decided marker refuses reuse (a prepare against it would be
      // born-decided — no atomicity); the dedicated type is the
      // contract the streaming coordinator's race handling catches
      val e = intercept[TxnMarkerDecidedException] {
        IndexCatalog.prepareTxn(a, Seq(fakeFile(a, "g3/lang=fr/p9.parquet")), Nil, mLive)
      }
      assert(e.getMessage.contains("already decided"))
      // an aborted txn whose slot is still live: marker stays too
      val mAbort = s"$mdir/aborted.decision"
      IndexCatalog.prepareTxn(a, Seq(fakeFile(a, "g4/lang=zh/dead.parquet")), Nil, mAbort)
      IndexCatalog.decideTxn(mAbort, "abort")
      // an orphaned decided marker (its store chain was vacuumed away)
      val mGone = s"$mdir/gone.decision"
      IndexCatalog.decideTxn(mGone, "abort")
      // an in-flight marker: undecided, kept no matter what
      val mDoubt = s"$mdir/indoubt.decision"

      // under the DEFAULT grace every decided marker here is too fresh
      // to reclaim — the replay-horizon guard (a decided-commit marker
      // can be the LAST exactly-once guard once vacuum expires its
      // ingest-batch tag manifests)
      assert(IndexCatalog.vacuumTxnMarkers(mdir, Seq(a, b)).isEmpty)
      // graceMs = 0: the caller asserts the marker dir is quiescent
      val deleted = IndexCatalog.vacuumTxnMarkers(mdir, Seq(a, b), graceMs = 0L)
      assert(deleted == Seq(mGone), s"wrong GC set: $deleted")
      assert(IndexCatalog.txnDecision(mLive) == Some("commit")) // survives
      assert(IndexCatalog.txnDecision(mAbort) == Some("abort")) // survives
      assert(!IndexCatalog.fs.exists(mGone))
      assert(!IndexCatalog.fs.exists(mDoubt)) // never existed; name reserved
      // once vacuum expires the aborted slot's manifest, its marker
      // becomes unreferenced and the next GC takes it
      (1 to 4).foreach { i =>
        IndexCatalog.commitFiles(a, Seq(fakeFile(a, s"g5$i/lang=en/x$i.parquet")))
      }
      IndexCatalog.vacuum(a, retain = 2, orphanGraceMs = 0L)
      val deleted2 = IndexCatalog.vacuumTxnMarkers(mdir, Seq(a, b), graceMs = 0L)
      assert(deleted2 == Seq(mAbort), s"wrong second GC set: $deleted2")
      assert(IndexCatalog.txnDecision(mLive) == Some("commit")) // still referenced by b
    } finally graft.Fs.deleteRecursively(root)
  }

  test("consistentSnapshot never returns a torn cut across a racing transaction") {
    val root = tmp()
    val (a, b) = (s"$root/docs", s"$root/stats")
    try {
      IndexCatalog.commitFiles(a, Seq(fakeFile(a, "g1/lang=en/p0.parquet")))
      IndexCatalog.commitFiles(b, Seq(fakeFile(b, "g1/lang=en/s0.parquet")))
      // quiescent: the snapshot is just the readable heads
      assert(IndexCatalog.consistentSnapshot(Seq(a, b)) == Seq(1, 1))
      // a txn lands EXACTLY in the capture→validate window: the first
      // attempt is invalidated and the retry returns the post-txn cut
      // in BOTH stores — never (pre, post)
      var fired = false
      val got = IndexCatalog.consistentSnapshot(Seq(a, b), beforeValidate = () => {
        if (!fired) {
          fired = true
          val m = s"$root/txn/snap.decision"
          IndexCatalog.commitTxn(m, Seq(
            (a, Seq(fakeFile(a, "g2/lang=de/p1.parquet")), Nil),
            (b, Seq(fakeFile(b, "g2/lang=de/s1.parquet")), Nil)))
        }
      })
      assert(got == Seq(2, 2), s"torn or stale cut: $got")
      // both sides of the cut resolve to the same transaction set
      assert(IndexCatalog.files(a, got(0)).size == 2)
      assert(IndexCatalog.files(b, got(1)).size == 2)
      // sustained pressure gives up loudly instead of spinning forever
      var i = 0
      val e = intercept[IllegalStateException] {
        IndexCatalog.consistentSnapshot(Seq(a), maxAttempts = 3,
          beforeValidate = () => {
            i += 1
            IndexCatalog.commitFiles(a, Seq(fakeFile(a, s"g9$i/lang=en/x$i.parquet")))
          })
      }
      assert(e.getMessage.contains("no stable multi-store snapshot"))
    } finally graft.Fs.deleteRecursively(root)
  }

  test("resolution across a checkpoint boundary replays aborted slots as no-ops") {
    val root = tmp()
    val a = s"$root/store"
    try {
      val interval = IndexCatalog.CheckpointInterval
      val kept = scala.collection.mutable.ArrayBuffer[String]()
      (1 to interval + 3).foreach { i =>
        if (i == 3 || i == interval + 1) {
          val m = s"$root/txn/mid$i.decision"
          IndexCatalog.prepareTxn(a,
            Seq(fakeFile(a, s"g$i/bucket=0/dead$i.parquet")), Nil, m)
          IndexCatalog.decideTxn(m, "abort")
        } else {
          val f = fakeFile(a, s"g$i/bucket=${i % 3}/p$i.parquet")
          IndexCatalog.commitFiles(a, Seq(f))
          kept += f
        }
      }
      // the periodic checkpoint at `interval` exists (that slot was a
      // plain commit) and the post-boundary resolution is exact
      assert(IndexCatalog.hasCheckpoint(a, interval))
      assert(IndexCatalog.latestFiles(a).toSet == kept.toSet)
      assert(IndexCatalog.files(a, 3).toSet == kept.take(2).toSet)
    } finally graft.Fs.deleteRecursively(root)
  }
}
