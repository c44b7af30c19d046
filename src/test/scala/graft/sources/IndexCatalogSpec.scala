package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM contracts of the manifest catalog itself (no Spark): the
  * commit protocol's concurrent-writer failure, vacuum's tolerance of
  * earlier vacuums' manifest gaps, and the orphan grace window.
  *
  * ABSTRACT over the [[graft.sources.CatalogFs]] implementation: the
  * protocol's port-readiness claim ("implement the seam, keep the
  * protocol") is executed, not argued, by running this whole suite
  * twice — once on [[graft.sources.LocalCatalogFs]] (hard-link
  * create-if-absent) and once on [[ObjectStoreFakeFs]] (a conditional
  * -PUT object store). Concrete suites at the bottom of this file.
  */
abstract class IndexCatalogContract extends AnyFunSuite {

  /** The catalog under test — every test body's `IndexCatalog.` call
    * resolves to this instance, not the global object.
    */
  protected def ops: graft.sources.IndexCatalogOps
  private lazy val IndexCatalog = ops

  private def store(): String =
    Files.createTempDirectory("graft_cat_spec").toString

  private def fakeGen(base: String, name: String): String = {
    val d = Paths.get(base, name)
    Files.createDirectories(d)
    val f = d.resolve(s"part-$name.parquet")
    Files.writeString(f, name)
    f.toString
  }

  test("concurrent committers never silently drop a commit: successes == versions") {
    val base = store()
    try {
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val committed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      val unexpected = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      val threads = (0 until 2).map { t =>
        new Thread(() => (0 until 6).foreach { i =>
          val f = fakeGen(base, s"gen-t$t-$i")
          // timed await: a partner killed by an unexpected exception
          // breaks the barrier instead of deadlocking the suite
          barrier.await(30, java.util.concurrent.TimeUnit.SECONDS)
          var attempts = 0
          var done = false
          while (!done && attempts < 10) {
            attempts += 1
            try { IndexCatalog.commitFiles(base, Seq(f)); committed.add(f); done = true }
            catch {
              case e: IllegalStateException if
                e.getMessage.contains("concurrent commit") => // retry
              case e: Throwable => unexpected.add(e.toString); done = true
            }
          }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      assert(unexpected.isEmpty, s"non-collision failures: $unexpected")
      // the invariant a silent rename-replace would break: every
      // successful commit owns its OWN version (a replaced manifest
      // would make versions < successes and drop files from history)
      assert(IndexCatalog.currentVersion(base) == committed.size())
      val latest = IndexCatalog.latestFiles(base).toSet
      committed.forEach(f => assert(latest.contains(f), s"$f lost from history"))
      // no stray tmp files survive a collision
      val s = Files.list(Paths.get(base, "manifests"))
      try s.forEach(p => assert(!p.getFileName.toString.endsWith(".tmp")))
      finally s.close()
    } finally graft.Fs.deleteRecursively(base)
  }

  test("vacuum tolerates manifest gaps left by an earlier, tighter vacuum") {
    val base = store()
    try {
      val fs = (1 to 5).map(i => fakeGen(base, f"gen-v$i%05d"))
      fs.foreach(f => IndexCatalog.commitRewrite(base, Seq(f), Nil,
        IndexCatalog.currentVersion(base)))
      // retain=1 at v5: manifests v1..v4 drop, their superseded files go
      assert(IndexCatalog.vacuum(base, retain = 1).toSet == fs.init.toSet)
      assert(IndexCatalog.liveVersions(base) == Seq(5))
      val f6 = fakeGen(base, "gen-v00006")
      IndexCatalog.commitRewrite(base, Seq(f6), Nil,
        IndexCatalog.currentVersion(base))
      // the wider retention window now reaches past the vacuumed
      // manifests — must GC cleanly, not throw on the gaps
      val deleted = IndexCatalog.vacuum(base, retain = 4)
      assert(deleted.isEmpty) // v5 and v6 are both inside the window
      assert(IndexCatalog.liveVersions(base) == Seq(5, 6))
      assert(IndexCatalog.referencedFiles(base, 1) == Set(fs.last, f6))
    } finally graft.Fs.deleteRecursively(base)
  }

  test("commitWithRetry: two racing appenders both land, store content is the union") {
    val base = store()
    try {
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val failures = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      val threads = (0 until 2).map { t =>
        new Thread(() => (0 until 6).foreach { i =>
          val f = fakeGen(base, s"gen-t$t-$i")
          barrier.await(30, java.util.concurrent.TimeUnit.SECONDS)
          // NO external retry loop: the catalog's own optimistic loop
          // must absorb the CAS conflicts the barrier manufactures
          try IndexCatalog.commitWithRetry(base)(_ => (Seq(f), Seq(s"w=$t b=$i")))
          catch { case e: Throwable => failures.add(e.toString) }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      assert(failures.isEmpty, s"retry path failed: $failures")
      // every commit owns its own version and no file fell out of the
      // latest manifest — the union property two concurrent ingest
      // streams into one store need
      assert(IndexCatalog.currentVersion(base) == 12)
      val latest = IndexCatalog.latestFiles(base).toSet
      (0 until 2).foreach { t =>
        (0 until 6).foreach { i =>
          val f = Paths.get(base, s"gen-t$t-$i", s"part-gen-t$t-$i.parquet")
          assert(latest.contains(f.toString), s"$f lost from latest")
        }
      }
      assert(IndexCatalog.committedTags(base).size == 12)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("commitWithRetry re-PREPARES against the winner's state after losing the CAS") {
    val base = store()
    try {
      val f1 = fakeGen(base, "gen-one")
      IndexCatalog.commitFiles(base, Seq(f1))
      val loserPrepared = new java.util.concurrent.CountDownLatch(1)
      val winnerDone = new java.util.concurrent.CountDownLatch(1)
      val observed = new java.util.concurrent.CopyOnWriteArrayList[Int]()
      val fLoser = fakeGen(base, "gen-loser")
      val loser = new Thread(() =>
        IndexCatalog.commitWithRetry(base) { cur =>
          observed.add(cur)
          if (observed.size == 1) {
            // first attempt: observed v1, now let the winner commit v2
            loserPrepared.countDown()
            winnerDone.await(30, java.util.concurrent.TimeUnit.SECONDS)
          }
          (Seq(fLoser), Seq(s"loser saw v$cur"))
        })
      loser.start()
      loserPrepared.await(30, java.util.concurrent.TimeUnit.SECONDS)
      val fWinner = fakeGen(base, "gen-winner")
      IndexCatalog.commitFiles(base, Seq(fWinner))
      winnerDone.countDown()
      loser.join(30000)
      // the loser's first publish lost the v2 CAS; its SECOND prepare
      // observed the winner's v2 and committed v3 carrying both files
      assert(observed.asScala.toList == List(1, 2))
      assert(IndexCatalog.currentVersion(base) == 3)
      assert(IndexCatalog.tags(base, 3) == Seq("loser saw v2"))
      assert(IndexCatalog.latestFiles(base).toSet ==
        Set(f1, fWinner, fLoser))
    } finally graft.Fs.deleteRecursively(base)
  }

  test("a rewrite based on a stale version fails the CAS instead of dropping an interleaved append") {
    val base = store()
    try {
      val f1 = fakeGen(base, "gen-a")
      IndexCatalog.commitFiles(base, Seq(f1)) // v1
      val basedOn = IndexCatalog.currentVersion(base) // rewriter reads v1
      val fApp = fakeGen(base, "gen-app")
      IndexCatalog.commitFiles(base, Seq(fApp)) // append lands v2 mid-rewrite
      // the stale rewrite loses the CAS — without basedOn validation it
      // would have published a manifest silently missing gen-app
      val fCompact = fakeGen(base, "gen-compact")
      val e = intercept[IllegalStateException] {
        IndexCatalog.commitRewrite(base, Seq(fCompact), Seq("compaction"), basedOn)
      }
      assert(IndexCatalog.isCommitConflict(e))
      assert(IndexCatalog.latestFiles(base).toSet == Set(f1, fApp))
      // same contract for partition replacement
      val fPart = fakeGen(base, "bucket=1")
      val e2 = intercept[IllegalStateException] {
        IndexCatalog.commitReplacePartitions(base, Seq(fPart), Nil, basedOn)
      }
      assert(IndexCatalog.isCommitConflict(e2))
      // re-derived against the winner's version, the rewrite lands
      IndexCatalog.commitRewrite(base, Seq(fCompact), Seq("compaction"),
        IndexCatalog.currentVersion(base))
      assert(IndexCatalog.currentVersion(base) == 3)
      assert(IndexCatalog.latestFiles(base) == Seq(fCompact))
    } finally graft.Fs.deleteRecursively(base)
  }

  private def fakePart(base: String, bucket: Int, name: String): String = {
    val d = Paths.get(base, "corpus", s"bucket=$bucket")
    Files.createDirectories(d)
    val f = d.resolve(s"part-$name.parquet")
    Files.writeString(f, name)
    f.toString
  }

  test("rebasing replacement: an append into a DIFFERENT partition does not force re-derivation") {
    val base = store()
    try {
      val a0 = fakePart(base, 0, "a0")
      val a1 = fakePart(base, 1, "a1")
      IndexCatalog.commitFiles(base, Seq(a0, a1)) // v1
      val basedOn = IndexCatalog.currentVersion(base) // rewriter reads v1
      // an append lands in bucket=2 mid-rewrite — logically independent
      val b2 = fakePart(base, 2, "b2")
      IndexCatalog.commitFiles(base, Seq(b2)) // v2
      // the bucket=1 replacement, still based on v1: the plain commit
      // would fail the CAS; the rebasing commit sees the intervening
      // keys are disjoint and lands WITHOUT the caller re-deriving
      val r1 = fakePart(base, 1, "r1")
      val v = IndexCatalog.commitReplacePartitionsRebasing(
        base, Seq(r1), Seq("rewrite b1"), basedOn)
      assert(v == 3)
      // the winner's append survived AND the replacement applied
      assert(IndexCatalog.latestFiles(base).toSet == Set(a0, b2, r1))
      assert(IndexCatalog.tags(base, 3) == Seq("rewrite b1"))
      // time travel still serves the pre-replacement bucket=1 file
      assert(IndexCatalog.files(base, 2).toSet == Set(a0, a1, b2))
    } finally graft.Fs.deleteRecursively(base)
  }

  test("rebasing replacement: a commit into the SAME partition re-raises the conflict to re-derive") {
    val base = store()
    try {
      val a1 = fakePart(base, 1, "a1")
      IndexCatalog.commitFiles(base, Seq(a1)) // v1
      val basedOn = IndexCatalog.currentVersion(base)
      val b1 = fakePart(base, 1, "b1")
      IndexCatalog.commitFiles(base, Seq(b1)) // v2: bucket=1 grew mid-rewrite
      val r1 = fakePart(base, 1, "r1")
      // rebasing would silently supersede b1's rows — must re-raise
      val e = intercept[IllegalStateException] {
        IndexCatalog.commitReplacePartitionsRebasing(base, Seq(r1), Nil, basedOn)
      }
      assert(IndexCatalog.isCommitConflict(e))
      assert(IndexCatalog.latestFiles(base).toSet == Set(a1, b1))
      // an intervening FULL REWRITE conflicts with every key
      val basedOn2 = IndexCatalog.currentVersion(base)
      val c1 = fakePart(base, 1, "c1")
      IndexCatalog.commitRewrite(base, Seq(c1), Seq("compaction"), basedOn2) // v3
      val r9 = fakePart(base, 9, "r9")
      val e2 = intercept[IllegalStateException] {
        IndexCatalog.commitReplacePartitionsRebasing(base, Seq(r9), Nil, basedOn2)
      }
      assert(IndexCatalog.isCommitConflict(e2))
      assert(IndexCatalog.latestFiles(base) == Seq(c1))
    } finally graft.Fs.deleteRecursively(base)
  }

  test("addConflicts: a key-disjoint intervening add can still force re-derivation (predicate writers)") {
    val base = store()
    try {
      val f1 = fakePart(base, 1, "a.parquet")
      IndexCatalog.commitFiles(base, Seq(f1)) // v1
      // interleaved append into a DIFFERENT partition before our commit
      val f2 = fakePart(base, 2, "b.parquet")
      IndexCatalog.commitFiles(base, Seq(f2)) // v2
      val mine = fakePart(base, 1, "c.parquet")
      // content-aware conflict: the callback flags the intervening add
      val flagged = intercept[IllegalStateException] {
        IndexCatalog.commitReplacePartitionsRebasing(
          base, Seq(mine), Nil, basedOn = 1,
          addConflicts = adds => { assert(adds == Seq(f2)); true })
      }
      assert(IndexCatalog.isCommitConflict(flagged))
      // same interleaving, callback clears it: rebases and lands
      val v = IndexCatalog.commitReplacePartitionsRebasing(
        base, Seq(mine), Nil, basedOn = 1,
        addConflicts = _ => false)
      assert(v == 3)
      assert(IndexCatalog.files(base, 3).toSet == Set(mine, f2))
    } finally graft.Fs.deleteRecursively(base)
  }

  test("racing replacement vs disjoint-partition appends: all land, none re-derives its content") {
    val base = store()
    try {
      val a0 = fakePart(base, 0, "a0")
      val a1 = fakePart(base, 1, "a1")
      IndexCatalog.commitFiles(base, Seq(a0, a1)) // v1
      val basedOn = IndexCatalog.currentVersion(base)
      // one thread REWRITES bucket=1 (based on v1, its content derived
      // once — a re-derivation would be observable as a second commit
      // attempt with different content, so we pin commit count);
      // three threads APPEND into buckets 2..4 concurrently
      val barrier = new java.util.concurrent.CyclicBarrier(4)
      val unexpected = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      val r1 = fakePart(base, 1, "r1")
      val rewriter = new Thread(() => {
        try {
          barrier.await(30, java.util.concurrent.TimeUnit.SECONDS)
          // the rebasing commit must absorb every disjoint-key CAS
          // loss WITHOUT the caller re-deriving (no outer retry loop
          // here — a same-key conflict would escape and fail the test)
          IndexCatalog.commitReplacePartitionsRebasing(
            base, Seq(r1), Seq("rewrite b1"), basedOn)
        } catch { case e: Throwable => unexpected.add("rewriter: " + e) }
      })
      val appenders = (2 to 4).map { b =>
        new Thread(() => {
          try {
            val f = fakePart(base, b, s"app$b")
            barrier.await(30, java.util.concurrent.TimeUnit.SECONDS)
            IndexCatalog.commitWithRetry(base)(_ => (Seq(f), Nil))
          } catch { case e: Throwable => unexpected.add(s"appender $b: " + e) }
        })
      }
      (rewriter +: appenders).foreach(_.start())
      (rewriter +: appenders).foreach(_.join())
      assert(unexpected.isEmpty, s"failures under disjoint-key race: $unexpected")
      // every writer landed exactly once: 1 build + 3 appends + 1 rewrite
      assert(IndexCatalog.currentVersion(base) == 5)
      val latest = IndexCatalog.latestFiles(base).toSet
      // the replacement applied (a1 superseded by r1) AND every
      // concurrent append survived
      assert(latest == Set(a0, r1) ++
        (2 to 4).map(b => s"$base/corpus/bucket=$b/part-app$b.parquet"))
    } finally graft.Fs.deleteRecursively(base)
  }

  test("vacuum re-carries newest-per-family key= tags past the expired chain; free-form tags expire") {
    val base = store()
    try {
      val f1 = fakeGen(base, "gen-v00001")
      IndexCatalog.commitRewrite(base, Seq(f1), Seq(
        "corpus_stats=10:100", "stats_cols=doc_id", "merge bucket=3"), 0)
      val f2 = fakeGen(base, "gen-v00002")
      IndexCatalog.commitFiles(base, Seq(f2), Seq("corpus_stats=12:140"))
      // tagless compactions push the stats-bearing commits past any
      // small retention window — the ADVICE failure shape
      (3 to 6).foreach { i =>
        val f = fakeGen(base, f"gen-v$i%05d")
        IndexCatalog.commitRewrite(base, Seq(f), Nil,
          IndexCatalog.currentVersion(base))
      }
      IndexCatalog.vacuum(base, retain = 1)
      assert(IndexCatalog.liveVersions(base) == Seq(6))
      // newest instance per family survives retention
      assert(IndexCatalog.newestTag(base, "corpus_stats=")
        .contains("corpus_stats=12:140"))
      assert(IndexCatalog.newestTag(base, "stats_cols=")
        .contains("stats_cols=doc_id"))
      // free-form per-commit history expires with its manifest
      assert(!IndexCatalog.committedTags(base).contains("merge bucket=3"))
      // a LATER declaration on a live manifest supersedes the carried one
      val f7 = fakeGen(base, "gen-v00007")
      IndexCatalog.commitFiles(base, Seq(f7), Seq("corpus_stats=20:300"))
      assert(IndexCatalog.newestTag(base, "corpus_stats=")
        .contains("corpus_stats=20:300"))
      // a second vacuum folds the first's carried snapshot forward
      val f8 = fakeGen(base, "gen-v00008")
      IndexCatalog.commitRewrite(base, Seq(f8), Nil,
        IndexCatalog.currentVersion(base))
      IndexCatalog.vacuum(base, retain = 1)
      assert(IndexCatalog.liveVersions(base) == Seq(8))
      assert(IndexCatalog.newestTag(base, "corpus_stats=")
        .contains("corpus_stats=20:300"))
      assert(IndexCatalog.newestTag(base, "stats_cols=")
        .contains("stats_cols=doc_id"))
    } finally graft.Fs.deleteRecursively(base)
  }

  test("vacuum default keeps fresh uncommitted files, sweeps stale ones; grace<=0 reclaims fresh") {
    val base = store()
    try {
      val f1 = fakeGen(base, "gen-live")
      IndexCatalog.commitFiles(base, Seq(f1))
      // an in-flight writer's file inside a governed root: gen-live is
      // the manifest-governed first segment, so plant the orphan there
      val orphan = Paths.get(base, "gen-live", "part-inflight.parquet")
      Files.writeString(orphan, "in-flight")
      // DEFAULT vacuum keeps the just-written file — safe by default
      // against an in-flight append's pre-commit writes
      assert(IndexCatalog.vacuum(base, retain = 1).isEmpty)
      assert(Files.exists(orphan))
      // aged past the grace it becomes crash debris and the default sweeps it
      Files.setLastModifiedTime(orphan,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 2 * IndexCatalog.DefaultOrphanGraceMs))
      assert(IndexCatalog.vacuum(base, retain = 1) == Seq(orphan.toString))
      assert(!Files.exists(orphan))
      // explicit grace<=0 reclaims even a fresh orphan (quiescent store)
      Files.writeString(orphan, "in-flight")
      assert(IndexCatalog.vacuum(base, retain = 1, orphanGraceMs = 0L) ==
        Seq(orphan.toString))
      assert(!Files.exists(orphan))
      assert(Files.exists(Paths.get(f1)))
    } finally graft.Fs.deleteRecursively(base)
  }

  test("superseded committed files delete regardless of age; vacuum racing an append never eats it") {
    val base = store()
    try {
      // v1 then a v2 REWRITE: v1's file is superseded — committed
      // history, deletable even though its mtime is fresh
      val f1 = fakeGen(base, "gen-a")
      IndexCatalog.commitRewrite(base, Seq(f1), Nil, 0)
      val f2 = fakeGen(base, "gen-b")
      IndexCatalog.commitRewrite(base, Seq(f2), Nil, 1)
      assert(IndexCatalog.vacuum(base, retain = 1) == Seq(f1))
      assert(!Files.exists(Paths.get(f1)) && Files.exists(Paths.get(f2)))

      // an append in flight: data file written into a governed root,
      // manifest not yet committed — a default vacuum interleaves,
      // the file survives, and the commit then lands intact
      val inflight = Paths.get(base, "gen-b", "part-inflight.parquet")
      Files.writeString(inflight, "in-flight")
      assert(IndexCatalog.vacuum(base, retain = 1).isEmpty)
      assert(Files.exists(inflight))
      IndexCatalog.commitFiles(base, Seq(inflight.toString))
      assert(IndexCatalog.latestFiles(base).toSet == Set(f2, inflight.toString))
    } finally graft.Fs.deleteRecursively(base)
  }

  test("commitTaggedOnce: concurrent replays of one tagged batch commit at most once") {
    val base = store()
    try {
      // the check-then-act hole this primitive closes: every thread
      // passes the fence check BEFORE any commit exists (the barrier
      // sits inside prepare, which commitTaggedOnce only reaches after
      // its fence check), then all race the same version CAS — the
      // losers must re-check and become replay no-ops, never a second
      // tagged commit. This is the zombie-driver-plus-replacement
      // shape a streamed ingest's foreachBatch can produce.
      val n = 4
      val inPrepare = new java.util.concurrent.CyclicBarrier(n)
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val failures = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      val threads = (0 until n).map { t =>
        new Thread(() => {
          val f = fakeGen(base, s"gen-dup-$t")
          try {
            val r = IndexCatalog.commitTaggedOnce(base, "ingest-batch=42") {
              _ =>
                inPrepare.await(30, java.util.concurrent.TimeUnit.SECONDS)
                (Seq(f), Seq(s"writer=$t"))
            }
            if (r.isDefined) wins.incrementAndGet()
          } catch { case e: Throwable => failures.add(e.toString) }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      assert(failures.isEmpty, s"unexpected failures: $failures")
      assert(wins.get() == 1, s"exactly one replay must commit, got ${wins.get()}")
      assert(IndexCatalog.currentVersion(base) == 1,
        "a fenced loser must not occupy a version slot")
      assert(IndexCatalog.committedTags(base).contains("ingest-batch=42"))
      // a later sequential replay is fenced without preparing at all
      var prepared = false
      val late = IndexCatalog.commitTaggedOnce(base, "ingest-batch=42") { _ =>
        prepared = true
        (Seq(fakeGen(base, "gen-late")), Nil)
      }
      assert(late.isEmpty && !prepared,
        "a fenced replay must return None before running prepare")
      // a DIFFERENT tag commits normally through the same primitive
      val other = IndexCatalog.commitTaggedOnce(base, "ingest-batch=43")(
        _ => (Seq(fakeGen(base, "gen-next")), Nil))
      assert(other.contains(2))
    } finally graft.Fs.deleteRecursively(base)
  }

  test("newGenDir is unique per call: concurrent writers never share (and overwrite) one generation directory") {
    val base = store()
    try {
      // same observed version, two calls — a version-derived name would
      // collide here, and an overwrite-mode writer in the shared dir
      // would delete the other's possibly already-committed files
      val g1 = IndexCatalog.newGenDir(base)
      val g2 = IndexCatalog.newGenDir(base)
      assert(g1 != g2, "two writers handed the same generation directory")
      assert(Files.isDirectory(Paths.get(g1)) && Files.isDirectory(Paths.get(g2)))
      // each commit lists ONLY its own directory's files
      Files.writeString(Paths.get(g1, "part-a.parquet"), "a")
      Files.writeString(Paths.get(g2, "part-b.parquet"), "b")
      IndexCatalog.commit(base, g1)
      IndexCatalog.commit(base, g2)
      assert(IndexCatalog.files(base, 1).map(f =>
        Paths.get(f).getFileName.toString) == Seq("part-a.parquet"))
      assert(IndexCatalog.files(base, 2).size == 2)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("vacuum membership is canonical-path based: a store written through a non-normalized base spelling never mass-deletes live data") {
    val canonical = store()
    // every write AND this vacuum go through a redundant './' spelling
    // — manifests then record files under that spelling, while the
    // deletion candidates are listed under the normalized absolute
    // root; raw string comparison would classify every live file as an
    // orphan and delete it at grace <= 0
    val base = canonical + java.io.File.separator + "." +
      java.io.File.separator
    try {
      val f1 = fakeGen(base, "gen-one")
      IndexCatalog.commitRewrite(base, Seq(f1), Nil, 0)
      val f2 = fakeGen(base, "gen-two")
      IndexCatalog.commitRewrite(base, Seq(f2), Nil, 1) // supersedes f1
      val deleted = IndexCatalog.vacuum(base, retain = 1, orphanGraceMs = 0L)
      // exactly the superseded file goes; the live one survives
      assert(deleted == Seq(f1) ||
        deleted.map(d => Paths.get(d).toAbsolutePath.normalize.toString) ==
          Seq(Paths.get(f1).toAbsolutePath.normalize.toString),
        s"vacuum deleted $deleted, expected only the superseded $f1")
      assert(Files.exists(Paths.get(f2)),
        "live data deleted: path-spelling mismatch in vacuum membership")
      assert(IndexCatalog.latestFiles(base) == Seq(f2))
    } finally graft.Fs.deleteRecursively(canonical)
  }

  test("vacuum reclaims a crashed writer's never-committed generation dir past the grace window") {
    val base = store()
    try {
      val f1 = fakeGen(base, "gen-live")
      IndexCatalog.commitFiles(base, Seq(f1))
      // a writer takes a unique gen dir, stages data, and dies before
      // commit: no manifest will EVER reference this directory, so a
      // roots walk derived from committed paths alone leaks it forever
      val dead = IndexCatalog.newGenDir(base)
      val staged = Paths.get(dead, "part-staged.parquet")
      Files.writeString(staged, "staged-then-crashed")
      // fresh: the default grace window protects an in-flight writer
      assert(IndexCatalog.vacuum(base, retain = 1).isEmpty)
      assert(Files.exists(staged))
      // aged past the grace it is crash debris and must be swept
      Files.setLastModifiedTime(staged,
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 2 * IndexCatalog.DefaultOrphanGraceMs))
      assert(IndexCatalog.vacuum(base, retain = 1) == Seq(staged.toString))
      assert(!Files.exists(staged))
      // the committed store is untouched
      assert(IndexCatalog.latestFiles(base) == Seq(f1))
      assert(Files.exists(Paths.get(f1)))
    } finally graft.Fs.deleteRecursively(base)
  }

  test("newestTag follows restore-of lineage: a rollback never pairs restored files with the undone suffix's governing tags") {
    val base = store()
    try {
      val f1 = fakeGen(base, "gen-one")
      IndexCatalog.commitFiles(base, Seq(f1), Seq("corpus_stats=a")) // v1
      val f2 = fakeGen(base, "gen-two")
      // v2 declares BOTH a newer instance of an existing family and a
      // family v1 never had
      IndexCatalog.commitFiles(base, Seq(f2),
        Seq("corpus_stats=b", "centroids=centroids-v2")) // v2
      assert(IndexCatalog.newestTag(base, "corpus_stats=")
        .contains("corpus_stats=b"))
      // restore to v1: content lineage rebases, so resolution must see
      // v1's stats and NO centroid declaration at all — walking the
      // linear chain through the undone v2 would return b / v2's
      // centroids and pair them with v1's files (the torn-geometry bug)
      IndexCatalog.restore(base, 1) // v3
      assert(IndexCatalog.newestTag(base, "corpus_stats=")
        .contains("corpus_stats=a"))
      assert(IndexCatalog.newestTag(base, "centroids=").isEmpty)
      // a declaration AFTER the restore wins over the rebased lineage
      val f4 = fakeGen(base, "gen-four")
      IndexCatalog.commitFiles(base, Seq(f4), Seq("corpus_stats=c")) // v4
      assert(IndexCatalog.newestTag(base, "corpus_stats=")
        .contains("corpus_stats=c"))
      assert(IndexCatalog.newestTag(base, "centroids=").isEmpty)
      // vacuum's carried-tag fold resolves through the SAME lineage:
      // expiring v1..v3 must carry stats=c's predecessors correctly —
      // the undone corpus_stats=b and centroids=v2 must NOT resurrect
      IndexCatalog.vacuum(base, retain = 1)
      assert(IndexCatalog.liveVersions(base) == Seq(4))
      assert(IndexCatalog.newestTag(base, "corpus_stats=")
        .contains("corpus_stats=c"))
      assert(IndexCatalog.newestTag(base, "centroids=").isEmpty)
    } finally graft.Fs.deleteRecursively(base)
  }

  test("vacuum caps its horizon so a live restore's target lineage is never expired") {
    val base = store()
    try {
      val f1 = fakeGen(base, "gen-a")
      IndexCatalog.commitFiles(base, Seq(f1), Seq("window_w=8")) // v1 declares
      val f2 = fakeGen(base, "gen-b")
      IndexCatalog.commitFiles(base, Seq(f2), Seq("window_w=9")) // v2 re-declares
      val f3 = fakeGen(base, "gen-c")
      IndexCatalog.commitFiles(base, Seq(f3)) // v3
      IndexCatalog.restore(base, 1) // v4: lineage rebases to v1's view
      val f5 = fakeGen(base, "gen-e")
      IndexCatalog.commitFiles(base, Seq(f5)) // v5, linear on the restore
      assert(IndexCatalog.newestTag(base, "window_w=").contains("window_w=8"))
      // naive horizon (retain=3) = 3, leaving the v4 restore LIVE and
      // STRICTLY ABOVE the horizon with its target below it: expiring
      // v1 would leave the restore's lineage walk jumping to an
      // expired target — files survive but window_w= silently
      // un-declares (the horizon carry at v3 folds v3's LINEAR lineage
      // — window_w=9 — which the restore bypasses, so it cannot help).
      // The cap keeps the target live instead. (A restore sitting AT
      // the horizon needs no cap — the carry resolves through its own
      // restore-of indirection; the lineage spec above covers that.)
      IndexCatalog.vacuum(base, retain = 3)
      assert(IndexCatalog.newestTag(base, "window_w=").contains("window_w=8"),
        "live restore's governing-tag lineage was expired by vacuum")
      assert(IndexCatalog.liveVersions(base).contains(1),
        "the live restore's target version must stay resolvable")
      // content resolution through the restored head is intact too
      assert(IndexCatalog.files(base, 4) == Seq(f1))
    } finally graft.Fs.deleteRecursively(base)
  }

  test("vacuum removes an emptied (or already-empty) unreferenced centroid dir entry") {
    val base = store()
    try {
      val f1 = fakeGen(base, "gen-a")
      IndexCatalog.commitFiles(base, Seq(f1))
      // a CAS-losing recluster's staged dir: one file, no tag names it
      val dead = Paths.get(base, "centroids-v00002-dead")
      Files.createDirectories(dead)
      Files.writeString(dead.resolve("part-x.parquet"), "x")
      IndexCatalog.vacuum(base, retain = 1, orphanGraceMs = 0L)
      assert(!Files.exists(dead),
        "emptied unreferenced centroid dir must not linger as an entry")
      // a writer that died right after mkdirs: empty dir, nothing to
      // reclaim file-wise — the entry itself is the debris
      val empty = Paths.get(base, "centroids-v00003-dead")
      Files.createDirectories(empty)
      IndexCatalog.vacuum(base, retain = 1, orphanGraceMs = 0L)
      assert(!Files.exists(empty))
    } finally graft.Fs.deleteRecursively(base)
  }

  test("vacuum under DEFAULT grace removes a dir it just emptied (pre-sweep mtime governs)") {
    val base = store()
    try {
      val f1 = fakeGen(base, "gen-a")
      IndexCatalog.commitFiles(base, Seq(f1))
      // an expired recluster's leftover: its one file AND the dir's own
      // mtime are both past the grace window — the sweep deletes the
      // file (which bumps the dir mtime) and must still remove the
      // emptied dir in the SAME vacuum, because grace is judged by the
      // dir's PRE-sweep mtime, not the bump the sweep itself caused
      val dead = Paths.get(base, "centroids-v00002-dead")
      Files.createDirectories(dead)
      val part = dead.resolve("part-x.parquet")
      Files.writeString(part, "x")
      val old = java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2 * IndexCatalog.DefaultOrphanGraceMs)
      Files.setLastModifiedTime(part, old)
      Files.setLastModifiedTime(dead, old)
      IndexCatalog.vacuum(base, retain = 1) // default grace
      assert(!Files.exists(dead),
        "a dir emptied by this vacuum must not survive to the next one " +
          "when its pre-sweep mtime is past the grace window")
      // control: a YOUNG dir (fresh mkdir by a racing recluster) keeps
      // its grace protection under the same default-grace vacuum
      val young = Paths.get(base, "centroids-v00003-race")
      Files.createDirectories(young)
      IndexCatalog.vacuum(base, retain = 1)
      assert(Files.exists(young),
        "a young empty dir inside the grace window must survive")
    } finally graft.Fs.deleteRecursively(base)
  }

  test("vacuumTxnMarkers compares canonical marker paths: a referenced decided marker spelled differently is never GC'd") {
    val base = store()
    val mdirCanon = store()
    try {
      // the coordinator spells the marker with a redundant './' — the
      // manifests record that spelling; the GC walk lists the
      // canonical one. Raw comparison would delete the decided marker
      // a live manifest still references, flipping the committed
      // participant permanently back to in-doubt.
      val marker = mdirCanon + java.io.File.separator + "." +
        java.io.File.separator + "m1"
      val f = fakeGen(base, "gen-txn")
      val committed = IndexCatalog.commitTxn(marker, Seq((base, Seq(f), Nil)))
      assert(committed.isDefined, "txn should commit cleanly")
      val gone = IndexCatalog.vacuumTxnMarkers(mdirCanon, Seq(base), graceMs = 0L)
      assert(gone.isEmpty, s"GC deleted a still-referenced marker: $gone")
      // the committed participant must still resolve
      assert(IndexCatalog.latestFiles(base) == Seq(f))
    } finally Seq(base, mdirCanon).foreach(graft.Fs.deleteRecursively)
  }
}

/** The default binding: the catalog as every operator uses it, over
  * the hard-link [[LocalCatalogFs]].
  */
class IndexCatalogSpec extends IndexCatalogContract {
  protected def ops: IndexCatalogOps = graft.sources.IndexCatalog
}

/** [[CatalogFs]] as an OBJECT STORE would implement it — the
  * port-readiness fake: the data plane (list/read/delete/stat) passes
  * through to the backing "bucket" (the local filesystem here), and
  * the one primitive with teeth, [[CatalogFs.publishIfAbsent]], is a
  * server-arbitrated conditional PUT (S3 `If-None-Match: *` / GCS
  * `ifGenerationMatch(0)`): one atomic exists-check-and-create
  * decision per key on the "server" (a JVM-wide lock standing in for
  * the store's internal arbitration), a single-shot full-object write
  * (atomic move — no reader ever observes a torn object), and
  * reject-on-exists returned to the loser. No hard links, no
  * client-visible staging files — the mechanism LocalCatalogFs leans
  * on is deliberately absent, so a protocol that accidentally relied
  * on link semantics would fail this suite.
  */
object ObjectStoreFakeFs extends CatalogFs {
  import java.nio.file.StandardCopyOption

  def listNames(dir: String): Seq[String] = LocalCatalogFs.listNames(dir)
  def listFilesRecursive(dir: String, suffix: String): Seq[String] =
    LocalCatalogFs.listFilesRecursive(dir, suffix)
  def readString(path: String): String = LocalCatalogFs.readString(path)
  def exists(path: String): Boolean = LocalCatalogFs.exists(path)
  def mkdirs(dir: String): Unit = LocalCatalogFs.mkdirs(dir)
  def delete(path: String): Unit = LocalCatalogFs.delete(path)
  def mtimeMillis(path: String): Option[Long] = LocalCatalogFs.mtimeMillis(path)

  def publishIfAbsent(path: String, content: String): Boolean =
    ObjectStoreFakeFs.synchronized {
      val target = Paths.get(path)
      if (Files.exists(target)) false // conditional PUT: reject-on-exists
      else {
        // single-shot visibility: stage OUTSIDE the bucket namespace
        // (the system temp dir — an object store's internal upload
        // buffer is never listable by clients), then atomic move
        // INSIDE the arbitration — readers (who never take the lock,
        // and may list the target's directory concurrently) see the
        // full object or nothing, and never a staging entry
        val tmp = Files.createTempFile(".put-", ".stage")
        try {
          Files.writeString(tmp, content)
          Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
          true
        } finally { Files.deleteIfExists(tmp); () }
      }
    }
}

/** The ENTIRE catalog contract suite re-run over the object-store
  * fake — concurrent committers, commitWithRetry races, the
  * commitTaggedOnce fence, vacuum/GC, txn markers, all of it — which
  * is what turns "ports to any object store offering conditional PUT"
  * from an argument into an executed fact.
  */
class ObjectStoreCatalogSpec extends IndexCatalogContract {
  protected def ops: IndexCatalogOps = new IndexCatalogOps(ObjectStoreFakeFs)
}
