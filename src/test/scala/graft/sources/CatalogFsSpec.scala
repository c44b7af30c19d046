package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.scalatest.funsuite.AnyFunSuite

/** The port seam under the catalog: [[IndexCatalogOps]] against
  * filesystems OTHER than the local default — a fully in-memory
  * [[CatalogFs]] (proving the manifest protocol never escapes the
  * seam to java.nio), and a conflict-injecting wrapper (proving the
  * seam's `publishIfAbsent = false` surfaces as the same
  * commit-conflict failure the retry loop absorbs). The local impl's
  * own atomicity is covered here too; the protocol-level concurrency
  * contracts stay in [[IndexCatalogSpec]].
  */
class CatalogFsSpec extends AnyFunSuite {

  /** An in-memory [[CatalogFs]]: paths are plain map keys, publish is
    * `putIfAbsent` — the shape of an object-store port (S3 conditional
    * PUT / GCS ifGenerationMatch(0)), with zero disk underneath.
    */
  private class MemCatalogFs extends CatalogFs {
    val entries = new ConcurrentHashMap[String, (String, Long)]()

    def put(path: String, content: String): Unit =
      entries.put(path, (content, System.currentTimeMillis()))
    def age(path: String, mtime: Long): Unit =
      entries.computeIfPresent(path, (_, v) => (v._1, mtime))

    def listNames(dir: String): Seq[String] = {
      val p = dir + "/"
      entries.keySet.toArray(Array.empty[String]).toSeq
        .filter(k => k.startsWith(p) && !k.drop(p.length).contains("/"))
        .map(_.drop(p.length))
    }
    def listFilesRecursive(dir: String, suffix: String): Seq[String] = {
      val p = dir + "/"
      entries.keySet.toArray(Array.empty[String]).toSeq
        .filter(k => k.startsWith(p) && k.endsWith(suffix))
    }
    def readString(path: String): String = {
      val v = entries.get(path)
      if (v == null) throw new java.nio.file.NoSuchFileException(path)
      v._1
    }
    def exists(path: String): Boolean = entries.containsKey(path)
    def mkdirs(dir: String): Unit = () // directories are implicit in keys
    def publishIfAbsent(path: String, content: String): Boolean =
      entries.putIfAbsent(path, (content, System.currentTimeMillis())) == null
    def delete(path: String): Unit = entries.remove(path)
    def mtimeMillis(path: String): Option[Long] =
      Option(entries.get(path)).map(_._2)
  }

  test("full manifest lifecycle on an in-memory filesystem — the protocol never escapes the seam") {
    val fs = new MemCatalogFs
    val cat = new IndexCatalogOps(fs)
    val base = "/mem/store"

    // build (v1) + tagged append (v2), data files only ever in the map
    fs.put(s"$base/corpus/bucket=0/part-a.parquet", "a")
    fs.put(s"$base/corpus/bucket=1/part-b.parquet", "b")
    assert(cat.currentVersion(base) == 0 && cat.latestFiles(base).isEmpty)
    assert(cat.commit(base, s"$base/corpus") == 1)
    fs.put(s"$base/corpus/bucket=1/part-c.parquet", "c")
    assert(cat.commitFiles(base, Seq(s"$base/corpus/bucket=1/part-c.parquet"),
      Seq("ingest-batch=0")) == 2)
    assert(cat.files(base, 2).size == 3)
    assert(cat.tags(base, 2) == Seq("ingest-batch=0"))
    assert(cat.committedTags(base) == Set("ingest-batch=0"))

    // partition-level replacement (v3): bucket=1 rewritten, bucket=0
    // carried forward untouched; v2 still resolves the old bucket=1
    fs.put(s"$base/corpus/bucket=1/part-d.parquet", "d")
    assert(cat.commitReplacePartitions(base,
      Seq(s"$base/corpus/bucket=1/part-d.parquet"), Nil, 2) == 3)
    assert(cat.files(base, 3).toSet == Set(
      s"$base/corpus/bucket=0/part-a.parquet",
      s"$base/corpus/bucket=1/part-d.parquet"))
    assert(cat.files(base, 2).contains(s"$base/corpus/bucket=1/part-b.parquet"))

    // compaction rewrite (v4), then vacuum(retain=1): superseded files
    // and expired manifests leave the MAP; live survives; a planted
    // fresh orphan outlives the default grace, an aged one does not
    fs.put(s"$base/corpus/bucket=9/part-z.parquet", "z")
    assert(cat.commitRewrite(base,
      Seq(s"$base/corpus/bucket=9/part-z.parquet"), Seq("compaction"), 3) == 4)
    fs.put(s"$base/corpus/bucket=9/part-fresh-orphan.parquet", "f")
    fs.put(s"$base/corpus/bucket=9/part-stale-orphan.parquet", "s")
    fs.age(s"$base/corpus/bucket=9/part-stale-orphan.parquet",
      System.currentTimeMillis() - 2 * cat.DefaultOrphanGraceMs)
    val deleted = cat.vacuum(base, retain = 1)
    assert(deleted.toSet == Set(
      s"$base/corpus/bucket=0/part-a.parquet",
      s"$base/corpus/bucket=1/part-b.parquet",
      s"$base/corpus/bucket=1/part-c.parquet",
      s"$base/corpus/bucket=1/part-d.parquet",
      s"$base/corpus/bucket=9/part-stale-orphan.parquet"))
    deleted.foreach(f => assert(!fs.exists(f)))
    assert(fs.exists(s"$base/corpus/bucket=9/part-fresh-orphan.parquet"))
    assert(cat.liveVersions(base) == Seq(4))
    assert(cat.latestFiles(base) == Seq(s"$base/corpus/bucket=9/part-z.parquet"))
    assert(scala.util.Try(cat.files(base, 2)).isFailure)
  }

  test("publishIfAbsent=false surfaces as the commit conflict the retry loop absorbs") {
    val mem = new MemCatalogFs
    // fail the FIRST publish of every commit attempt — a manufactured
    // CAS loss on whatever filesystem sits under the seam
    val failures = new java.util.concurrent.atomic.AtomicInteger(0)
    val flaky = new CatalogFs {
      def listNames(d: String) = mem.listNames(d)
      def listFilesRecursive(d: String, s: String) = mem.listFilesRecursive(d, s)
      def readString(p: String) = mem.readString(p)
      def exists(p: String) = mem.exists(p)
      def mkdirs(d: String) = mem.mkdirs(d)
      def delete(p: String) = mem.delete(p)
      def mtimeMillis(p: String) = mem.mtimeMillis(p)
      def publishIfAbsent(p: String, c: String): Boolean =
        if (failures.getAndIncrement() % 2 == 0) false
        else mem.publishIfAbsent(p, c)
    }
    val cat = new IndexCatalogOps(flaky)
    val base = "/mem/flaky"
    mem.put(s"$base/gen/part-a.parquet", "a")
    // a bare commit loses the injected CAS and throws the typed conflict
    val e = intercept[IllegalStateException] {
      cat.commitFiles(base, Seq(s"$base/gen/part-a.parquet"))
    }
    assert(cat.isCommitConflict(e))
    // the optimistic loop re-prepares and lands on the second publish
    failures.set(0) // next publish fails again, the one after lands
    val prepares = new java.util.concurrent.atomic.AtomicInteger(0)
    assert(cat.commitWithRetry(base) { cur =>
      prepares.incrementAndGet()
      (Seq(s"$base/gen/part-a.parquet"), Seq(s"saw v$cur"))
    } == 1)
    assert(prepares.get() == 2)
    assert(cat.latestFiles(base) == Seq(s"$base/gen/part-a.parquet"))
    assert(cat.tags(base, 1) == Seq("saw v0"))
  }

  test("commit metadata is O(batch), not O(store): append manifest bytes stay flat as the store grows") {
    val mem = new MemCatalogFs
    // record the byte size of every published metadata file
    val published = new ConcurrentHashMap[String, Int]()
    val counting = new CatalogFs {
      def listNames(d: String) = mem.listNames(d)
      def listFilesRecursive(d: String, s: String) = mem.listFilesRecursive(d, s)
      def readString(p: String) = mem.readString(p)
      def exists(p: String) = mem.exists(p)
      def mkdirs(d: String) = mem.mkdirs(d)
      def delete(p: String) = mem.delete(p)
      def mtimeMillis(p: String) = mem.mtimeMillis(p)
      def publishIfAbsent(p: String, c: String): Boolean = {
        val won = mem.publishIfAbsent(p, c)
        if (won) published.put(p, c.length)
        won
      }
    }
    val cat = new IndexCatalogOps(counting)
    val base = "/mem/grow"
    val fileOf = (i: Int) => s"$base/corpus/bucket=${i % 4}/part-$i.parquet"
    (1 to 30).foreach { i =>
      mem.put(fileOf(i), "x")
      cat.commitFiles(base, Seq(fileOf(i)), Seq(s"batch=$i"))
    }
    assert(cat.currentVersion(base) == 30)
    assert(cat.latestFiles(base).size == 30)
    // every append's manifest is one add line + one tag — the byte
    // size is the BATCH's, independent of the 30-file store. (Before
    // incremental manifests, v30's manifest listed all 30 files.)
    val sizes = (1 to 30).map(v => published.get(s"$base/manifests/v$v.txt"))
    assert(sizes.forall(_ > 0))
    assert(sizes.max - sizes.min <= 2, // path-length digits only
      s"append manifest bytes grew with store size: $sizes")
    // periodic checkpoints materialized at the interval boundaries...
    val interval = cat.CheckpointInterval
    (interval to 30 by interval).foreach { v =>
      assert(counting.exists(s"$base/manifests/v$v.ckpt"), s"no ckpt at v$v")
      // ...and each snapshot holds exactly that version's resolved list
      assert(counting.readString(s"$base/manifests/v$v.ckpt")
        .split("\n").count(_.nonEmpty) == v)
    }
    // resolution across a checkpoint boundary replays ckpt + suffix
    // and equals the full-chain walk: content pinned at three points
    assert(cat.files(base, interval + 3).toSet ==
      (1 to interval + 3).map(fileOf).toSet)
    assert(cat.files(base, interval - 1).toSet ==
      (1 until interval).map(fileOf).toSet)
    assert(cat.files(base, 30).toSet == (1 to 30).map(fileOf).toSet)
  }

  test("vacuum checkpoints its horizon so survivors resolve after the delta chain expires") {
    val mem = new MemCatalogFs
    val cat = new IndexCatalogOps(mem)
    val base = "/mem/hvac"
    val fileOf = (i: Int) => s"$base/corpus/bucket=${i % 4}/part-$i.parquet"
    // five DELTA commits (never crossing the periodic interval), then
    // retain=2: horizon v4's predecessors all expire — without the
    // horizon snapshot, v4 and v5 would be unresolvable
    (1 to 5).foreach { i =>
      mem.put(fileOf(i), "x")
      cat.commitFiles(base, Seq(fileOf(i)))
    }
    assert(cat.CheckpointInterval > 5) // the premise: no periodic ckpt yet
    cat.vacuum(base, retain = 2)
    assert(cat.liveVersions(base) == Seq(4, 5))
    assert(mem.exists(s"$base/manifests/v4.ckpt"))
    assert(cat.files(base, 4).toSet == (1 to 4).map(fileOf).toSet)
    assert(cat.files(base, 5).toSet == (1 to 5).map(fileOf).toSet)
    assert(scala.util.Try(cat.files(base, 3)).isFailure)
    // a later, wider-horizon vacuum drops the now-pre-horizon snapshot
    mem.put(fileOf(6), "x")
    cat.commitFiles(base, Seq(fileOf(6)))
    cat.vacuum(base, retain = 1)
    assert(!mem.exists(s"$base/manifests/v4.ckpt"))
    assert(mem.exists(s"$base/manifests/v6.ckpt"))
    assert(cat.files(base, 6).toSet == (1 to 6).map(fileOf).toSet)
  }

  test("LocalCatalogFs.publishIfAbsent: exactly one winner under contention, content intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fs_spec").toString
    try {
      val target = dir + "/v1.txt"
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val barrier = new java.util.concurrent.CyclicBarrier(4)
      val threads = (0 until 4).map { t =>
        new Thread(() => {
          barrier.await(30, java.util.concurrent.TimeUnit.SECONDS)
          if (LocalCatalogFs.publishIfAbsent(target, s"writer-$t"))
            wins.incrementAndGet()
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
      assert(wins.get() == 1)
      // the surviving content is exactly one writer's, never torn
      assert(LocalCatalogFs.readString(target).matches("writer-\\d"))
      // and no staging debris outlives the race
      assert(LocalCatalogFs.listNames(dir).forall(!_.endsWith(".tmp")))
    } finally graft.Fs.deleteRecursively(dir)
  }
}
