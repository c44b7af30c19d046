package graft.sources

import java.nio.file.Paths
import scala.jdk.CollectionConverters._

/** Manifest-backed catalog for the persisted index stores (the LSH
  * band-bucket store, the IVF store, the sign-LSH embedding store).
  *
  * The mechanism is the same one the versioned-table surface
  * ([[graft.operators.SourceQueries]]'s time-travel store) uses, applied
  * to indexes: data files are immutable once written, each store
  * GENERATION is a directory of new files, and a VERSION is a manifest
  * listing every live file (all prior files plus the new generation's).
  * Readers resolve the highest committed manifest and scan exactly those
  * files, so
  *  - a half-written generation is invisible until its manifest commits
  *    (the commit is a single atomic create-if-absent),
  *  - appends never rewrite old partitions — probe-after-append reads
  *    old files byte-identical to what the build wrote,
  *  - committed versions stay readable — the index analogue of table
  *    time travel — until [[vacuum]] expires them past the retention
  *    horizon (an expired version fails fast at manifest resolution).
  *
  * Every filesystem touchpoint goes through [[CatalogFs]] — the
  * protocol (versions, manifests, tags, partition commits, retention)
  * is filesystem-agnostic, and porting to a DFS or object store means
  * implementing that five-method trait (atomic create-if-absent is the
  * only primitive with teeth; HDFS `create(overwrite=false)`, S3
  * conditional PUT, and GCS `ifGenerationMatch(0)` all provide it).
  * The default instance ([[IndexCatalog]]) binds [[LocalCatalogFs]];
  * manifest resolution is a few KB of paths — a catalog lookup, not
  * data motion — exactly as production table formats commit snapshots.
  * Maintenance concurrency: commits are safe against racing committers
  * (the loser's commit throws instead of silently replacing the
  * winner's), and [[vacuum]] is safe-by-default against an in-flight
  * append to the SAME store: files not yet referenced by any manifest
  * are kept unless older than `orphanGraceMs` (default
  * [[DefaultOrphanGraceMs]]) — keep the grace above the writers' max
  * write-to-commit latency, the same rule every table format's
  * orphan-file cleanup imposes.
  */
class IndexCatalogOps(val fs: CatalogFs) {

  /** Default orphan grace for [[vacuum]]: files not referenced by any
    * present manifest are kept unless at least this stale. 20 minutes
    * covers any fixture-scale (and most production) write-to-commit
    * latency; an in-flight append racing a default vacuum survives.
    */
  val DefaultOrphanGraceMs: Long = 20L * 60 * 1000

  private def manifestsDir(base: String): String =
    Paths.get(base, "manifests").toString

  private def manifestPath(base: String, v: Int): String =
    Paths.get(manifestsDir(base), s"v$v.txt").toString

  private val ManifestName = raw"v(\d+)\.txt".r

  /** Highest committed version, 0 if the store has none. */
  def currentVersion(base: String): Int =
    fs.listNames(manifestsDir(base))
      .collect { case ManifestName(n) => n.toInt }
      .foldLeft(0)(math.max)

  /** The data files of committed version `v` (paths, sorted).
    * `#`-prefixed manifest lines are commit metadata ([[tags]]), not
    * file paths.
    */
  def files(base: String, v: Int): Seq[String] = {
    require(v >= 1, s"version $v is not committed")
    fs.readString(manifestPath(base, v))
      .split("\n").toSeq.filter(l => l.nonEmpty && !l.startsWith("#"))
  }

  /** Metadata tags recorded by version `v`'s commit — `#`-prefixed
    * lines in the manifest, so a tag becomes visible in the SAME
    * atomic manifest commit (create-if-absent) that publishes the
    * file list.
    */
  def tags(base: String, v: Int): Seq[String] =
    fs.readString(manifestPath(base, v))
      .split("\n").toSeq.collect { case l if l.startsWith("#") => l.drop(1) }

  /** Every tag on a still-live manifest. The streaming ingest path
    * keys its exactly-once guard on this set: a replayed micro-batch
    * whose tag is already committed must not commit again. (Retention
    * must therefore exceed the replay horizon — [[vacuum]] dropping a
    * manifest forgets its tags, as in any snapshot-committed format.)
    */
  def committedTags(base: String): Set[String] =
    liveVersions(base).iterator.flatMap(tags(base, _)).toSet

  /** Versions whose manifest is still present — committed and not yet
    * expired by [[vacuum]]. The catalog's readable history.
    */
  def liveVersions(base: String): Seq[Int] =
    (1 to currentVersion(base)).filter(v => fs.exists(manifestPath(base, v)))

  /** The current version's files; empty for an empty store. */
  def latestFiles(base: String): Seq[String] = {
    val v = currentVersion(base)
    if (v == 0) Seq.empty else files(base, v)
  }

  /** A fresh generation directory for the NEXT commit. Writers put new
    * parquet files here, then call [[commit]]; until then the
    * generation is invisible to every reader.
    */
  def newGenDir(base: String): String = {
    val v = currentVersion(base) + 1
    val p = Paths.get(base, f"gen-v$v%05d").toString
    fs.mkdirs(p)
    p
  }

  /** All parquet data files under `dir`, recursively (covers
    * Hive-partitioned layouts like `bucket=3/part-....parquet`).
    * Empty when the directory does not exist yet.
    */
  def listDataFiles(dir: String): Seq[String] =
    fs.listFilesRecursive(dir, ".parquet").sorted

  /** Commit `genDir`'s parquet files as the next version: manifest =
    * previous version's files ++ the generation's, published with a
    * single atomic create-if-absent. Returns the new version.
    */
  def commit(base: String, genDir: String): Int =
    commitFiles(base, listDataFiles(genDir))

  /** Commit an explicit set of NEW data files as the next version —
    * the path for partitioned stores, where a generation's files land
    * inside existing `key=value` directories and the writer diffs the
    * listing rather than using a separate generation dir. Visibility
    * still flips only at the manifest commit.
    */
  def commitFiles(base: String, newFiles: Seq[String],
      commitTags: Seq[String] = Nil): Int = {
    require(newFiles.nonEmpty, "no parquet files to commit")
    // the predecessor's file list and the target version MUST come from
    // the same observed state: deriving content from a separate
    // latestFiles read would let a racing winner's files vanish from a
    // retrying loser's manifest even though the version CAS succeeded
    val cur = currentVersion(base)
    val prev = if (cur == 0) Seq.empty else files(base, cur)
    writeManifestAt(base, cur + 1, prev ++ newFiles.sorted, commitTags)
  }

  /** The Hive-style partition key of a data file: its `k=v` directory
    * segments, joined — `.../gen-v00002/part=3/f.parquet` → `part=3`,
    * `.../corpus/bucket=17/f.parquet` → `bucket=17`, nested layouts
    * concatenate. None for files outside any `k=v` directory. The
    * GENERATION directory a file sits in is deliberately not part of
    * the key: the same logical partition accumulates (or is replaced)
    * across generations.
    */
  private[graft] def partitionKey(f: String): Option[String] = {
    val segs = Paths.get(f).iterator().asScala.map(_.toString)
      .filter(s => s.contains("=") && !s.startsWith(".")).toSeq
    if (segs.isEmpty) None else Some(segs.mkString("/"))
  }

  /** Commit a PARTITION-LEVEL REPLACEMENT: the next version's manifest
    * keeps every predecessor file whose partition key is NOT among the
    * new files' keys, and lists the new files in place of the replaced
    * partitions — the per-partition copy-on-write commit every real
    * table format backs MERGE/update with, and the primitive that lets
    * a streamed maintenance job publish only the partitions a batch
    * touched instead of a full snapshot. Predecessor files WITHOUT a
    * partition key (unpartitioned layouts) are always carried forward;
    * every new file must carry one. Replaced partitions' old files
    * stay on disk for older manifests (time travel) until [[vacuum]].
    *
    * `basedOn` is the REQUIRED base-version validation: the caller
    * names the version its replacement content was derived from, and
    * the commit targets exactly `basedOn + 1` — so a commit that
    * landed in between (say an append into a partition this rewrite
    * is about to replace) fails the CAS loudly instead of being
    * silently dropped from the new manifest. This is the
    * conflicting-commit detection every snapshot format's
    * rewrite/OPTIMIZE path performs; losers must RE-DERIVE their
    * replacement against the winner's state, not re-publish stale
    * content (so [[retryingCommit]] alone is NOT a valid wrapper).
    */
  /** `extraReplacedKeys` names partitions replaced WITH NOTHING — the
    * fully-emptied-partition case a row-level DELETE produces (every
    * row of a bucket removed leaves no new file to carry the key, but
    * the old files must still be superseded). A commit may be pure
    * removal: `newFiles` empty, `extraReplacedKeys` non-empty.
    */
  def commitReplacePartitions(base: String, newFiles: Seq[String],
      commitTags: Seq[String], basedOn: Int,
      extraReplacedKeys: Set[String] = Set.empty): Int = {
    require(newFiles.nonEmpty || extraReplacedKeys.nonEmpty,
      "nothing to commit: no new files and no partitions to empty")
    require(basedOn >= 0, s"basedOn must be an observed version, got $basedOn")
    val keyed = newFiles.map(f => f -> partitionKey(f))
    require(keyed.forall(_._2.isDefined),
      s"files without a k=v partition segment: ${keyed.filter(_._2.isEmpty).map(_._1)}")
    val replaced = keyed.flatMap(_._2).toSet ++ extraReplacedKeys
    val prev = if (basedOn == 0) Seq.empty else files(base, basedOn)
    val kept = prev.filterNot(f => partitionKey(f).exists(replaced.contains))
    writeManifestAt(base, basedOn + 1, (kept ++ newFiles).sorted, commitTags)
  }

  /** Commit a REWRITE: the next version's manifest lists ONLY
    * `files` — the compaction commit, where the store's live rows were
    * rewritten into a fresh (smaller) file set and the old generations'
    * files are superseded rather than extended. The old files stay on
    * disk (older manifests still reference them — time travel holds)
    * until [[vacuum]] reclaims them past the retention horizon.
    *
    * `basedOn` names the version the rewrite's content was derived
    * from and the commit targets `basedOn + 1` — a commit landing in
    * between (an append whose rows the rewrite did not carry) fails
    * the CAS loudly instead of having its rows silently superseded
    * away; see [[commitReplacePartitions]] for the contract.
    */
  def commitRewrite(base: String, files: Seq[String],
      commitTags: Seq[String], basedOn: Int): Int =  {
    require(files.nonEmpty, "no parquet files to commit")
    require(basedOn >= 0, s"basedOn must be an observed version, got $basedOn")
    writeManifestAt(base, basedOn + 1, files.sorted, commitTags)
  }

  /** RESTORE the store to prior committed version `toVersion` — the
    * rollback every snapshot-committed table format pairs with its
    * time travel: the NEXT manifest lists exactly `toVersion`'s
    * files, published as a normal rewrite commit tagged
    * `restore-of=<v>`. The restore is pure catalog metadata — zero
    * data files move, copy, or rewrite (the spec pins byte-identity
    * of the whole store across it) — and history stays monotone: the
    * rolled-back versions remain readable between `toVersion` and the
    * restore until [[vacuum]] expires them, exactly like any other
    * superseded commit. Later appends build on the restored state.
    *
    * Rides [[retryingCommit]]: losing the version CAS to a concurrent
    * committer re-reads the head and re-publishes — no content
    * re-derivation is needed because the restored FILE LIST is pinned
    * by `toVersion`, not derived from the head. Restoring a vacuumed
    * version fails fast at manifest resolution ([[files]]).
    */
  def restore(base: String, toVersion: Int): Int = {
    val target = files(base, toVersion)
    retryingCommit() {
      commitRewrite(base, target, Seq(s"restore-of=$toVersion"),
        basedOn = currentVersion(base))
    }
  }

  /** True iff `e` is the concurrent-commit CAS conflict raised by a
    * losing committer — the one failure [[retryingCommit]] retries.
    */
  def isCommitConflict(e: Throwable): Boolean = e match {
    case ise: IllegalStateException =>
      ise.getCause.isInstanceOf[java.nio.file.FileAlreadyExistsException]
    case _ => false
  }

  /** Optimistic-retry wrapper around a single catalog commit: re-run
    * `attempt` when it loses the version CAS, up to `maxAttempts`.
    * Sound because every commit method here derives its target version
    * AND predecessor file list inside the call, from the state the
    * retry observes — a loser's re-attempt sees the winner's commit.
    * `attempt` must therefore be a catalog commit expression, not a
    * cached manifest write. Only the CAS conflict retries; any other
    * failure (or exhaustion) propagates. Content-level conflict
    * resolution (tag guards, anti-joins against stored rows) remains
    * the caller's; use [[commitWithRetry]] when the commit's CONTENT
    * must be re-derived against the freshly observed version.
    */
  def retryingCommit(maxAttempts: Int = 16)(attempt: => Int): Int = {
    var n = 0
    while (n < maxAttempts) {
      n += 1
      try return attempt
      catch {
        case e if isCommitConflict(e) && n < maxAttempts =>
          // bounded deterministic backoff; contention here is a few
          // maintenance writers, not a thundering herd
          Thread.sleep(math.min(64L, 1L << math.min(n, 6)))
      }
    }
    throw new IllegalStateException(s"unreachable: $maxAttempts attempts")
  }

  /** Append-commit with optimistic re-PREPARATION: observe the current
    * version, let `prepare(cur)` derive the commit's content (new data
    * files + tags) against exactly that state, and CAS on `cur + 1` —
    * so a commit landing between observation and publish fails the
    * CAS and re-runs `prepare` against the winner's state, never
    * committing content derived from a stale read. This is the loop
    * two concurrent ingest streams into ONE store need: both commits
    * land (distinct versions, union content), neither blocks on
    * manual intervention.
    */
  def commitWithRetry(base: String, maxAttempts: Int = 16)
      (prepare: Int => (Seq[String], Seq[String])): Int =
    retryingCommit(maxAttempts) {
      val cur = currentVersion(base)
      val prev = if (cur == 0) Seq.empty else files(base, cur)
      val (newFiles, commitTags) = prepare(cur)
      require(newFiles.nonEmpty, "no parquet files to commit")
      writeManifestAt(base, cur + 1, prev ++ newFiles.sorted, commitTags)
    }

  private def writeManifestAt(base: String, v: Int, all: Seq[String],
      commitTags: Seq[String]): Int = {
    require(commitTags.forall(t => !t.contains("\n")), "tags are single-line")
    fs.mkdirs(manifestsDir(base))
    val target = manifestPath(base, v)
    // publishIfAbsent is an atomic create-IF-ABSENT: a racing committer
    // that also computed version v gets `false` here and fails loudly
    // instead of silently replacing the winner's manifest — the
    // conflicting-commit failure every snapshot-committed format gives,
    // where a blind overwrite would drop the winner's files from history.
    if (!fs.publishIfAbsent(target, (commitTags.map("#" + _) ++ all).mkString("\n")))
      throw new IllegalStateException(
        s"concurrent commit: version $v of $base was committed by " +
          "another writer; re-read the store state and retry",
        new java.nio.file.FileAlreadyExistsException(target))
    v
  }

  /** Union of the data files referenced by every still-live manifest
    * with version >= `fromVersion` (versions a prior [[vacuum]] already
    * expired are simply absent, not an error).
    */
  def referencedFiles(base: String, fromVersion: Int): Set[String] =
    liveVersions(base).filter(_ >= fromVersion)
      .flatMap(files(base, _)).toSet

  /** Reclaim storage: keep the newest `retain` versions readable and
    * delete everything older — the retention GC every manifest-committed
    * table format pairs with its time travel. Concretely:
    *  - live = union of the manifests in the retention window;
    *  - candidates = parquet files under the directory roots the
    *    manifests govern (ONLY those roots — store metadata written
    *    outside the catalog, e.g. `centroids/` / `planes/`, is never
    *    touched);
    *  - delete candidates not in live: files superseded by a
    *    [[commitRewrite]] compaction beyond the horizon, plus torn
    *    writes that never committed (crash debris) under those SHARED
    *    roots. (A fully uncommitted generation DIRECTORY of the
    *    gen-dir-layout stores appears in no live manifest, so its root
    *    is out of scope here — that debris is the store owner's to
    *    remove, exactly like a table format's untracked directories.)
    *  - delete the expired manifests, so reads of a pre-horizon version
    *    fail fast at resolution instead of listing vanished files.
    * Readers of in-window versions are untouched: their manifests and
    * every file those reference survive byte-identical. Returns the
    * deleted data-file paths.
    *
    * Candidates split into two classes with different delete rules:
    *  - SUPERSEDED files — referenced by some still-present manifest
    *    (one now expiring) but not by the retention window — were
    *    definitely committed, so no writer still needs them: deleted
    *    unconditionally.
    *  - ORPHANS — referenced by NO present manifest — are ambiguous:
    *    crash debris (a [[StagedWrite]] whose mover died mid-promotion,
    *    or a gen-dir writer that never committed), or an IN-FLIGHT
    *    append's just-moved files awaiting their manifest commit.
    *    These are deleted only when older than
    *    `orphanGraceMs`, and the DEFAULT grace is [[DefaultOrphanGraceMs]]
    *    — safe against any append whose write-to-commit latency stays
    *    under it, the same safe-by-default posture table formats give
    *    their orphan-file cleanup. Pass `orphanGraceMs <= 0` to
    *    explicitly reclaim fresh debris (known-quiescent store only).
    */
  def vacuum(base: String, retain: Int,
      orphanGraceMs: Long = DefaultOrphanGraceMs): Seq[String] = {
    require(retain >= 1, "must retain at least the current version")
    val cur = currentVersion(base)
    val horizon = math.max(1, cur - retain + 1)
    // ONE read per live manifest; live/ever-committed/roots all derive
    // from this map — on a remote CatalogFs each manifest is a
    // metadata round-trip, so re-listing per derived set would triple
    // the protocol's I/O for no reason
    val byVersion: Map[Int, Seq[String]] =
      liveVersions(base).map(v => v -> files(base, v)).toMap
    val live = byVersion.collect {
      case (v, fs) if v >= horizon => fs }.flatten.toSet
    val everCommitted = byVersion.values.flatten.toSet
    // roots governed by a live manifest (committed paths' first segment
    // under base) — superseded files under them are in scope even when
    // only expired manifests referenced those exact files. Files
    // OUTSIDE base — a shallow clone's manifests reference the SOURCE
    // store's files by path — are the source store's to manage: the
    // borrower's vacuum never walks (let alone deletes) a foreign
    // root, the same ownership rule table formats give shallow clones.
    val basePath = Paths.get(base).toAbsolutePath.normalize
    val roots = byVersion.values.flatten.flatMap { f =>
      val rel = basePath.relativize(Paths.get(f).toAbsolutePath.normalize)
      if (rel.getNameCount >= 1 && rel.getName(0).toString != "..")
        Some(rel.getName(0).toString)
      else None
    }.toSet
    val cutoff = System.currentTimeMillis() - orphanGraceMs
    val deleted = roots.toSeq.sorted.flatMap { r =>
      listDataFiles(basePath.resolve(r).toString)
        .filterNot(f => live.contains(f))
        // superseded (ever-committed) files delete unconditionally;
        // orphans only past the grace window. A candidate deleted
        // between listing and stat (another process, or a racing
        // vacuum) is already gone — skip it, mirroring the tolerant
        // delete below.
        .filter(f => everCommitted.contains(f) || orphanGraceMs <= 0L ||
          fs.mtimeMillis(f).exists(_ < cutoff))
    }
    deleted.foreach(fs.delete)
    // a data file's sidecars ([[FileStats]] ranges, [[FileBloom]]
    // sketches) die with the file — both are keyed by path, so this is
    // an exact cleanup, and a file that never had one is a no-op delete
    deleted.foreach { f =>
      fs.delete(FileStats.statsPath(base, f))
      fs.delete(FileBloom.bloomPath(base, f))
    }
    (1 until horizon).foreach(v => fs.delete(manifestPath(base, v)))
    deleted
  }
}

/** The default catalog instance — the protocol bound to the local
  * filesystem. Operators call this; tests that exercise the protocol
  * against a different (or instrumented) filesystem instantiate
  * [[IndexCatalogOps]] with their own [[CatalogFs]].
  */
object IndexCatalog extends IndexCatalogOps(LocalCatalogFs)
