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
  * commit. Readers resolve a version to its live-file list and scan
  * exactly those files, so
  *  - a half-written generation is invisible until its manifest commits
  *    (the commit is a single atomic create-if-absent),
  *  - appends never rewrite old partitions — probe-after-append reads
  *    old files byte-identical to what the build wrote,
  *  - committed versions stay readable — the index analogue of table
  *    time travel — until [[vacuum]] expires them past the retention
  *    horizon (an expired version fails fast at manifest resolution).
  *
  * Manifests are INCREMENTAL — a commit records only its DELTA, so
  * commit metadata is O(what the commit touched), never O(store):
  *  - an append manifest lists just the added files (`+path` lines);
  *  - a partition replacement lists the replaced partition KEYS
  *    (`~key` lines) plus the added files — O(touched partitions);
  *  - only a REWRITE ([[commitRewrite]] — compaction, restore), whose
  *    content is by definition the whole live set, writes a full
  *    snapshot (`!full` marker).
  * Version resolution replays the delta chain from the nearest FULL
  * point below: a rewrite manifest, or a CHECKPOINT — a `v<N>.ckpt`
  * snapshot of the resolved list written every
  * [[CheckpointInterval]] commits (and by [[vacuum]] at its horizon,
  * so expiring the pre-horizon chain never strands the survivors).
  * Checkpoints are derived, idempotent metadata (create-if-absent of
  * a list the deltas already determine), so writing one needs no
  * coordination and losing one only lengthens a replay. This is the
  * incremental-log + periodic-checkpoint design production table
  * formats use so that a million-file table's ten-thousandth commit
  * writes kilobytes, not a full file listing — without it, every
  * commit and every read of a 100 TB store pays O(store) metadata.
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
/** Thrown by [[IndexCatalogOps.prepareTxn]] when the named marker is
  * already decided — the caller must take a FRESH marker per attempt.
  * A dedicated type (not a bare require message) so the streaming
  * coordinator's prepare/decide-race handling catches the PROTOCOL
  * condition, not a string that a doc rewording would silently break.
  * Extends IllegalArgumentException to keep the misuse classification.
  */
class TxnMarkerDecidedException(val marker: String, val decision: String)
  extends IllegalArgumentException(
    s"transaction marker $marker is already decided ($decision); " +
      "use a fresh marker per attempt")

class IndexCatalogOps(val fs: CatalogFs) {

  /** Default orphan grace for [[vacuum]]: files not referenced by any
    * present manifest are kept unless at least this stale. 20 minutes
    * covers any fixture-scale (and most production) write-to-commit
    * latency; an in-flight append racing a default vacuum survives.
    */
  val DefaultOrphanGraceMs: Long = 20L * 60 * 1000

  /** A checkpoint snapshot is written every this-many commits (plus
    * at every [[vacuum]] horizon), bounding any version resolution to
    * at most this many delta-manifest reads past a snapshot. Small
    * enough that replay is a handful of KB-sized metadata reads,
    * large enough that snapshot writes stay rare; the knob every
    * incremental-log table format exposes.
    */
  val CheckpointInterval: Int = 8

  private def manifestsDir(base: String): String =
    Paths.get(base, "manifests").toString

  private def manifestPath(base: String, v: Int): String =
    Paths.get(manifestsDir(base), s"v$v.txt").toString

  private def ckptPath(base: String, v: Int): String =
    Paths.get(manifestsDir(base), s"v$v.ckpt").toString

  private def tagsPath(base: String, v: Int): String =
    Paths.get(manifestsDir(base), s"v$v.tags").toString

  private val ManifestName = raw"v(\d+)\.txt".r

  /** The families vacuum's carry applies to — tags with a `key=`
    * shape where the newest instance governs. [[vacuum]] re-carries
    * the newest instance of each that would otherwise expire with the
    * pre-horizon chain, because these are load-bearing store metadata,
    * not per-commit history: losing the last `corpus_stats=` to
    * retention would brick every text-index probe even though the
    * postings themselves survive. Per-commit GUARD/HISTORY
    * tags (`ingest-batch=`, `slice=`, `mv-batch=`, `restore-of=`) are
    * deliberately NOT governing: each instance is a fact about one
    * commit, so "newest instance wins" is the wrong algebra — carrying
    * batch 7's guard while batch 0's expires would give the
    * exactly-once replay guards inconsistent memory. Those expire with
    * their manifests (retention must exceed the replay horizon, as in
    * any snapshot-committed format) and the content-level backstops
    * take over — spec-pinned in StreamIndexAppendSpec /
    * StreamClusterAppendSpec.
    */
  private val GoverningTagFamilies =
    Set("corpus_stats=", "stats_cols=", "check=", "schema=", "centroids=",
      "window_w=")

  /** Highest OCCUPIED version slot, 0 if the store has none — the
    * writer-side counter (the next commit targets this + 1). Readers
    * that must not observe an in-doubt multi-store txn prepare use
    * [[readableVersion]]; for a store no transaction ever touches the
    * two are identical.
    */
  def currentVersion(base: String): Int =
    fs.listNames(manifestsDir(base))
      .collect { case ManifestName(n) => n.toInt }
      .foldLeft(0)(math.max)

  /** One commit's parsed manifest: `#` lines are [[tags]], `!full`
    * marks a snapshot (adds = the complete live list), `+` lines are
    * added files, `~` lines are replaced partition keys. A `?txn:`
    * line marks a PREPARED multi-store transaction participant: the
    * delta applies only once the named decision file says `commit`
    * (see [[txnDecision]]) — until then the slot is reserved but the
    * content is invisible, and a decision of `abort` makes it a
    * permanent no-op.
    */
  private[sources] case class Manifest(tags: Seq[String], full: Boolean,
      adds: Seq[String], removeKeys: Set[String],
      pendingTxn: Option[String] = None)

  private[sources] def readManifest(base: String, v: Int): Manifest = {
    val lines = fs.readString(manifestPath(base, v))
      .split("\n").toSeq.filter(_.nonEmpty)
    Manifest(
      tags = lines.collect { case l if l.startsWith("#") => l.drop(1) },
      full = lines.contains("!full"),
      adds = lines.collect { case l if l.startsWith("+") => l.drop(1) },
      removeKeys =
        lines.collect { case l if l.startsWith("~") => l.drop(1) }.toSet,
      pendingTxn =
        lines.collectFirst { case l if l.startsWith("?txn:") => l.drop(5) })
  }

  /** Once-decided markers memoized in-process: a decision is a
    * WRITE-ONCE fact (the create-if-absent CAS is the only writer),
    * so once a verdict has been observed the cache can never go stale
    * — without it every resolution walk re-reads and re-parses the
    * same immutable file twice per txn-participant version
    * ([[txnDecision]] + [[txnParticipants]] inside
    * [[manifestApplies]]), turning hot-path version resolution into
    * repeated filesystem reads. Undecided (absent) markers are NEVER
    * cached: in-doubt is the one state that changes.
    */
  private val decidedCache = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Option[Set[(String, Int)]])]()

  /** Read + parse + memoize a decided marker: `(verdict,
    * participants)` once the file exists, None while in doubt.
    */
  private def readDecision(
      marker: String): Option[(String, Option[Set[(String, Int)]])] = {
    val cached = decidedCache.get(marker)
    if (cached != null) return Some(cached)
    if (!fs.exists(marker)) return None
    val lines = fs.readString(marker).trim.linesIterator.toSeq
    val verdict = lines.head.trim
    val parts = lines.drop(1).filter(_.contains("@")).map { l =>
      val i = l.indexOf('@')
      (normBase(l.substring(i + 1)), l.substring(0, i).toInt)
    }
    val parsed = (verdict, if (parts.isEmpty) None else Some(parts.toSet))
    decidedCache.putIfAbsent(marker, parsed)
    Some(parsed)
  }

  /** The decision of the multi-store transaction whose decision file
    * is `marker`: `Some("commit")` / `Some("abort")` once decided,
    * `None` while in doubt. The decision is a SINGLE create-if-absent
    * file whose FIRST line is the verdict — one CAS, so a commit/abort
    * race has exactly one winner and every reader agrees forever. A
    * commit written by [[commitTxn]] also ENUMERATES its participants
    * (`<version>@<base>` lines, see [[txnParticipants]]); the verdict
    * line alone answers this lookup. Decided lookups are memoized
    * ([[readDecision]]) — decisions are immutable once written.
    */
  def txnDecision(marker: String): Option[String] =
    readDecision(marker).map(_._1)

  /** The `(base, version)` participants a COMMIT decision enumerates,
    * or None when the decision carries no list (abort verdicts, and
    * commits written by a direct [[decideTxn]] call without
    * participants — those apply to every prepare naming the marker,
    * the pre-enumeration semantics). [[commitTxn]] always enumerates,
    * which is what closes the late-prepare race: a prepare PUBLISHED
    * after the decision can never be in the list, so it can never
    * become visible (see [[manifestApplies]]).
    */
  def txnParticipants(marker: String): Option[Set[(String, Int)]] =
    readDecision(marker).flatMap(_._2)

  /** Canonical store identity for participant membership: prepare-side
    * and read-side base strings must agree even when one is relative,
    * carries redundant segments, or reaches the store THROUGH A
    * SYMLINK. Lexical normalization alone is not enough for the last
    * case — a symlinked store root normalizes to the link's spelling
    * on one side and the target's on the other, and a committed
    * participant would then silently resolve as a permanent no-op
    * (membership rejection = data invisibility). `toRealPath`
    * resolves links against the live filesystem; a path that no
    * longer exists falls back to lexical normalization — by then no
    * reader can resolve manifests under it anyway. Both the write
    * side ([[decideTxn]]) and every read side re-canonicalize through
    * this one function, so even decision files recorded under the
    * old lexical form compare equal once re-normalized.
    */
  private def normBase(base: String): String = {
    val p = Paths.get(base)
    try p.toRealPath().toString
    catch { case _: java.io.IOException => p.toAbsolutePath.normalize.toString }
  }

  /** Decide the transaction at `marker` with `verdict` ("commit" or
    * "abort") and return the ACTUAL decision — the first writer's, if
    * a racing decider got there first. Idempotent; losing the CAS is
    * not an error, it is how the protocol serializes the decision.
    *
    * `participants` (commit only) enumerates the prepared slots this
    * decision covers as `(base, version)` pairs; when present, ONLY
    * those slots apply ([[manifestApplies]]) — a prepare against the
    * same marker that published after the decision (a racing replay
    * that passed [[prepareTxn]]'s in-doubt check before the decision
    * landed) is then a permanent no-op instead of a born-visible
    * duplicate. [[commitTxn]] always passes its participant list.
    */
  def decideTxn(marker: String, verdict: String,
      participants: Seq[(String, Int)] = Seq.empty): String = {
    require(verdict == "commit" || verdict == "abort", verdict)
    require(participants.isEmpty || verdict == "commit",
      "participants enumerate a COMMIT's covered slots; an abort covers none")
    val parent = Paths.get(marker).getParent
    if (parent != null) fs.mkdirs(parent.toString)
    val content = (verdict +: participants.map { case (b, v) =>
      s"$v@${normBase(b)}" }).mkString("\n")
    fs.publishIfAbsent(marker, content)
    // read back through the memoizing parse: the winner may be a
    // RACING decider, and its (verdict, participants) is what every
    // later lookup must see
    readDecision(marker).get._1
  }

  /** Whether version `v`'s manifest content APPLIES to resolution —
    * true for ordinary commits and decided-commit txn participants,
    * false for aborted ones. A commit decision that ENUMERATES its
    * participants ([[txnParticipants]]) applies only to listed
    * `(base, version)` slots: a prepare against the same marker that
    * published AFTER the decision landed (the racing-replay TOCTOU —
    * it passed [[prepareTxn]]'s in-doubt check before the decision)
    * is outside the list and reads as a permanent no-op, never a
    * born-visible duplicate. An undecided participant throws when
    * `strict` (resolution must not guess) and reads as not-applied
    * otherwise (tag lookups see a snapshot without the in-doubt txn).
    */
  private def manifestApplies(base: String, v: Int, m: Manifest,
      strict: Boolean): Boolean = m.pendingTxn match {
    case None => true
    case Some(marker) => txnDecision(marker) match {
      case Some("commit") =>
        txnParticipants(marker).forall(_.contains((normBase(base), v)))
      case Some(_) => false
      case None if strict => throw new IllegalStateException(
        s"version $v of $base is a prepared multi-store transaction " +
          s"participant whose decision ($marker) is still in doubt; " +
          "commit or abort the transaction (any later writer to this " +
          "store fences it to abort)")
      case None => false
    }
  }

  /** The partition keys a committed version TOUCHED — added files'
    * keys plus replaced keys (conservatively including keys replaced
    * with nothing), None when the commit was a full rewrite (which
    * touches everything). The input to key-level conflict detection
    * ([[commitReplacePartitionsRebasing]]); reading it is one
    * delta-manifest read, never a resolution.
    */
  private[graft] def touchedKeys(base: String, v: Int): Option[Set[String]] = {
    val m = readManifest(base, v)
    if (!manifestApplies(base, v, m, strict = true))
      Some(Set.empty) // aborted txn participant: a permanent no-op
    else if (m.full) None
    else Some(m.adds.flatMap(partitionKey).toSet ++ m.removeKeys)
  }

  /** The data files of committed version `v` (paths, sorted),
    * resolved by replaying the delta chain from the nearest full
    * point at or below `v` (a `!full` rewrite manifest, a checkpoint
    * snapshot, or the empty store at version 0). A version whose
    * chain was expired by [[vacuum]] fails fast at the missing
    * manifest read.
    */
  def files(base: String, v: Int): Seq[String] = {
    require(v >= 1, s"version $v is not committed")
    // walk back collecting deltas until a full point, then replay
    var deltas = List.empty[Manifest] // oldest-first via prepend
    var cursor = v
    var full: Seq[String] = null
    while (full == null) {
      val m = readManifest(base, cursor) // absent manifest: expired, fail fast
      // an aborted txn participant is a permanent no-op delta; an
      // undecided one throws (strict) — resolution must never guess a
      // transaction's outcome. Only the raw head can be in doubt: any
      // writer publishing PAST a prepared slot fences it first.
      val applies = manifestApplies(base, cursor, m, strict = true)
      if (applies && m.full) full = m.adds
      else if (fs.exists(ckptPath(base, cursor)))
        // a checkpoint is the POST-commit state of its version: use it
        // as the base and do not re-apply that version's delta
        full = fs.readString(ckptPath(base, cursor))
          .split("\n").toSeq.filter(_.nonEmpty)
      else {
        if (applies) deltas = m :: deltas
        cursor -= 1
        if (cursor == 0) full = Seq.empty
      }
    }
    var state = full
    deltas.foreach { m =>
      val kept =
        if (m.removeKeys.isEmpty) state
        else state.filterNot(f => partitionKey(f).exists(m.removeKeys.contains))
      state = kept ++ m.adds
    }
    state.sorted
  }

  /** Metadata tags recorded by version `v`'s commit — `#`-prefixed
    * lines in the manifest, so a tag becomes visible in the SAME
    * atomic manifest commit (create-if-absent) that publishes the
    * delta.
    */
  def tags(base: String, v: Int): Seq[String] = readManifest(base, v).tags

  /** The tags [[vacuum]] re-carried at version `v`'s horizon snapshot
    * — newest-per-family survivors of the expired pre-`v` chain.
    * Empty when no vacuum ever expired a chain below `v`.
    */
  private[sources] def carriedTags(base: String, v: Int): Seq[String] = {
    val p = tagsPath(base, v)
    if (!fs.exists(p)) Seq.empty
    else fs.readString(p).split("\n").toSeq.filter(_.nonEmpty)
  }

  /** The newest governing tag starting with `prefix` — resolved over
    * live manifests AND the carried-tag snapshots vacuum leaves at
    * expired chains' horizons, newest first (a version's own manifest
    * tags supersede tags carried AT it, which are older by
    * construction). The lookup every newest-wins tag family
    * (`corpus_stats=`, `stats_cols=`, `check=`, `centroids=`) goes
    * through, so retention can never silently un-declare store
    * metadata.
    *
    * RESTORE-AWARE: governing tags are content-coupled (a schema, a
    * stats census, a centroid geometry describe the FILES), and a
    * restore commit rebases the store's content to its target — so
    * when the walk reaches a `restore-of=K` commit that does not
    * itself declare the family, resolution JUMPS to K and continues
    * there, exactly as file resolution does. Without the jump, a
    * rollback past a RECLUSTER would pair the restored old-geometry
    * rows with the newest (undone) centroid family — the torn state
    * the atomic rewrite exists to prevent; with it, a family declared
    * only in the undone suffix correctly resolves to None.
    */
  def newestTag(base: String, prefix: String): Option[String] =
    newestTagThrough(base, prefix, Int.MaxValue)

  /** [[newestTag]] restricted to live versions <= `cap` — the shared
    * walk (newest-first, applied tags over carried, restore-of
    * lineage jumps) that both the global lookup and vacuum's
    * carried-tag fold resolve through.
    */
  private def newestTagThrough(
      base: String, prefix: String, cap: Int): Option[String] = {
    var vs = liveVersions(base).filter(_ <= cap).sorted.reverse.toList
    while (vs.nonEmpty) {
      val v = vs.head
      vs = vs.tail
      val applied = appliedTags(base, v)
      val hit = applied.reverseIterator.find(_.startsWith(prefix))
        .orElse(carriedTags(base, v).reverseIterator.find(_.startsWith(prefix)))
      if (hit.isDefined) return hit
      applied.reverseIterator.find(_.startsWith("restore-of=")).foreach { r =>
        val k = r.stripPrefix("restore-of=").toInt
        vs = vs.filter(_ <= k)
      }
    }
    None
  }

  /** Version `v`'s manifest tags IF its content applies — empty for
    * an aborted txn participant (its tags were never committed) and
    * for an in-doubt one (a tag snapshot must not include a
    * transaction whose outcome is unknown). Tag lookups go through
    * this so `corpus_stats=` et al. never leak from a dead prepare.
    */
  private def appliedTags(base: String, v: Int): Seq[String] = {
    val m = readManifest(base, v)
    if (manifestApplies(base, v, m, strict = false)) m.tags
    else Seq.empty
  }

  /** Every tag on a still-live manifest, plus vacuum-carried tags. The
    * streaming ingest path keys its exactly-once guard on this set: a
    * replayed micro-batch whose tag is already committed must not
    * commit again. (Retention must still exceed the replay horizon —
    * [[vacuum]] carries forward only the NEWEST tag per `key=` family,
    * so older replay-guard tags expire with their manifests, as in any
    * snapshot-committed format.)
    */
  def committedTags(base: String): Set[String] =
    liveVersions(base).iterator
      .flatMap(v => appliedTags(base, v) ++ carriedTags(base, v)).toSet

  /** Versions whose manifest is still present — committed and not yet
    * expired by [[vacuum]]. The catalog's readable history.
    */
  def liveVersions(base: String): Seq[Int] =
    (1 to currentVersion(base)).filter(v => fs.exists(manifestPath(base, v)))

  /** The newest version a READER may resolve: the raw head, unless
    * the head is a prepared txn participant still in doubt — then the
    * slot below it (an in-doubt txn is invisible until decided, and
    * the fencing rule keeps at most the head undecided). Decided slots
    * — committed or aborted — resolve normally.
    */
  def readableVersion(base: String): Int = {
    var v = currentVersion(base) // the head manifest always exists
    while (v >= 1 &&
        readManifest(base, v).pendingTxn.exists(txnDecision(_).isEmpty))
      v -= 1
    v
  }

  /** The current readable version's files; empty for an empty store. */
  def latestFiles(base: String): Seq[String] = {
    val v = readableVersion(base)
    if (v == 0) Seq.empty else files(base, v)
  }

  /** A fresh generation directory for the NEXT commit. Writers put new
    * parquet files here, then call [[commit]]; until then the
    * generation is invisible to every reader.
    *
    * The directory is UNIQUE PER CALL (version-prefixed for
    * debuggability, random-suffixed for identity): deriving the name
    * from `currentVersion` alone would hand two concurrent writers —
    * e.g. a zombie driver and its restarted replacement replaying one
    * micro-batch — the SAME directory, where an `overwrite`-mode
    * writer deletes the other's possibly already-COMMITTED files (the
    * live manifest then references deleted data), and even append-mode
    * writers cross-contaminate each other's `listDataFiles` commit
    * listing. Generation-dir names carry no semantics (partition keys
    * are the `k=v` segments under them), so uniqueness is free; an
    * abandoned loser's directory is ordinary orphan debris for
    * [[vacuum]].
    */
  def newGenDir(base: String): String = {
    val v = currentVersion(base) + 1
    val p = Paths.get(base,
      f"gen-v$v%05d-${java.util.UUID.randomUUID().toString.take(12)}").toString
    fs.mkdirs(p) // through the CatalogFs seam, like every other touch
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
    // the delta manifest lists ONLY this commit's files — O(batch)
    // metadata written no matter how large the store has grown; the
    // predecessor chain is never read, only the version CAS races
    writeDeltaAt(base, currentVersion(base) + 1,
      newFiles.sorted, Set.empty, commitTags)
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
    // the delta records replaced KEYS + added files — O(touched
    // partitions) metadata; resolution applies the key removal to
    // whatever the predecessor chain holds, so the kept list is never
    // materialized at commit time
    writeDeltaAt(base, basedOn + 1, newFiles.sorted, replaced, commitTags)
  }

  /** [[commitReplacePartitions]] with KEY-LEVEL conflict handling: on
    * losing the version CAS, the intervening commits' touched
    * partition keys (one delta-manifest read each — this is what the
    * incremental manifests buy) are checked against this replacement's
    * keys. Disjoint — the common case of a replacement racing appends
    * into OTHER partitions — means the derived content is still valid
    * against the new head, so the commit REBASES (re-targets the head
    * + 1) without the caller re-deriving anything; sound because
    * resolution applies this commit's key removals to whatever the
    * predecessor chain holds, so the interleaved commits' files in
    * other partitions carry forward untouched. An intervening commit
    * that touched one of OUR keys (or a full rewrite, which touches
    * everything) re-raises the CAS conflict: the caller must
    * re-derive its replacement content against the winner's state,
    * exactly the serialization rule [[commitReplacePartitions]]
    * documents. This is the commit-level conflict detection
    * production snapshot formats run so that logically-independent
    * writers never serialize on re-derivation.
    *
    * `addConflicts` extends conflict detection beyond keys for
    * PREDICATE-DRIVEN writers (UPDATE, which must FIND its change
    * set): it sees each key-disjoint intervening commit's ADDED
    * files and returns true when their content could have matched
    * the caller's predicate — rows the find phase never read, the
    * write-skew key-level detection alone cannot see. Default
    * `_ => false` keeps the pure key-level rule for writers whose
    * change set is handed in (MERGE / DELETE / compaction).
    */
  def commitReplacePartitionsRebasing(base: String, newFiles: Seq[String],
      commitTags: Seq[String], basedOn: Int,
      extraReplacedKeys: Set[String] = Set.empty,
      maxAttempts: Int = 16,
      addConflicts: Seq[String] => Boolean = _ => false): Int = {
    val myKeys = newFiles.flatMap(partitionKey).toSet ++ extraReplacedKeys
    var bo = basedOn
    var n = 0
    while (true) {
      n += 1
      try return commitReplacePartitions(
        base, newFiles, commitTags, bo, extraReplacedKeys)
      catch {
        case e if isCommitConflict(e) && n < maxAttempts =>
          val head = currentVersion(base)
          val conflicting = (bo + 1 to head).exists { v =>
            val m = readManifest(base, v)
            // an intervening PREPARED txn participant: fence an
            // undecided one to abort (the writer rule — our commit
            // would fence it at publish anyway), then judge by the
            // actual decision; an aborted slot touched nothing, and a
            // decided-commit slot OUTSIDE the decision's participant
            // list (a late prepare the enumeration fenced) is the
            // same permanent no-op resolution sees
            val applies = m.pendingTxn match {
              case Some(marker) => decideTxn(marker, "abort") == "commit" &&
                txnParticipants(marker).forall(_.contains((normBase(base), v)))
              case None => true
            }
            if (!applies) false
            else if (m.full) true // full rewrite: content conflict
            else {
              val ks = m.adds.flatMap(partitionKey).toSet ++ m.removeKeys
              ks.exists(myKeys.contains) ||
                (m.adds.nonEmpty && addConflicts(m.adds))
            }
          }
          if (conflicting) throw e // caller must re-derive
          bo = head // disjoint keys: rebase, content still valid
      }
    }
    throw new IllegalStateException(s"unreachable: $maxAttempts attempts")
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
    // a rewrite's content IS the whole live set, so its manifest is a
    // full snapshot — which also makes it a free resolution point
    writeFullAt(base, basedOn + 1, files.sorted, commitTags)
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
    *
    * `removeKeys` names partition keys this commit SUPERSEDES — the
    * derived-summary pattern (a `hot=` boilerplate census, a
    * `stats=`-style rollup): the commit's files append, while the
    * named keys' previous files leave the live set in the SAME atomic
    * manifest, so readers always see data and its derived summary
    * from one version. Prior versions keep their own summary (time
    * travel stays consistent); a summary the prepare recomputes must
    * be staged INSIDE `prepare` so a lost CAS re-derives it against
    * the winner's state.
    */
  def commitWithRetry(base: String, maxAttempts: Int = 16,
      removeKeys: Set[String] = Set.empty)
      (prepare: Int => (Seq[String], Seq[String])): Int =
    retryingCommit(maxAttempts) {
      val cur = currentVersion(base)
      val (newFiles, commitTags) = prepare(cur)
      require(newFiles.nonEmpty, "no parquet files to commit")
      writeDeltaAt(base, cur + 1, newFiles.sorted, removeKeys, commitTags)
    }

  /** [[commitWithRetry]] with an exactly-once TAG FENCE evaluated
    * INSIDE the CAS loop — the commit-layer form of the streamed
    * ingest replay guard. A check done once before the commit
    * (check-then-act) leaves a window where two concurrent replays of
    * the same micro-batch — a zombie driver and its restarted
    * replacement — both see the tag absent and both commit, silently
    * doubling the batch's rows (and, for stores whose probes SUM
    * per-generation partials, corrupting every later census). Here the
    * fence re-evaluates on every attempt against a tag snapshot at
    * least as new as the observed version, and publication is the same
    * version CAS: a racing duplicate either sees the winner's tag
    * before preparing, or loses the CAS, re-runs, and then sees it.
    * At most one commit can ever carry `fenceTag`.
    *
    * Returns the committed version, or None when fenced (the replay
    * no-op). `prepare`'s extra tags ride the same manifest as the
    * fence tag. A fenced loser's already-staged files become orphan
    * debris outside any manifest — [[vacuum]]'s normal crashed-writer
    * cleanup, the price of not holding locks.
    */
  def commitTaggedOnce(base: String, fenceTag: String, maxAttempts: Int = 16,
      removeKeys: Set[String] = Set.empty)
      (prepare: Int => (Seq[String], Seq[String])): Option[Int] = {
    var n = 0
    while (n < maxAttempts) {
      n += 1
      val cur = currentVersion(base)
      // committedTags resolves against the version current at ITS read
      // (>= cur): a same-tag commit landing in [cur-read, fence-read]
      // is seen here; one landing after is at cur + 1 and fails our CAS
      if (committedTags(base).contains(fenceTag)) return None
      val (newFiles, extraTags) = prepare(cur)
      require(newFiles.nonEmpty, "no parquet files to commit")
      try return Some(writeDeltaAt(base, cur + 1, newFiles.sorted, removeKeys,
        fenceTag +: extraTags))
      catch {
        case e if isCommitConflict(e) && n < maxAttempts =>
          Thread.sleep(math.min(64L, 1L << math.min(n, 6)))
      }
    }
    throw new IllegalStateException(s"unreachable: $maxAttempts attempts")
  }

  /** Phase 1 of a MULTI-STORE TRANSACTION: publish an append delta in
    * this store that is INVISIBLE until the transaction at `marker`
    * decides. The prepare occupies the next version slot through the
    * normal CAS (so single-store writers and other txns serialize
    * against it), but readers resolve past it ([[readableVersion]]),
    * its tags stay out of [[committedTags]]/[[newestTag]], and its
    * delta applies only on a `commit` decision — `abort` makes the
    * slot a permanent no-op that later resolution skips.
    *
    * The decision file is the ATOMICITY point: N stores' prepares all
    * name the same `marker`, so the coordinator's single
    * [[decideTxn]]("commit") CAS flips every participant visible at
    * once — the cross-store analogue of the one-manifest commit, with
    * the same create-if-absent primitive underneath. Failure handling
    * is optimistic: any writer that lands AFTER an undecided prepare
    * (including vacuum) fences the transaction to `abort`, so a
    * crashed coordinator can never wedge a store and the in-doubt
    * window is exactly the coordinator's prepare→decide span. A
    * coordinator must therefore treat "my commit CAS lost to an abort"
    * as a clean transaction failure and retry from fresh prepares —
    * the same rule every optimistic-2PC table format imposes. One
    * prepare per store per transaction.
    */
  def prepareTxn(base: String, newFiles: Seq[String],
      commitTags: Seq[String], marker: String): Int = {
    require(newFiles.nonEmpty, "no parquet files to prepare")
    // a decided marker must never be reused: a prepare against it
    // would be born-decided — instantly visible with no atomicity.
    // (A coordinator retrying after a fence uses a FRESH marker.) The
    // check is best-effort against misuse, not a race-free gate: a
    // decision landing after it is the atomic flip working, and the
    // prepare that slipped past is fenced STRUCTURALLY — [[commitTxn]]
    // enumerates its participants in the decision file, and
    // [[manifestApplies]] rejects any same-marker slot outside the
    // list, so a late prepare is a permanent no-op, never a duplicate.
    txnDecision(marker).foreach(d =>
      throw new TxnMarkerDecidedException(marker, d))
    retryingCommit() {
      writeDeltaAt(base, currentVersion(base) + 1,
        newFiles.sorted, Set.empty, commitTags, pendingTxn = Some(marker))
    }
  }

  /** Run a whole multi-store transaction: prepare every participant
    * (`(base, newFiles, commitTags)`, in order), then attempt the
    * commit decision. Returns the participants' committed versions,
    * or None when the transaction aborted — a concurrent writer
    * fenced an undecided prepare, or a prepare failed outright (the
    * marker is then decided `abort` so no participant can ever become
    * visible). Either way every store is left consistent: all
    * participants visible, or none.
    */
  def commitTxn(marker: String,
      parts: Seq[(String, Seq[String], Seq[String])]): Option[Seq[Int]] = {
    // one prepare per store: a second prepare in the same store would
    // fence the first — the transaction would abort itself. Identity is
    // the canonical path: two spellings of one store are one store.
    require(parts.map(p => normBase(p._1)).distinct.size == parts.size,
      s"duplicate store in transaction parts: ${parts.map(_._1)}")
    val prepared =
      try parts.map { case (base, newFiles, tags) =>
        prepareTxn(base, newFiles, tags, marker)
      }
      catch {
        case e: Throwable =>
          decideTxn(marker, "abort") // no participant may ever apply
          throw e
      }
    // the commit decision ENUMERATES its participants: only these
    // (base, version) slots ever apply under this marker, so a racing
    // same-marker prepare that publishes after this CAS is structurally
    // fenced (manifestApplies membership) instead of born-visible
    val participants = parts.map(_._1).zip(prepared)
    if (decideTxn(marker, "commit", participants) == "commit") Some(prepared)
    else None
  }

  /** Reclaim DECIDED transaction markers no live manifest references —
    * the decision-file GC paired with [[vacuum]]. A marker must outlive
    * every manifest whose `?txn:` line names it (deleting it early
    * would flip a committed participant back to in-doubt — content
    * corruption), so deletion requires BOTH: the marker is decided,
    * and none of `bases`' still-live manifests reference it. The
    * caller names every store the marker directory's transactions
    * could have touched — the same scoping contract vacuum has with
    * its directory roots. Undecided markers are kept regardless (an
    * in-flight coordinator owns them; its participants' manifests may
    * not exist yet). Returns the deleted marker paths.
    *
    * Decided markers are additionally kept within `graceMs` of their
    * decision (mtime), DEFAULT [[DefaultOrphanGraceMs]]: after
    * compaction + vacuum expire a streaming batch's `ingest-batch=`
    * tag manifests, the decided marker is the LAST exactly-once guard
    * a late replay of that batch meets (StreamTxnSpec's marker
    * backstop) — GC'ing it while replays are still possible re-opens
    * the double-commit window. Keep the grace above the stream's
    * replay horizon; pass `graceMs <= 0` only for a known-quiescent
    * marker directory (no source can re-deliver its batches).
    */
  def vacuumTxnMarkers(markerDir: String, bases: Seq[String],
      graceMs: Long = DefaultOrphanGraceMs): Seq[String] = {
    // marker identity is the CANONICAL path ([[normBase]]'s treatment):
    // manifests record the marker string the COORDINATOR spelled — a
    // relative or non-normalized spelling there would otherwise never
    // equal this walk's absolute candidate, and a decided marker that
    // live manifests still reference would be deleted, permanently
    // flipping a committed participant back to in-doubt (strict
    // resolution then throws on it forever)
    val referenced: Set[String] = bases.flatMap { b =>
      liveVersions(b).flatMap(v => readManifest(b, v).pendingTxn)
    }.map(normBase).toSet
    val cutoff = System.currentTimeMillis() - graceMs
    fs.listNames(markerDir).flatMap { n =>
      val p = Paths.get(markerDir, n).toString
      val pastGrace = graceMs <= 0 ||
        fs.mtimeMillis(p).exists(_ < cutoff) // vanished = racing GC won
      if (!referenced.contains(normBase(p)) && pastGrace &&
          txnDecision(p).isDefined) {
        fs.delete(p)
        // drop the memoized verdict with the file: a GC'd marker path
        // must read as absent in THIS process too (markers are
        // contract-bound to never be reused, but the cache must not
        // make same-name reuse fail here while succeeding in a fresh
        // process). Cross-process caches are safe by the GC contract:
        // deletion requires that no live manifest references the
        // marker, so no resolution ever consults it again.
        decidedCache.remove(p)
        Some(p)
      } else None
    }.sorted
  }

  /** A CONSISTENT multi-store read snapshot: one readable version per
    * base, guaranteed to contain every multi-store transaction's
    * effects in ALL of the listed stores or in NONE — the read-side
    * complement of [[commitTxn]] (whose single decision CAS makes the
    * write atomic, but a reader capturing store versions one at a time
    * could still straddle it). The guarantee is the seqlock rule:
    * capture every base's [[readableVersion]], then re-read them all —
    * if every version is unchanged, no commit (txn or otherwise)
    * landed in any listed store between its first and second read, so
    * the captured vector is a cut no transaction crosses; otherwise
    * retry. Cost is two KB-sized metadata reads per store per attempt,
    * no locks, no writer coordination; under sustained write pressure
    * the loop gives up loudly after `maxAttempts` (read-only callers
    * can fall back to per-store reads, which are each individually
    * consistent). Use the returned vector with [[files]] for as-of
    * scans — versions stay resolvable until [[vacuum]] expires them,
    * so the snapshot outlives the loop by the retention window.
    *
    * `beforeValidate` is a test seam (defaults to nothing): it runs
    * between capture and validation, exactly the window a racing
    * transaction must be caught in.
    */
  def consistentSnapshot(bases: Seq[String], maxAttempts: Int = 16,
      beforeValidate: () => Unit = () => ()): Seq[Int] = {
    require(bases.nonEmpty, "no stores to snapshot")
    var n = 0
    while (n < maxAttempts) {
      n += 1
      val captured = bases.map(readableVersion)
      beforeValidate()
      if (bases.map(readableVersion) == captured) return captured
    }
    throw new IllegalStateException(
      s"no stable multi-store snapshot in $maxAttempts attempts — " +
        "sustained commit pressure on the listed stores")
  }

  private def writeDeltaAt(base: String, v: Int, adds: Seq[String],
      removeKeys: Set[String], commitTags: Seq[String],
      pendingTxn: Option[String] = None): Int = {
    publishManifest(base, v, commitTags.map("#" + _) ++
      pendingTxn.map("?txn:" + _).toSeq ++
      removeKeys.toSeq.sorted.map("~" + _) ++ adds.map("+" + _))
    // periodic checkpoint: a derived, idempotent snapshot so later
    // resolutions replay at most CheckpointInterval deltas. Written
    // AFTER the commit succeeded — a crash here loses nothing (the
    // next resolution just replays further), and create-if-absent
    // makes a replayed writer's re-attempt a no-op. A PREPARED txn
    // slot skips it: its resolution is undefined until the decision,
    // and any later checkpoint() call materializes it decided.
    if (v % CheckpointInterval == 0 && pendingTxn.isEmpty) checkpoint(base, v)
    v
  }

  private def writeFullAt(base: String, v: Int, all: Seq[String],
      commitTags: Seq[String]): Int =
    publishManifest(base, v,
      commitTags.map("#" + _) ++ Seq("!full") ++ all.map("+" + _))

  /** Materialize version `v`'s resolved file list as a `v<N>.ckpt`
    * snapshot (idempotent; no-op when present). Safe to call from any
    * process at any time — the content is fully determined by the
    * committed chain. (Exception: an in-doubt txn prepare has no
    * resolved state yet — resolution throws until the decision, like
    * any read of that version.)
    */
  def checkpoint(base: String, v: Int): Unit = {
    val p = ckptPath(base, v)
    if (!fs.exists(p)) fs.publishIfAbsent(p, files(base, v).mkString("\n"))
  }

  /** True iff version `v`'s checkpoint snapshot is materialized —
    * observable protocol state for specs and gated queries.
    */
  def hasCheckpoint(base: String, v: Int): Boolean =
    fs.exists(ckptPath(base, v))

  private def publishManifest(base: String, v: Int, lines: Seq[String]): Int = {
    require(lines.forall(l => !l.contains("\n")),
      "manifest entries are single-line")
    // FENCE: before occupying slot v, decide any still-in-doubt txn
    // prepare at v-1 — to abort (the coordinator that meant to commit
    // has lost the race; it learns so at its own marker CAS). This is
    // what makes "a version with a successor is decided" an invariant,
    // so resolution of interior versions never meets an undecided txn
    // and an orphaned prepare (crashed coordinator) cannot wedge the
    // store: the next writer clears it. One extra manifest read per
    // commit — the same read-the-log-tail cost every snapshot format's
    // commit pays.
    if (v > 1 && fs.exists(manifestPath(base, v - 1)))
      readManifest(base, v - 1).pendingTxn.foreach { marker =>
        if (txnDecision(marker).isEmpty) decideTxn(marker, "abort")
      }
    fs.mkdirs(manifestsDir(base))
    val target = manifestPath(base, v)
    // publishIfAbsent is an atomic create-IF-ABSENT: a racing committer
    // that also computed version v gets `false` here and fails loudly
    // instead of silently replacing the winner's manifest — the
    // conflicting-commit failure every snapshot-committed format gives,
    // where a blind overwrite would drop the winner's files from history.
    if (!fs.publishIfAbsent(target, lines.mkString("\n")))
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
    // vacuum is a writer: an in-doubt txn prepare at the head is
    // fenced to abort (same rule as any commit landing after it), so
    // every resolution below is over decided slots only
    if (cur >= 1)
      readManifest(base, cur).pendingTxn.foreach { marker =>
        if (txnDecision(marker).isEmpty) decideTxn(marker, "abort")
      }
    var horizon = math.max(1, cur - retain + 1)
    // A LIVE restore ABOVE the horizon whose target falls BELOW it
    // would have its tag lineage expired out from under it: its
    // newestTag walk jumps to <= target and finds neither a live
    // manifest nor a carried snapshot there — the horizon carry below
    // reflects the HORIZON's own lineage, which such a restore
    // bypasses — so the restored head's files stay live while the
    // store's governing tags (window_w=, centroids=) silently
    // un-declare. A restore sitting AT the horizon is fine (the carry
    // resolves through its restore-of indirection, `hJump` below); a
    // restore BELOW the horizon expires whole and its lineage folds
    // into the carry's restore-aware walk. So: cap the horizon at the
    // minimum restore-of target among strictly-above-horizon live
    // versions. Fixpoint — capping keeps more versions live, which
    // can surface deeper live restores; each step strictly lowers the
    // horizon, so it terminates at >= 1.
    var rescanRestores = true
    while (rescanRestores) {
      rescanRestores = false
      ((horizon + 1) to cur)
        .filter(v => fs.exists(manifestPath(base, v)))
        .flatMap(v => appliedTags(base, v).reverseIterator
          .find(_.startsWith("restore-of="))
          .map(_.stripPrefix("restore-of=").toInt))
        .filter(_ < horizon)
        .minOption
        .foreach { t => horizon = t; rescanRestores = true }
    }
    // the horizon version must stay resolvable once its predecessor
    // delta chain expires: materialize its snapshot first (idempotent;
    // skipped when its own manifest is already full, or when an
    // earlier tighter vacuum already expired the version itself)
    if (horizon > 1 && fs.exists(manifestPath(base, horizon)) &&
        !readManifest(base, horizon).full)
      checkpoint(base, horizon)
    // governing tags that would expire with the pre-horizon chain:
    // the newest instance per `key=` family among versions < horizon
    // (their manifest tags and any earlier vacuum's carried snapshot,
    // folded oldest-first so later instances win) is re-published at
    // the horizon — content is determined by the immutable chain, so
    // create-if-absent makes racing vacuums agree
    if (horizon > 1) {
      // per family, the newest instance over the expiring pre-horizon
      // chain THROUGH THE SAME restore-aware walk newestTag uses —
      // folding the chain linearly would resurrect a tag a restore in
      // that chain had undone (appliedTags inside the walk already
      // excludes aborted txn participants' never-committed tags). The
      // HORIZON's own restore-of indirection caps the walk too: when
      // the new oldest live version is itself a restore, the expired
      // chain's view from it is its TARGET's lineage — without the cap
      // a vacuum landing right after a rollback would carry the undone
      // suffix's declarations into the horizon snapshot. (Tag lineage
      // below a restore target that retention has already expired is
      // gone — retention must exceed the rollback window, the same
      // rule the replay guards impose on consumer lag.)
      // (horizon's manifest may itself be a gap an earlier, tighter
      // vacuum left — no manifest, no indirection to honor)
      val hJump =
        if (!fs.exists(manifestPath(base, horizon))) None
        else appliedTags(base, horizon).reverseIterator
          .find(_.startsWith("restore-of="))
          .map(_.stripPrefix("restore-of=").toInt)
      val cap = math.min(horizon - 1, hJump.getOrElse(horizon - 1))
      val carried = GoverningTagFamilies.toSeq.sorted.flatMap { fam =>
        newestTagThrough(base, fam, cap)
      }
      if (carried.nonEmpty)
        fs.publishIfAbsent(tagsPath(base, horizon), carried.mkString("\n"))
    }
    // ONE resolution per live version; live/ever-committed/roots all
    // derive from this map — on a remote CatalogFs each manifest is a
    // metadata round-trip, so re-listing per derived set would triple
    // the protocol's I/O for no reason. Bounded to the versions fenced
    // at entry (<= cur): a commit landing DURING the vacuum — or a txn
    // prepare, which strict resolution would throw on as in-doubt — is
    // not this vacuum's concern, and its just-written files are
    // orphan-grace-protected like any in-flight append's.
    val byVersion: Map[Int, Seq[String]] =
      liveVersions(base).filter(_ <= cur).map(v => v -> files(base, v)).toMap
    // membership identity is the CANONICAL path (absolute, lexically
    // normalized — the same treatment `basePath` below gets): manifests
    // record paths in the WRITER's spelling, so a store written via a
    // relative or non-normalized base would otherwise have every
    // committed file mis-classified as an orphan and mass-deleted once
    // the grace window passed — silent data loss from a path spelling.
    def canon(f: String): String =
      Paths.get(f).toAbsolutePath.normalize.toString
    // canonical -> the manifest spellings that map to it (needed again
    // for sidecar cleanup: sidecar names hash the RECORDED spelling)
    val spellings: Map[String, Seq[String]] =
      byVersion.values.flatten.toSeq.groupBy(canon)
    val live = byVersion.collect {
      case (v, fs) if v >= horizon => fs }.flatten.map(canon).toSet
    val everCommitted = spellings.keySet
    // roots governed by a live manifest (committed paths' first segment
    // under base) — superseded files under them are in scope even when
    // only expired manifests referenced those exact files. Files
    // OUTSIDE base — a shallow clone's manifests reference the SOURCE
    // store's files by path — are the source store's to manage: the
    // borrower's vacuum never walks (let alone deletes) a foreign
    // root, the same ownership rule table formats give shallow clones.
    val basePath = Paths.get(base).toAbsolutePath.normalize
    val manifestRoots = byVersion.values.flatten.flatMap { f =>
      val rel = basePath.relativize(Paths.get(f).toAbsolutePath.normalize)
      if (rel.getNameCount >= 1 && rel.getName(0).toString != "..")
        Some(rel.getName(0).toString)
      else None
    }.toSet
    // NEVER-COMMITTED generation dirs are invisible to the manifest
    // walk above: [[newGenDir]]'s unique suffix means a writer that
    // died between staging and commit left a directory no manifest
    // will ever reference, so deriving roots from committed paths
    // alone would leak its parquet forever. List `gen-v*` names
    // directly under base as additional roots — a committed gen's
    // files are `live` and survive; an abandoned gen's files are
    // orphans and die past the grace window like any staged debris.
    val roots = manifestRoots ++
      fs.listNames(base).filter(_.startsWith("gen-v"))
    val cutoff = System.currentTimeMillis() - orphanGraceMs
    val deleted = roots.toSeq.sorted.flatMap { r =>
      listDataFiles(basePath.resolve(r).toString)
        .filterNot(f => live.contains(canon(f)))
        // superseded (ever-committed) files delete unconditionally;
        // orphans only past the grace window. A candidate deleted
        // between listing and stat (another process, or a racing
        // vacuum) is already gone — skip it, mirroring the tolerant
        // delete below.
        .filter(f => everCommitted.contains(canon(f)) ||
          orphanGraceMs <= 0L || fs.mtimeMillis(f).exists(_ < cutoff))
    }
    deleted.foreach(fs.delete)
    // a data file's sidecars ([[FileStats]] ranges, [[FileBloom]]
    // sketches) die with the file — both are keyed by the path STRING
    // the writer recorded, so the cleanup deletes the sidecar of every
    // manifest spelling that canonicalizes to the deleted file (plus
    // the listed spelling itself, which covers never-committed
    // orphans); a file that never had one is a no-op delete
    deleted.foreach { f =>
      (spellings.getOrElse(canon(f), Nil) :+ f).distinct.foreach { sp =>
        fs.delete(FileStats.statsPath(base, sp))
        fs.delete(FileBloom.bloomPath(base, sp))
      }
    }
    (1 until horizon).foreach { v =>
      fs.delete(manifestPath(base, v))
      fs.delete(ckptPath(base, v)) // a pre-horizon snapshot dies with its chain
      fs.delete(tagsPath(base, v)) // its families were folded into the new one
    }
    // RECLUSTER centroid generations (`centroids-v*` dirs) are
    // referenced only by `centroids=` TAGS, never by a manifest's file
    // list, so the roots walk above can never govern them: without
    // this pass every recluster leaves a permanent centroid dir even
    // after its version expires (and a CAS-losing recluster's
    // pre-staged dir leaks forever). A dir is reclaimable when no tag
    // instance still on a live manifest or carried snapshot names it —
    // computed AFTER the expirations above, so an undone or expired
    // declaration no longer pins its geometry — and, like any staged
    // debris, only past the orphan grace window (a racing recluster
    // writes its centroids BEFORE its commit).
    val liveCentroidDirs: Set[String] = liveVersions(base).flatMap { v =>
      (appliedTags(base, v) ++ carriedTags(base, v))
        .filter(_.startsWith("centroids="))
        .map(_.stripPrefix("centroids="))
    }.toSet
    val unreferencedCentroidDirs = fs.listNames(base)
      .filter(_.startsWith("centroids-v"))
      .filterNot(liveCentroidDirs.contains)
    // the dirs' PRE-deletion mtimes, captured before the debris sweep
    // below: deleting a dir's files bumps the dir's own mtime, so a
    // grace check against the post-sweep mtime would keep every
    // just-emptied dir alive until a LATER vacuum — the recorded
    // pre-sweep value is what actually dates the dir's last real write
    val preSweepDirMtime: Map[String, Option[Long]] =
      unreferencedCentroidDirs.map { d =>
        d -> fs.mtimeMillis(basePath.resolve(d).toString)
      }.toMap
    val centroidDebris = unreferencedCentroidDirs
      .flatMap { d =>
        val files = fs.listFilesRecursive(basePath.resolve(d).toString, "")
          // defense-in-depth: no manifest ever lists files under a
          // centroid dir (they ride `centroids=` tags), but if one
          // ever did, the live set must win over the tag census —
          // same never-delete-live rule as the roots walk above
          .filterNot(f => live.contains(canon(f)))
        if (files.nonEmpty && (orphanGraceMs <= 0L ||
            files.forall(f => fs.mtimeMillis(f).forall(_ < cutoff))))
          files
        else Seq.empty
      }
    centroidDebris.foreach(fs.delete)
    // an unreferenced dir that now holds nothing (reclaimed above, by
    // an earlier vacuum, or a writer that died before writing a file)
    // must not linger as an empty entry forever — remove the entry
    // itself, judging grace by the PRE-sweep mtime (a dir this vacuum
    // just emptied was last genuinely written when its expired files
    // were, not when the sweep unlinked them). Tolerant delete: a
    // racing recluster that mkdir'd (empty, young) is mtime-protected,
    // and one that lands a file between the emptiness check and the
    // delete surfaces as DirectoryNotEmptyException — swallowed, the
    // dir survives.
    unreferencedCentroidDirs.foreach { d =>
      val p = basePath.resolve(d).toString
      if (fs.listFilesRecursive(p, "").isEmpty &&
          (orphanGraceMs <= 0L ||
            preSweepDirMtime.getOrElse(d, None).forall(_ < cutoff)))
        scala.util.Try(fs.delete(p))
    }
    deleted ++ centroidDebris
  }
}

/** The default catalog instance — the protocol bound to the local
  * filesystem. Operators call this; tests that exercise the protocol
  * against a different (or instrumented) filesystem instantiate
  * [[IndexCatalogOps]] with their own [[CatalogFs]].
  */
object IndexCatalog extends IndexCatalogOps(LocalCatalogFs)
