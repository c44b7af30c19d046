package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

/** Build-once, copy-many FIXTURE stores for the gated queries.
  *
  * Some twenty gated queries open by constructing the SAME immutable
  * starting store from the fixture tables — the even-id sign-LSH
  * embedding store, the 90%+decile text index, the full-corpus PQ
  * store — and then spend their actual proof value on what happens
  * NEXT (DML, streams, compaction, time travel). Re-running the
  * identical build per query re-tokenizes/re-encodes the same corpus
  * twenty times per bench pass without adding evidence: the build
  * path itself is exercised once here and separately spec-pinned
  * (writeEmbedGen / writeTextIndexGen / buildPqStore specs all build
  * uncached).
  *
  * So: the FIRST query to need a given (kind, sfDir) fixture builds
  * it into a process-owned temp dir; every consumer (including the
  * first) receives a byte-level COPY under its own base, so per-query
  * isolation is untouched — mutations, vacuums and restores hit the
  * copy, never the template. Copying must rewrite one thing: catalog
  * manifests (`manifests/v*.txt` / `.ckpt`) list data files by
  * ABSOLUTE path, so those text files get the template prefix
  * replaced with the destination's. Data files, planes, codebooks
  * copy verbatim.
  *
  * Scope deliberately excludes the specs (they assert on the build
  * path itself, some through an instrumented [[CatalogFs]]) and any
  * store a query builds non-identically (streamed ingest builds,
  * sliced backfills).
  */
object StoreFixtures {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      cache.values.forEach(d =>
        { scala.util.Try(graft.Fs.deleteRecursively(d)); () })))
  }

  /** Build (iff this process hasn't yet) the `(kind, sfDir)` template
    * WITHOUT copying it anywhere — the warm-up half of [[cloneInto]],
    * exposed so a harness ([[graft.Bench]]) can pre-build every
    * registered template untimed: one-time template cost then never
    * lands inside a measured query (nor, asymmetrically, only in the
    * queries that happen to run first). Same purity contract as
    * [[cloneInto]]: `build` must be a pure function of `(kind, sfDir)`.
    */
  def ensureTemplate(kind: String, sfDir: String)(
      build: String => Unit): Unit = {
    cache.computeIfAbsent(s"$kind|$sfDir", _ => {
      val d = Files.createTempDirectory(s"graft_fixture_$kind").toString
      build(d)
      // freeze the built template's files: clones hard-link data files
      // (shared inodes), so the whole scheme rests on the
      // never-mutate-committed-files invariant — make an accidental
      // in-place write fail loudly (non-root) instead of silently
      // smearing onto every later consumer's template. Directories
      // stay writable (nothing appends into a template, and the
      // shutdown sweep needs the unlink right anyway).
      val walk = Files.walk(Paths.get(d))
      try walk.forEach(p =>
        if (!Files.isDirectory(p)) { p.toFile.setWritable(false, false); () })
      finally walk.close()
      d
    })
    ()
  }

  /** True iff `p` lies under any template this process built — the
    * belt-and-suspenders guard for mtime-bumping helpers
    * (e.g. the streamed-feed `appendOrderedAfter` fence): a bump
    * through a hard link would smear onto the shared template inode
    * for every later clone, and root bypasses the read-only bit above,
    * so the writing paths check the DESTINATION explicitly and fail
    * loudly rather than corrupt the cache.
    */
  def isTemplatePath(p: String): Boolean = {
    val abs = Paths.get(p).toAbsolutePath.normalize.toString
    val it = cache.values.iterator
    var hit = false
    while (!hit && it.hasNext) {
      val t = it.next()
      hit = abs == t || abs.startsWith(t + java.io.File.separator)
    }
    hit
  }

  /** The template directory itself, for READ-ONLY consumers: probes
    * that never mutate the store (no commits, no vacuum, no restore)
    * may read the shared template in place instead of paying a
    * byte-copy per query — the copy exists to isolate MUTATION, and a
    * pure reader of an immutable store needs no isolation. Contract:
    * the caller must treat the returned path as immutable; a consumer
    * that writes even one version must use [[cloneInto]] or it would
    * poison every later consumer's template.
    */
  def readOnlyTemplate(kind: String, sfDir: String)(
      build: String => Unit): String = {
    ensureTemplate(kind, sfDir)(build)
    cache.get(s"$kind|$sfDir")
  }

  /** Copy the `(kind, sfDir)` fixture store into `dest`, building the
    * template first iff this process hasn't yet. `build` must be a
    * pure function of `(kind, sfDir)` — same content every time — or
    * the cache would make query results depend on execution order.
    */
  def cloneInto(kind: String, sfDir: String, dest: String)(
      build: String => Unit): Unit = {
    ensureTemplate(kind, sfDir)(build)
    copyStore(cache.get(s"$kind|$sfDir"), dest)
  }

  /** Recursive copy of a store tree with metadata re-keying: manifest
    * text files list data files by absolute path (prefix-rewritten),
    * and stats/bloom sidecars are NAMED by the SHA-1 of their data
    * file's absolute path ([[FileStats.statsPath]] /
    * [[FileBloom.bloomPath]]) — copied verbatim they'd be orphans and
    * every prune on the clone would silently degrade to the
    * conservative keep-all. So sidecars are skipped in the walk and
    * re-published under the DESTINATION path's key instead (their
    * CONTENT is path-free).
    */
  private[sources] def copyStore(src: String, dest: String): Unit = {
    val sp = Paths.get(src)
    val dp = Paths.get(dest)
    val dataFiles = scala.collection.mutable.ArrayBuffer.empty[String]
    def parentName(p: java.nio.file.Path, up: Int): String = {
      var q = p.getParent
      var i = 1
      while (q != null && i < up) { q = q.getParent; i += 1 }
      if (q == null || q.getFileName == null) "" else q.getFileName.toString
    }
    val stream = Files.walk(sp)
    try stream.forEach { p =>
      val t = dp.resolve(sp.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else {
        Files.createDirectories(t.getParent)
        val n = p.getFileName.toString
        val inManifests = parentName(p, 1) == "manifests"
        val isSidecar = parentName(p, 2) == "manifests" &&
          (parentName(p, 1) == "stats" || parentName(p, 1) == "bloom")
        if (inManifests && (n.endsWith(".txt") || n.endsWith(".ckpt")))
          Files.writeString(t, Files.readString(p).replace(src, dest))
        else if (isSidecar) () // re-keyed below, not copied by name
        else {
          // HARD LINK, not byte copy: committed data files are
          // immutable by the catalog's contract (generations are
          // write-once; rewrites create NEW files; vacuum/DML only
          // unlink whole files, which removes the clone's name and
          // never touches the template's), so sharing the inode is
          // safe and turns the per-query clone from O(store bytes)
          // into O(file count) of metadata ops. Fallback to a copy
          // where linking is refused (foreign filesystem boundary).
          Files.deleteIfExists(t)
          try Files.createLink(t, p)
          catch { case _: UnsupportedOperationException | _: java.io.IOException =>
            Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
          }
          if (!p.toString.contains("/manifests/")) dataFiles += p.toString
        }
      }
    } finally stream.close()
    dataFiles.foreach { f =>
      val destF = dp.resolve(sp.relativize(Paths.get(f))).toString
      Seq(FileStats.statsPath(src, f) -> FileStats.statsPath(dest, destF),
          FileBloom.bloomPath(src, f) -> FileBloom.bloomPath(dest, destF))
        .foreach { case (s, d) =>
          if (Files.exists(Paths.get(s))) {
            Files.createDirectories(Paths.get(d).getParent)
            Files.copy(Paths.get(s), Paths.get(d),
              StandardCopyOption.REPLACE_EXISTING)
          }
        }
    }
  }
}
