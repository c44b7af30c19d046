package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** The filesystem seam under [[IndexCatalog]] — the five touchpoints
  * the manifest protocol needs (list, read, atomic publish, delete,
  * stat), and nothing else. The protocol itself (versions, manifests,
  * tags, partition-level commits, retention vacuum) lives entirely
  * above this line in [[IndexCatalogOps]]; porting the catalog to a
  * distributed filesystem means implementing THIS trait, not touching
  * the protocol.
  *
  * The one primitive with teeth is [[publishIfAbsent]]: an atomic
  * create-IF-ABSENT of a small metadata file. Every real DFS offers
  * one — HDFS `create(path, overwrite = false)`, S3 conditional PUT
  * (If-None-Match), GCS precondition `ifGenerationMatch(0)` — and the
  * local impl builds it from hard links (see [[LocalCatalogFs]]).
  * Everything else is plain list/read/delete semantics any object
  * store provides. Paths are plain strings throughout; an impl may
  * interpret them as URIs.
  *
  * Serializable because sidecar publication ([[FileBloom.record]])
  * ships the fs to executors — an impl used on that path must write
  * to storage every executor reaches (true of [[LocalCatalogFs]] in
  * one JVM, and of any DFS/object-store impl by construction; a
  * test-only in-memory fs is driver-local and must stay off it).
  */
trait CatalogFs extends Serializable {

  /** Immediate child names of `dir` (file names, not paths); empty
    * when `dir` does not exist.
    */
  def listNames(dir: String): Seq[String]

  /** All files under `dir` (recursively) whose name ends with
    * `suffix`, as full paths; empty when `dir` does not exist.
    */
  def listFilesRecursive(dir: String, suffix: String): Seq[String]

  /** The full content of the file at `path` (UTF-8). */
  def readString(path: String): String

  /** True iff a file exists at `path`. */
  def exists(path: String): Boolean

  /** Create `dir` (and parents) if absent. */
  def mkdirs(dir: String): Unit

  /** ATOMICALLY create the file at `path` with `content` iff no file
    * exists there; return false (changing nothing) when one does.
    * This is the commit primitive: two racing writers targeting the
    * same path must see exactly one `true`. A torn write must never
    * be visible at `path` — stage elsewhere and link/rename-if-absent.
    */
  def publishIfAbsent(path: String, content: String): Boolean

  /** Delete the file at `path` if present; missing is not an error
    * (a racing deleter already won).
    */
  def delete(path: String): Unit

  /** Last-modified time of `path` in epoch millis, or None when the
    * file vanished between listing and stat (racing deleter).
    */
  def mtimeMillis(path: String): Option[Long]
}

/** [[CatalogFs]] over `java.nio.file` — the default (and test)
  * implementation. Atomic publish = write to a same-directory temp
  * file, then `Files.createLink` at the target: link creation is an
  * atomic create-if-absent on POSIX filesystems, so the loser of a
  * race gets `FileAlreadyExistsException` (mapped to `false`) instead
  * of silently replacing the winner — where a rename would.
  */
object LocalCatalogFs extends CatalogFs {

  def listNames(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala.map(_.getFileName.toString).toSeq
      finally s.close()
    }
  }

  def listFilesRecursive(dir: String, suffix: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.walk(p)
      // regular files only: Files.walk also emits directories, and a
      // directory whose NAME matches the suffix (or any dir under an
      // empty-suffix listing) must not surface as a deletable "file"
      try s.iterator().asScala
        .filter(f => Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(suffix))
        .map(_.toString).toSeq
      finally s.close()
    }
  }

  def readString(path: String): String = Files.readString(Paths.get(path))

  def exists(path: String): Boolean = Files.exists(Paths.get(path))

  def mkdirs(dir: String): Unit = Files.createDirectories(Paths.get(dir))

  def publishIfAbsent(path: String, content: String): Boolean = {
    val target: Path = Paths.get(path)
    // per-attempt tmp file: racing committers targeting the same path
    // must not share a staging file, or the loser links the winner's
    // content (or trips over its deletion) instead of failing its own
    val tmp = Files.createTempFile(
      target.getParent, s".${target.getFileName}-", ".tmp")
    try {
      Files.writeString(tmp, content)
      try { Files.createLink(target, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }

  def delete(path: String): Unit = Files.deleteIfExists(Paths.get(path))

  def mtimeMillis(path: String): Option[Long] =
    try Some(Files.getLastModifiedTime(Paths.get(path)).toMillis)
    catch { case _: java.nio.file.NoSuchFileException => None }
}
