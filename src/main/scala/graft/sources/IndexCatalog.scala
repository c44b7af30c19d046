package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
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
  *    (the commit is a single atomic rename),
  *  - appends never rewrite old partitions — probe-after-append reads
  *    old files byte-identical to what the build wrote,
  *  - old versions stay readable forever (manifests are never deleted),
  *    which is the index analogue of table time travel.
  *
  * On a real DFS the atomic-rename commit and driver-side manifest
  * resolution (a few KB of paths — a catalog lookup, not data motion)
  * carry over unchanged; production table formats commit snapshots the
  * same way.
  */
object IndexCatalog {

  private def manifestsDir(base: String): Path = Paths.get(base, "manifests")

  private val ManifestName = raw"v(\d+)\.txt".r

  /** Highest committed version, 0 if the store has none. */
  def currentVersion(base: String): Int = {
    val dir = manifestsDir(base)
    if (!Files.isDirectory(dir)) 0
    else Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case ManifestName(n) => n.toInt }
      .foldLeft(0)(math.max)
  }

  /** The data files of committed version `v` (paths, sorted). */
  def files(base: String, v: Int): Seq[String] = {
    require(v >= 1, s"version $v is not committed")
    Files.readString(manifestsDir(base).resolve(s"v$v.txt"))
      .split("\n").toSeq.filter(_.nonEmpty)
  }

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
    val p = Paths.get(base, f"gen-v$v%05d")
    Files.createDirectories(p)
    p.toString
  }

  /** All parquet data files under `dir`, recursively (covers
    * Hive-partitioned layouts like `bucket=3/part-....parquet`).
    * Empty when the directory does not exist yet.
    */
  def listDataFiles(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val s = Files.walk(p)
      try s.iterator().asScala
        .filter(f => f.getFileName.toString.endsWith(".parquet"))
        .map(_.toString).toSeq.sorted
      finally s.close()
    }
  }

  /** Commit `genDir`'s parquet files as the next version: manifest =
    * previous version's files ++ the generation's, written to a temp
    * path and atomically renamed into place. Returns the new version.
    */
  def commit(base: String, genDir: String): Int =
    commitFiles(base, listDataFiles(genDir))

  /** Commit an explicit set of NEW data files as the next version —
    * the path for partitioned stores, where a generation's files land
    * inside existing `key=value` directories and the writer diffs the
    * listing rather than using a separate generation dir. Visibility
    * still flips only at the manifest rename.
    */
  def commitFiles(base: String, newFiles: Seq[String]): Int = {
    require(newFiles.nonEmpty, "no parquet files to commit")
    val prior = latestFiles(base)
    val v = currentVersion(base) + 1
    Files.createDirectories(manifestsDir(base))
    val tmp = manifestsDir(base).resolve(s".v$v.txt.tmp")
    Files.writeString(tmp, (prior ++ newFiles.sorted).mkString("\n"))
    Files.move(tmp, manifestsDir(base).resolve(s"v$v.txt"),
      StandardCopyOption.ATOMIC_MOVE)
    v
  }
}
