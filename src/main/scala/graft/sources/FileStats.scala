package graft.sources

import java.nio.file.Paths
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.column.statistics.{IntStatistics, LongStatistics}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

/** Per-FILE column statistics for the manifest-committed stores — the
  * data-skipping half of the catalog's metadata, mirroring the
  * min/max file stats every production table format records at commit
  * so a range predicate prunes FILES before the engine ever lists or
  * opens them (partition pruning cuts by the partition VALUE; this
  * cuts by the content RANGE, the orthogonal axis — an id-ordered
  * ingest naturally gives each generation a tight id range even
  * though its files land across every hash partition).
  *
  * Mechanics:
  *  - stats come from the parquet FOOTERS the writer already produced
  *    (min/max per row group, folded per file) — metadata I/O only,
  *    no data pages are read; the numbers are byte-identical to what
  *    the scan's own row-group skipping uses;
  *  - each data file gets one immutable sidecar under
  *    `<base>/manifests/stats/` keyed by the hash of its committed
  *    path, published with the catalog's atomic create-if-absent —
  *    data files are immutable once committed, so their stats are
  *    too, and a replayed recording is a no-op rather than a race;
  *  - sidecars are keyed by path, so carried-forward files keep their
  *    stats across every later commit (append, partition replacement,
  *    rewrite) with zero maintenance, and [[IndexCatalogOps.vacuum]]
  *    deletes a file's sidecar with the file;
  *  - pruning is CONSERVATIVE: a file with no sidecar (or no recorded
  *    range for the column) is always kept — stats can only remove
  *    provably-irrelevant files, never rows.
  *
  * 100 TB shape: the sidecar set is catalog metadata (a few dozen
  * bytes per data file); a range probe resolves the manifest, loads
  * the listed files' stats, and hands the engine the surviving file
  * list — O(files-in-version) metadata reads, zero data motion for
  * the skipped files.
  */
object FileStats {

  private[sources] def statsDir(base: String): String =
    Paths.get(base, "manifests", "stats").toString

  /** The sidecar path for a committed data file — keyed by the hash
    * of the file's committed (absolute) path, so the mapping survives
    * any later commit that carries the file forward.
    */
  def statsPath(base: String, dataFile: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1")
      .digest(dataFile.getBytes("UTF-8"))
    Paths.get(statsDir(base), d.map("%02x".format(_)).mkString + ".txt").toString
  }

  /** Fold `file`'s parquet footer into per-column (min, max) for the
    * requested integer columns — across all row groups, skipping
    * columns whose statistics are absent or value-less.
    */
  /** One shared Hadoop conf for every footer read: `new
    * Configuration()` re-parses the default XML resources each call —
    * pure driver-side overhead that used to be paid once PER FILE at
    * every commit's stats pass. The conf is read-only here.
    */
  private lazy val footerConf = new Configuration()

  private def footerRanges(file: String, cols: Set[String]): Map[String, (Long, Long)] = {
    val rdr = ParquetFileReader.open(
      HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(file), footerConf))
    try {
      rdr.getFooter.getBlocks.asScala.iterator
        .flatMap(_.getColumns.asScala)
        .filter(c => cols.contains(c.getPath.toDotString))
        .flatMap { c =>
          c.getStatistics match {
            case s: LongStatistics if s.hasNonNullValue =>
              Some(c.getPath.toDotString -> (s.getMin, s.getMax))
            case s: IntStatistics if s.hasNonNullValue =>
              Some(c.getPath.toDotString -> (s.getMin.toLong, s.getMax.toLong))
            case _ => None
          }
        }
        .toSeq.groupBy(_._1)
        .map { case (k, vs) =>
          k -> (vs.map(_._2._1).min, vs.map(_._2._2).max)
        }
    } finally rdr.close()
  }

  /** Record stats sidecars for freshly written data files (call after
    * [[StagedWrite]] and before — or after — the manifest commit:
    * visibility is governed by the manifest either way, a sidecar for
    * an uncommitted file is just inert metadata). Idempotent: a file
    * whose sidecar exists is skipped, so crash-replayed writers never
    * conflict.
    */
  def record(base: String, files: Seq[String], cols: Seq[String],
      fs: CatalogFs = LocalCatalogFs): Unit = {
    if (files.isEmpty) return
    fs.mkdirs(statsDir(base))
    files.foreach { f =>
      val target = statsPath(base, f)
      if (!fs.exists(target)) {
        val lines = footerRanges(f, cols.toSet).toSeq.sorted
          .map { case (c, (lo, hi)) => s"$c\t$lo\t$hi" }
        fs.publishIfAbsent(target, lines.mkString("\n"))
      }
    }
  }

  // --- declared stats columns (catalog metadata, not caller knowledge) --

  private val TagPrefix = "stats_cols="

  /** The commit tag declaring the store's stats column list — the
    * same declare-once-in-the-manifest pattern as the store's CHECK
    * constraint ([[StoreConstraints.declareTag]]) and schema tag:
    * every later writer discovers WHICH columns to record from
    * catalog metadata instead of each call site hard-coding its own
    * list.
    */
  def declareTag(cols: Seq[String]): String = {
    require(cols.nonEmpty && cols.forall(c => !c.contains(",") && !c.contains("\n")),
      s"stats columns must be non-empty, comma/newline-free: $cols")
    TagPrefix + cols.mkString(",")
  }

  /** The store's declared stats columns: the `stats_cols=` tag of the
    * NEWEST live version that declares one (a later commit's tag
    * supersedes — re-declare to widen the list; files recorded before
    * the widening simply lack the new column and fall back to the
    * conservative keep). Empty for a store that never declared.
    */
  def declaredCols(base: String,
      catalog: IndexCatalogOps = IndexCatalog): Seq[String] =
    catalog.newestTag(base, TagPrefix)
      // vacuum-carried tags resolve too: retention past the declaring
      // commit must not silently degrade recordDeclared to a no-op
      .map(_.drop(TagPrefix.length).split(",").toSeq.filter(_.nonEmpty))
      .getOrElse(Seq.empty)

  /** [[record]] over the store's DECLARED column list — what a writer
    * that knows only the store base calls after its commit.
    */
  def recordDeclared(base: String, files: Seq[String],
      fs: CatalogFs = LocalCatalogFs): Unit =
    record(base, files, declaredCols(base), fs)

  /** The recorded (min, max) of `col` for each of `files` that has
    * one — files without a sidecar or without the column are absent
    * from the map (and must be treated as unbounded by callers).
    */
  def ranges(base: String, files: Seq[String], col: String,
      fs: CatalogFs = LocalCatalogFs): Map[String, (Long, Long)] =
    files.flatMap { f =>
      val p = statsPath(base, f)
      if (!fs.exists(p)) None
      else fs.readString(p).split("\n").iterator
        .map(_.split("\t"))
        .collectFirst { case Array(c, lo, hi) if c == col =>
          f -> (lo.toLong, hi.toLong)
        }
    }.toMap

  /** The files of a manifest-resolved list a scan for
    * `col BETWEEN lo AND hi` must read: files whose recorded range
    * intersects [lo, hi], plus (conservatively) every file with no
    * recorded range.
    */
  def prune(base: String, files: Seq[String], col: String,
      lo: Long, hi: Long, fs: CatalogFs = LocalCatalogFs): Seq[String] = {
    val r = ranges(base, files, col, fs)
    files.filter(f => r.get(f).forall { case (mn, mx) => mx >= lo && mn <= hi })
  }

  /** Conjunctive multi-column prune: keep the files every predicate's
    * recorded range intersects — ONE sidecar read per file for all
    * predicates (the per-column [[prune]] composed naively would
    * re-read the sidecar per column). Per column, a file without a
    * recorded range is conservatively unbounded, exactly as [[prune]].
    */
  def pruneAll(base: String, files: Seq[String],
      preds: Seq[(String, Long, Long)],
      fs: CatalogFs = LocalCatalogFs): Seq[String] = {
    if (preds.isEmpty) return files
    val wanted = preds.map(_._1).toSet
    files.filter { f =>
      val p = statsPath(base, f)
      val recorded: Map[String, (Long, Long)] =
        if (!fs.exists(p)) Map.empty
        else fs.readString(p).split("\n").iterator
          .map(_.split("\t"))
          .collect { case Array(c, lo, hi) if wanted.contains(c) =>
            c -> (lo.toLong, hi.toLong)
          }.toMap
      preds.forall { case (c, lo, hi) =>
        recorded.get(c).forall { case (mn, mx) => mx >= lo && mn <= hi }
      }
    }
  }
}
