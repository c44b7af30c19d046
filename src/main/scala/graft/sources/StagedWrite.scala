package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/** Exact-file generation writes for the stores whose generations land
  * INSIDE a shared Hive-partitioned root (`bucket=`/`centroid_id=`
  * layouts): write the batch to a private staging directory, then
  * atomically move each task file into its partition directory and
  * return the exact list of moved files for the manifest commit.
  *
  * This replaces the earlier list-before/write/list-after diff, whose
  * window was a correctness hazard under CONCURRENT appenders to one
  * store: a second writer's files landing inside the window entered
  * the first writer's diff, double-listing them across manifests (the
  * same row scanned twice by every later reader). With staging, a
  * writer's file list is its own by construction — the catalog's
  * optimistic-retry commit then makes two racing appends both land
  * with union content, no coordination. This is the task-commit
  * pattern production table formats use: tasks write files, the
  * commit records the exact paths; nothing is ever inferred from a
  * directory listing. (On a DFS the move is the committer's
  * task-output promotion; hot-path data never rewrites.)
  *
  * An empty batch writes no parquet files and returns an empty list —
  * callers keep their documented skip (no-file appends publish no
  * version).
  */
object StagedWrite {

  /** Write `df` partitioned by `partCols` into `root`, returning the
    * exact file paths this write created (sorted). Staging lives in a
    * dot-prefixed sibling of `root` — never part of any committed
    * path, so vacuum's governed-root walk cannot see it.
    */
  def partitioned(df: DataFrame, root: String, partCols: Seq[String]): Seq[String] = {
    val rootP = Paths.get(root)
    Files.createDirectories(rootP.getParent)
    val staging = Files.createTempDirectory(rootP.getParent, ".staging-")
    try {
      df.write.mode("overwrite").partitionBy(partCols: _*)
        .parquet(staging.toString)
      IndexCatalog.listDataFiles(staging.toString).map { f =>
        val rel = staging.relativize(Paths.get(f))
        val dest = rootP.resolve(rel)
        Files.createDirectories(dest.getParent)
        // task file names carry the write job's UUID — unique in the
        // destination partition by construction
        Files.move(Paths.get(f), dest, StandardCopyOption.ATOMIC_MOVE)
        dest.toString
      }.sorted
    } finally scala.util.Try(graft.Fs.deleteRecursively(staging.toString))
  }
}
