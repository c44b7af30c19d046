package graft

import java.nio.file.{Files, Paths}

/** Filesystem helpers shared by queries that materialize through temp
  * directories (sink round-trips, streaming checkpoints).
  */
object Fs {

  /** Delete a directory tree (children before parents). The walk
    * stream is closed in a finally block — `Files.walk` holds an open
    * directory stream until closed, and repeated bench/verify
    * invocations must not accumulate file handles.
    */
  def deleteRecursively(path: String): Unit = {
    val root = Paths.get(path)
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverse.foreach(p => Files.deleteIfExists(p))
      } finally walk.close()
    }
  }
}
