package graft

import scala.util.Try

/** Temp-dir leases for queries whose RESULT stays lazy over temp
  * storage (parquet sinks, stored sketch stages): the returned
  * DataFrame reads the directory directly — fully distributed, no
  * driver-side collect — so the directory must outlive the call.
  *
  * Each invocation leases its dirs under the query's name, releasing
  * the PREDECESSOR's dirs (same name), and a JVM shutdown hook sweeps
  * whatever remains — at most one dir set per query is ever leased.
  * Contract: a returned frame is fully consumed before the same query
  * runs again — true of the bench / verify / test harnesses, and of
  * any sane caller (each dir set is a few MB of fixture-derived data).
  */
object Lease {

  private val leased =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      leased.values.forEach(_.foreach(d => Try(Fs.deleteRecursively(d))))))
  }

  /** Register `dirs` as backing `name`'s live result; reclaim the ones
    * backing the previous result, whose last consumer has run by the
    * documented contract.
    */
  def lease(name: String, dirs: Seq[String]): Unit = {
    val prev = leased.put(name, dirs)
    if (prev != null) prev.foreach(d => Try(Fs.deleteRecursively(d)))
  }
}
