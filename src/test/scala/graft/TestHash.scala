package graft

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

/** Shared byte-identity helper for the store-lifecycle specs: the
  * carry-forward contracts (append/evolution/compaction leave
  * committed files byte-identical) all pin against this one digest.
  */
object TestHash {
  def sha256(p: String): String = {
    val d = MessageDigest.getInstance("SHA-256")
    d.digest(Files.readAllBytes(Paths.get(p))).map("%02x".format(_)).mkString
  }
}
