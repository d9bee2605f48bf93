package graft

import java.nio.file.{Files, LinkOption, Path}

/** Scratch-directory lifecycle for operators that exercise REAL sinks
  * (round-trips, compaction, streaming checkpoints): one definition of
  * recursive delete, so deletion hardening — symlink guards, retry on
  * lock-holding filesystems — lands in one place instead of a dozen
  * inlined closures.
  */
object Scratch {
  /** Recursive delete; no-op on nonexistent paths. Never follows a
    * symlink out of the tree: a symlinked directory is detected with
    * NOFOLLOW_LINKS and only the link itself is deleted — its target's
    * contents are untouched. (`File.listFiles()` DOES enumerate a
    * symlinked dir's target, so the naive recursion would delete
    * through the link; today's callers only delete Spark-written temp
    * trees that contain no links, but this utility must stay safe for
    * general reuse.) */
  def rmTree(path: String): Unit = {
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p, LinkOption.NOFOLLOW_LINKS)) {
        val children = Files.list(p)
        try children.forEach(c => rm(c)) finally children.close()
      }
      // best-effort like File.delete(): a straggler lock must not abort
      // the query that already produced its result
      try { Files.deleteIfExists(p); () }
      catch { case _: java.io.IOException => () }
    }
    val p = java.nio.file.Paths.get(path)
    if (Files.exists(p, LinkOption.NOFOLLOW_LINKS)) rm(p)
  }
}
