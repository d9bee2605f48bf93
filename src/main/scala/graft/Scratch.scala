package graft

/** Scratch-directory lifecycle for operators that exercise REAL sinks
  * (round-trips, compaction, streaming checkpoints): one definition of
  * recursive delete, so deletion hardening — symlink guards, retry on
  * lock-holding filesystems — lands in one place instead of a dozen
  * inlined closures.
  */
object Scratch {
  /** Recursive delete; no-op on nonexistent paths, never follows out of
    * the tree (listFiles does not resolve symlinked dirs' contents as
    * children of the link target's parent). */
  def rmTree(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(path))
  }
}
