package graft.util

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** Closing wrapper for `Files.list`: the returned stream holds an OPEN
  * DIRECTORY file descriptor until closed, and an unclosed listing per
  * commit-log read is a slow fd leak that eventually kills the JVM with
  * `error=24, Too many open files`. Directory listings in this engine
  * are bounded (log dirs, staging dirs, partition dirs), so an eager
  * materialize-and-close is both safe and the simplest correct shape —
  * always list through this.
  */
object Fs {
  def listDir(dir: Path): Vector[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.toVector
    finally s.close()
  }

  /** Recursive delete — the REBUILD primitive for derived index tables:
    * an in-place overwrite keeps the old table's SetTxn state (by
    * design — streaming idempotence must survive overwrites), so a
    * rebuild that must RESET the change-feed applied pointer deletes the
    * table and starts a fresh log instead. Safe for concurrent readers
    * the same way any delete+recreate is: the engine's fingerprinted
    * snapshot/decode caches degrade to a miss, never a stale serve. */
  def deleteRecursively(p: Path): Unit = {
    // NOFOLLOW: a symlinked directory inside the tree must be deleted AS
    // THE LINK — following it would recurse into (and empty) its TARGET,
    // which lives outside the tree being deleted
    if (Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS))
      listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
