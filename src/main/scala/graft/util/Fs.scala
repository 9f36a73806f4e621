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
}
