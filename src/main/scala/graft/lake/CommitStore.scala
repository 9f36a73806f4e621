package graft.lake

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}
import java.util.UUID

import scala.collection.concurrent.TrieMap

/** The ONE primitive the commit log needs from storage: conditional
  * publication — "make these bytes visible at `dest` iff nothing is
  * there yet". Everything else in the log (staging, checkpoints, reads)
  * is plain file I/O.
  *
  * Implementations:
  *  - [[LocalFsCommitStore]] (default): stage + `Files.createLink` —
  *    hard links are atomic and fail if the destination exists, which
  *    is exactly put-if-absent on any POSIX filesystem (and on NFS).
  *  - An object-store adapter maps the same contract onto conditional
  *    writes: S3 `PUT If-None-Match: *`, GCS `x-goog-if-generation-
  *    match: 0`, ABFS `If-None-Match: *`. No SDKs ship in this build,
  *    so deployments [[CommitStore.register]] their adapter per URI
  *    scheme; the engine's commit/conflict semantics (rebase on a lost
  *    race) are already exactly what a conditional PUT gives you.
  *
  * A losing publication MUST leave `dest` untouched and return false —
  * [[LakeLog]] turns that into [[CommitConflictException]] and the
  * writer rebases.
  */
trait CommitStore {

  /** Publish `body` at `dest` iff absent. True = this writer won. */
  def putIfAbsent(dest: Path, body: Array[Byte]): Boolean

  /** Publish an already-staged local file (e.g. a parquet checkpoint)
    * at `dest` iff absent. */
  def putIfAbsentFile(dest: Path, staged: Path): Boolean

  /** Overwrite `dest` atomically (the `_last_checkpoint` pointer —
    * last-writer-wins is correct there, monotonicity is checked above). */
  def replace(dest: Path, body: Array[Byte]): Unit
}

object CommitStore {

  private val registry = TrieMap[String, String => CommitStore]()

  /** Install an adapter for a URI scheme (`"s3"`, `"gs"`, `"abfss"`). */
  def register(scheme: String, factory: String => CommitStore): Unit =
    registry.put(scheme.toLowerCase, factory)

  /** Remove a registered adapter (tests; scheme hand-over on shutdown). */
  def unregister(scheme: String): Unit =
    registry.remove(scheme.toLowerCase)

  /** The store for a table path: scheme-registered adapter, else local. */
  def forPath(tablePath: String): CommitStore = {
    val scheme = tablePath.indexOf("://") match {
      case -1 => "file"
      case i => tablePath.substring(0, i).toLowerCase
    }
    registry.get(scheme).map(_(tablePath)).getOrElse(LocalFsCommitStore)
  }
}

/** Default store: stage into a `.tmp/` sibling, publish with an atomic
  * hard link, clean the staging file either way. */
object LocalFsCommitStore extends CommitStore {

  private def stage(dest: Path, suffix: String): Path = {
    val tmpDir = dest.getParent.resolve(LakeLog.TMP_DIR)
    Files.createDirectories(tmpDir)
    tmpDir.resolve(UUID.randomUUID().toString + suffix)
  }

  override def putIfAbsent(dest: Path, body: Array[Byte]): Boolean = {
    val tmp = stage(dest, ".json")
    Files.write(tmp, body, StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    try {
      Files.createLink(dest, tmp) // atomic; fails if dest exists
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  override def putIfAbsentFile(dest: Path, staged: Path): Boolean =
    try {
      Files.createLink(dest, staged)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    }

  override def replace(dest: Path, body: Array[Byte]): Unit = {
    val tmp = stage(dest, "")
    Files.write(tmp, body, StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    Files.move(tmp, dest,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
}

/** Production-shaped object-store adapter on a shared filesystem
  * (VERDICT r3 #5 — the seam's second real implementation, durable
  * across JVMs unlike the in-memory test double below). Models exactly
  * the shape an S3/GCS/ABFS adapter has: the CONDITION is decided by one
  * atomic primitive separate from the data bytes — here an atomically
  * created reservation marker under `<logDir>/.cond/`, standing in for
  * the store's `If-None-Match: *` response — and only the winner then
  * publishes the object, REFUSING an existing `dest` (atomically via
  * hard link where the FS supports it; elsewhere a no-replace move
  * whose one-syscall window is the residual share of the lease-theft
  * caveat below), so even a pathological double-reservation degrades to
  * a lost race rather than overwriting a committed object.
  *
  * Works on any FS with atomic `O_CREAT|O_EXCL` (POSIX, NFSv3+), i.e.
  * also where hard links are unavailable. Crash window, handled as in
  * the DynamoDB-mutex LogStore designs this mirrors: a winner that dies
  * between reserving and publishing leaves the key reserved with no
  * object, and any later writer REPAIRS it — a marker whose `dest` is
  * absent after `staleMarkerMs` is deleted and the condition re-contended
  * (so a crashed writer never wedges the log). The inherited limitation
  * is the same as every lease-based mutex: a LIVE writer stalled longer
  * than the window between reserve and publish can be repaired over,
  * so size the window well above a publish (default 60 s vs
  * milliseconds). Staleness additionally compares the repairer's LOCAL
  * clock against the marker mtime assigned by the shared filesystem's
  * server (NFS et al.), so writer↔server clock skew shrinks or extends
  * the effective lease by the skew amount — this adapter assumes the
  * fleet runs synchronized clocks (NTP-level skew, seconds at worst)
  * and `staleMarkerMs` should be sized to cover the expected skew on
  * top of the worst-case publish. Real S3/GCS conditional PUTs are
  * atomic check+publish,
  * so THEY have neither the window nor the caveat — the marker split
  * exists only because a plain filesystem lacks a conditional overwrite.
  */
final class MarkerFsCommitStore(staleMarkerMs: Long = 60000L)
  extends CommitStore {
  /** Contention observability (specs/monitoring): `wins` counts WON
    * CONDITIONS (reservations), not published objects — a publication
    * refused at an already-existing dest (possible after a marker
    * vacuum) increments `publishRefused` instead of un-counting the
    * reservation. published ≈ wins − publishRefused. */
  @volatile var wins: Int = 0
  @volatile var lostRaces: Int = 0
  @volatile var repairs: Int = 0
  @volatile var publishRefused: Int = 0

  private def reserve(dest: Path): Boolean = {
    val dir = dest.getParent.resolve(".cond")
    Files.createDirectories(dir)
    val marker = dir.resolve(dest.getFileName.toString + ".reserved")
    def tryCreate(): Boolean =
      try { Files.createFile(marker); synchronized { wins += 1 }; true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    if (tryCreate()) return true
    // crashed-winner repair: reserved, nothing published, lease expired.
    // The takeover is an ATOMIC RENAME of the specific marker instance
    // we observed as stale — exactly one repairer can move it, a marker
    // that vanished concurrently (another repairer won) is re-contended
    // rather than deleted, and a FRESH marker re-created inside the
    // window is detected by inode comparison after the move and
    // restored. dest is checked first: a published object's marker is
    // never stale.
    import java.nio.file.attribute.BasicFileAttributes
    val observed =
      try Some(Files.readAttributes(marker, classOf[BasicFileAttributes]))
      catch { case _: java.io.IOException => None }
    observed match {
      case None =>
        // marker vanished: someone else repaired (and may have already
        // released) — one fresh contention attempt, never a delete
        if (tryCreate()) return true
      case Some(a) if !Files.exists(dest) &&
          System.currentTimeMillis() -
            a.lastModifiedTime.toMillis > staleMarkerMs =>
        val tomb = dir.resolve(
          marker.getFileName.toString + ".tomb." + UUID.randomUUID())
        val moved =
          try { Files.move(marker, tomb); true } // atomic: single mover
          catch { case _: java.io.IOException => false }
        if (moved) {
          val sameInstance =
            try {
              val t = Files.readAttributes(tomb, classOf[BasicFileAttributes])
              if (t.fileKey != null && a.fileKey != null)
                t.fileKey == a.fileKey
              else t.lastModifiedTime == a.lastModifiedTime
            } catch { case _: java.io.IOException => false }
          if (sameInstance) {
            try Files.deleteIfExists(tomb)
            catch { case _: java.io.IOException => () }
            synchronized { repairs += 1 }
            if (tryCreate()) return true
          } else {
            // we moved a marker that was re-created after our staleness
            // read — put it back (best effort; see the class doc's
            // lease-theft caveat this mirrors)
            try Files.move(tomb, marker)
            catch {
              case _: java.io.IOException =>
                try Files.deleteIfExists(tomb)
                catch { case _: java.io.IOException => () }
            }
          }
        }
      case _ => ()
    }
    synchronized { lostRaces += 1 }
    false
  }

  private def publish(dest: Path, write: Path => Unit): Boolean = {
    val tmp = dest.getParent.resolve(
      ".cond/" + UUID.randomUUID().toString + ".staged")
    write(tmp)
    // Publication must REFUSE an existing dest — the backstop that turns
    // any residual double-reservation (multi-party repair races) into an
    // ordinary lost race instead of overwriting a committed object.
    // Where the FS supports hard links the refusal is ATOMIC
    // (O_EXCL-class link); on link-less filesystems the fallback is a
    // no-replace move whose exists-check+rename leaves a one-syscall
    // window — the residual share of the documented lease-theft caveat.
    // A vanished tmp (a concurrent marker vacuum reclaimed a staged file
    // past the lease window) is a LOSS, not an exception: the contract
    // is true/false, never a throw for losing.
    def cleanup(): Unit =
      try Files.deleteIfExists(tmp)
      catch { case _: java.io.IOException => () }
    val linked =
      try { Files.createLink(dest, tmp); cleanup(); Some(true) }
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          cleanup(); Some(false)
        case _: java.nio.file.NoSuchFileException =>
          cleanup(); Some(false)
        case _: UnsupportedOperationException => None
        case _: java.nio.file.FileSystemException => None // links refused
      }
    val ok = linked.getOrElse {
      try { Files.move(tmp, dest); true }
      catch {
        case _: java.nio.file.FileAlreadyExistsException => cleanup(); false
        case _: java.nio.file.NoSuchFileException => cleanup(); false
      }
    }
    if (!ok) synchronized { publishRefused += 1 }
    ok
  }

  override def putIfAbsent(dest: Path, body: Array[Byte]): Boolean =
    reserve(dest) && publish(dest, tmp =>
      Files.write(tmp, body, StandardOpenOption.CREATE_NEW,
        StandardOpenOption.WRITE))

  override def putIfAbsentFile(dest: Path, staged: Path): Boolean =
    reserve(dest) && publish(dest, tmp => { Files.copy(staged, tmp); () })

  override def replace(dest: Path, body: Array[Byte]): Unit =
    LocalFsCommitStore.replace(dest, body)

  /** Reclaim `.cond/` state that is no longer load-bearing: markers
    * whose object IS published (publish refuses an existing `dest`, so
    * a late re-reservation cannot overwrite it — the marker's job is
    * done), markers lexicographically below `expiredBelow` (commit
    * names are zero-padded, so pass the snapshot-expiry floor: the
    * object was deliberately DELETED and the protocol never re-attempts
    * versions at or below the latest), and orphaned `.staged`/`.tomb.`
    * temporaries older than the lease window. Run from the same cadence
    * as data VACUUM / expireSnapshots; without it a long-lived table
    * accumulates one marker file per commit forever. Returns the number
    * of entries deleted.
    */
  def vacuumMarkers(logDir: Path, expiredBelow: Option[String] = None): Int = {
    val dir = logDir.resolve(".cond")
    if (!Files.isDirectory(dir)) return 0
    var removed = 0
    val stream = Files.list(dir)
    try {
      val it = stream.iterator()
      while (it.hasNext) {
        val p = it.next()
        val name = p.getFileName.toString
        val deletable =
          if (name.endsWith(".reserved")) {
            val obj = name.stripSuffix(".reserved")
            Files.exists(logDir.resolve(obj)) ||
              expiredBelow.exists(floor => obj < floor)
          } else if (name.contains(".tomb.") || name.endsWith(".staged"))
            try System.currentTimeMillis() -
              Files.getLastModifiedTime(p).toMillis > staleMarkerMs
            catch { case _: java.io.IOException => false }
          else false
        if (deletable) {
          try { if (Files.deleteIfExists(p)) removed += 1 }
          catch { case _: java.io.IOException => () }
        }
      }
    } finally stream.close()
    removed
  }
}

/** Test double with object-store semantics: the conditional check is a
  * separate atomic primitive (a concurrent map, standing in for S3's
  * If-None-Match) and only the WINNER's bytes land on disk — losers
  * never touch `dest`, exactly like a failed conditional PUT. */
final class ConditionalPutCommitStore extends CommitStore {
  private val published = TrieMap[String, Unit]()
  @volatile var lostRaces: Int = 0

  override def putIfAbsent(dest: Path, body: Array[Byte]): Boolean =
    if (published.putIfAbsent(dest.toString, ()).isEmpty) {
      Files.createDirectories(dest.getParent)
      Files.write(dest, body, StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      true
    } else { lostRaces += 1; false }

  override def putIfAbsentFile(dest: Path, staged: Path): Boolean =
    if (published.putIfAbsent(dest.toString, ()).isEmpty) {
      Files.createDirectories(dest.getParent)
      Files.copy(staged, dest)
      true
    } else { lostRaces += 1; false }

  override def replace(dest: Path, body: Array[Byte]): Unit =
    LocalFsCommitStore.replace(dest, body)
}
