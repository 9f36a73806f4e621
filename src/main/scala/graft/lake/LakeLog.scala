package graft.lake

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.util.UUID

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.spark.sql.types.{DataType, StructType}

/** Resolved table state at one version. */
final case class Snapshot(
    version: Long,
    metaData: MetaData,
    files: Seq[AddFile],
    txns: Map[String, Long],
    commits: Seq[(Long, CommitInfo)]) {
  def schema: StructType = DataType.fromDDL(metaData.schemaDdl).asInstanceOf[StructType]
  def dataSchema: StructType =
    StructType(schema.filterNot(f => metaData.partitionColumns.contains(f.name)))
  def numFiles: Long = files.size.toLong
  def sizeInBytes: Long = files.map(_.size).sum
}

/** The commit log: `_lake_log/NNNNNNNNNNNNNNNNNNNN.json`, one JSON action
  * per line, modeled on the Delta log the reference dissects
  * (`01.parquet_primer.py:199-222`).
  *
  * Atomicity on a shared filesystem: a commit is staged to
  * `_lake_log/.tmp/<uuid>` then published with `Files.createLink` — hard
  * links are atomic and FAIL if the destination exists, which is the
  * mutual exclusion two concurrent writers need (loser gets
  * [[CommitConflictException]] and rebases). Readers only ever see whole
  * committed files.
  *
  * Scale note: snapshot resolution is O(commits); every CHECKPOINT_EVERY
  * commits a compacted JSON checkpoint (`NNN.checkpoint.json`) is written
  * so resolution reads one checkpoint + a short tail, not the whole
  * history — same shape as Delta's parquet checkpoints.
  */
final class LakeLog(val tablePath: String) {

  import LakeLog._

  val logDir: Path = Paths.get(tablePath, LOG_DIR)

  def exists: Boolean = {
    if (!Files.isDirectory(logDir)) return false
    listVersions.nonEmpty
  }

  // ---- listing ---------------------------------------------------------

  private def listLog(suffix: String): Seq[(Long, Path)] = {
    if (!Files.isDirectory(logDir)) return Seq.empty
    val out = Files.list(logDir).iterator().asScala
      .flatMap { p =>
        val n = p.getFileName.toString
        if (n.endsWith(suffix) && n.length > suffix.length) {
          val stem = n.dropRight(suffix.length)
          if (stem.forall(_.isDigit)) Some(stem.toLong -> p) else None
        } else None
      }
      .toSeq.sortBy(_._1)
    out
  }

  def listVersions: Seq[Long] = listLog(COMMIT_SUFFIX).map(_._1)

  def latestVersion: Option[Long] = listVersions.lastOption

  // ---- reading ---------------------------------------------------------

  private def readActions(p: Path): Seq[Action] =
    Files.readAllLines(p, StandardCharsets.UTF_8).asScala.toSeq
      .filter(_.nonEmpty).map(Action.fromJson)

  /** Actions of one committed version (for vacuum / audit). */
  def readCommit(v: Long): Seq[Action] =
    readActions(logDir.resolve(LakeLog.commitFileName(v)))

  /** Resolve the snapshot at `asOf` (None = latest). Starts from the
    * newest checkpoint at or below the target version.
    */
  def snapshot(asOf: Option[Long] = None): Snapshot = {
    val versions = listVersions
    require(versions.nonEmpty, s"not a lake table (no commits): $tablePath")
    val target = asOf match {
      case Some(v) =>
        require(versions.contains(v),
          s"version $v does not exist for $tablePath (have ${versions.head}..${versions.last})")
        v
      case None => versions.last
    }
    val ckpt = listLog(CHECKPOINT_SUFFIX).filter(_._1 <= target).lastOption
    val baseActions = ckpt.map { case (_, p) => readActions(p) }.getOrElse(Seq.empty)
    val tailVersions = versions.filter(v => v <= target && v > ckpt.map(_._1).getOrElse(-1L))

    var meta: Option[MetaData] = None
    val files = scala.collection.mutable.LinkedHashMap[String, AddFile]()
    val txns = scala.collection.mutable.HashMap[String, Long]()
    val commits = scala.collection.mutable.ArrayBuffer[(Long, CommitInfo)]()

    def apply(a: Action, version: Long): Unit = {
      a.metaData.foreach(m => meta = Some(m))
      a.add.foreach(f => files(f.path) = f)
      a.remove.foreach(r => files.remove(r.path))
      a.txn.foreach(t => txns(t.appId) = math.max(t.batchId, txns.getOrElse(t.appId, Long.MinValue)))
      a.commitInfo.foreach(ci => commits += version -> ci)
    }

    baseActions.foreach(apply(_, ckpt.map(_._1).getOrElse(0L)))
    for (v <- tailVersions; a <- readActions(logDir.resolve(commitFileName(v)))) apply(a, v)

    Snapshot(target, meta.getOrElse(
      throw new IllegalStateException(s"no metaData action found in log of $tablePath")),
      files.values.toSeq, txns.toMap, commits.toSeq)
  }

  /** Greatest version whose commit timestamp is <= ts. */
  def versionAtTimestamp(tsMillis: Long): Long = {
    val versions = listVersions
    val withTs = versions.map { v =>
      val ci = readActions(logDir.resolve(commitFileName(v)))
        .flatMap(_.commitInfo).headOption
      v -> ci.map(_.timestamp).getOrElse(0L)
    }
    withTs.filter(_._2 <= tsMillis).map(_._1).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"no commit at or before timestamp $tsMillis for $tablePath"))
  }

  // ---- writing ---------------------------------------------------------

  /** Atomically publish `actions` as version `version`.
    * @throws CommitConflictException if that version already exists.
    */
  def write(version: Long, actions: Seq[Action]): Unit = {
    Files.createDirectories(logDir)
    val tmpDir = logDir.resolve(TMP_DIR)
    Files.createDirectories(tmpDir)
    val tmp = tmpDir.resolve(UUID.randomUUID().toString + ".json")
    val body = actions.map(Action.toJson).mkString("", "\n", "\n")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    val dest = logDir.resolve(commitFileName(version))
    try {
      Files.createLink(dest, tmp) // atomic; fails if dest exists
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new CommitConflictException(tablePath, version)
      case NonFatal(e) => throw e
    } finally {
      Files.deleteIfExists(tmp)
    }
    maybeCheckpoint(version)
  }

  private def maybeCheckpoint(version: Long): Unit = {
    if (version == 0 || version % CHECKPOINT_EVERY != 0) return
    try {
      val snap = snapshot(Some(version))
      val actions =
        Seq(Action.of(snap.metaData)) ++
          snap.txns.map { case (app, b) => Action.of(SetTxn(app, b)) } ++
          snap.files.map(Action.of)
      val tmp = logDir.resolve(TMP_DIR).resolve(UUID.randomUUID().toString)
      Files.write(tmp,
        actions.map(Action.toJson).mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      try Files.createLink(logDir.resolve(checkpointFileName(version)), tmp)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
      finally Files.deleteIfExists(tmp)
    } catch {
      case NonFatal(_) => () // checkpoints are an optimization, never fail a commit
    }
  }
}

final class CommitConflictException(table: String, version: Long)
  extends RuntimeException(
    s"concurrent commit: version $version of $table was published by another writer")

object LakeLog {
  val LOG_DIR = "_lake_log"
  val TMP_DIR = ".tmp"
  val COMMIT_SUFFIX = ".json"
  val CHECKPOINT_SUFFIX = ".checkpoint.json"
  val CHECKPOINT_EVERY = 10

  def commitFileName(v: Long): String = f"$v%020d$COMMIT_SUFFIX"
  def checkpointFileName(v: Long): String = f"$v%020d$CHECKPOINT_SUFFIX"
}
