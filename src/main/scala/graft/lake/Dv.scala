package graft.lake

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.file.{Files, Path, Paths}
import java.util.UUID

import org.roaringbitmap.longlong.Roaring64Bitmap

/** Deletion-vector sidecars: a serialized Roaring64Bitmap of deleted row
  * indexes per parquet file, stored under `<table>/_dv/`. Row indexes are
  * Spark's `_metadata.row_index` (position within the file), so the
  * vector is valid for exactly one physical file — any rewrite of the
  * file drops its vector.
  */
object Dv {

  val DV_DIR = "_dv"

  def serialize(bm: Roaring64Bitmap): Array[Byte] = {
    bm.runOptimize()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    bm.serialize(out)
    out.flush()
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Roaring64Bitmap = {
    val bm = new Roaring64Bitmap()
    bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    bm
  }

  /** Write a new sidecar; returns its table-relative path. */
  def write(tablePath: String, bm: Roaring64Bitmap): String = {
    val rel = s"$DV_DIR/${UUID.randomUUID()}.dv"
    val dest = Paths.get(tablePath, rel)
    Files.createDirectories(dest.getParent)
    Files.write(dest, serialize(bm))
    rel
  }

  def readBytes(tablePath: String, rel: String): Array[Byte] =
    Files.readAllBytes(Paths.get(tablePath, rel))

  def read(tablePath: String, rel: String): Roaring64Bitmap =
    deserialize(readBytes(tablePath, rel))

  /** Vectors serializing at or below this ride base64-inline in the
    * commit log / checkpoint (AddFile.dvInline) — no sidecar, no extra
    * file read per scan. */
  val INLINE_MAX_BYTES = 1024

  def encode(bytes: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(bytes)

  def decode(s: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s)

  /** The file's deletion vector, wherever it lives (sidecar or inline). */
  def bitmapOf(tablePath: String, f: AddFile): Option[Roaring64Bitmap] =
    f.dvPath.map(read(tablePath, _))
      .orElse(f.dvInline.map(s => deserialize(decode(s))))

  /** Attach `bm` to the file entry: inline when small, sidecar when not.
    * The superseded sidecar (if any) is left for vacuum to age out. */
  def attach(tablePath: String, f: AddFile, bm: Roaring64Bitmap,
      now: Long, inlineMax: Int = INLINE_MAX_BYTES): AddFile = {
    val bytes = serialize(bm)
    if (bytes.length <= inlineMax)
      f.copy(dvPath = None, dvInline = Some(encode(bytes)),
        dvCardinality = bm.getLongCardinality, modificationTime = now)
    else
      f.copy(dvPath = Some(write(tablePath, bm)), dvInline = None,
        dvCardinality = bm.getLongCardinality, modificationTime = now)
  }
}

/** Executor-side deletion-vector lookup: absolute-normalized data-file
  * path → sidecar path (or serialized bitmap bytes for vectors that were
  * never persisted — MERGE's transient claim bitmaps, inline DVs). Only
  * paths/compressed bytes ship with the task; each executor deserializes
  * a bitmap lazily on first probe — the table directory is shared storage
  * by the same assumption the data files rely on.
  */
final class DvLookup(tablePath: String, dvPaths: Map[String, String],
    inline: Map[String, Array[Byte]] = Map.empty)
  extends Serializable {

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Roaring64Bitmap]()

  def deleted(filePath: String, rowIndex: Long): Boolean = {
    val key = Stats.normalizeFileUri(filePath)
    val bm = cache.computeIfAbsent(key, k =>
      dvPaths.get(k).map(rel => Dv.read(tablePath, rel))
        .orElse(inline.get(k).map(Dv.deserialize))
        .getOrElse(new Roaring64Bitmap()))
    bm.contains(rowIndex)
  }

  def isEmpty: Boolean = dvPaths.isEmpty && inline.isEmpty
}
