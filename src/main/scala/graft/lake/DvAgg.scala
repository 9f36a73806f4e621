package graft.lake

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf
import org.roaringbitmap.longlong.Roaring64Bitmap

/** Aggregator buffer holding a mutable Roaring64 bitmap. The bitmap class
  * is not `Serializable`, so (de)serialization between partial and final
  * aggregation goes through the portable Roaring format via
  * `writeObject`/`readObject`.
  */
final class DvBitmapBuffer extends Serializable {
  @transient var bm: Roaring64Bitmap = new Roaring64Bitmap()

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    val bytes = Dv.serialize(if (bm == null) new Roaring64Bitmap() else bm)
    out.writeInt(bytes.length)
    out.write(bytes)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    val bytes = new Array[Byte](in.readInt())
    in.readFully(bytes)
    bm = Dv.deserialize(bytes)
  }
}

/** Executor-side deletion-vector construction: a typed Aggregator that
  * folds row indexes into a Roaring64 bitmap per group and finishes to the
  * portable serialized form. DML identity jobs group by file path and
  * collect ONE blob per file to the driver — never the matched rows
  * themselves, so a DELETE claiming 40% of a 100 TB table still returns
  * O(files) bytes.
  *
  * Negative indexes are a sentinel for "this row contributes nothing"
  * (`_metadata.row_index` is never negative); using a sentinel instead of
  * NULL keeps the input encoder on the primitive fast path.
  */
object DvAgg extends Aggregator[Long, DvBitmapBuffer, Array[Byte]] {
  def zero: DvBitmapBuffer = new DvBitmapBuffer()
  def reduce(b: DvBitmapBuffer, idx: Long): DvBitmapBuffer = {
    if (idx >= 0L) b.bm.addLong(idx)
    b
  }
  def merge(a: DvBitmapBuffer, b: DvBitmapBuffer): DvBitmapBuffer = {
    a.bm.or(b.bm)
    a
  }
  def finish(b: DvBitmapBuffer): Array[Byte] = Dv.serialize(b.bm)
  def bufferEncoder: Encoder[DvBitmapBuffer] = Encoders.javaSerialization[DvBitmapBuffer]
  def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY

  /** `bitmap(idxCol)` usable in `groupBy(...).agg(...)`. */
  val bitmap: UserDefinedFunction = udaf(DvAgg, Encoders.scalaLong)
}

/** Test observability for the DML scale contract: the row count the most
  * recent DV identity job returned to the driver. Specs assert this stays
  * O(files) under large-fraction DELETE/MERGE (the per-row collect was the
  * one driver OOM hazard at 100 TB).
  */
private[graft] object DmlMetrics {
  val lastIdentityRowsCollected = new java.util.concurrent.atomic.AtomicLong(-1L)
  /** true when the most recent DELETE/UPDATE/MERGE resolved its candidates
    * via the distributed checkpoint scan instead of a materialized
    * snapshot. */
  val lastDmlDistributed = new java.util.concurrent.atomic.AtomicBoolean(false)
  /** Touched-file count of the most recent MERGE (post key-range pruning
    * and prefilter) — lets specs assert the scan really narrowed. */
  val lastMergeCandidateFiles = new java.util.concurrent.atomic.AtomicLong(-1L)
  /** true when the most recent purgeStale resolved its live-file census
    * inventory via the distributed checkpoint scan (big-log parity with
    * DELETE/UPDATE) instead of a materialized snapshot. */
  val lastPurgeDistributed = new java.util.concurrent.atomic.AtomicBoolean(false)
}
