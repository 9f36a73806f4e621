package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType}

import graft.lake.{FusedBloomAgg, FusedBloomBuffer}

/** Catalyst-level fused-bloom hash collector (the hot-path form of the
  * write-side bloom build): `children` are the per-indexed-column
  * nullable xxhash64 expressions, evaluated DIRECTLY against each
  * internal row — no array construction, no encoder round-trip, no
  * boxing beyond the Long hash itself. A udaf/Aggregator version of
  * this measured ~7 µs/row on the staging write (Seq[Option[Long]]
  * deserialization per row); this one is the reason the fused build is
  * cheaper than the read-side job it replaces.
  *
  * Rows are keyed by TaskContext partition id (see
  * [[graft.lake.BloomIndex.attachFused]] for the file-name contract).
  */
case class FusedBloomHashAgg(
    children: Seq[Expression],
    capPerCol: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FusedBloomBuffer] {

  override def createAggregationBuffer(): FusedBloomBuffer =
    new FusedBloomBuffer(children.length, capPerCol)

  override def update(b: FusedBloomBuffer, row: InternalRow): FusedBloomBuffer = {
    val tc = org.apache.spark.TaskContext.get()
    val pid = if (tc == null) -1 else tc.partitionId()
    val p = b.part(pid)
    p.rows += 1L
    var c = 0
    while (c < children.length) {
      val v = children(c).eval(row)
      if (v != null) p.add(c, v.asInstanceOf[Long])
      c += 1
    }
    b
  }

  override def merge(a: FusedBloomBuffer, b: FusedBloomBuffer): FusedBloomBuffer = {
    val it = b.parts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val existing = a.parts.get(e.getKey)
      if (existing == null) a.parts.put(e.getKey, e.getValue)
      else {
        // defensively union (cannot happen under exactly-once partials)
        val p = e.getValue
        existing.rows += p.rows
        if (p.overflow) existing.overflow = true
        var c = 0
        while (c < children.length) {
          var i = 0
          while (i < p.sizes(c)) { existing.add(c, p.hashes(c)(i)); i += 1 }
          c += 1
        }
      }
    }
    a
  }

  override def eval(b: FusedBloomBuffer): Any = FusedBloomAgg.finishBlob(b)

  override def serialize(b: FusedBloomBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(b)
    oos.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FusedBloomBuffer =
    new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(bytes))
      .readObject().asInstanceOf[FusedBloomBuffer]

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): FusedBloomHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FusedBloomHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FusedBloomHashAgg =
    copy(children = newChildren)
  override def prettyName: String = "fused_bloom_hashes"
}

object FusedBloomHashAgg {
  /** Observe-ready metric column over the given hash columns. */
  def metric(hashCols: Seq[Column], capPerCol: Int): Column =
    Bridge.column(FusedBloomHashAgg(hashCols.map(Bridge.expr), capPerCol)
      .toAggregateExpression())
}
