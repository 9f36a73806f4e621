package graft.lake

/** Collects the per-column xxhash64 values of every row a staging-write
  * task writes, keyed by the task's PARTITION ID (read from the
  * TaskContext — with no layout dirs, no bucketing and no
  * maxRecordsPerFile, the write stage's partition N produces exactly
  * the `part-0000N-*` file). Evaluated as an OBSERVED metric of the
  * write job ([[BloomIndex.attachFused]]), so the bloom sidecar build
  * needs no second read of the written files and no job of its own.
  *
  * Exactly-once: observed metrics accept only the first successful
  * completion of each partition, so a retried/speculative write task
  * can never double-contribute.
  *
  * Scale guard: each partition buffers raw 8-byte hashes up to
  * `capPerCol`; a task that overflows (a huge file) marks its partition
  * and the file falls back to the classic read-side build — the fusion
  * only ever carries small-commit bytes through the driver, mirroring
  * the bloom driver-merge gate.
  */
final class FusedBloomPart(nCols: Int, capPerCol: Int) extends Serializable {
  var rows: Long = 0L
  var overflow: Boolean = false
  var hashes: Array[Array[Long]] = Array.fill(nCols)(new Array[Long](16))
  var sizes: Array[Int] = new Array[Int](nCols)

  def add(c: Int, h: Long): Unit = {
    if (overflow) return
    if (sizes(c) >= capPerCol) { overflow = true; return }
    if (sizes(c) == hashes(c).length)
      hashes(c) = java.util.Arrays.copyOf(hashes(c),
        math.min(capPerCol, hashes(c).length * 2))
    hashes(c)(sizes(c)) = h
    sizes(c) += 1
  }

  def col(c: Int): Array[Long] =
    java.util.Arrays.copyOf(hashes(c), sizes(c))
}

final class FusedBloomBuffer(nCols0: Int, capPerCol0: Int)
    extends Serializable {
  var nCols: Int = nCols0
  var capPerCol: Int = capPerCol0
  @transient var parts: java.util.HashMap[Integer, FusedBloomPart] =
    new java.util.HashMap()

  def part(pid: Int): FusedBloomPart = {
    var p = parts.get(pid)
    if (p == null) { p = new FusedBloomPart(nCols, capPerCol); parts.put(pid, p) }
    p
  }

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.writeInt(nCols)
    out.writeInt(capPerCol)
    out.writeInt(if (parts == null) 0 else parts.size())
    if (parts != null) {
      val it = parts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        out.writeInt(e.getKey.intValue())
        val p = e.getValue
        out.writeLong(p.rows)
        out.writeBoolean(p.overflow)
        var c = 0
        while (c < nCols) {
          out.writeInt(p.sizes(c))
          var i = 0
          while (i < p.sizes(c)) { out.writeLong(p.hashes(c)(i)); i += 1 }
          c += 1
        }
      }
    }
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    val n = in.readInt()
    val cap = in.readInt()
    nCols = n
    capPerCol = cap
    parts = new java.util.HashMap()
    val nParts = in.readInt()
    var k = 0
    while (k < nParts) {
      val pid = in.readInt()
      val p = new FusedBloomPart(n, cap)
      p.rows = in.readLong()
      p.overflow = in.readBoolean()
      var c = 0
      while (c < n) {
        val len = in.readInt()
        val arr = new Array[Long](math.max(16, len))
        var i = 0
        while (i < len) { arr(i) = in.readLong(); i += 1 }
        p.hashes(c) = arr
        p.sizes(c) = len
        c += 1
      }
      parts.put(pid, p)
      k += 1
    }
  }
}

object FusedBloomAgg {
  /** Blob: Int nParts; per part: Int pid, Long rows, Boolean overflow,
    * then per column Int len + len raw hashes (omitted on overflow). */
  def finishBlob(b: FusedBloomBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.parts.size())
    val it = b.parts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val p = e.getValue
      out.writeInt(e.getKey.intValue())
      out.writeLong(p.rows)
      out.writeBoolean(p.overflow)
      if (!p.overflow) {
        var c = 0
        while (c < b.nCols) {
          out.writeInt(p.sizes(c))
          var i = 0
          while (i < p.sizes(c)) { out.writeLong(p.hashes(c)(i)); i += 1 }
          c += 1
        }
      }
    }
    out.close()
    bos.toByteArray
  }
  final case class DecodedPart(rows: Long, overflow: Boolean,
      hashes: Array[Array[Long]])

  def decode(blob: Array[Byte], nCols: Int): Map[Int, DecodedPart] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(blob))
    val n = in.readInt()
    (0 until n).map { _ =>
      val pid = in.readInt()
      val rows = in.readLong()
      val overflow = in.readBoolean()
      val hashes =
        if (overflow) Array.empty[Array[Long]]
        else Array.fill(nCols) {
          val len = in.readInt()
          val arr = new Array[Long](len)
          var i = 0
          while (i < len) { arr(i) = in.readLong(); i += 1 }
          arr
        }
      pid -> DecodedPart(rows, overflow, hashes)
    }.toMap
  }

  /** default per-column raw-hash cap per write task: 512k hashes = 4 MB */
  val DEFAULT_CAP = 524288
}
