package graft.lake

import java.nio.file.Path

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Distributed snapshot state for huge commit logs (VERDICT r2 #5): at
  * 100 TB / millions of files, materializing `Snapshot.files` as a
  * driver-side Seq and filtering it in a loop is itself a scale hazard.
  * This is the Delta trick — the parquet CHECKPOINT is read as a normal
  * Spark DataFrame (distributed, column-pruned), the bounded JSON tail
  * (at most [[LakeLog.CHECKPOINT_EVERY]] commits) is applied as a
  * broadcast set, and per-file stats pruning runs ON EXECUTORS; only the
  * SURVIVING candidate files come back to the driver for scan planning.
  *
  * Everything here is a standalone object function so the typed-filter
  * closures capture only serializable arguments (expressions, schemas,
  * small sets) — never a SparkSession or a LakeTable.
  */
private[lake] object DistributedState {

  /** Identity fingerprint of a checkpoint FILE (size + mtime-ns +
    * fileKey), folded into every cache key here: a table deleted and
    * recreated at the same path produces a same-named checkpoint whose
    * path-keyed cache entry would otherwise serve the OLD incarnation's
    * state — transiently wrong on the read path, and DURABLY wrong once
    * the distributed checkpoint build bakes the stale file list into a
    * new on-disk checkpoint. One stat per use; a vanished file yields the
    * constant [[FP_MISSING]] sentinel — callers must treat it as
    * uncacheable (never insert, never serve), because a constant key
    * could match across incarnations and a unique key per call would
    * grow an unbounded cache one entry per repeated stat failure. */
  private[lake] val FP_MISSING = "missing"
  private def fp(ckpt: Path): String =
    try {
      val attrs = java.nio.file.Files.readAttributes(
        ckpt, classOf[java.nio.file.attribute.BasicFileAttributes])
      attrs.size() + ":" +
        attrs.lastModifiedTime().to(java.util.concurrent.TimeUnit.NANOSECONDS) +
        ":" + String.valueOf(attrs.fileKey())
    } catch { case scala.util.control.NonFatal(_) => FP_MISSING }

  /** Checkpoint row count from the parquet FOOTER only — the cheap
    * driver-side signal for "is this table big enough to bother".
    * Cached per (path, fingerprint): immutable content caches forever,
    * a recreate's same-named checkpoint misses.
    */
  def checkpointRows(ckpt: Path): Long = {
    val fpr = fp(ckpt)
    def read(): Long = {
      val in = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(ckpt.toString), new Configuration(false))
      val r = ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }
    if (fpr == FP_MISSING) read() // unstat-able: don't grow the cache
    else rowsCache.getOrElseUpdate(ckpt.toAbsolutePath.toString + "|" + fpr, read())
  }

  /** Total rows across a (possibly multi-part) checkpoint's files —
    * footer reads only, cached per part. */
  def checkpointRows(parts: Seq[Path]): Long = parts.map(checkpointRows).sum

  private val rowsCache = scala.collection.concurrent.TrieMap.empty[String, Long]

  /** The checkpoint's AddFile rows as a typed Dataset — Spark's parquet
    * scan (prunes to the `add` column), JSON sub-blobs decoded per row on
    * executors with the same Jackson helpers the driver log reader uses.
    *
    * Checkpoint-to-checkpoint reuse (NEXT r3 #2): the decoded Dataset is
    * PERSISTED and cached per (session, checkpoint path, file
    * fingerprint) — content at a given fingerprint is immutable, so
    * every read of a hot table between checkpoints reuses the
    * materialized decode, while a delete+recreate's same-named
    * checkpoint can never be served the old incarnation's rows. Small
    * LRU; evicted entries unpersist.
    */
  def checkpointFiles(spark: SparkSession, ckpt: Path): Dataset[AddFile] =
    checkpointFiles(spark, Seq(ckpt))

  /** Multi-part overload: one scan over the whole part set, cached under
    * a key that folds EVERY part's fingerprint — any unstat-able part
    * disables caching for the call (never cache, never serve). */
  def checkpointFiles(spark: SparkSession, parts: Seq[Path]): Dataset[AddFile] =
    fileCache.synchronized {
      val fprs = parts.map(fp)
      def decode(): Dataset[AddFile] = {
        decodeMisses.incrementAndGet()
        spark.read.parquet(parts.map(_.toString): _*)
          .where(col("add").isNotNull)
          .select("add.*")
          .map(decodeAdd)(Encoders.product[AddFile])
      }
      if (fprs.contains(FP_MISSING)) decode()
      else {
        val key = System.identityHashCode(spark) + ":" +
          parts.map(_.toAbsolutePath).zip(fprs)
            .map { case (p, f) => s"$p|$f" }.mkString(";")
        Option(fileCache.get(key)).getOrElse {
          val ds = decode()
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          fileCache.put(key, ds)
          ds
        }
      }
    }

  /** Live files = checkpoint adds minus tail-touched paths, plus the
    * tail's surviving adds — the ONE implementation of replace-by-path
    * assembly shared by the read path ([[pruneLive]]) and the
    * distributed checkpoint build (LakeLog), so the semantics cannot
    * drift between them. NOTE: a path both in the checkpoint and
    * re-added by the tail lands at the END here, where the driver
    * replay keeps its original position — file ORDER is not a snapshot
    * contract (Spark re-orders splits for scheduling anyway); content
    * equality is, and is spec-pinned.
    */
  def liveFiles(
      spark: SparkSession,
      ckptFiles: Dataset[AddFile],
      touched: Set[String],
      tailAdds: Seq[AddFile]): Dataset[AddFile] = {
    val base =
      if (touched.isEmpty) ckptFiles
      else ckptFiles.filter((f: AddFile) => !touched.contains(f.path))
    if (tailAdds.isEmpty) base
    else base.unionByName(
      spark.createDataset(tailAdds)(Encoders.product[AddFile]))
  }

  private val MAX_CACHED = 8
  private val fileCache =
    new java.util.LinkedHashMap[String, Dataset[AddFile]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Dataset[AddFile]]): Boolean =
        if (size > MAX_CACHED) { e.getValue.unpersist(false); true }
        else false
    }

  /** Test observability: cache misses that triggered a fresh decode. */
  private[lake] val decodeMisses = new java.util.concurrent.atomic.AtomicLong(0L)

  private def decodeAdd(r: Row): AddFile = {
    def optStr(name: String): Option[String] = {
      val i = r.fieldIndex(name)
      if (r.isNullAt(i)) None else Some(r.getString(i))
    }
    AddFile(
      r.getAs[String]("path"),
      optStr("partitionValues").map(Checkpoint.decodeStringMap).getOrElse(Map.empty),
      r.getAs[Long]("size"),
      r.getAs[Long]("modificationTime"),
      optStr("stats").map(Checkpoint.decodeStats),
      optStr("dvPath"),
      { val i = r.fieldIndex("dvCardinality")
        if (r.isNullAt(i)) 0L else r.getLong(i) },
      { val i = r.fieldIndex("bucket")
        if (r.isNullAt(i)) None else Some(r.getInt(i)) },
      optStr("dvInline"),
      // field added after the first checkpoints shipped: absent column
      // (old checkpoint file) decodes as None. indexWhere walks the
      // shared schema's ~10 fields — no per-row array allocation
      { val i = r.schema.indexWhere(_.name == "bloomPath")
        if (i >= 0 && !r.isNullAt(i)) Some(r.getString(i)) else None })
  }

  /** Decode one `metaData.*`-shaped Row (from the checkpoint's metaData
    * struct) — shared by [[checkpointMeta]] and LakeLog's distributed
    * checkpoint build. */
  private[lake] def decodeMetaRow(r: Row): MetaData = {
    def optStr(name: String): Option[String] = {
      val i = r.fieldIndex(name)
      if (r.isNullAt(i)) None else Some(r.getString(i))
    }
    MetaData(
      r.getAs[String]("id"),
      r.getAs[String]("schemaDdl"),
      optStr("partitionColumns").map(Checkpoint.decodeStringSeq)
        .getOrElse(Seq.empty),
      optStr("properties").map(Checkpoint.decodeStringMap)
        .getOrElse(Map.empty),
      r.getAs[Long]("createdTime"),
      optStr("schemaJson"))
  }

  /** Table metadata out of the checkpoint without touching its add rows
    * on the driver: one column-pruned distributed scan, one collected row.
    */
  def checkpointMeta(spark: SparkSession, ckpt: Path): Option[MetaData] =
    checkpointMeta(spark, Seq(ckpt))

  /** Multi-part overload — the metaData row lives in part 1 by this
    * engine's convention, but the scan covers all parts so foreign
    * layouts that spread actions arbitrarily still resolve. */
  def checkpointMeta(spark: SparkSession, parts: Seq[Path]): Option[MetaData] =
    spark.read.parquet(parts.map(_.toString): _*)
      .where(col("metaData").isNotNull)
      .select("metaData.*")
      .limit(1).collect().headOption.map(decodeMetaRow)

  /** Live files = checkpoint adds minus tail-touched paths, plus the
    * tail's surviving adds; then stats pruning distributed across the
    * cluster. `touched`/`tailAdds` are bounded by the tail's size (≤
    * CHECKPOINT_EVERY commits), so shipping them in the closure is O(KB).
    */
  def pruneLive(
      ckptFiles: Dataset[AddFile],
      touched: Set[String],
      tailAdds: Seq[AddFile],
      resolved: Seq[Expression],
      schema: StructType,
      partitionCols: Seq[String],
      probe: BloomProbe = BloomProbe.none): Array[AddFile] =
    pruneDs(liveFiles(ckptFiles.sparkSession, ckptFiles, touched, tailAdds),
      resolved, schema, partitionCols, probe)

  /** Stats pruning over an already-assembled live Dataset (the
    * [[liveFiles]] output): min/max AND bloom evaluate ON EXECUTORS — a
    * point lookup into a million-file table reads its index sidecars
    * distributed, never through the driver — and only survivors collect.
    */
  def pruneDs(
      all: Dataset[AddFile],
      resolved: Seq[Expression],
      schema: StructType,
      partitionCols: Seq[String],
      probe: BloomProbe = BloomProbe.none): Array[AddFile] = {
    val pruned =
      if (resolved.isEmpty) all
      else {
        val norm = resolved.map(Stats.normalize)
        all.filter((f: AddFile) =>
          norm.forall(e => Stats.mightMatchNormalized(f, e, schema, partitionCols, probe)))
      }
    pruned.collect()
  }
}

/** Test observability: how the most recent [[LakeTable.read]] resolved
  * its candidate files. */
private[graft] object ReadMetrics {
  /** true = distributed checkpoint scan; false = driver-side Seq. */
  val lastReadDistributed = new java.util.concurrent.atomic.AtomicBoolean(false)
}
