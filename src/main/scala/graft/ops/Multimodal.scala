package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns (builder brief): image/audio/video as opaque
  * `binary` columns with typed metadata structs. The Spark plumbing —
  * binaryFile scan, schemas, partitioning, per-partition batch shape —
  * is real; image decode/resize use the JDK's own javax.imageio (the
  * reference's pandas_udf + PIL width×height,
  * `05.ingesta_incremental [imagenes].py:57-60`, without the python
  * worker hop); video/audio decoding has no codec library in this
  * container, so those two extractors are DETERMINISTIC STUBS with the
  * production signature.
  *
  * Scale notes: decode work is per-row CPU with no shuffle — it scales
  * linearly with executors; `balancedBySize` repartitions by cumulative
  * byte size so a few huge files can't skew one task.
  */
object Multimodal {

  val imageMetaType: StructType = DataType.fromDDL(
    "width int, height int, format string, ok boolean").asInstanceOf[StructType]

  /** Binary-file scan (S6): one file → one row
    * {path, modificationTime, length, content}.
    */
  def readBinaryDir(spark: SparkSession, dir: String,
      glob: Option[String] = None, recursive: Boolean = true): DataFrame = {
    var r = spark.read.format("binaryFile")
    glob.foreach(g => r = r.option("pathGlobFilter", g))
    if (recursive) r = r.option("recursiveFileLookup", "true")
    r.load(dir)
  }

  // ---- images (REAL decode via javax.imageio) --------------------------

  private def decodeMeta(bytes: Array[Byte]): (Int, Int, String, Boolean) = {
    if (bytes == null) return (0, 0, "none", false)
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) (0, 0, "unknown", false)
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          (reader.getWidth(0), reader.getHeight(0),
            reader.getFormatName.toLowerCase, true)
        } finally reader.dispose()
      }
    } catch { case _: Exception => (0, 0, "error", false) }
  }

  private val imageMetaUdf = udf { bytes: Array[Byte] =>
    val (w, h, f, ok) = decodeMeta(bytes)
    (w, h, f, ok)
  }

  /** Attach an image-metadata struct (width/height/format) decoded from
    * the binary content — header-only read, the full pixel raster is
    * never materialized.
    */
  def withImageMeta(df: DataFrame, contentCol: String = "content",
      metaCol: String = "image_meta"): DataFrame =
    df.withColumn(metaCol, imageMetaUdf(col(contentCol))
      .cast(imageMetaType))

  private val resizeUdf = udf { (bytes: Array[Byte], w: Int, h: Int) =>
    try {
      val src = ImageIO.read(new ByteArrayInputStream(bytes))
      if (src == null) null
      else {
        val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        g.drawImage(src, 0, 0, w, h, null)
        g.dispose()
        val out = new ByteArrayOutputStream()
        ImageIO.write(dst, "png", out)
        out.toByteArray
      }
    } catch { case _: Exception => null }
  }

  /** Real resize (Graphics2D), returning PNG bytes. */
  def withResized(df: DataFrame, w: Int, h: Int,
      contentCol: String = "content", outCol: String = "resized"): DataFrame =
    df.withColumn(outCol, resizeUdf(col(contentCol), lit(w), lit(h)))

  // ---- video / audio (STUBS — no codec libs in this container) ---------

  /** Session flag gating the stub decoders below: they produce
    * deterministic FAKE frames/features (real Spark-side plumbing, fake
    * decode), and a production pipeline must never mistake them for real
    * codecs. Callers opt in explicitly — typically test/CI sessions. */
  val ALLOW_STUBS_CONF = "spark.graft.multimodal.allowStubDecoders"

  private def requireStubsAllowed(df: DataFrame, what: String): Unit =
    require(df.sparkSession.conf.getOption(ALLOW_STUBS_CONF)
      .exists(_.toBoolean),
      s"$what is a STUB (deterministic fake decode — no codec libraries " +
        s"in this build); set $ALLOW_STUBS_CONF=true to acknowledge, or " +
        "swap in a real decoder for production")

  val frameMetaType: StructType = DataType.fromDDL(
    "frame_index int, offset bigint, frame binary").asInstanceOf[StructType]

  /** STUB frame sampler: a real implementation hands `bytes` to a codec
    * and returns every `everyNth` decoded frame. The deterministic fake
    * slices fixed-width windows so schema/explode/partition behavior is
    * fully exercised end-to-end.
    */
  private val frameSampleUdf = udf { (bytes: Array[Byte], everyNth: Int, frameSize: Int) =>
    if (bytes == null) Array.empty[(Int, Long, Array[Byte])]
    else {
      val n = math.max(bytes.length / math.max(frameSize, 1), 0)
      (0 until n by math.max(everyNth, 1)).map { i =>
        val off = i.toLong * frameSize
        (i, off, bytes.slice(off.toInt, math.min(off.toInt + frameSize, bytes.length)))
      }.toArray
    }
  }

  /** One row per sampled "frame" (array → explode), the standard shape
    * for downstream per-frame featurization.
    */
  def sampleFrames(df: DataFrame, everyNth: Int = 10, frameSize: Int = 4096,
      contentCol: String = "content"): DataFrame = {
    requireStubsAllowed(df, "sampleFrames")
    df.withColumn("__frames",
        frameSampleUdf(col(contentCol), lit(everyNth), lit(frameSize))
          .cast(ArrayType(frameMetaType)))
      .withColumn("frame_info", explode(col("__frames")))
      .drop("__frames", contentCol)
      .select(col("*"), col("frame_info.*"))
      .drop("frame_info")
  }

  /** STUB audio featurizer: production swaps the body for a real
    * decode + spectrogram; the fake derives a fixed-length deterministic
    * feature vector from byte statistics so the schema contract
    * (`array<float>` of `dim`) and the downstream similarity ops hold.
    */
  private val audioFeatureUdf = udf { (bytes: Array[Byte], dim: Int) =>
    if (bytes == null) Array.fill(dim)(0f)
    else {
      val out = new Array[Float](dim)
      var i = 0
      while (i < bytes.length) {
        out(i % dim) += (bytes(i) & 0xff) / 255f
        i += 1
      }
      val n = math.max(bytes.length / dim, 1)
      out.map(_ / n)
    }
  }

  def withAudioFeatures(df: DataFrame, dim: Int = 16,
      contentCol: String = "content", outCol: String = "audio_features"): DataFrame = {
    requireStubsAllowed(df, "withAudioFeatures")
    df.withColumn(outCol, audioFeatureUdf(col(contentCol), lit(dim)))
  }

  // ---- partitioning ----------------------------------------------------

  /** Repartition so each task gets ~`targetBytes` of binary payload:
    * binary workloads skew by file size, not row count.
    */
  def balancedBySize(df: DataFrame, targetBytes: Long = 128L << 20,
      lengthCol: String = "length"): DataFrame = {
    // sum() is NULL on an empty frame — degrade to one partition
    val row = df.agg(sum(col(lengthCol))).head()
    val total = if (row.isNullAt(0)) 0L else row.getLong(0)
    val parts = math.max(1, math.min(10000, (total / targetBytes).toInt + 1))
    df.repartitionByRange(parts, col(lengthCol), col("path"))
  }
}
