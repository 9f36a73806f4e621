package graft.ops

import java.awt.image.BufferedImage
import java.nio.file.{Files, Path}

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  /** Real PNGs of distinct sizes + one junk file. */
  private lazy val imgDir: Path = {
    val dir = Files.createTempDirectory("imgs-")
    def png(name: String, w: Int, h: Int): Unit = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff00ff)
      ImageIO.write(img, "png", dir.resolve(name).toFile)
    }
    png("a.png", 8, 6)
    png("b.png", 32, 16)
    Files.write(dir.resolve("junk.png"), Array[Byte](1, 2, 3))
    dir
  }

  test("binaryFile scan: one row per file with content") {
    val df = Multimodal.readBinaryDir(spark, imgDir.toString, Some("*.png"))
    assert(df.count() === 3)
    assert(df.schema.fieldNames.toSet ===
      Set("path", "modificationTime", "length", "content"))
  }

  test("image metadata decoded for real PNGs, junk flagged not-ok") {
    val df = Multimodal.withImageMeta(
      Multimodal.readBinaryDir(spark, imgDir.toString, Some("*.png")))
    val metas = df.select(col("path"), col("image_meta.*"))
      .collect().map(r => (r.getString(0).split('/').last,
        r.getInt(1), r.getInt(2), r.getBoolean(4))).toSet
    assert(metas.exists { case (n, w, h, ok) => n == "a.png" && w == 8 && h == 6 && ok })
    assert(metas.exists { case (n, w, h, ok) => n == "b.png" && w == 32 && h == 16 && ok })
    assert(metas.exists { case (n, _, _, ok) => n == "junk.png" && !ok })
  }

  test("resize produces decodable images of target size") {
    val df = Multimodal.withResized(
      Multimodal.readBinaryDir(spark, imgDir.toString, Some("[ab].png")), 4, 4)
    val meta = Multimodal.withImageMeta(df, contentCol = "resized",
      metaCol = "resized_meta")
    val sizes = meta.select(col("resized_meta.width"), col("resized_meta.height"))
      .as[(Int, Int)].collect().toSet
    assert(sizes === Set((4, 4)))
  }

  test("stub decoders refuse to run unless explicitly acknowledged") {
    val dir = Files.createTempDirectory("gate-")
    Files.write(dir.resolve("v.bin"), Array.fill[Byte](100)(1))
    val df = Multimodal.readBinaryDir(spark, dir.toString)
    spark.conf.unset(Multimodal.ALLOW_STUBS_CONF)
    val e1 = intercept[IllegalArgumentException](Multimodal.sampleFrames(df))
    assert(e1.getMessage.contains("STUB"))
    val e2 = intercept[IllegalArgumentException](Multimodal.withAudioFeatures(df))
    assert(e2.getMessage.contains(Multimodal.ALLOW_STUBS_CONF))
  }

  test("frame sampling explodes deterministic frame rows") {
    val dir = Files.createTempDirectory("vids-")
    Files.write(dir.resolve("v.bin"), Array.fill[Byte](10000)(7))
    spark.conf.set(Multimodal.ALLOW_STUBS_CONF, "true")
    val frames = Multimodal.sampleFrames(
      Multimodal.readBinaryDir(spark, dir.toString), everyNth = 1, frameSize = 4096)
    val rows = frames.select("frame_index", "offset").as[(Int, Long)]
      .collect().sortBy(_._1)
    assert(rows.toSeq === Seq((0, 0L), (1, 4096L)))
    assert(frames.schema("frame").dataType.typeName === "binary")
  }

  test("audio features: fixed dim, deterministic, feeds similarity ops") {
    val dir = Files.createTempDirectory("audio-")
    Files.write(dir.resolve("x.pcm"), Array.tabulate[Byte](2048)(i => (i % 120).toByte))
    Files.write(dir.resolve("y.pcm"), Array.tabulate[Byte](2048)(i => (i % 120).toByte))
    spark.conf.set(Multimodal.ALLOW_STUBS_CONF, "true")
    val df = Multimodal.withAudioFeatures(
      Multimodal.readBinaryDir(spark, dir.toString), dim = 16)
    assert(df.select(size(col("audio_features"))).as[Int].collect().forall(_ === 16))
    // identical content → identical features → cosine 1.0 through Similarity
    val pairs = Dedup.embeddingPairs(
      df.withColumn("id", monotonically_increasing_id()),
      "audio_features", "id", threshold = 0.999)
    assert(pairs.count() === 1)
  }

  test("size-balanced repartition keeps all rows") {
    val df = Multimodal.readBinaryDir(spark, imgDir.toString)
    assert(Multimodal.balancedBySize(df, targetBytes = 64).count() === df.count())
  }
}
