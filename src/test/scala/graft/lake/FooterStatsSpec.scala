package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Footer-based stats must agree with the aggregation-job stats on every
  * supported type, and skipping behavior must be unchanged.
  */
class FooterStatsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("footer stats == job stats across types") {
    val dir = Files.createTempDirectory("footer-").toString
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    val df = spark.range(0, 1000).select(
      $"id",
      ($"id" % 7).cast("int").as("i"),
      ($"id" * 1.5).as("d"),
      concat(lit("s"), lpad($"id".cast("string"), 4, "0")).as("s"),
      to_timestamp(lit("2021-06-01 00:00:00")).plus(
        expr("make_interval(0,0,0,0,0,cast(id as int),0)")).as("ts"),
      to_date(lit("2021-06-01")).as("dt"),
      when($"id" % 10 === 0, null).otherwise($"id").as("nullable"))
      .repartitionByRange(3, $"id")
    df.write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
    val schema = spark.read.parquet(dir).schema

    val viaJob = Stats.collect(spark, schema, files)
    val viaFooter = Stats.collectFromFooters(spark, schema, files)

    assert(viaFooter.keySet === viaJob.keySet)
    viaJob.foreach { case (file, job) =>
      val foot = viaFooter(file)
      assert(foot.numRecords === job.numRecords, s"rows differ for $file")
      def same(a: String, b: String): Boolean =
        a == b || (try BigDecimal(a) == BigDecimal(b)
                   catch { case _: NumberFormatException => false })
      job.minValues.foreach { case (c, v) =>
        foot.minValues.get(c).foreach(fv =>
          assert(same(fv, v), s"min($c): footer=$fv job=$v"))
      }
      job.maxValues.foreach { case (c, v) =>
        foot.maxValues.get(c).foreach(fv =>
          assert(same(fv, v), s"max($c): footer=$fv job=$v"))
      }
      job.nullCount.foreach { case (c, v) =>
        foot.nullCount.get(c).foreach(fv => assert(fv === v, s"nulls($c)"))
      }
      // footer stats must cover the columns the job found rangeable
      assert(job.minValues.keySet.subsetOf(foot.minValues.keySet),
        s"footer missing ranges for ${job.minValues.keySet -- foot.minValues.keySet}")
    }
  }

  test("distributed footer collection == driver-loop collection") {
    // above spark.graft.stats.distributedThreshold the footer reads run
    // on executors (the CONVERT-of-a-big-table path); the result must be
    // byte-identical to the sequential driver loop
    val dir = Files.createTempDirectory("footer-dist-").toString
    spark.range(0, 600).select(
      $"id", ($"id" * 2.5).as("d"),
      concat(lit("k"), $"id".cast("string")).as("s"),
      when($"id" % 5 === 0, null).otherwise($"id").as("n"))
      .repartitionByRange(6, $"id")
      .write.mode("overwrite").parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString).toSeq
    val schema = spark.read.parquet(dir).schema

    val viaDriver = Stats.collectFromFooters(spark, schema, files)
    spark.conf.set("spark.graft.stats.distributedThreshold", "1")
    val viaExec =
      try Stats.collectFromFooters(spark, schema, files)
      finally spark.conf.unset("spark.graft.stats.distributedThreshold")
    assert(viaExec === viaDriver)
    assert(viaExec.nonEmpty && viaExec.head._2.minValues.nonEmpty)
  }

  test("skipping via footer stats prunes like before") {
    val path = Files.createTempDirectory("footer-skip-").toString
    val df = spark.range(0, 400).select($"id", rand(5).as("v"))
      .repartitionByRange(4, $"id")
    val t = LakeTable.create(spark, path, df)
    assert(t.read($"id" < 50).inputFiles.length === 1)
    assert(t.read($"id" < 50).count() === 50)
    assert(t.read($"id" >= 350).count() === 50)
  }
}
