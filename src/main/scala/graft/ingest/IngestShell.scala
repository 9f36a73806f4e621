package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.LakeTable
import graft.streaming.LakeStreaming

/** CLI driving the ingestion engine end-to-end in a scratch dir: writes
  * landing JSON waves, runs the config-driven engine (availableNow),
  * re-runs to prove exactly-once, archives landing→raw, and pushes the
  * harness events table through the Kafka-envelope multiplex path.
  * Usage: runMain graft.ingest.IngestShell <sfDir> <workDir>
  */
object IngestShell {
  private def runOnce(spark: SparkSession, ds: IngestDataset): Unit = {
    val e = new Engine(spark, Seq(ds)); e.start(); e.awaitAll()
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, workDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = Paths.get(workDir)
    val landing = root.resolve("landing/orders")
    Files.createDirectories(landing)

    def wave(name: String, rows: Seq[String]): Unit =
      Files.write(landing.resolve(name),
        rows.mkString("\n").getBytes(StandardCharsets.UTF_8))

    val ds = IngestDataset(
      name = "orders",
      sourceDir = landing.toString,
      tableDir = root.resolve("bronze/orders").toString,
      checkpointDir = root.resolve("ckpt/orders").toString,
      loader = LoaderConfig(schemaLocation = root.resolve("schema/orders").toString,
        schemaHints = Some("id bigint, qty bigint")),
      archiveDir = Some(root.resolve("raw/orders").toString))

    wave("w1.json", Seq(
      """{"id": 1, "item": "pizza", "qty": 2}""",
      """{"id": 2, "item": "salad", "qty": "oops"}"""))
    runOnce(spark, ds)
    val bronze = LakeTable.forPath(spark, ds.tableDir)
    println(s"[ingest-shell] wave1: rows=${bronze.toDF.count()} " +
      s"rescued=${bronze.toDF.where(col("_rescued_data").isNotNull).count()} " +
      s"landingLeft=${graft.util.Fs.listDir(landing).size}")

    wave("w2.json", Seq("""{"id": 3, "item": "cola", "qty": 6}"""))
    runOnce(spark, ds)
    runOnce(spark, ds) // idle re-run
    println(s"[ingest-shell] after wave2 + idle rerun: rows=${bronze.toDF.count()} " +
      s"(exactly-once => 3)")

    // events → Kafka envelope → multiplex bronze partitioned by _topic
    val fullEvents = graft.tables.Tables.events(spark, sfDir)
    val envelope = EventIngest.envelopeFromEvents(fullEvents)
    val multi = EventIngest.multiplexBronze(
      envelope.withColumnRenamed("topic", "topic"))
    val multiPath = root.resolve("bronze/multiplex").toString
    LakeTable.create(spark, multiPath, multi, partitionBy = Seq("_topic"))
    val mt = LakeTable.forPath(spark, multiPath)
    println(s"[ingest-shell] multiplex: rows=${mt.toDF.count()} " +
      s"topics=${mt.toDF.select("_topic").distinct().count()} " +
      s"pruned=${mt.read(col("_topic") === "events_click").inputFiles.length}/" +
      s"${mt.toDF.inputFiles.length} files")
    spark.stop()
  }
}
