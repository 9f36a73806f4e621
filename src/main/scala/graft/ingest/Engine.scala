package graft.ingest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.streaming.LakeStreaming

/** Config-driven ingestion engine (SURVEY §2 row T8, §7.7): the typed
  * equivalent of the reference's per-dataset dict configs fanned out into
  * N streaming queries (`notebooks/04.ingestas_motor/01.ingestas_motor
  * .py:72-242`). One [[IngestDataset]] per source; [[Engine.start]]
  * launches every stream, [[Engine.awaitAll]] drains them.
  */
final case class IngestDataset(
    name: String,
    sourceDir: String,
    tableDir: String,
    checkpointDir: String,
    loader: LoaderConfig,
    partitionBy: Seq[String] = Seq.empty,
    availableNow: Boolean = true,
    processingTime: String = "5 seconds",
    /** landing→raw archive dir: processed source files are MOVED here
      * after each batch (K7, `03.ingesta_incremental_v2 [json].py:
      * 211-235`). */
    archiveDir: Option[String] = None,
    /** Properties stamped on the bronze table at creation — the
      * config-driven way to land CDC-enabled or auto-compacting tables
      * (graft.enableChangeDataFeed, graft.autoCompact.*). */
    tableProperties: Map[String, String] = Map.empty)

final class Engine(spark: SparkSession, datasets: Seq[IngestDataset]) {

  private var queries: Seq[StreamingQuery] = Seq.empty

  def start(): Seq[StreamingQuery] = {
    queries = datasets.map { ds =>
      val loader = new IncrementalLoader(spark, ds.sourceDir,
        ds.loader.copy(archiveDir = ds.archiveDir.orElse(ds.loader.archiveDir)))
      val stream = loader.readStream()
      val trigger =
        if (ds.availableNow) Trigger.AvailableNow()
        else Trigger.ProcessingTime(ds.processingTime)
      LakeStreaming.sink(
        stream, ds.tableDir, queryName = ds.name,
        checkpointLocation = ds.checkpointDir,
        partitionBy = ds.partitionBy,
        trigger = trigger,
        tableProperties = ds.tableProperties)
    }
    queries
  }

  def awaitAll(): Unit = queries.foreach(_.awaitTermination())

  def stopAll(): Unit = queries.foreach(_.stop())
}
