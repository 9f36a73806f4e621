package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}

/** Incremental file-ingestion source — the engine's Auto Loader analog
  * (SURVEY §2.1 S7, §7.5). Built on the Structured Streaming file source
  * (exactly-once discovery via the stream checkpoint) plus the
  * cloudFiles-style schema layer the reference configures
  * (`notebooks/02.ingestas_ficheros/00.databricks_autoloader.py:11-108`):
  *
  *  - schema inference from a batch read of the existing files, persisted
  *    to `schemaLocation` (first run infers, later runs load —
  *    `cloudFiles.schemaLocation`);
  *  - `schemaHints`: DDL fragments overriding inferred field types
  *    (`01.ingestas_motor.py:81`);
  *  - `_rescued_data`: rows that do not parse against the schema land in
  *    a rescue column instead of being dropped (PERMISSIVE +
  *    columnNameOfCorruptRecord);
  *  - `addNewColumns` evolution ACROSS RESTARTS: at start(), new columns
  *    in the source not in the persisted schema are appended and the
  *    persisted schema updated — the real Auto Loader fails the stream
  *    and picks the columns up on restart, so restart-time evolution
  *    matches its observable behavior.
  */
final case class LoaderConfig(
    format: String = "json",              // json | csv | parquet | binaryFile
    schemaLocation: String,
    schemaHints: Option[String] = None,
    inferColumnTypes: Boolean = true,
    rescuedDataColumn: String = "_rescued_data",
    evolveSchema: Boolean = true,         // addNewColumns
    /** Files per micro-batch. Bounded BY DEFAULT (Auto Loader's own
      * default is 1000): the per-batch work — and the evolution guard's
      * per-batch filename collect in [[EvolvingStream]] — must stay
      * O(trigger), never O(backlog). None = unbounded, opt-in only. */
    maxFilesPerTrigger: Option[Int] = Some(1000),
    pathGlobFilter: Option[String] = None,
    recursiveFileLookup: Boolean = false,
    csvHeader: Boolean = true,
    /** landing→raw archive (K7): delegated to the file source's native
      * `cleanSource=archive`, which moves a file only AFTER the batch
      * that read it commits — restart-safe, unlike a foreachBatch mv
      * (a crash between mv and commit would orphan the replay). */
    archiveDir: Option[String] = None,
    /** Schema inference reads at most this many of the NEWEST files
      * (by mtime) — a landing zone with millions of files must not pay a
      * full-directory batch read at every start (VERDICT r01 #6). */
    maxFilesForInference: Int = 100)

final class IncrementalLoader(
    spark: SparkSession,
    sourceDir: String,
    config: LoaderConfig) {

  private val schemaFile = Paths.get(config.schemaLocation, "_schema.ddl")

  /** The effective schema: persisted ∪ (evolved new columns) + hints. */
  def resolveSchema(): StructType = {
    val persisted: Option[StructType] =
      if (Files.exists(schemaFile))
        Some(DataType.fromDDL(
          new String(Files.readAllBytes(schemaFile), StandardCharsets.UTF_8))
          .asInstanceOf[StructType])
      else None

    val inferred: Option[StructType] =
      if (persisted.isEmpty || config.evolveSchema) inferNow() else None

    val merged = (persisted, inferred) match {
      case (Some(p), Some(i)) =>
        // addNewColumns: append source columns the persisted schema lacks
        val known = p.fieldNames.toSet
        StructType(p.fields ++ i.fields.filterNot(f => known.contains(f.name)))
      case (Some(p), None) => p
      case (None, Some(i)) => i
      case (None, None) =>
        throw new IllegalStateException(
          s"no files to infer a schema from in $sourceDir and no persisted schema")
    }
    val hinted = applyHints(merged)
    persist(hinted)
    hinted
  }

  /** Schema of a specific file set (the per-batch detection probe). */
  private[ingest] def inferFilesSchema(files: Seq[String]): Option[StructType] =
    inferOver(files)

  private def inferNow(): Option[StructType] = {
    val all = listSourceFiles()
    // newest files carry the newest columns (addNewColumns semantics);
    // cap the inference read so startup cost is O(maxFilesForInference)
    val files =
      if (all.size <= config.maxFilesForInference) all
      else all.map(f => f -> Files.getLastModifiedTime(Paths.get(f)).toMillis)
        .sortBy(_._2).takeRight(config.maxFilesForInference).map(_._1)
    inferOver(files)
  }

  private def inferOver(files: Seq[String]): Option[StructType] = {
    if (files.isEmpty) return None
    val reader = spark.read
    val df = config.format match {
      case "json" =>
        (if (config.inferColumnTypes) reader
         else reader.option("primitivesAsString", "true")).json(files: _*)
      case "csv" =>
        reader.option("header", config.csvHeader.toString)
          .option("inferSchema", config.inferColumnTypes.toString).csv(files: _*)
      case "parquet" => reader.parquet(files: _*)
      case "binaryFile" => reader.format("binaryFile").load(files: _*)
      case other => throw new IllegalArgumentException(s"unsupported format: $other")
    }
    Some(df.schema)
  }

  private def listSourceFiles(): Seq[String] = {
    val root = Paths.get(sourceDir)
    if (!Files.isDirectory(root)) return Seq.empty
    val glob = config.pathGlobFilter
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val matcher = glob.map(g =>
      root.getFileSystem.getPathMatcher("glob:" + g))
    def walk(dir: java.nio.file.Path): Unit = {
      val it = graft.util.Fs.listDir(dir).iterator
      while (it.hasNext) {
        val p = it.next()
        if (Files.isDirectory(p)) { if (config.recursiveFileLookup) walk(p) }
        else if (!p.getFileName.toString.startsWith(".") &&
          !p.getFileName.toString.startsWith("_") &&
          matcher.forall(_.matches(p.getFileName)))
          out += p.toString
      }
    }
    walk(root)
    out.toSeq.sorted
  }

  private def applyHints(s: StructType): StructType = config.schemaHints match {
    case None => s
    case Some(ddl) =>
      val hints = DataType.fromDDL(ddl).asInstanceOf[StructType]
      val hintMap = hints.fields.map(f => f.name -> f).toMap
      val overridden = s.fields.map(f => hintMap.getOrElse(f.name, f))
      val newFields = hints.fields.filterNot(f => s.fieldNames.contains(f.name))
      StructType(overridden ++ newFields)
  }

  private def persist(s: StructType): Unit = {
    Files.createDirectories(schemaFile.getParent)
    Files.write(schemaFile, s.toDDL.getBytes(StandardCharsets.UTF_8))
  }

  /** Append `newFields` to the persisted schema (mid-stream
    * addNewColumns). */
  private[ingest] def evolveTo(newFields: Seq[StructField]): Unit = {
    val cur = DataType.fromDDL(
      new String(Files.readAllBytes(schemaFile), StandardCharsets.UTF_8))
      .asInstanceOf[StructType]
    val known = cur.fieldNames.toSet
    persist(StructType(cur.fields ++ newFields.filterNot(f => known.contains(f.name))))
  }

  /** Full Auto Loader `addNewColumns` behavior (VERDICT r01 #8, reference
    * `00.databricks_autoloader.py:42-52`): the RUNNING query fails when a
    * micro-batch's files carry columns missing from the current schema;
    * the supervisor evolves + persists the schema and restarts the query
    * automatically. The throw happens BEFORE the sink sees the batch, so
    * the failed batch replays under the evolved schema — exactly-once is
    * preserved by the stream checkpoint.
    */
  def startEvolving(checkpointDir: String,
      sink: (DataFrame, Long) => Unit): EvolvingStream =
    new EvolvingStream(this, spark, config, checkpointDir, sink)

  /** The streaming DataFrame: exactly-once file discovery (checkpoint),
    * rescue column, ingestion metadata columns first (P7 —
    * `03.ingesta_incremental_v2 [json].py:109-119`).
    */
  def readStream(): DataFrame = {
    val schema = resolveSchema()
    val withRescue =
      if (config.format == "json" || config.format == "csv")
        StructType(schema.fields :+ StructField(config.rescuedDataColumn, StringType))
      else schema

    var reader = spark.readStream.schema(withRescue)
    config.maxFilesPerTrigger.foreach(n =>
      reader = reader.option("maxFilesPerTrigger", n))
    config.pathGlobFilter.foreach(g => reader = reader.option("pathGlobFilter", g))
    if (config.recursiveFileLookup)
      reader = reader.option("recursiveFileLookup", "true")
    config.archiveDir.foreach { dir =>
      reader = reader
        .option("cleanSource", "archive")
        .option("sourceArchiveDir", dir)
    }

    val raw = config.format match {
      case "json" =>
        reader
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", config.rescuedDataColumn)
          .json(sourceDir)
      case "csv" =>
        reader
          .option("header", config.csvHeader.toString)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", config.rescuedDataColumn)
          .csv(sourceDir)
      case "parquet" => reader.parquet(sourceDir)
      case "binaryFile" => reader.format("binaryFile").load(sourceDir)
      case other => throw new IllegalArgumentException(s"unsupported format: $other")
    }

    val metaCols = Seq(
      current_timestamp().as("_ingested_at"),
      input_file_name().as("_ingested_filename"))
    val dataCols = raw.columns.map(col)
    raw.select(metaCols ++ dataCols: _*)
  }
}
