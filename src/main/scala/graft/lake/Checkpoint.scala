package graft.lake

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.core.`type`.TypeReference
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.MessageTypeParser

/** Columnar checkpoint of a snapshot's live actions, mirroring Delta's
  * checkpoint parquet (`01.parquet_primer.py:382-386`): typed columns for
  * the hot fields, JSON strings for the nested maps (exactly how Delta
  * stores per-file `stats`). Written and read with parquet-hadoop's Group
  * API — no SparkSession needed on the log's metadata path.
  */
private[lake] object Checkpoint {

  private val schema = MessageTypeParser.parseMessageType(
    """message lake_checkpoint {
      |  optional group add {
      |    required binary path (STRING);
      |    optional binary partitionValues (STRING);
      |    required int64 size;
      |    required int64 modificationTime;
      |    optional binary stats (STRING);
      |    optional binary dvPath (STRING);
      |    optional int64 dvCardinality;
      |    optional int32 bucket;
      |    optional binary dvInline (STRING);
      |    optional binary bloomPath (STRING);
      |  }
      |  optional group metaData {
      |    required binary id (STRING);
      |    required binary schemaDdl (STRING);
      |    optional binary partitionColumns (STRING);
      |    optional binary properties (STRING);
      |    required int64 createdTime;
      |    optional binary schemaJson (STRING);
      |  }
      |  optional group txn {
      |    required binary appId (STRING);
      |    required int64 batchId;
      |  }
      |}""".stripMargin)

  private val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m
  }

  private def toJson(o: Any): String = mapper.writeValueAsString(o)

  private def stringMap(s: String): Map[String, String] =
    mapper.readValue(s, new TypeReference[Map[String, String]] {})

  private def stringSeq(s: String): Seq[String] =
    mapper.readValue(s, new TypeReference[Seq[String]] {})

  // executor-side decode for [[DistributedState]]'s checkpoint scan —
  // same wire format, parsed where the rows are
  private[lake] def decodeStringMap(s: String): Map[String, String] = stringMap(s)
  private[lake] def decodeStringSeq(s: String): Seq[String] = stringSeq(s)
  private[lake] def decodeStats(s: String): FileStats = stats(s)

  private def stats(s: String): FileStats = {
    val st = mapper.readValue(s, classOf[FileStats])
    // Jackson gives Integer for small JSON ints under erasure; re-widen
    st.copy(nullCount = st.nullCount.asInstanceOf[Map[String, Any]]
      .map { case (k, v) => k -> v.asInstanceOf[Number].longValue() })
  }

  /** Streams `actions` — callers may pass a lazy iterator, so a
    * checkpoint encode never needs the full action list in memory
    * (the distributed build hands an executor task the live-file
    * iterator of a Spark partition). */
  def write(dest: Path, actions: IterableOnce[Action]): Unit = {
    val factory = new SimpleGroupFactory(schema)
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(dest.toString))
      .withType(schema)
      .withConf(new Configuration(false))
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    try {
      actions.iterator.foreach { a =>
        val g = factory.newGroup()
        a.add.foreach { f =>
          val ag = g.addGroup("add")
          ag.add("path", f.path)
          ag.add("partitionValues", toJson(f.partitionValues))
          ag.add("size", f.size)
          ag.add("modificationTime", f.modificationTime)
          f.stats.foreach(st => ag.add("stats", toJson(st)))
          f.dvPath.foreach(dv => ag.add("dvPath", dv))
          f.dvInline.foreach(dv => ag.add("dvInline", dv))
          if (f.dvPath.isDefined || f.dvInline.isDefined)
            ag.add("dvCardinality", f.dvCardinality)
          f.bucket.foreach(b => ag.add("bucket", b))
          f.bloomPath.foreach(bp => ag.add("bloomPath", bp))
        }
        a.metaData.foreach { m =>
          val mg = g.addGroup("metaData")
          mg.add("id", m.id)
          mg.add("schemaDdl", m.schemaDdl)
          mg.add("partitionColumns", toJson(m.partitionColumns))
          mg.add("properties", toJson(m.properties))
          mg.add("createdTime", m.createdTime)
          m.schemaJson.foreach(j => mg.add("schemaJson", j))
        }
        a.txn.foreach { t =>
          val tg = g.addGroup("txn")
          tg.add("appId", t.appId)
          tg.add("batchId", t.batchId)
        }
        if (a.add.isDefined || a.metaData.isDefined || a.txn.isDefined)
          writer.write(g)
      }
    } finally writer.close()
  }

  def read(src: Path): Seq[Action] = {
    val reader = ParquetReader
      .builder(new GroupReadSupport(), new org.apache.hadoop.fs.Path(src.toString))
      .withConf(new Configuration(false))
      .build()
    val out = scala.collection.mutable.ArrayBuffer[Action]()
    try {
      var g: Group = reader.read()
      while (g != null) {
        def has(field: String): Boolean = g.getFieldRepetitionCount(field) > 0
        if (has("add")) {
          val ag = g.getGroup("add", 0)
          // containsField guard: checkpoints written before a field
          // existed carry the old message type — read them as None
          def present(f: String): Boolean =
            ag.getType.asGroupType().containsField(f) &&
              ag.getFieldRepetitionCount(f) > 0
          def opt(f: String): Option[String] =
            if (present(f)) Some(ag.getString(f, 0)) else None
          out += Action.of(AddFile(
            ag.getString("path", 0),
            opt("partitionValues").map(stringMap).getOrElse(Map.empty),
            ag.getLong("size", 0),
            ag.getLong("modificationTime", 0),
            opt("stats").map(stats),
            opt("dvPath"),
            if (present("dvCardinality")) ag.getLong("dvCardinality", 0) else 0L,
            if (present("bucket")) Some(ag.getInteger("bucket", 0)) else None,
            opt("dvInline"),
            opt("bloomPath")))
        } else if (has("metaData")) {
          val mg = g.getGroup("metaData", 0)
          def opt(f: String): Option[String] =
            if (mg.getFieldRepetitionCount(f) > 0) Some(mg.getString(f, 0)) else None
          out += Action.of(MetaData(
            mg.getString("id", 0),
            mg.getString("schemaDdl", 0),
            opt("partitionColumns").map(stringSeq).getOrElse(Seq.empty),
            opt("properties").map(stringMap).getOrElse(Map.empty),
            mg.getLong("createdTime", 0),
            opt("schemaJson")))
        } else if (has("txn")) {
          val tg = g.getGroup("txn", 0)
          out += Action.of(SetTxn(tg.getString("appId", 0), tg.getLong("batchId", 0)))
        }
        g = reader.read()
      }
    } finally reader.close()
    out.toSeq
  }
}
