package org.apache.spark.sql.graft

import java.io.ByteArrayInputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Confluent-framed Avro decode (SURVEY §2.8 F15) on the core avro lib
  * that ships with Spark (no spark-avro in this environment): input is
  * the wire format the reference strips by hand with
  * `substring(_value, 6, length(_value) - 5)`
  * (`05.ingesta_incremental_singleplex [avro].py:134-152`) — 1 magic
  * byte, 4 schema-id bytes, then avro binary. Output is the record
  * rendered as a JSON string, composable with `from_json(ddl)` exactly
  * like the JSON event path.
  *
  * The writer schema is provided at plan time (the reference fetches it
  * from the schema registry over HTTP; offline, the schema travels with
  * the job config). Reader/decoder instances are cached per thread —
  * expression eval is hot-path.
  */
case class ConfluentAvroToJson(child: Expression, schemaJson: String)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "from_confluent_avro"

  @transient private lazy val localReader =
    new ThreadLocal[GenericDatumReader[GenericRecord]] {
      override def initialValue(): GenericDatumReader[GenericRecord] = {
        val schema = new Schema.Parser().parse(schemaJson)
        new GenericDatumReader[GenericRecord](schema)
      }
    }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.length < 6 || bytes(0) != 0) return null // not Confluent-framed
    try {
      val decoder = DecoderFactory.get()
        .binaryDecoder(bytes, 5, bytes.length - 5, null)
      val record = localReader.get().read(null, decoder)
      UTF8String.fromString(record.toString) // GenericRecord.toString IS JSON
    } catch {
      case _: Exception => null // undecodable → null (rescue upstream)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AvroExpressions {
  /** Column API: decode a Confluent-framed avro binary column to JSON. */
  def fromConfluentAvro(c: Column, schemaJson: String): Column =
    Bridge.column(ConfluentAvroToJson(Bridge.expr(c), schemaJson))
}
