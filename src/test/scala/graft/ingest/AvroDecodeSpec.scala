package graft.ingest

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-trip of the Confluent-avro event path (pizza orders shaped like
  * `04.datasource [avro].py:253-300`): encode GenericRecords with the
  * core avro lib, frame Confluent-style, decode through the native
  * expression + from_json.
  */
class AvroDecodeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private val schemaJson =
    """{"type":"record","name":"PizzaOrder","fields":[
         {"name":"order_id","type":"long"},
         {"name":"pizzaName","type":"string"},
         {"name":"additionalToppings","type":{"type":"array","items":"string"}}
       ]}"""

  private def encode(orderId: Long, pizza: String, toppings: Seq[String]): Array[Byte] = {
    val schema = new Schema.Parser().parse(schemaJson)
    val rec: GenericRecord = new GenericData.Record(schema)
    rec.put("order_id", orderId)
    rec.put("pizzaName", pizza)
    rec.put("additionalToppings",
      java.util.Arrays.asList(toppings: _*))
    val out = new ByteArrayOutputStream()
    // Confluent framing: magic 0 + 4-byte schema id
    out.write(Array[Byte](0, 0, 0, 0, 42))
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  test("confluent avro value decodes through the envelope pipeline") {
    val rows = Seq(
      ("u1", encode(1L, "margherita", Seq("olives", "basil")), "pizza", 0, 0L),
      ("u2", encode(2L, "diavola", Seq()), "pizza", 1, 1L))
    val envelope = rows.toDF("key", "value", "topic", "partition", "offset")
      .select(col("key").cast("binary").as("key"), col("value"),
        col("topic"), col("partition"), col("offset"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("timestamp"),
        lit(0).as("timestampType"))

    val decoded = EventIngest.decodeAvroSingleplex(envelope, schemaJson,
      "order_id bigint, pizzaName string, additionalToppings array<string>")

    val got = decoded.select("order_id", "pizzaName", "additionalToppings")
      .as[(Long, String, Seq[String])].collect().sortBy(_._1)
    assert(got(0) === ((1L, "margherita", Seq("olives", "basil"))))
    assert(got(1) === ((2L, "diavola", Seq())))
    // envelope metadata survives with the _-prefix convention
    assert(decoded.columns.contains("_topic"))
  }

  test("non-confluent bytes decode to null instead of failing the job") {
    val envelope = Seq(("u1", Array[Byte](9, 9, 9), "t", 0, 0L))
      .toDF("key", "value", "topic", "partition", "offset")
      .select(col("key").cast("binary").as("key"), col("value"),
        col("topic"), col("partition"), col("offset"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")).as("timestamp"),
        lit(0).as("timestampType"))
    val decoded = EventIngest.decodeAvroSingleplex(envelope,
      schemaJson, "order_id bigint")
    assert(decoded.count() === 1)
    assert(decoded.where(col("order_id").isNull).count() === 1)
  }
}
