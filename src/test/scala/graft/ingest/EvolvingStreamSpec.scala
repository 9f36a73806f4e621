package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Mid-stream schema evolution (VERDICT r01 #8): a new-column file
  * arriving while the query RUNS must fail the batch, evolve the schema,
  * and land through an automatic restart — no manual intervention.
  */
class EvolvingStreamSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def drop(dir: String, name: String, lines: String*): Unit =
    Files.write(Paths.get(dir, name),
      lines.mkString("\n").getBytes(StandardCharsets.UTF_8))

  test("new column mid-stream: fail, evolve, restart, replay") {
    val src = Files.createTempDirectory("evolve-src-").toString
    val schemaLoc = Files.createTempDirectory("evolve-schema-").toString
    val ckpt = Files.createTempDirectory("evolve-ckpt-").toString
    drop(src, "wave1.json",
      """{"id":1,"name":"a"}""", """{"id":2,"name":"b"}""")

    val loader = new IncrementalLoader(spark, src,
      LoaderConfig(format = "json", schemaLocation = schemaLoc))
    val batches =
      java.util.concurrent.ConcurrentHashMap.newKeySet[(Seq[String], Long)]()
    val rows = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val stream = loader.startEvolving(ckpt, (df: DataFrame, id: Long) => {
      batches.add((df.columns.toSeq, id))
      df.toJSON.collect().foreach(rows.add)
    })
    try {
      stream.processAllAvailable()
      assert(rows.asScala.exists(_.contains("\"name\":\"a\"")))
      assert(stream.restarts === 0)

      // a file with an unseen column lands while the query is running
      drop(src, "wave2.json", """{"id":3,"name":"c","extra":"X"}""")
      stream.processAllAvailable()

      assert(stream.restarts === 1) // failed + restarted automatically
      // the evolved column landed, populated, through the replayed batch
      assert(rows.asScala.exists(r =>
        r.contains("\"id\":3") && r.contains("\"extra\":\"X\"")))
      // the persisted schema evolved
      val ddl = new String(Files.readAllBytes(
        Paths.get(schemaLoc, "_schema.ddl")), StandardCharsets.UTF_8)
      assert(ddl.contains("extra"))
      // wave-1 rows were NOT re-emitted (exactly-once across the restart)
      assert(rows.asScala.count(_.contains("\"name\":\"a\"")) === 1)
    } finally stream.stop()
  }

  test("parquet sources evolve mid-stream too (drifted columns, no rescue needed)") {
    val src = Files.createTempDirectory("evolve-pq-src-").toString
    val schemaLoc = Files.createTempDirectory("evolve-pq-schema-").toString
    val ckpt = Files.createTempDirectory("evolve-pq-ckpt-").toString
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "name").coalesce(1)
      .write.parquet(s"$src/wave1")
    // flatten: the loader watches a flat dir
    val f1 = java.nio.file.Files.list(java.nio.file.Paths.get(s"$src/wave1"))
      .iterator().asScala.find(_.toString.endsWith(".parquet")).get
    java.nio.file.Files.move(f1, java.nio.file.Paths.get(s"$src/wave1.parquet"))

    val loader = new IncrementalLoader(spark, src,
      LoaderConfig(format = "parquet", schemaLocation = schemaLoc,
        pathGlobFilter = Some("*.parquet")))
    val rows = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val stream = loader.startEvolving(ckpt,
      (df: DataFrame, _: Long) => df.toJSON.collect().foreach(rows.add))
    try {
      stream.processAllAvailable()
      assert(rows.asScala.exists(_.contains("\"id\":1")))

      Seq((2L, "b", 3.5)).toDF("id", "name", "score").coalesce(1)
        .write.parquet(s"$src/wave2")
      val f2 = java.nio.file.Files.list(java.nio.file.Paths.get(s"$src/wave2"))
        .iterator().asScala.find(_.toString.endsWith(".parquet")).get
      java.nio.file.Files.move(f2, java.nio.file.Paths.get(s"$src/wave2.parquet"))

      stream.processAllAvailable()
      assert(stream.restarts === 1)
      assert(rows.asScala.exists(r =>
        r.contains("\"id\":2") && r.contains("\"score\":3.5")))
    } finally stream.stop()
  }

  test("evolveSchema=false streams on unchanged (new columns rescued-or-dropped)") {
    val src = Files.createTempDirectory("noevolve-src-").toString
    val schemaLoc = Files.createTempDirectory("noevolve-schema-").toString
    val ckpt = Files.createTempDirectory("noevolve-ckpt-").toString
    drop(src, "wave1.json", """{"id":1,"name":"a"}""")

    val loader = new IncrementalLoader(spark, src,
      LoaderConfig(format = "json", schemaLocation = schemaLoc,
        evolveSchema = false))
    val rows = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val stream = loader.startEvolving(ckpt,
      (df: DataFrame, _: Long) => df.toJSON.collect().foreach(rows.add))
    try {
      stream.processAllAvailable()
      drop(src, "wave2.json", """{"id":2,"name":"b","extra":"X"}""")
      stream.processAllAvailable()
      assert(stream.restarts === 0)
      assert(rows.asScala.exists(_.contains("\"id\":2")))
      // the unknown column did not appear
      assert(!rows.asScala.exists(_.contains("extra")))
    } finally stream.stop()
  }
}
