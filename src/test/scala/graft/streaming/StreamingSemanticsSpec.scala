package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Streaming semantics the engine exposes beyond the reference's usage
  * (SURVEY T9 — windows, watermarks, session windows; A3 — streaming
  * grouped aggregation; T2 — ProcessingTime trigger): driven with the
  * harness events table streamed through a file source into a memory
  * sink.
  */
class StreamingSemanticsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  /** Stream of the sf0.001 events table (ns-timestamp already rebuilt by
    * writing a micros copy first).
    */
  private lazy val eventsDir: String = {
    val dir = Files.createTempDirectory("events-stream-").toString
    graft.tables.Tables.events(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def eventsStream = {
    val schema = spark.read.parquet(eventsDir).schema
    spark.readStream.schema(schema).parquet(eventsDir)
  }

  test("A3: streaming grouped aggregation (complete mode)") {
    val agg = eventsStream.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("by_type")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.sql("SELECT * FROM by_type").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = spark.read.parquet(eventsDir).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("T9: tumbling window + watermark aggregation (append mode)") {
    val agg = eventsStream
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("windowed")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // append mode emits only windows sealed by the watermark; with a
    // bounded input everything except the tail hour is sealed
    val emitted = spark.sql("SELECT count(*) FROM windowed").as[Long].head()
    val distinctWindows = spark.read.parquet(eventsDir)
      .select(window($"ts", "1 hour"), $"event_type").distinct().count()
    assert(emitted > 0)
    assert(emitted <= distinctWindows)
  }

  test("T9: session window aggregation") {
    val agg = eventsStream
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("sessions")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.sql("SELECT count(*) FROM sessions").as[Long].head() > 0)
  }

  test("T2: ProcessingTime trigger drains and stops cleanly") {
    val q = eventsStream.groupBy($"event_type").count()
      .writeStream.outputMode("complete")
      .format("memory").queryName("pt_agg")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM pt_agg").as[Long].head() === 5)
    } finally q.stop()
  }

  test("stream-stream inner join with watermarked time-bound condition") {
    // purchases enriched with the same user's clicks within the
    // preceding hour — both sides streaming, state bounded by the
    // watermark + time-range condition
    val clicks = eventsStream.where($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("c_ts"), $"event_id".as("c_id"))
      .withWatermark("c_ts", "30 minutes")
    val purchases = eventsStream.where($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"ts".as("p_ts"), $"event_id".as("p_id"))
      .withWatermark("p_ts", "30 minutes")
    val joined = purchases.join(clicks,
      $"p_user" === $"c_user" &&
        $"c_ts" >= $"p_ts" - expr("INTERVAL 1 HOUR") && $"c_ts" <= $"p_ts")
    val q = joined.writeStream
      .format("memory").queryName("ss_join").outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("ss-join-ckpt-").toString)
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table("ss_join").select("p_id", "c_id").collect().toSet
      // batch reference over the same data
      val ev = graft.tables.Tables.events(spark, "/root/testdata/sf0.001")
      val want = ev.where($"event_type" === "purchase").alias("p")
        .join(ev.where($"event_type" === "click").alias("c"),
          col("p.user_id") === col("c.user_id") &&
            col("c.ts") >= col("p.ts") - expr("INTERVAL 1 HOUR") &&
            col("c.ts") <= col("p.ts"))
        .select(col("p.event_id"), col("c.event_id")).collect().toSet
      assert(want.nonEmpty, "fixture must produce join matches")
      assert(got.map(r => (r.getLong(0), r.getLong(1))) ===
        want.map(r => (r.getLong(0), r.getLong(1))))
    } finally q.stop()
  }

  test("streaming dedup: dropDuplicatesWithinWatermark bounds its state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

    val dedup = in.toDF().toDF("id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("dedup_wm").start()
    try {
      // batch 1: duplicate ids inside one batch collapse
      in.addData((1L, ts(0)), (1L, ts(1)), (2L, ts(2)))
      q.processAllAvailable()
      // batch 2: id 1 again within the watermark window → still a dupe;
      // id 3 is new; event at :40 advances the watermark past :30
      in.addData((1L, ts(3)), (3L, ts(5)), (9L, ts(40)))
      q.processAllAvailable()
      // batch 3: id 1 reappears AFTER its dedup state expired (watermark
      // :30 > first-seen :00 + 10 min) → emitted again, by design
      in.addData((1L, ts(45)))
      q.processAllAvailable()
      val ids = spark.sql("SELECT id FROM dedup_wm").as[Long].collect().toSeq
      assert(ids.count(_ == 1L) === 2,
        s"id 1 should emit once per watermark window, got $ids")
      assert(ids.count(_ == 2L) === 1 && ids.count(_ == 3L) === 1)
    } finally q.stop()
  }

  test("windowed streaming aggregate lands exactly-once in a lake table") {
    import graft.lake.LakeTable
    import graft.streaming.LakeStreaming
    val root = java.nio.file.Files.createTempDirectory("stream-agg-")
    val agg = eventsStream
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("window_start"), $"event_type", $"n")
    val q = LakeStreaming.sink(agg, root.resolve("agg_table").toString,
      "win_agg", root.resolve("ckpt").toString)
    q.awaitTermination()
    val t = LakeTable.forPath(spark, root.resolve("agg_table").toString)
    val first = t.toDF.count()
    assert(first > 0)
    // replay the whole stream: checkpoint + idempotent commits = no dupes
    val q2 = LakeStreaming.sink(agg, root.resolve("agg_table").toString,
      "win_agg", root.resolve("ckpt").toString)
    q2.awaitTermination()
    assert(t.toDF.count() === first)
  }
}
