package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.lake.LakeTable

/** Randomized restart soundness for the commit-log streaming pipe: a
  * lake-to-lake stream (LakeSourceProvider → DSv2 streaming sink) is
  * started and drained with Trigger.AvailableNow once per wave, with a
  * random mix of appends and DML rewrites (change commits, skipped by
  * contract) landing between waves. Exactly-once must hold ACROSS the
  * restarts: the sink ends up with every appended row exactly once —
  * an off-by-one in the version offsets or a SetTxn replay hole shows
  * up as a missing or duplicated batch.
  */
class StreamRestartFuzzSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  for (seed <- Seq(91L, 92L)) {
    test(s"source→sink stream stays exactly-once across restarts (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val root = Files.createTempDirectory(s"stream-fuzz-$seed-").toString
      val src = LakeTable.create(spark, s"$root/src",
        Seq((0L, 0.0)).toDF("id", "v"))
      LakeTable.create(spark, s"$root/sink",
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          src.snapshot.schema))
      val expected = scala.collection.mutable.Set(0L)
      var nextId = 100L

      (1 to 4).foreach { wave =>
        (0 until 1 + rnd.nextInt(3)).foreach { _ =>
          val rows = Seq.fill(1 + rnd.nextInt(4)) {
            nextId += 1; (nextId, rnd.nextInt(100).toDouble)
          }
          src.append(rows.toDF("id", "v"))
          expected ++= rows.map(_._1)
        }
        // change commits (updates of EXISTING rows) are skipped by the
        // stream by contract — they must not duplicate or drop anything
        if (rnd.nextBoolean()) {
          val ids = rnd.shuffle(expected.toSeq).take(2)
          src.merge(ids.map(i => (i, 999.0)).toDF("id", "v"),
            expr("t.id = s.id"),
            whenMatchedUpdate = Some(Map.empty),
            whenNotMatchedInsert = None)
        }
        val q = spark.readStream
          .format("org.apache.spark.sql.graft.LakeSourceProvider")
          .option("path", s"$root/src")
          .load()
          .writeStream
          .format("org.apache.spark.sql.graft.LakeSourceProvider")
          .option("path", s"$root/sink")
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()

        val got = LakeTable.forPath(spark, s"$root/sink").toDF
          .select("id").as[Long].collect()
        assert(got.length === got.distinct.length,
          s"seed $seed wave $wave: duplicated rows in the sink")
        assert(got.toSet === expected.toSet,
          s"seed $seed wave $wave: sink diverged " +
            s"(missing ${expected.toSet -- got.toSet}, " +
            s"extra ${got.toSet -- expected.toSet})")
      }
    }
  }
}
