package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized time-travel consistency: across a random DML history
  * (append / DV delete / update / merge upsert / compact), EVERY
  * historical version must read back exactly the model state recorded
  * when that version was committed — long after later commits, DV
  * claims, rewrites, and checkpoints (CHECKPOINT_EVERY=10 means long
  * sequences cross a checkpoint boundary) have changed the table.
  * This pins snapshot resolution, historical DV reads, and
  * reorganization invisibility (compact must not change any version's
  * visible rows) in one property.
  */
class TimeTravelFuzzSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  for (seed <- Seq(71L, 72L)) {
    test(s"every historical version reads its recorded state (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"tt-fuzz-$seed-").toString
      val init = (0L until 30L).map(i => (i, rnd.nextInt(100).toDouble))
      val t = LakeTable.create(spark, dir, init.toDF("id", "v").repartition(3))
      val model = scala.collection.mutable.Map(init: _*)
      var nextId = 500L
      // recorded (version → expected state); v0 = creation
      val history = scala.collection.mutable.ArrayBuffer[
        (Long, Map[Long, Double])]()
      history += t.snapshot.version -> model.toMap

      (1 to 14).foreach { _ =>
        rnd.nextInt(5) match {
          case 0 =>
            val rows = Seq.fill(1 + rnd.nextInt(3)) {
              nextId += 1; (nextId, rnd.nextInt(100).toDouble)
            }
            t.append(rows.toDF("id", "v"))
            rows.foreach { case (k, v) => model(k) = v }
          case 1 =>
            val m = 3 + rnd.nextInt(9)
            val r = rnd.nextInt(m)
            t.delete(pmod(col("id"), lit(m)) === r)
            model.keys.filter(k => ((k % m) + m) % m == r).toSeq
              .foreach(model.remove)
          case 2 =>
            val m = 3 + rnd.nextInt(9)
            val r = rnd.nextInt(m)
            val add = rnd.nextInt(40).toDouble
            t.update(pmod(col("id"), lit(m)) === r,
              Map("v" -> (col("v") + add)))
            model.keys.filter(k => ((k % m) + m) % m == r).toSeq
              .foreach(k => model(k) = model(k) + add)
          case 3 =>
            val src = (Seq.fill(2) {
              if (rnd.nextBoolean() && model.nonEmpty)
                model.keys.toSeq(rnd.nextInt(model.size))
              else { nextId += 1; nextId }
            }).distinct.map(id => (id, rnd.nextInt(100).toDouble))
            t.merge(src.toDF("id", "v"), expr("t.id = s.id"))
            src.foreach { case (k, v) => model(k) = v }
          case 4 =>
            // reorganization: no visible change at ANY version
            t.compact(targetFileBytes = 1L << 20)
        }
        history += t.snapshot.version -> model.toMap
      }

      // dedupe by version (compact may be a no-op commit-wise when
      // nothing qualified) keeping the LAST state per version
      val byVersion = history.groupBy(_._1).map { case (v, xs) => v -> xs.last._2 }
      assert(byVersion.size >= 10, "history should span many versions")
      byVersion.toSeq.sortBy(_._1).foreach { case (v, expect) =>
        val got = t.asOf(v).toDF.collect()
          .map(r => r.getLong(0) -> r.getDouble(1)).toMap
        assert(got === expect, s"seed $seed: version $v diverged")
      }

      // expiry: keep the newest 5 versions; every retained version still
      // reads its recorded state, expired ones raise, and the LATEST
      // state is untouched
      val last = t.snapshot.version
      val expired = t.expireSnapshots(olderThanMs = 0, retainLast = 5)
      assert(expired > 0, "fixture should expire something")
      val horizon = last - 4
      byVersion.toSeq.sortBy(_._1).foreach { case (v, expect) =>
        if (v >= horizon) {
          val got = t.asOf(v).toDF.collect()
            .map(r => r.getLong(0) -> r.getDouble(1)).toMap
          assert(got === expect, s"seed $seed: retained version $v diverged")
        } else {
          val e = intercept[IllegalArgumentException] { t.asOf(v) }
          assert(e.getMessage.contains("expire"),
            s"seed $seed: version $v should be expired, got: ${e.getMessage}")
        }
      }
      assert(t.toDF.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
        === byVersion(last), s"seed $seed: latest state changed by expiry")
    }
  }
}
