package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized soundness fuzz for the consolidated key index: a seeded
  * op sequence (appends, point and range deletes, compaction, forced
  * checkpoints — every one a rebuild at staleFraction 0, cache
  * invalidations, plus the natural every-10-commits boundary builds
  * racing the reads) against a driver-side model. The invariants are
  * the bloom family's absolutes: a probe NEVER loses a live row
  * (unsound skip) and NEVER resurrects a deleted or never-written one,
  * no matter which generation of the index — or none — serves it.
  */
class ConsolidatedKeyIndexFuzzSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def run(seed: Long): Unit = {
    val rnd = new scala.util.Random(seed)
    val path = Files.createTempDirectory(s"ckidx-fuzz-$seed-").toString
    val model = scala.collection.mutable.Map.empty[Long, String]
    val deleted = scala.collection.mutable.Set.empty[Long]
    var next = 0L
    def freshBatch(n: Int) = {
      val rows = (0 until n).map { _ =>
        val id = next; next += 1; (id, s"v$id")
      }
      rows.foreach { case (id, v) => model(id) = v }
      rows.toDF("id", "v").repartition(1 + rnd.nextInt(3))
    }
    val t = LakeTable.create(spark, path, freshBatch(40),
      properties = Map(
        BloomIndex.COLS_PROP -> "id",
        ConsolidatedKeyIndex.MIN_FILES_PROP -> "1",
        // rebuild on ANY uncovered file: maximal index churn
        ConsolidatedKeyIndex.STALE_FRACTION_PROP -> "0.0",
        // tiny groups: every rebuild exercises carry/drop/re-pack
        // across group boundaries, and probes span many groups
        ConsolidatedKeyIndex.GROUP_SLOTS_PROP -> "8"))

    def check(step: Int): Unit = {
      rnd.shuffle(model.toSeq).take(5).foreach { case (k, v) =>
        val got = t.read($"id" === k).collect()
        assert(got.length == 1 && got.head.getString(1) == v,
          s"seed=$seed step=$step live key $k lost or wrong: " +
            got.mkString(","))
      }
      rnd.shuffle(deleted.toSeq).take(3).foreach { k =>
        assert(t.read($"id" === k).isEmpty,
          s"seed=$seed step=$step deleted key $k resurrected")
      }
      (0 until 3).foreach { _ =>
        val k = next + 1 + rnd.nextInt(1000)
        assert(t.read($"id" === k).isEmpty,
          s"seed=$seed step=$step phantom key $k")
      }
      assert(t.toDF.count() === model.size.toLong,
        s"seed=$seed step=$step row-count drift")
    }

    (1 to 24).foreach { step =>
      rnd.nextInt(6) match {
        case 0 | 1 => t.append(freshBatch(10 + rnd.nextInt(60)))
        case 2 =>
          val ks = rnd.shuffle(model.keys.toSeq).take(1 + rnd.nextInt(5))
          if (ks.nonEmpty) {
            t.delete(col("id").isin(ks: _*))
            ks.foreach { k => model.remove(k); deleted += k }
          }
        case 3 =>
          if (model.nonEmpty) {
            val lo = model.keys.toSeq(rnd.nextInt(model.size))
            val hi = lo + rnd.nextInt(30)
            t.delete(col("id") >= lo && col("id") <= hi)
            model.keys.toSeq.filter(k => k >= lo && k <= hi)
              .foreach { k => model.remove(k); deleted += k }
          }
        case 4 => t.compact()
        case 5 =>
          t.log.writeCheckpointAt(t.snapshot.version)
          LakeLog.awaitMaintenance()
          ConsolidatedKeyIndex.invalidate(path)
      }
      if (step % 4 == 0) { LakeLog.awaitMaintenance(); check(step) }
    }
    LakeLog.awaitMaintenance()
    ConsolidatedKeyIndex.invalidate(path)
    check(99)
    // the fuzz must actually have exercised the index, not just fallback
    KeyIndexMetrics.reset()
    model.keys.headOption.foreach(k => t.read($"id" === k).count())
    assert(KeyIndexMetrics.served.get() > 0,
      s"seed=$seed: no probe was ever served consolidated")
  }

  test("randomized churn (seed 11): no lost rows, no phantoms") { run(11) }
  test("randomized churn (seed 12): no lost rows, no phantoms") { run(12) }

  test("randomized churn, DISTRIBUTED build path forced (seed 13)") {
    // the driver-local fast path covers every small fixture by default;
    // zeroing its byte gate forces the executor transpose (the 100 TB
    // path) through the same probe-vs-model invariants
    spark.conf.set("spark.graft.index.driverBuildMaxBytes", "0")
    try run(13)
    finally spark.conf.unset("spark.graft.index.driverBuildMaxBytes")
  }
}
