package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Opt-in post-write auto-compaction ([[LakeTable.maybeAutoCompact]]):
  * streaming/micro-batch ingestion must stop accumulating small files
  * once a (partition, bucket) group crosses the configured threshold,
  * without an external OPTIMIZE scheduler — and without the hook ever
  * changing query results or firing on tables that didn't opt in.
  */
class AutoCompactSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("autocompact-").toString

  private def acProps(minFiles: Int): Map[String, String] = Map(
    LakeTable.AUTO_COMPACT_PROP -> "true",
    LakeTable.AUTO_COMPACT_MIN_FILES_PROP -> minFiles.toString)

  test("disabled by default: small appends accumulate files untouched") {
    val t = LakeTable.create(spark, tmpDir(), Seq((1L, "a")).toDF("id", "v"))
    (2L to 5L).foreach(i => t.append(Seq((i, s"v$i")).toDF("id", "v")))
    assert(t.snapshot.files.size === 5)
    assert(t.history.where(col("operation") === "COMPACT").count() === 0)
  }

  test("threshold crossing compacts the group; data and history intact") {
    val t = LakeTable.create(spark, tmpDir(),
      Seq((1L, "a")).toDF("id", "v"), properties = acProps(4))
    (2L to 3L).foreach(i => t.append(Seq((i, s"v$i")).toDF("id", "v")))
    assert(t.snapshot.files.size === 3, "below threshold: no compaction yet")
    t.append(Seq((4L, "v4")).toDF("id", "v")) // 4th file crosses minFiles=4
    assert(t.snapshot.files.size === 1,
      s"the group must bin-pack to one file, got ${t.snapshot.files.size}")
    assert(t.toDF.as[(Long, String)].collect().toSet ===
      (1L to 4L).map(i => (i, if (i == 1) "a" else s"v$i")).toSet)
    assert(t.history.where(col("operation") === "COMPACT").count() === 1)
    // the next small append starts a fresh cycle, not a rewrite storm
    t.append(Seq((5L, "v5")).toDF("id", "v"))
    assert(t.snapshot.files.size === 2)
  }

  test("partitioned table: only the hot partition's files rewrite") {
    val t = LakeTable.create(spark, tmpDir(),
      Seq((1L, "cold", 1.0)).toDF("id", "p", "v"),
      partitionBy = Seq("p"), properties = acProps(3))
    val coldFiles = t.snapshot.files.map(_.path).toSet
    (2L to 4L).foreach(i =>
      t.append(Seq((i, "hot", i * 1.0)).toDF("id", "p", "v")))
    val files = t.snapshot.files
    assert(files.count(_.partitionValues("p") == "hot") === 1,
      "hot partition must compact to one file")
    assert(files.filter(_.partitionValues("p") == "cold").map(_.path).toSet
      === coldFiles, "the cold partition's file must be untouched")
  }

  test("the idempotent streaming append path triggers it too") {
    val t = LakeTable.create(spark, tmpDir(),
      Seq((0L, "seed")).toDF("id", "v"), properties = acProps(4))
    (1L to 3L).foreach(b =>
      t.idempotentAppend(Seq((b, s"b$b")).toDF("id", "v"), "app", b))
    assert(t.snapshot.files.size === 1,
      "epoch 3's append crosses the threshold and compacts")
    assert(t.toDF.count() === 4)
    // replayed epoch stays a no-op (idempotence survives the REORG)
    assert(!t.idempotentAppend(Seq((3L, "dup")).toDF("id", "v"), "app", 3L))
    assert(t.toDF.count() === 4)
  }

  test("bucketed table: auto-compaction preserves the bucket layout") {
    // the REORG must re-route every rewritten row through the canonical
    // bucket hash and stamp AddFile.bucket — otherwise the scan's
    // KeyGroupedPartitioning claim becomes a lie and storage-partitioned
    // joins silently mis-route after the first compaction
    val t = LakeTable.create(spark, tmpDir(),
      (1L to 40L).map(i => (i % 8, i * 1.0)).toDF("k", "v"),
      bucketBy = Seq("k"), numBuckets = 4, properties = acProps(3))
    (1 to 2).foreach(r =>
      t.append((1L to 8L).map(i => (i % 8, r * 100.0 + i)).toDF("k", "v")))
    assert(t.history.where(col("operation") === "COMPACT").count() > 0,
      "auto-compaction must have fired")
    val files = t.snapshot.files
    assert(files.forall(_.bucket.isDefined),
      "every post-compaction file must carry its bucket id")
    // the REAL invariant: every row in every file hashes to THAT file's
    // stamped bucket — a REORG that merged across buckets or stamped a
    // stale id would put rows of bucket 2 in a file claiming bucket 0
    // and silently mis-route storage-partitioned joins
    files.foreach { f =>
      val abs = java.nio.file.Paths.get(t.path, f.path).toString
      val offenders = spark.read.parquet(abs)
        .withColumn("__b", Bucketing.bucketId(Seq(col("k")), 4))
        .where(col("__b") =!= f.bucket.get)
        .count()
      assert(offenders === 0,
        s"file ${f.path} (bucket ${f.bucket.get}) holds $offenders " +
          "rows of OTHER buckets")
    }
    assert(t.toDF.count() === 40 + 16)
  }

  test("randomized DML interleaved with auto-compaction tracks the model") {
    // REORG commits firing at unpredictable points between appends,
    // deletes, and updates must never change what queries see — the
    // interaction surface (deletion vectors on freshly compacted files,
    // candidate resolution over rewritten paths, snapshot-cache tail
    // replay through REORGs) is exactly where a silent bug would hide
    val rnd = new scala.util.Random(11)
    val t = LakeTable.create(spark, tmpDir(),
      Seq((0L, "r0")).toDF("id", "v"), properties = acProps(3))
    val model = scala.collection.mutable.LinkedHashMap(0L -> "r0")
    var nextId = 1L
    for (step <- 1 to 25) {
      rnd.nextInt(3) match {
        case 0 =>
          val rows = (0 until 1 + rnd.nextInt(2)).map { _ =>
            val id = nextId; nextId += 1
            model(id) = s"r$id"; (id, s"r$id")
          }
          t.append(rows.toDF("id", "v"))
        case 1 if model.nonEmpty =>
          val id = model.keys.toSeq(rnd.nextInt(model.size))
          model.remove(id)
          t.delete(col("id") === id)
        case _ if model.nonEmpty =>
          val id = model.keys.toSeq(rnd.nextInt(model.size))
          model(id) = s"u$step"
          t.update(col("id") === id, Map("v" -> lit(s"u$step")))
        case _ => ()
      }
      assert(t.toDF.as[(Long, String)].collect().toSet === model.toSet,
        s"divergence at step $step")
    }
    assert(t.history.where(col("operation") === "COMPACT").count() > 0,
      "the fuzz must actually exercise auto-compaction (non-vacuous)")
  }
}
