package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Deletion vectors: small DELETEs are sidecar writes, not file
  * rewrites; full-file deletes are pure metadata; reads (Scala AND SQL)
  * mask deleted rows; vectors union across deletes and clear on rewrite.
  */
class DeletionVectorSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("dv-").toString

  private def hasDv(f: AddFile): Boolean =
    f.dvPath.isDefined || f.dvInline.isDefined

  test("small delete writes a sidecar, not a rewrite") {
    val path = tmp()
    val t = LakeTable.create(spark, path,
      (1L to 100L).map(i => (i, i * 1.0)).toDF("id", "v").repartition(1))
    val before = t.snapshot.files.map(_.path)

    val n = t.delete($"id" === 5L || $"id" === 17L)
    assert(n === 2L)
    val snap = t.snapshot
    assert(snap.files.map(_.path) === before) // SAME physical file
    assert(hasDv(snap.files.head))
    assert(snap.files.head.dvCardinality === 2L)
    assert(t.toDF.count() === 98)
    assert(t.toDF.where($"id" === 5L).count() === 0)

    // second delete unions into a new vector
    val n2 = t.delete($"id" <= 10L)
    assert(n2 === 9L) // 5 already gone
    assert(t.snapshot.files.head.dvCardinality === 11L)
    assert(t.toDF.count() === 89)
  }

  test("full-file delete is pure metadata; heavy delete rewrites") {
    val path = tmp()
    // two files via partition: p=a (10 rows), p=b (10 rows)
    val t = LakeTable.create(spark, path,
      (1L to 20L).map(i => (i, if (i <= 10) "a" else "b")).toDF("id", "p"),
      partitionBy = Seq("p"))
    // whole partition a: full-file remove, no DV, no new file
    val filesBefore = t.snapshot.files.size
    assert(t.delete($"p" === "a") === 10L)
    val snap = t.snapshot
    assert(snap.files.size < filesBefore)
    assert(!snap.files.exists(hasDv))
    assert(snap.commits.map(_._2).lastOption.map(_.numAddedFiles) === Some(0L))
    // 90% of remaining file: above dvMaxFraction → rewrite
    assert(t.delete($"id" <= 19L) === 9L)
    assert(!t.snapshot.files.exists(hasDv)) // rewrote, no DV
    assert(t.toDF.select("id").as[Long].collect().toSeq === Seq(20L))
  }

  test("SQL reads and DML see through deletion vectors") {
    val wh = Files.createTempDirectory("dv-wh-").toString
    spark.conf.set("spark.sql.catalog.dv", "org.apache.spark.sql.graft.LakeCatalog")
    spark.conf.set("spark.sql.catalog.dv.warehouse", wh)
    Files.createDirectories(java.nio.file.Paths.get(s"$wh/db"))
    spark.sql("CREATE TABLE dv.db.t AS SELECT id, id * 2 AS v FROM range(50)")
    LakeTable.forPath(spark, s"$wh/db/t").delete($"id" < 5L)

    assert(spark.sql("SELECT count(*) FROM dv.db.t").as[Long].head() === 45)
    assert(spark.sql("SELECT min(id) FROM dv.db.t").as[Long].head() === 5)
    // aggregates/filters push into the substituted plan fine
    assert(spark.sql("SELECT sum(v) FROM dv.db.t WHERE id < 10").as[Long].head() ===
      (5L until 10L).map(_ * 2).sum)
    // SQL DELETE also lands as a DV (small fraction)
    spark.sql("DELETE FROM dv.db.t WHERE id = 7")
    assert(spark.sql("SELECT count(*) FROM dv.db.t").as[Long].head() === 44)
  }

  test("update and merge do not resurrect DV-deleted rows") {
    val path = tmp()
    val t = LakeTable.create(spark, path,
      (1L to 30L).map(i => (i, 0.0)).toDF("id", "v").repartition(1))
    t.delete($"id" <= 3L)
    assert(hasDv(t.snapshot.files.head))
    // small UPDATE: DVs the old row version and appends only the new one
    val filesBefore = t.snapshot.files.map(_.path).toSet
    t.update($"id" === 10L, Map("v" -> lit(9.9)))
    assert(t.toDF.count() === 27)
    val snap = t.snapshot
    assert(snap.files.map(_.path).toSet.intersect(filesBefore) === filesBefore,
      "update must not rewrite the original file")
    assert(snap.files.exists(f => hasDv(f) && f.dvCardinality === 4L),
      "old row version joins the deleted set") // 3 deleted + 1 updated-old
    assert(t.toDF.where($"id" <= 3L).count() === 0)
    assert(t.toDF.where($"v" === 9.9).count() === 1)
    assert(t.toDF.where($"id" === 10L).count() === 1) // exactly one version
    // MERGE matching everything: deleted rows are not match targets
    t.merge((1L to 5L).map(i => (i, 5.5)).toDF("id", "v"), expr("t.id = s.id"),
      whenMatchedUpdate = Some(Map.empty), whenNotMatchedInsert = Some(Map.empty))
    assert(t.toDF.where($"id" <= 3L).count() === 3) // re-INSERTED as unmatched
    assert(t.toDF.count() === 30)
  }

  test("small merge DVs the matched old rows and appends only new versions") {
    val path = tmp()
    val t = LakeTable.create(spark, path,
      (1L to 100L).map(i => (i, 0.0)).toDF("id", "v").repartition(1))
    val original = t.snapshot.files.map(_.path).toSet

    // upsert 5 matched + 2 inserted
    t.merge((96L to 102L).map(i => (i, 1.0)).toDF("id", "v"),
      expr("t.id = s.id"))
    val snap = t.snapshot
    assert(snap.files.map(_.path).toSet.intersect(original) === original,
      "merge must not rewrite a lightly-matched file")
    assert(snap.files.exists(f => original(f.path) && f.dvCardinality === 5L),
      "matched old row versions are bitmap-deleted")
    val ci = snap.commits.last._2
    assert(ci.operation === "MERGE" && ci.parameters("deletionVectors") === "1")
    assert(ci.numOutputRows === 7L) // 5 updates + 2 inserts appended
    assert(t.toDF.count() === 102)
    assert(t.toDF.where($"v" === 1.0).count() === 7)
    assert(t.toDF.where($"id" === 96L).count() === 1) // exactly one version

    // time travel still sees the pre-merge state through the old (empty) DV
    assert(t.asOf(0).toDF.where($"v" === 1.0).count() === 0)
  }

  test("merge delete clauses claim rows through DVs; heavy merge rewrites") {
    val path = tmp()
    val t = LakeTable.create(spark, path,
      (1L to 50L).map(i => (i, 0.0)).toDF("id", "v").repartition(1))
    val original = t.snapshot.files.map(_.path).toSet
    // delete-only merge, 10% of rows: DV, no new data files
    t.merge((1L to 5L).map(i => Tuple1(i)).toDF("id"), expr("t.id = s.id"),
      whenMatchedUpdate = None, whenMatchedDelete = true,
      whenNotMatchedInsert = None)
    val snap = t.snapshot
    assert(snap.files.map(_.path).toSet === original)
    assert(snap.files.head.dvCardinality === 5L)
    assert(snap.commits.last._2.numAddedFiles === 0L)
    assert(t.toDF.count() === 45)

    // update matching ~90% of survivors: above dvMaxFraction → rewrite
    t.merge((1L to 47L).map(i => (i, 2.0)).toDF("id", "v"), expr("t.id = s.id"),
      whenNotMatchedInsert = None)
    val snap2 = t.snapshot
    assert(snap2.files.forall(f => !original(f.path)), "heavy merge rewrites")
    assert(!snap2.files.exists(hasDv))
    assert(t.toDF.count() === 45)
    assert(t.toDF.where($"v" === 2.0).count() === 42) // ids 6..47
  }

  test("small DVs inline in the commit log: no sidecar, no extra read") {
    val path = tmp()
    val t = LakeTable.create(spark, path,
      (1L to 100L).map(i => (i, i * 1.0)).toDF("id", "v").repartition(1))
    t.delete($"id" <= 4L)
    val f = t.snapshot.files.head
    assert(f.dvInline.isDefined && f.dvPath.isEmpty)
    assert(f.dvCardinality === 4L)
    // nothing on disk: the vector rides in the log (and its checkpoints)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path, Dv.DV_DIR)))
    assert(t.toDF.count() === 96)
    assert(t.toDF.where($"id" <= 4L).count() === 0)
    // inline vector round-trips the JSON log on a fresh handle
    val t2 = LakeTable.forPath(spark, path)
    assert(t2.snapshot.files.head.dvInline === f.dvInline)
    assert(t2.toDF.count() === 96)
  }

  test("time travel and vacuum interact correctly with DVs") {
    val path = tmp()
    spark.conf.set("spark.graft.dv.inlineMaxBytes", "0") // force sidecars
    val t = LakeTable.create(spark, path,
      (1L to 10L).map(i => Tuple1(i)).toDF("id").repartition(1))
    t.delete($"id" === 1L) // v1: dv A
    t.delete($"id" === 2L) // v2: dv B (union), A now orphaned
    assert(t.toDF.count() === 8)
    assert(t.asOf(1).toDF.count() === 9) // old snapshot uses old vector
    assert(t.asOf(0).toDF.count() === 10)

    val dvDir = java.nio.file.Paths.get(path, Dv.DV_DIR)
    assert(java.nio.file.Files.list(dvDir).count() === 2)
    val removed = t.vacuum(retentionMs = 0L)
    assert(removed.exists(_.endsWith(".dv"))) // orphaned vector A cleaned
    assert(java.nio.file.Files.list(dvDir).count() === 1)
    assert(t.toDF.count() === 8) // live vector untouched
    spark.conf.unset("spark.graft.dv.inlineMaxBytes")
  }
}
