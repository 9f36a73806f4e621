package graft.lake

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The distributed vacuum path (executor-side listing, liveness
  * anti-join, retention evaluation, deletes) must behave EXACTLY like
  * the driver-side walk: same files deleted, same files kept, staging
  * dirs reaped, CDC retention decoupled — proven by running the same
  * history through both paths and comparing.
  */
class VacuumDistributedSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def withThreshold[T](n: Long)(body: => T): T = {
    spark.conf.set("spark.graft.vacuum.distributedThreshold", n.toString)
    try body
    finally spark.conf.unset("spark.graft.vacuum.distributedThreshold")
  }

  /** Build one table with removed files, a DV sidecar history, CDC
    * change files, an orphaned staging dir, and live data. */
  private def buildHistory(path: String): LakeTable = {
    val t = LakeTable.create(spark, path,
      (1L to 40L).map(i => (i, s"r$i")).toDF("id", "v"),
      properties = Map(Cdc.PROP -> "true"))
    t.append((41L to 50L).map(i => (i, s"r$i")).toDF("id", "v"))
    t.delete(col("id") <= 5L)        // DV or rewrite + CDC files
    t.update(col("id") === 50L, Map("v" -> lit("upd")))
    t.compact(targetFileBytes = 1L << 30) // leaves removed originals
    val staging = Paths.get(path, LakeTable.STAGING_PREFIX + "orphan")
    Files.createDirectories(staging)
    Files.write(staging.resolve("never-committed.parquet"), Array[Byte](1, 2))
    t
  }

  private def allFiles(path: String): Set[String] = {
    val root = Paths.get(path)
    def walk(d: java.nio.file.Path): Seq[String] =
      graft.util.Fs.listDir(d).flatMap { p =>
        if (Files.isDirectory(p)) {
          if (p.getFileName.toString == LakeLog.LOG_DIR) Seq.empty else walk(p)
        } else Seq(root.relativize(p).toString)
      }
    walk(root).toSet
  }

  test("distributed vacuum deletes exactly what the driver walk deletes") {
    val p1 = Files.createTempDirectory("vac-driver-").toString
    val p2 = Files.createTempDirectory("vac-dist-").toString
    val t1 = buildHistory(p1)
    val t2 = buildHistory(p2)

    val delDriver = withThreshold(Long.MaxValue)(t1.vacuum(retentionMs = 0L))
    val delDist = withThreshold(1L)(t2.vacuum(retentionMs = 0L))

    assert(delDriver.nonEmpty, "the history must produce vacuumable files")
    // same RELATIVE paths cannot be asserted (file names are UUIDs), but
    // the deleted counts by kind and the surviving file sets must match
    def kinds(s: Seq[String]): Map[String, Int] =
      s.groupBy {
        case r if r.startsWith(Cdc.CDC_DIR + "/") => "cdc"
        case r if r.endsWith(".dv") => "dv"
        case r if r.startsWith(LakeTable.STAGING_PREFIX) => "staging"
        case _ => "data"
      }.view.mapValues(_.size).toMap
    assert(kinds(delDist) === kinds(delDriver))
    assert(allFiles(p2).size === allFiles(p1).size)
    // both tables still read their full live state
    assert(t1.toDF.count() === t2.toDF.count())
    assert(t2.toDF.orderBy("id").as[(Long, String)].collect().toSeq ===
      t1.toDF.orderBy("id").as[(Long, String)].collect().toSeq)
    // and the live file set survived the distributed deletes
    assert(t2.snapshot.files.map(_.path).toSet.subsetOf(allFiles(p2)))
  }

  test("distributed vacuum on a table opened via a relative path") {
    // ADVICE r6: the directory strings shipped to executor tasks must be
    // absolutized DRIVER-side — relative strings resolve against each
    // executor's own working directory on a real cluster (local mode
    // shares the driver CWD, so this spec pins the relative-path shape
    // and end-to-end behavior; the absolutization lives in walkDirs).
    val relBase = Paths.get("target", s"vac-rel-${java.util.UUID.randomUUID()}")
    Files.createDirectories(relBase.getParent)
    val rel = relBase.toString
    assert(!Paths.get(rel).isAbsolute, "the spec must exercise a relative root")
    try {
      val t = buildHistory(rel)
      val deleted = withThreshold(1L)(t.vacuum(retentionMs = 0L))
      assert(deleted.nonEmpty, "the history must produce vacuumable files")
      assert(deleted.forall(!Paths.get(_).isAbsolute),
        "reported paths stay table-relative")
      assert(t.toDF.count() === 45)
      assert(t.snapshot.files.map(_.path).toSet.subsetOf(allFiles(rel)))
    } finally {
      graft.TestFs.rmRf(relBase)
    }
  }

  test("distributed path honors retention (nothing young deleted)") {
    val p = Files.createTempDirectory("vac-dist-ret-").toString
    val t = buildHistory(p)
    val before = allFiles(p)
    val deleted = withThreshold(1L)(t.vacuum(retentionMs = 1000L * 3600))
    assert(deleted.isEmpty, s"fresh files must survive retention: $deleted")
    assert(allFiles(p) === before)
  }
}
