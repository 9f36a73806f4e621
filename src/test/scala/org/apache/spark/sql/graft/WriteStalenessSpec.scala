package org.apache.spark.sql.graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.lake.LakeTable

/** Regression tests for the DSv2 publish staleness check and the
  * streaming sink's schema-evolution switch:
  *
  *  - [[LakePublish.publish]] re-reads the LATEST snapshot on every
  *    attempt and takes a fresh version number, so a concurrent metadata
  *    commit (ADD CONSTRAINT / schema evolution / re-partition) never
  *    raises a CommitConflict — before the fix the staged files, aligned
  *    and validated against the PLANNED metadata, committed silently
  *    under the new rules. The publish now carries the planned MetaData
  *    and refuses to commit when the table's current metadata differs
  *    (the same staleness rule `LakeTable.commitWithRetry` applies to
  *    rebased blind appends).
  *  - `LakeStreaming.sink(mergeSchema = ...)` was accepted and silently
  *    ignored — `idempotentAppend` always evolved the schema. The flag
  *    now reaches the append: `false` fails a batch carrying unknown
  *    columns instead of evolving the table under a sink that promised
  *    not to.
  */
class WriteStalenessSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("DSv2 publish refuses to commit past a concurrent metadata change") {
    val path = tmpDir("stale-pub-")
    val t = LakeTable.create(spark, path, Seq((1L, "a")).toDF("id", "v"))
    val planned = t.snapshot.metaData
    val dataSchema = t.snapshot.dataSchema

    // metadata commit lands between write planning and publish
    t.alterAddColumn("extra", "INT")

    val staging = Paths.get(path, "_staging_stale_test")
    Files.createDirectories(staging)
    val versionBefore = t.snapshot.version
    val e = intercept[IllegalStateException] {
      LakePublish.publish(t, staging, dataSchema, Seq.empty, LakeAppend,
        "q-stale", txn = None, plannedMeta = Some(planned))
    }
    assert(e.getMessage.contains("metadata change"))
    assert(t.snapshot.version === versionBefore, "nothing may commit")

    // re-planned against the CURRENT metadata the same publish goes through
    LakePublish.publish(t, staging, dataSchema, Seq.empty, LakeAppend,
      "q-fresh", txn = None, plannedMeta = Some(t.snapshot.metaData))
    assert(t.snapshot.version === versionBefore + 1)
  }

  test("benign property-only commits do NOT abort a planned publish") {
    val path = tmpDir("stale-benign-")
    val t = LakeTable.create(spark, path, Seq((1L, "a")).toDF("id", "v"))
    val planned = t.snapshot.metaData
    val dataSchema = t.snapshot.dataSchema

    // a concurrent commit touching only benign table properties leaves
    // the staged rows valid — staleness compares validationState, not
    // whole-MetaData equality (ADVICE r5: whole-equality permanently
    // failed running streams whose plannedMeta is pinned at query start)
    t.setProperties(Map("owner" -> "data-eng", "comment" -> "benign"))

    val staging = Paths.get(path, "_staging_benign_test")
    Files.createDirectories(staging)
    val versionBefore = t.snapshot.version
    LakePublish.publish(t, staging, dataSchema, Seq.empty, LakeAppend,
      "q-benign", txn = None, plannedMeta = Some(planned))
    assert(t.snapshot.version === versionBefore + 1,
      "the publish must go through past a props-only commit")

    // but a CONSTRAINT added concurrently still aborts — staged rows
    // were never checked against it
    val planned2 = t.snapshot.metaData
    t.addCheckConstraint("idpos", "id > 0")
    val staging2 = Paths.get(path, "_staging_benign_test2")
    Files.createDirectories(staging2)
    val e = intercept[IllegalStateException] {
      LakePublish.publish(t, staging2, dataSchema, Seq.empty, LakeAppend,
        "q-constraint", txn = None, plannedMeta = Some(planned2))
    }
    assert(e.getMessage.contains("metadata change"))
  }

  test("a pinned plan refuses to commit into a recreated table generation") {
    // ADVICE r6: validationState omitted MetaData.id, so a table deleted
    // and RECREATED at the same path with an identical schema slipped
    // past the staleness guards — a pinned-plan stream or rebasing
    // append silently committed into the new table generation.
    val path = tmpDir("stale-gen-")
    val t = LakeTable.create(spark, path, Seq((1L, "a")).toDF("id", "v"))
    val planned = t.snapshot.metaData
    val dataSchema = t.snapshot.dataSchema

    graft.TestFs.rmRf(path)
    LakeTable.create(spark, path, Seq((9L, "z")).toDF("id", "v"))
    val t2 = LakeTable.forPath(spark, path)

    // identical schema, identical (benign) properties — the GENERATION
    // is what must differ
    assert(planned.schemaDdl === t2.snapshot.metaData.schemaDdl)
    assert(planned.validationState !== t2.snapshot.metaData.validationState,
      "recreated table generation must change the validation state")

    val staging = Paths.get(path, "_staging_gen_test")
    Files.createDirectories(staging)
    val e = intercept[IllegalStateException] {
      LakePublish.publish(t2, staging, dataSchema, Seq.empty, LakeAppend,
        "q-gen", txn = None, plannedMeta = Some(planned))
    }
    assert(e.getMessage.contains("metadata change"))
    assert(t2.snapshot.version === 0, "nothing may land in the new generation")
  }

  test("a running stream survives a benign mid-stream property change") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmpDir("stale-benign-stream-")
    val table = s"$root/t"
    LakeTable.create(spark, table, Seq((0L, "seed")).toDF("id", "v"))

    val in = MemoryStream[(Long, String)]
    in.addData((1L, "a"))
    // DSv2 sink: the path whose plannedMeta is pinned at query START —
    // whole-MetaData staleness here permanently failed the stream on
    // any later props-only commit (ADVICE r5)
    val q = in.toDF().toDF("id", "v").writeStream
      .format("org.apache.spark.sql.graft.LakeSourceProvider")
      .option("path", table)
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try {
      q.processAllAvailable()
      // mid-stream: an external props-only commit (e.g. an ownership
      // tag) — the stream's pinned plannedMeta must tolerate it
      LakeTable.forPath(spark, table)
        .setProperties(Map("owner" -> "someone-else"))
      in.addData((2L, "b"))
      q.processAllAvailable()
      assert(q.exception.isEmpty,
        s"stream must survive a benign property change: ${q.exception}")
      assert(LakeTable.forPath(spark, table).read().count() === 3)
    } finally q.stop()
  }

  test("idempotentAppend(mergeSchema = false) rejects unknown columns") {
    val path = tmpDir("stale-merge-")
    val t = LakeTable.create(spark, path, Seq((1L, "a")).toDF("id", "v"))
    val evolved = Seq((2L, "b", 9)).toDF("id", "v", "extra")
    val e = intercept[IllegalArgumentException] {
      t.idempotentAppend(evolved, "app", 0L, mergeSchema = false)
    }
    assert(e.getMessage.contains("mergeSchema"))
    assert(t.snapshot.schema.fieldNames.toSeq === Seq("id", "v"),
      "the rejected batch must not evolve the table")
    // the default (true) still evolves — the sink's documented behavior
    assert(t.idempotentAppend(evolved, "app", 0L))
    assert(t.snapshot.schema.fieldNames.contains("extra"))
  }

  test("sink(mergeSchema = false) fails the stream on an evolved batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmpDir("stale-sink-")
    val table = s"$root/t"
    // table exists with (id, v); the stream's batches carry (id, v, extra)
    LakeTable.create(spark, table, Seq((0L, "seed")).toDF("id", "v"))

    val in = MemoryStream[(Long, String, Int)]
    in.addData((1L, "a", 1))
    val q = graft.streaming.LakeStreaming.sink(
      in.toDF().toDF("id", "v", "extra"), table,
      queryName = "no-evolve", checkpointLocation = s"$root/ckpt",
      mergeSchema = false)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(30000)
      q.processAllAvailable()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(e).exists(_.getMessage != null) &&
      chain(e).exists(c => Option(c.getMessage).exists(_.contains("mergeSchema"))))
    assert(LakeTable.forPath(spark, table).snapshot.schema.fieldNames.toSeq
      === Seq("id", "v"))
  }
}
