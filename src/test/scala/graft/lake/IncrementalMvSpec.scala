package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Incrementally-maintained aggregate views ([[IncrementalMv]]): every
  * refresh must land the view EXACTLY where a full recompute would.
  */
class IncrementalMvSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmpDir(): String = Files.createTempDirectory("mv-test-").toString

  private def sourceTable(path: String): LakeTable =
    LakeTable.create(spark, path,
      Seq((1L, "a", Option(10.0)), (2L, "a", Option(20.0)),
        (3L, "b", Option(30.0)), (4L, "b", None), (5L, "c", Option(50.0)))
        .toDF("id", "g", "v"),
      properties = Map(Cdc.PROP -> "true"))

  /** view state == full recompute of the source's current state */
  private def assertParity(mvPath: String, src: LakeTable,
      keys: Seq[String], sums: Seq[String],
      minMax: Seq[String] = Seq.empty): Unit = {
    val got = LakeTable.forPath(spark, mvPath).toDF
      .orderBy(keys.map(col): _*).collect().toSeq
    val want = IncrementalMv.aggregate(src.toDF, keys, sums, minMax)
      .orderBy(keys.map(col): _*).collect().toSeq
    assert(got === want)
  }

  test("create snapshots the aggregate; refresh applies inserts/deletes/updates") {
    val srcPath = tmpDir()
    val mvPath = tmpDir() + "/mv"
    val t = sourceTable(srcPath)
    IncrementalMv.create(spark, mvPath, srcPath, Seq("g"), Seq("v"))
    assertParity(mvPath, t, Seq("g"), Seq("v"))

    t.append(Seq((6L, "a", Option(6.0)), (7L, "d", Option(7.0)))
      .toDF("id", "g", "v"))                         // new group d
    t.delete($"id" === 3)                            // shrink b
    t.update($"id" === 1, Map("v" -> lit(100.0)))    // change a's sum
    val v = IncrementalMv.refresh(spark, mvPath)
    assert(v === t.version)
    assertParity(mvPath, t, Seq("g"), Seq("v"))
    // refresh with nothing new is a cheap no-op
    assert(IncrementalMv.refresh(spark, mvPath) === v)
    assertParity(mvPath, t, Seq("g"), Seq("v"))
  }

  test("groups vanish at count 0 and sums return to NULL correctly") {
    val srcPath = tmpDir()
    val mvPath = tmpDir() + "/mv"
    val t = sourceTable(srcPath)
    IncrementalMv.create(spark, mvPath, srcPath, Seq("g"), Seq("v"))
    t.delete($"g" === "c")  // whole group disappears
    t.delete($"id" === 3)   // b keeps only the null-v row → sum_v NULL
    IncrementalMv.refresh(spark, mvPath)
    val mv = LakeTable.forPath(spark, mvPath).toDF
    assert(mv.where($"g" === "c").count() === 0)
    val b = mv.where($"g" === "b").collect().head
    assert(b.getAs[Long]("n") === 1)
    assert(b.isNullAt(b.fieldIndex("sum_v")))
    assert(b.getAs[Long]("nn_v") === 0)
    assertParity(mvPath, t, Seq("g"), Seq("v"))
  }

  test("group-key changes move rows between groups; MERGE source works") {
    val srcPath = tmpDir()
    val mvPath = tmpDir() + "/mv"
    val t = sourceTable(srcPath)
    IncrementalMv.create(spark, mvPath, srcPath, Seq("g"), Seq("v"))
    // move id=1 from group a to group b, upsert id=9 into c
    t.mergeClauses(
      Seq((1L, "b", Option(10.0)), (9L, "c", Option(9.0)))
        .toDF("id", "g", "v"),
      col("t.id") === col("s.id"),
      matchedClauses = Seq(MergeClause.Update(None, Map.empty)),
      notMatchedClauses = Seq(MergeClause.Insert(None, Map.empty)),
      notMatchedBySourceClauses = Seq.empty)
    IncrementalMv.refresh(spark, mvPath)
    assertParity(mvPath, t, Seq("g"), Seq("v"))
  }

  test("null group keys aggregate into their own group") {
    val srcPath = tmpDir()
    val mvPath = tmpDir() + "/mv"
    val t = LakeTable.create(spark, srcPath,
      Seq((1L, Option("a"), 1.0), (2L, Option.empty[String], 2.0),
        (3L, None, 3.0)).toDF("id", "g", "v"),
      properties = Map(Cdc.PROP -> "true"))
    IncrementalMv.create(spark, mvPath, srcPath, Seq("g"), Seq("v"))
    t.append(Seq((4L, Option.empty[String], 4.0)).toDF("id", "g", "v"))
    t.delete($"id" === 2)
    IncrementalMv.refresh(spark, mvPath)
    assertParity(mvPath, t, Seq("g"), Seq("v"))
    val nullRow = LakeTable.forPath(spark, mvPath).toDF
      .where($"g".isNull).collect().head
    assert(nullRow.getAs[Long]("n") === 2)
  }

  test("the applied-through version commits atomically with the merge") {
    val srcPath = tmpDir()
    val mvPath = tmpDir() + "/mv"
    val t = sourceTable(srcPath)
    IncrementalMv.create(spark, mvPath, srcPath, Seq("g"), Seq("v"))
    t.append(Seq((8L, "a", Option(8.0))).toDF("id", "g", "v"))
    IncrementalMv.refresh(spark, mvPath)
    val mv = LakeTable.forPath(spark, mvPath)
    // ONE commit carries both the data change and the version pointer
    val last = mv.log.readCommit(mv.version)
    assert(last.exists(_.metaData.exists(
      _.properties(IncrementalMv.SRC_VERSION_PROP) == t.version.toString)))
    assert(last.exists(a => a.add.isDefined || a.remove.isDefined))
  }

  test("continuous refresh: the change-feed stream triggers maintenance") {
    val srcPath = tmpDir()
    val mvPath = tmpDir() + "/mv"
    val t = sourceTable(srcPath)
    IncrementalMv.create(spark, mvPath, srcPath, Seq("g"), Seq("v"))
    val q = IncrementalMv.continuousRefresh(spark, mvPath,
      Files.createTempDirectory("mv-ckpt-").toString)
    try {
      t.append(Seq((6L, "e", Option(6.0))).toDF("id", "g", "v"))
      q.processAllAvailable()
      assertParity(mvPath, t, Seq("g"), Seq("v"))
      t.delete($"g" === "a")
      t.update($"id" === 5, Map("v" -> lit(55.0)))
      q.processAllAvailable()
      assertParity(mvPath, t, Seq("g"), Seq("v"))
    } finally q.stop()
  }

  test("min/max maintenance: inserts fold, extremum deletes recompute") {
    val srcPath = tmpDir()
    val mvPath = tmpDir() + "/mv"
    val t = sourceTable(srcPath)
    IncrementalMv.create(spark, mvPath, srcPath, Seq("g"), Seq("v"), Seq("v"))
    assertParity(mvPath, t, Seq("g"), Seq("v"), Seq("v"))
    // insert-only batch: arithmetic path (least/greatest)
    t.append(Seq((10L, "a", Option(5.0)), (11L, "a", Option(25.0)))
      .toDF("id", "g", "v"))
    IncrementalMv.refresh(spark, mvPath)
    assertParity(mvPath, t, Seq("g"), Seq("v"), Seq("v"))
    val a1 = LakeTable.forPath(spark, mvPath).toDF.where($"g" === "a").collect().head
    assert(a1.getAs[Double]("min_v") === 5.0 && a1.getAs[Double]("max_v") === 25.0)
    // delete the group's current min AND max → group recompute
    t.delete($"id".isin(10L, 11L))
    IncrementalMv.refresh(spark, mvPath)
    assertParity(mvPath, t, Seq("g"), Seq("v"), Seq("v"))
    val a2 = LakeTable.forPath(spark, mvPath).toDF.where($"g" === "a").collect().head
    assert(a2.getAs[Double]("min_v") === 10.0 && a2.getAs[Double]("max_v") === 20.0)
    // another extremum delete (v=10 is now a's min)
    t.delete($"id" === 1)
    IncrementalMv.refresh(spark, mvPath)
    assertParity(mvPath, t, Seq("g"), Seq("v"), Seq("v"))
    // update that moves a value across the extremum
    t.update($"id" === 2, Map("v" -> lit(1000.0)))
    IncrementalMv.refresh(spark, mvPath)
    assertParity(mvPath, t, Seq("g"), Seq("v"), Seq("v"))
  }

  test("min/max: new group whose batch inserts AND deletes recomputes") {
    val srcPath = tmpDir()
    val mvPath = tmpDir() + "/mv"
    val t = sourceTable(srcPath)
    IncrementalMv.create(spark, mvPath, srcPath, Seq("g"), Seq("v"), Seq("v"))
    // group z: three inserts then delete the extremes — in ONE refresh
    t.append(Seq((20L, "z", Option(1.0)), (21L, "z", Option(50.0)),
      (22L, "z", Option(7.0))).toDF("id", "g", "v"))
    t.delete($"id".isin(20L, 21L))
    IncrementalMv.refresh(spark, mvPath)
    assertParity(mvPath, t, Seq("g"), Seq("v"), Seq("v"))
    val z = LakeTable.forPath(spark, mvPath).toDF.where($"g" === "z").collect().head
    assert(z.getAs[Double]("min_v") === 7.0 && z.getAs[Double]("max_v") === 7.0)
    // and a group created+destroyed within one refresh never appears
    t.append(Seq((30L, "q", Option(3.0))).toDF("id", "g", "v"))
    t.delete($"g" === "q")
    IncrementalMv.refresh(spark, mvPath)
    assert(LakeTable.forPath(spark, mvPath).toDF.where($"g" === "q").count() === 0)
    assertParity(mvPath, t, Seq("g"), Seq("v"), Seq("v"))
  }

  test("readView derives SQL-AVG semantics from the stored pieces") {
    val srcPath = tmpDir()
    val mvPath = tmpDir() + "/mv"
    val t = sourceTable(srcPath)
    IncrementalMv.create(spark, mvPath, srcPath, Seq("g"), Seq("v"))
    t.delete($"id" === 3) // b keeps only its null-v row
    IncrementalMv.refresh(spark, mvPath)
    val view = IncrementalMv.readView(spark, mvPath)
    val want = t.toDF.groupBy("g").agg(avg("v").as("avg_v"))
    assert(view.select("g", "avg_v").orderBy("g").collect().toSeq ===
      want.orderBy("g").collect().toSeq)
    assert(view.where($"g" === "b").select("avg_v").collect().head.isNullAt(0))
  }

  test("count-only views and multi-key grouping") {
    val srcPath = tmpDir()
    val mvPath = tmpDir() + "/mv"
    val t = LakeTable.create(spark, srcPath,
      Seq((1L, "a", "x", 1.0), (2L, "a", "y", 2.0), (3L, "b", "x", 3.0))
        .toDF("id", "g1", "g2", "v"),
      properties = Map(Cdc.PROP -> "true"))
    IncrementalMv.create(spark, mvPath, srcPath, Seq("g1", "g2"))
    t.append(Seq((4L, "a", "x", 4.0)).toDF("id", "g1", "g2", "v"))
    t.delete($"id" === 2)
    IncrementalMv.refresh(spark, mvPath)
    assertParity(mvPath, t, Seq("g1", "g2"), Seq.empty)
  }

  test("compareAndSetProperties is a true CAS on table properties") {
    val path = tmpDir()
    val t = LakeTable.create(spark, path,
      Seq((1L, "a")).toDF("id", "v"),
      properties = Map("ptr" -> "5"))
    val vBefore = t.version
    // stale expectation: throws, commits NOTHING
    val e = intercept[StalePreconditionException] {
      t.compareAndSetProperties(Map("ptr" -> "4"), Map("ptr" -> "9"))
    }
    assert(e.getMessage.contains("ptr"))
    assert(t.version === vBefore)
    assert(t.snapshot.metaData.properties("ptr") === "5")
    // matching expectation: swaps
    t.compareAndSetProperties(Map("ptr" -> "5"), Map("ptr" -> "9"))
    assert(t.snapshot.metaData.properties("ptr") === "9")
  }

  test("mergeClauses expectProps aborts a stale merge before staging") {
    val path = tmpDir()
    val t = LakeTable.create(spark, path,
      Seq((1L, "a")).toDF("id", "v"),
      properties = Map("applied" -> "3"))
    val vBefore = t.version
    val src = Seq((1L, "b")).toDF("id", "v")
    intercept[StalePreconditionException] {
      t.mergeClauses(src, col("t.id") === col("s.id"),
        matchedClauses = Seq(MergeClause.Update(None, Map("v" -> col("s.v")))),
        notMatchedClauses = Seq.empty,
        notMatchedBySourceClauses = Seq.empty,
        expectProps = Map("applied" -> "2"))
    }
    assert(t.version === vBefore, "a stale merge must commit nothing")
    assert(t.toDF.where($"v" === "b").count() === 0)
  }

  test("compareAndSetProperties under contention: every increment lands once") {
    // the primitive's whole point: N threads CAS-incrementing a counter
    // property must produce exactly N increments — no lost updates, no
    // double-applies — with losers retrying from the advanced value
    val path = tmpDir()
    val t = LakeTable.create(spark, path,
      Seq((1L, "a")).toDF("id", "v"), properties = Map("ctr" -> "0"))
    val threads = (1 to 8).map { i =>
      new Thread(() => {
        var done = false
        while (!done) {
          val cur = LakeTable.forPath(spark, path)
            .snapshot.metaData.properties("ctr").toInt
          try {
            t.compareAndSetProperties(
              Map("ctr" -> cur.toString),
              Map("ctr" -> (cur + 1).toString))
            done = true
          } catch {
            case _: StalePreconditionException | _: CommitConflictException =>
              () // somebody else won; re-read and retry
          }
        }
      }, s"cas-$i")
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(t.snapshot.metaData.properties("ctr") === "8",
      "exactly 8 increments must land")
  }

  test("refresh stays exact across auto-compaction of the CDC source") {
    // an auto-compacting source interleaves REORG commits with the DML
    // the view consumes; REORGs emit no change data, so the refresh
    // must see exactly the logical changes — any leak of compaction's
    // file movement into the feed would corrupt the aggregates
    val srcPath = tmpDir()
    val mvPath = tmpDir() + "/mv"
    val t = LakeTable.create(spark, srcPath,
      Seq((1L, "a", Option(10.0)), (2L, "b", Option(20.0)))
        .toDF("id", "g", "v"),
      properties = Map(Cdc.PROP -> "true",
        LakeTable.AUTO_COMPACT_PROP -> "true",
        LakeTable.AUTO_COMPACT_MIN_FILES_PROP -> "3"))
    IncrementalMv.create(spark, mvPath, srcPath, Seq("g"), Seq("v"))
    for (round <- 1 to 3) {
      val base = round * 10L
      t.append(Seq((base, "a", Option(base * 1.0))).toDF("id", "g", "v"))
      t.append(Seq((base + 1, "c", Option(2.0))).toDF("id", "g", "v"))
      t.delete($"id" === base + 1)
      t.update($"id" === base, Map("v" -> lit(base * 2.0)))
      IncrementalMv.refresh(spark, mvPath)
      assertParity(mvPath, t, Seq("g"), Seq("v"))
    }
    assert(t.history.where(col("operation") === "COMPACT").count() > 0,
      "the source must actually have auto-compacted (non-vacuous)")
  }

  test("racing un-serialized refreshes apply each commit exactly once") {
    // simulates SEVERAL DRIVER PROCESSES refreshing one view: the JVM
    // lock is bypassed (refreshLocked directly), so serialization rests
    // entirely on the commit-level CAS — the applied-through pointer
    // guard validated on the merge's own read snapshot. Losers must
    // retry and apply ONLY the remainder: any double-apply or backward
    // pointer move breaks parity permanently.
    val srcPath = tmpDir()
    val mvPath = tmpDir() + "/mv"
    val t = sourceTable(srcPath)
    IncrementalMv.create(spark, mvPath, srcPath, Seq("g"), Seq("v"))
    val rnd = new scala.util.Random(7)
    for (round <- 1 to 3) {
      val base = round * 100L
      t.append(Seq((base, "a", Option(base * 1.0)),
        (base + 1, s"r$round", Option(2.0))).toDF("id", "g", "v"))
      t.delete($"id" === base)
      t.update($"id" === base + 1, Map("v" -> lit(9.0)))
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 4).map { i =>
        new Thread(() => {
          try {
            if (rnd.nextBoolean()) Thread.sleep(rnd.nextInt(30).toLong)
            IncrementalMv.refreshLocked(spark, mvPath)
          } catch { case th: Throwable => failures.add(th) }
        }, s"mv-racer-$round-$i")
      }
      threads.foreach(_.start())
      threads.foreach(_.join(120000))
      assert(failures.isEmpty,
        s"round $round: no racer may fail: ${failures.peek()}")
      assertParity(mvPath, t, Seq("g"), Seq("v"))
      assert(LakeTable.forPath(spark, mvPath)
        .snapshot.metaData.properties(IncrementalMv.SRC_VERSION_PROP).toLong
        === t.version, "pointer must land on the source's latest version")
    }
  }

  test("refresh refuses a source deleted and recreated at the same path") {
    // the applied-through pointer counts versions of ONE source
    // generation; a recreate restarts numbering over unrelated data, so
    // a refresh would read tableChanges(lastApplied+1, ...) of the new
    // generation and silently merge wrong deltas. The recorded source
    // id (SRC_ID_PROP) must fail it loudly instead.
    val srcPath = tmpDir()
    val mvPath = tmpDir() + "/mv"
    val t = sourceTable(srcPath)
    t.append(Seq((6L, "a", Option(6.0))).toDF("id", "g", "v"))
    IncrementalMv.create(spark, mvPath, srcPath, Seq("g"), Seq("v"))
    assertParity(mvPath, t, Seq("g"), Seq("v"))

    graft.TestFs.rmRf(srcPath)
    // recreated with the same schema AND more commits than the pointer,
    // so neither the schema nor the early "nothing new" return masks it
    val t2 = sourceTable(srcPath)
    t2.append(Seq((7L, "d", Option(7.0))).toDF("id", "g", "v"))
    t2.append(Seq((8L, "e", Option(8.0))).toDF("id", "g", "v"))

    val mvBefore = LakeTable.forPath(spark, mvPath).toDF.collect().toSet
    val e = intercept[IllegalStateException] {
      IncrementalMv.refresh(spark, mvPath)
    }
    assert(e.getMessage.contains("deleted and recreated"))
    assert(LakeTable.forPath(spark, mvPath).toDF.collect().toSet === mvBefore,
      "the view must be untouched by the refused refresh")
  }

  test("a legacy view adopts the source generation at its next refresh") {
    // views created before the guard existed have no recorded source
    // id; a refresh that advances the pointer must STAMP the observed
    // generation (same CAS commit), so the exposure window closes
    // instead of persisting forever
    val srcPath = tmpDir()
    val mvPath = tmpDir() + "/mv"
    val t = sourceTable(srcPath)
    IncrementalMv.create(spark, mvPath, srcPath, Seq("g"), Seq("v"))

    // simulate the legacy view: strip the recorded id with a raw
    // metadata commit (no public API removes properties — deliberate)
    val mv = LakeTable.forPath(spark, mvPath)
    val snap = mv.snapshot
    val legacyMeta = snap.metaData.copy(
      properties = snap.metaData.properties - IncrementalMv.SRC_ID_PROP)
    mv.log.write(snap.version + 1, Seq(Action.of(legacyMeta),
      Action.of(CommitInfo(System.currentTimeMillis(),
        "SET TBLPROPERTIES", Map.empty))))
    assert(!LakeTable.forPath(spark, mvPath).snapshot.metaData.properties
      .contains(IncrementalMv.SRC_ID_PROP))

    t.append(Seq((6L, "a", Option(6.0))).toDF("id", "g", "v"))
    IncrementalMv.refresh(spark, mvPath)
    assertParity(mvPath, t, Seq("g"), Seq("v"))
    assert(LakeTable.forPath(spark, mvPath).snapshot.metaData.properties
      .get(IncrementalMv.SRC_ID_PROP)
      .contains(t.snapshot.metaData.id), "refresh must adopt the id")

    // and the adopted id guards the very next refresh across a recreate
    graft.TestFs.rmRf(srcPath)
    val t2 = sourceTable(srcPath)
    t2.append(Seq((7L, "d", Option(7.0))).toDF("id", "g", "v"))
    t2.append(Seq((8L, "e", Option(8.0))).toDF("id", "g", "v"))
    val e = intercept[IllegalStateException] {
      IncrementalMv.refresh(spark, mvPath)
    }
    assert(e.getMessage.contains("deleted and recreated"))
  }
}
