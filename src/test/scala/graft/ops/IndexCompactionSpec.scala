package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

/** Compaction for the persisted incremental indexes (VERDICT r8 #1):
  * source deletes/updates leave stale MinHash postings and IVF
  * assignment rows forever — under churn the index grows without bound
  * and every probe pays the stale-candidate tax. The REORG-style purge
  * must drop exactly the dead ids' rows, leave the exactly-once sync
  * pointer and every property untouched, keep gate results
  * bit-identical, and stay invisible to downstream streams.
  */
class IndexCompactionSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.documents(spark, sf).select("doc_id", "text")

  test("minhash: purge drops deleted ids' postings; pointer + gate untouched") {
    val root = java.nio.file.Files.createTempDirectory("mh-compact-").toString
    val srcPath = s"$root/src"
    val idxPath = s"$root/idx"
    val t = graft.lake.LakeTable.create(spark, srcPath,
      docs.where($"doc_id" % 10 =!= 0).limit(200),
      properties = Map(graft.lake.Cdc.PROP -> "true"))
    Dedup.buildMinhashIndexFromTable(spark, idxPath, srcPath,
      "text", "doc_id")
    // one append + sync so the SetTxn pointer EXISTS before the purge
    t.append(docs.where($"doc_id" % 10 === 0).limit(20))
    assert(Dedup.syncMinhashIndexFromTable(spark, idxPath, srcPath,
      "text", "doc_id") > 0)
    val post = graft.lake.LakeTable.forPath(spark, s"$idxPath/postings")

    // 50% source churn
    val deleted = t.delete($"doc_id" % 2 === 0)
    assert(deleted > 0)
    val live = t.toDF.select("doc_id").as[Long].collect().toSet
    val before = post.toDF.select("id", "key").as[(Long, String)]
      .collect().toSet
    val expected = before.filter(p => live.contains(p._1))
    assert(expected.size < before.size, "churn must have left stale postings")

    // gate over a wave mixing near-dups of LIVE docs, near-dups of
    // DELETED docs (must SURVIVE: verification re-fetches source text by
    // id, dead ids fetch nothing), and fresh rows
    val wave = docs.where($"doc_id" % 10 === 5).limit(30)
      .select(($"doc_id" + 5000000).as("doc_id"),
        concat($"text", lit(" tail")).as("text"))
    val gateBefore = Dedup.minhashNewAgainstIndex(spark, idxPath, wave,
      "text", "doc_id", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet

    val txnsBefore = post.snapshot.txns
    val propsBefore = post.snapshot.metaData.properties
    assert(txnsBefore.nonEmpty)

    val dropped = Dedup.compactMinhashIndex(spark, idxPath, "doc_id")
    assert(dropped === (before.size - expected.size).toLong,
      "purge must drop exactly the dead ids' postings")
    assert(post.toDF.select("id", "key").as[(Long, String)]
      .collect().toSet === expected,
      "surviving postings must be bit-identical to the live filter")
    assert(post.snapshot.commits.last._2.operation === "PURGE")
    assert(post.snapshot.txns === txnsBefore, "sync pointer must not move")
    assert(post.snapshot.metaData.properties === propsBefore)
    assert(post.snapshot.files.forall(_.bloomPath.isDefined),
      "rewritten postings files must re-attach their per-file key blooms")

    val gateAfter = Dedup.minhashNewAgainstIndex(spark, idxPath, wave,
      "text", "doc_id", threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(gateAfter === gateBefore,
      "gate results must be bit-identical before/after the purge")

    // a second purge finds nothing and commits nothing
    val v = post.snapshot.version
    assert(Dedup.compactMinhashIndex(spark, idxPath, "doc_id") === 0L)
    assert(post.snapshot.version === v)

    // the sync continues exactly-once across the purge
    t.append(docs.where($"doc_id" % 10 === 7).limit(10))
    assert(Dedup.syncMinhashIndexFromTable(spark, idxPath, srcPath,
      "text", "doc_id") === 10L * 8)
  }

  test("ivf: purge drops deleted ids' assignments; pointer + probes intact") {
    val root = java.nio.file.Files.createTempDirectory("ivf-compact-").toString
    val srcPath = s"$root/src"
    val idxPath = s"$root/idx"
    val dim = 16
    val rnd = new scala.util.Random(23)
    val centers = Array.fill(6)(Array.fill(dim)(rnd.nextGaussian() * 3))
    def member(i: Int): Array[Float] =
      centers(i % 6).map(x => (x + rnd.nextGaussian() * 0.3).toFloat)
    val t = graft.lake.LakeTable.create(spark, srcPath,
      (0 until 120).map(i => (i.toLong, member(i))).toDF("vec_id", "embedding"),
      properties = Map(graft.lake.Cdc.PROP -> "true"))
    Similarity.rebuildIvfIndexFromTable(spark, idxPath, srcPath,
      "embedding", "vec_id", nLists = 6)
    t.append((200 until 220).map(i => (i.toLong, member(i)))
      .toDF("vec_id", "embedding"))
    assert(Similarity.syncIvfIndexFromTable(spark, idxPath, srcPath,
      "embedding", "vec_id") === 20L)
    val asg = graft.lake.LakeTable.forPath(spark, s"$idxPath/assignments")
    val cb = graft.lake.LakeTable.forPath(spark, s"$idxPath/codebook")

    // 50% churn
    assert(t.delete($"vec_id" % 2 === 0) > 0)
    val live = t.toDF.select("vec_id").as[Long].collect().toSet
    val before = asg.toDF.select("id", "list_id").as[(Long, Int)]
      .collect().toSet
    val expected = before.filter(p => live.contains(p._1))
    assert(expected.size < before.size)

    val txnsBefore = asg.snapshot.txns
    val cbPropsBefore = cb.snapshot.metaData.properties
    val cbVersion = cb.snapshot.version
    assert(txnsBefore.nonEmpty)

    // a probe AT a deleted vector sees its dead id pre-compact — the
    // stale-candidate tax this purge exists to stop paying
    val deadId = 0L
    val q = Seq((9000L, member(0))).toDF("q_id", "embedding")
    val hitsBefore = Similarity.ivfTopKIndexed(spark, idxPath, q,
      "embedding", "q_id", k = 5)
      .select("id").as[Long].collect().toSet
    assert(hitsBefore.exists(!live.contains(_)),
      "fixture must demonstrate a dead id surfacing pre-compact")

    val dropped = Similarity.compactIvfIndex(spark, idxPath, srcPath, "vec_id")
    assert(dropped === (before.size - expected.size).toLong)
    assert(asg.toDF.select("id", "list_id").as[(Long, Int)]
      .collect().toSet === expected,
      "surviving assignments must be bit-identical to the live filter")
    assert(asg.snapshot.commits.last._2.operation === "PURGE")
    assert(asg.snapshot.txns === txnsBefore, "sync pointer must not move")
    assert(cb.snapshot.metaData.properties === cbPropsBefore)
    assert(cb.snapshot.version === cbVersion, "the codebook is untouched")

    val hitsAfter = Similarity.ivfTopKIndexed(spark, idxPath, q,
      "embedding", "q_id", k = 5)
      .select("id").as[Long].collect().toSet
    assert(hitsAfter.forall(live.contains),
      "no dead id may surface post-compact")
    assert(hitsBefore.filter(live.contains).subsetOf(hitsAfter),
      "every live pre-compact hit must survive (dead ids only ever " +
        "displaced live candidates downward)")

    // the sync continues exactly-once across the purge
    t.append((300 until 305).map(i => (i.toLong, member(i)))
      .toDF("vec_id", "embedding"))
    assert(Similarity.syncIvfIndexFromTable(spark, idxPath, srcPath,
      "embedding", "vec_id") === 5L)
  }

  test("retrain compacts first when the index records its source") {
    val root = java.nio.file.Files.createTempDirectory("ivf-retrain-").toString
    val srcPath = s"$root/src"
    val idxPath = s"$root/idx"
    val dim = 16
    val rnd = new scala.util.Random(31)
    val centers = Array.fill(4)(Array.fill(dim)(rnd.nextGaussian() * 3))
    def member(i: Int): Array[Float] =
      centers(i % 4).map(x => (x + rnd.nextGaussian() * 0.3).toFloat)
    val t = graft.lake.LakeTable.create(spark, srcPath,
      (0 until 100).map(i => (i.toLong, member(i))).toDF("vec_id", "embedding"),
      properties = Map(graft.lake.Cdc.PROP -> "true"))
    Similarity.rebuildIvfIndexFromTable(spark, idxPath, srcPath,
      "embedding", "vec_id", nLists = 4)
    val asg = graft.lake.LakeTable.forPath(spark, s"$idxPath/assignments")
    val cb = graft.lake.LakeTable.forPath(spark, s"$idxPath/codebook")
    assert(cb.snapshot.metaData.properties(
      Similarity.SOURCE_PATH_PROP) === srcPath)
    assert(cb.snapshot.metaData.properties(
      Similarity.SOURCE_ID_COL_PROP) === "vec_id")

    // 50% churn: with compact-first, the stale mass must NOT count as
    // drift — live rows (50) sit below the trained count (100), so no
    // retrain fires, but the assignments still shrink to the live set
    assert(t.delete($"vec_id" % 2 === 0) === 50L)
    assert(!Similarity.maybeRetrainIvfIndex(spark, idxPath, driftRatio = 0.0),
      "purged stale mass must not register as drift")
    val live1 = t.toDF.select("vec_id").as[Long].collect().toSet
    assert(asg.toDF.select("id").as[Long].collect().toSet === live1,
      "the pre-retrain compaction must have purged the stale assignments")

    // grow past the trained count: retrain fires and trains on the LIVE
    // corpus only (the txn survives the in-place overwrite — existing
    // retrain semantics within one generation)
    t.append((200 until 320).map(i => (i.toLong, member(i)))
      .toDF("vec_id", "embedding"))
    assert(Similarity.syncIvfIndexFromTable(spark, idxPath, srcPath,
      "embedding", "vec_id") === 120L)
    val txns = asg.snapshot.txns
    assert(txns.nonEmpty)
    assert(Similarity.maybeRetrainIvfIndex(spark, idxPath, driftRatio = 0.0))
    val live2 = t.toDF.select("vec_id").as[Long].collect().toSet
    assert(asg.toDF.select("id").as[Long].collect().toSet === live2)
    assert(cb.snapshot.metaData.properties(Similarity.TRAINED_COUNT_PROP)
      .toLong === live2.size.toLong)
    assert(asg.snapshot.txns === txns,
      "retrain keeps the sync txn (in-place overwrite semantics)")
    // legacy escape hatch: compactFirst=false skips the purge
    t.delete($"vec_id" === 1L)
    assert(!Similarity.maybeRetrainIvfIndex(spark, idxPath,
      driftRatio = 1000.0, compactFirst = false))
    assert(asg.toDF.where($"id" === 1L).count() === 1L,
      "compactFirst=false must leave the stale row in place")
  }

  test("first sync back-fills the maintenance triple on a guard-era index") {
    val root = java.nio.file.Files.createTempDirectory("ivf-backfill-").toString
    val srcPath = s"$root/src"
    val idxPath = s"$root/idx"
    val rnd = new scala.util.Random(41)
    def vec(i: Int): Array[Float] = Array.fill(8)(rnd.nextGaussian().toFloat)
    val t = graft.lake.LakeTable.create(spark, srcPath,
      (0 until 40).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding"),
      properties = Map(graft.lake.Cdc.PROP -> "true"))
    // the r7 shape: direct build + generation-only baseline — no
    // recorded path or id column
    val snap = t.snapshot
    Similarity.buildIvfIndex(t.asOf(snap.version).toDF, "embedding",
      "vec_id", idxPath, nLists = 4)
    Similarity.markIvfSynced(spark, idxPath, snap.version,
      Some(snap.metaData.id))
    val cb = graft.lake.LakeTable.forPath(spark, s"$idxPath/codebook")
    assert(!cb.snapshot.metaData.properties.contains(
      Similarity.SOURCE_PATH_PROP))
    intercept[IllegalStateException] {
      Similarity.recordedSourcePath(spark, idxPath)
    }
    // one sync stamps the triple; the short-form compact then resolves
    t.append((100 until 105).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding"))
    assert(Similarity.syncIvfIndexFromTable(spark, idxPath, srcPath,
      "embedding", "vec_id") === 5L)
    assert(Similarity.recordedSourcePath(spark, idxPath) === srcPath)
    assert(cb.snapshot.metaData.properties(
      Similarity.SOURCE_ID_COL_PROP) === "vec_id")
    t.delete($"vec_id" < 10L)
    assert(Similarity.compactIvfIndex(spark, idxPath, "vec_id") === 10L)
  }

  test("retrain survives an orphaned source (purge degrades, loudly logged)") {
    val root = java.nio.file.Files.createTempDirectory("ivf-orphan-").toString
    val srcPath = s"$root/src"
    val idxPath = s"$root/idx"
    val rnd = new scala.util.Random(43)
    def vec(i: Int): Array[Float] = Array.fill(8)(rnd.nextGaussian().toFloat)
    val t = graft.lake.LakeTable.create(spark, srcPath,
      (0 until 30).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding"),
      properties = Map(graft.lake.Cdc.PROP -> "true"))
    Similarity.rebuildIvfIndexFromTable(spark, idxPath, srcPath,
      "embedding", "vec_id", nLists = 4)
    t.append((100 until 140).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding"))
    Similarity.syncIvfIndexFromTable(spark, idxPath, srcPath,
      "embedding", "vec_id")
    // the source table disappears entirely (retention, migration): the
    // pre-retrain purge cannot run, but the retrain itself never needed
    // the source — it must degrade, not crash
    graft.TestFs.rmRf(srcPath)
    assert(Similarity.maybeRetrainIvfIndex(spark, idxPath, driftRatio = 0.0),
      "retrain must still fire from the assignments")
    assert(graft.lake.LakeTable.forPath(spark, s"$idxPath/assignments")
      .toDF.count() === 70L)
  }

  test("compaction refuses a recreated source generation") {
    val root = java.nio.file.Files.createTempDirectory("compact-gen-").toString
    val srcPath = s"$root/src"
    val idxPath = s"$root/idx"
    graft.lake.LakeTable.create(spark, srcPath, docs.limit(30),
      properties = Map(graft.lake.Cdc.PROP -> "true"))
    Dedup.buildMinhashIndexFromTable(spark, idxPath, srcPath,
      "text", "doc_id")
    graft.TestFs.rmRf(srcPath)
    // recreated: EVERY old posting's id is "absent" from the new
    // generation — an unguarded compact would purge the whole index
    graft.lake.LakeTable.create(spark, srcPath, docs.limit(3),
      properties = Map(graft.lake.Cdc.PROP -> "true"))
    val e = intercept[IllegalStateException] {
      Dedup.compactMinhashIndex(spark, idxPath, "doc_id")
    }
    assert(e.getMessage.contains("deleted and recreated"))
  }
}
