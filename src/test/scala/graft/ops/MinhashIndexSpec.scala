package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

/** Persisted MinHash signature/band index — the incremental FUZZY dedup
  * family member (exact has the bloom gate, semantic has the IVF
  * semindex): corpus band postings persist as a lake table, a wave's
  * gate probes them by IN-list (file-skipped) instead of recomputing
  * corpus signatures, and maintenance is exactly-once from the source's
  * change feed with the same SetTxn + generation-guard machinery as the
  * IVF sync. Ground truth everywhere: exact shingle Jaccard.
  */
class MinhashIndexSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sf).select("doc_id", "text")

  /** Exact batch-vs-corpus + within-batch gate — what the index path
    * must reproduce: survivors have no corpus doc AND no earlier batch
    * doc at Jaccard >= threshold. */
  private def exactSurvivors(batch: org.apache.spark.sql.DataFrame,
      corpus: org.apache.spark.sql.DataFrame, threshold: Double): Set[Long] = {
    import graft.functions.TextFunctions.shingleHashes
    def sh(df: org.apache.spark.sql.DataFrame, id: String, s: String) =
      df.select(col("doc_id").as(id), shingleHashes(col("text"), 3).as(s))
        .where(size(col(s)) > 0)
    def jac(a: String, b: String) =
      size(array_intersect(col(a), col(b))).cast("double") /
        size(array_union(col(a), col(b))).cast("double")
    val b = sh(batch, "bid", "bsh")
    val c = sh(corpus, "cid", "csh")
    val corpusDropped = b.crossJoin(c)
      .where(jac("bsh", "csh") >= threshold).select("bid")
    val batchDropped = b.crossJoin(sh(batch, "bid2", "bsh2"))
      .where(col("bid2") < col("bid") && jac("bsh", "bsh2") >= threshold)
      .select("bid")
    val dropped = corpusDropped.unionByName(batchDropped)
      .as[Long].collect().toSet
    batch.select("doc_id").as[Long].collect().toSet -- dropped
  }

  test("two-wave gate: index-probed survivors == exact ground truth") {
    val root = java.nio.file.Files.createTempDirectory("mh-idx-").toString
    val srcPath = s"$root/src"
    val idxPath = s"$root/idx"
    val corpus = docs.where($"doc_id" % 10 =!= 0)
    val t = graft.lake.LakeTable.create(spark, srcPath, corpus,
      properties = Map(graft.lake.Cdc.PROP -> "true"))
    Dedup.buildMinhashIndexFromTable(spark, idxPath, srcPath,
      "text", "doc_id")

    // WAVE 1: fresh docs + near-dup copies of corpus docs (appended
    // tail: high-but-<1 Jaccard) + a same-wave near-dup pair
    val fresh1 = docs.where($"doc_id" % 10 === 0)
    val nearCorpus = corpus.where($"doc_id" % 20 === 5)
      .select(($"doc_id" + 1000000).as("doc_id"),
        concat($"text", lit(" near duplicate tail marker")).as("text"))
    val intraWave = fresh1.where($"doc_id" % 50 === 0)
      .select(($"doc_id" + 2000000).as("doc_id"),
        concat($"text", lit(" wave twin tail")).as("text"))
    val wave1 = fresh1.unionByName(nearCorpus).unionByName(intraWave)

    val got1 = Dedup.minhashNewAgainstIndex(spark, idxPath, wave1,
      "text", "doc_id", threshold = 0.5)
    val exp1 = exactSurvivors(wave1, t.toDF, 0.5)
    assert(got1.select("doc_id").as[Long].collect().toSet === exp1,
      "wave-1 survivors must match the exact Jaccard gate")
    assert(exp1.size < wave1.count(), "fixture must contain true near-dups")
    assert(nearCorpus.count() > 0 && intraWave.count() > 0)

    // append survivors + SYNC, then WAVE 2 carries near-dups of wave-1
    // survivors — they must now be dropped THROUGH THE INDEX
    t.append(got1)
    val appended = Dedup.syncMinhashIndexFromTable(spark, idxPath, srcPath,
      "text", "doc_id")
    assert(appended > 0, "sync must index the appended survivors")

    val wave2 = got1.limit(20)
      .select(($"doc_id" + 3000000).as("doc_id"),
        concat($"text", lit(" second wave tail")).as("text"))
      .unionByName(docs.where($"doc_id" % 10 === 3).limit(0)) // schema pin
    val got2 = Dedup.minhashNewAgainstIndex(spark, idxPath, wave2,
      "text", "doc_id", threshold = 0.5)
    val exp2 = exactSurvivors(wave2, t.toDF, 0.5)
    assert(got2.select("doc_id").as[Long].collect().toSet === exp2,
      "wave-2 must dedup against wave-1 survivors via the synced index")
    assert(exp2.size < wave2.count(),
      "wave-2 near-dups of indexed wave-1 rows must be dropped")
  }

  test("sync is exactly-once: replay is a no-op, crash recovery from the feed") {
    val root = java.nio.file.Files.createTempDirectory("mh-once-").toString
    val srcPath = s"$root/src"
    val idxPath = s"$root/idx"
    val t = graft.lake.LakeTable.create(spark, srcPath,
      docs.where($"doc_id" % 10 === 1).limit(50),
      properties = Map(graft.lake.Cdc.PROP -> "true"))
    Dedup.buildMinhashIndexFromTable(spark, idxPath, srcPath,
      "text", "doc_id")
    val post = graft.lake.LakeTable.forPath(spark, s"$idxPath/postings")
    val base = post.toDF.count()

    // "crash before sync": two source appends land with NO sync between
    t.append(docs.where($"doc_id" % 10 === 2).limit(10))
    t.append(docs.where($"doc_id" % 10 === 3).limit(10))
    val n = Dedup.syncMinhashIndexFromTable(spark, idxPath, srcPath,
      "text", "doc_id")
    assert(n === 20L * 8, "both un-applied versions picked up, 8 bands/doc")
    assert(post.toDF.count() === base + n)

    // replayed sync: no-op, no duplicate postings
    assert(Dedup.syncMinhashIndexFromTable(spark, idxPath, srcPath,
      "text", "doc_id") === 0L)
    assert(post.toDF.count() === base + n)
    // postings stay unique per (id, key)
    assert(post.toDF.groupBy("id", "key").count()
      .where($"count" > 1).isEmpty)
  }

  test("sync refuses a recreated source generation") {
    val root = java.nio.file.Files.createTempDirectory("mh-gen-").toString
    val srcPath = s"$root/src"
    val idxPath = s"$root/idx"
    val t = graft.lake.LakeTable.create(spark, srcPath,
      docs.limit(20), properties = Map(graft.lake.Cdc.PROP -> "true"))
    Dedup.buildMinhashIndexFromTable(spark, idxPath, srcPath,
      "text", "doc_id")
    t.append(docs.where($"doc_id" % 10 === 4).limit(5))
    assert(Dedup.syncMinhashIndexFromTable(spark, idxPath, srcPath,
      "text", "doc_id") > 0, "same-generation sync works")

    graft.TestFs.rmRf(srcPath)
    // recreated with MORE commits than the applied pointer, so the
    // "nothing new" early return cannot mask the wrong-generation read
    val t2 = graft.lake.LakeTable.create(spark, srcPath,
      docs.limit(3), properties = Map(graft.lake.Cdc.PROP -> "true"))
    (1 to 4).foreach(i => t2.append(docs.limit(i)))
    val e = intercept[IllegalStateException] {
      Dedup.syncMinhashIndexFromTable(spark, idxPath, srcPath,
        "text", "doc_id")
    }
    assert(e.getMessage.contains("deleted and recreated"))

    // the documented recovery: REBUILD resets the index log (fresh
    // txns), re-baselines at the new generation, and the next sync
    // continues exactly-once. An in-place overwrite would have kept the
    // OLD generation's SetTxn (applied=5 here vs the new table's
    // latest=4) and silently skipped every new commit below it.
    Dedup.buildMinhashIndexFromTable(spark, idxPath, srcPath,
      "text", "doc_id")
    val post = graft.lake.LakeTable.forPath(spark, s"$idxPath/postings")
    assert(post.snapshot.txns.isEmpty,
      "rebuild must start a fresh log — a surviving txn poisons the sync")
    assert(post.snapshot.metaData.properties(Dedup.MINHASH_SOURCE_ID_PROP)
      === t2.snapshot.metaData.id)
    t2.append(docs.where($"doc_id" % 10 === 6).limit(5))
    assert(Dedup.syncMinhashIndexFromTable(spark, idxPath, srcPath,
      "text", "doc_id") === 5L * 8,
      "post-rebuild sync must apply the new generation's commits")
  }

  test("within-batch dedup fires even with ZERO corpus band overlap") {
    // regression (ADVICE r8 high): candIds.isEmpty used to early-return
    // the whole batch, skipping the within-batch arm — two near-identical
    // same-wave docs resembling nothing indexed both survived and were
    // then both appended and permanently indexed
    val root = java.nio.file.Files.createTempDirectory("mh-alien-").toString
    val srcPath = s"$root/src"
    val idxPath = s"$root/idx"
    graft.lake.LakeTable.create(spark, srcPath,
      docs.where($"doc_id" % 10 =!= 0).limit(100),
      properties = Map(graft.lake.Cdc.PROP -> "true"))
    Dedup.buildMinhashIndexFromTable(spark, idxPath, srcPath,
      "text", "doc_id")
    // vocabulary disjoint from the corpus fixture: no shared shingle,
    // hence no shared band key, hence zero corpus candidates
    val alien = "qxv zmw plk rrt ubn ffj ooc hye wda gks " * 5
    val wave = Seq(
      (9000001L, alien),
      (9000002L, alien + " qxv zmw"), // near-dup of 9000001 (j ~ 1.0)
      (9000003L, "ngh vvb xxo ppq lld zzr mmu eet ccy aak " * 5))
      .toDF("doc_id", "text")
    val out = Dedup.minhashNewAgainstIndex(spark, idxPath, wave,
      "text", "doc_id", threshold = 0.5)
    val corpus = graft.lake.LakeTable.forPath(spark, srcPath).toDF
    assert(out.select("doc_id").as[Long].collect().toSet ===
      exactSurvivors(wave, corpus, 0.5))
    assert(out.select("doc_id").as[Long].collect().toSet ===
      Set(9000001L, 9000003L),
      "the larger-id same-wave twin must drop despite no corpus overlap")
  }

  test("probe reads the postings by IN-list, not a corpus scan") {
    val root = java.nio.file.Files.createTempDirectory("mh-prune-").toString
    val srcPath = s"$root/src"
    val idxPath = s"$root/idx"
    graft.lake.LakeTable.create(spark, srcPath,
      docs.where($"doc_id" % 10 =!= 0),
      properties = Map(graft.lake.Cdc.PROP -> "true"))
    Dedup.buildMinhashIndexFromTable(spark, idxPath, srcPath,
      "text", "doc_id")
    // the fixture's repeated texts give the sample REAL corpus overlap
    // (same property d9 relies on): the gate must drop exactly those,
    // probing by IN-list (file skipping engages on the key filter)
    val batch = docs.where($"doc_id" % 10 === 0).limit(25)
    val out = Dedup.minhashNewAgainstIndex(spark, idxPath, batch,
      "text", "doc_id", threshold = 0.5)
    val corpus = graft.lake.LakeTable.forPath(spark, srcPath).toDF
    assert(out.select("doc_id").as[Long].collect().toSet ===
      exactSurvivors(batch, corpus, 0.5))
    // config / source-path metadata round-trips
    val props = graft.lake.LakeTable.forPath(spark, s"$idxPath/postings")
      .snapshot.metaData.properties
    assert(props(Dedup.MINHASH_CONF_PROP) === "3,8,4")
    assert(props(Dedup.MINHASH_SOURCE_PATH_PROP) === srcPath)
    assert(props.contains(Dedup.MINHASH_SOURCE_ID_PROP))
  }
}
