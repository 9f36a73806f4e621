package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.lake.LakeTable
import graft.tables.Tables

class CorpusPipelineSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("curation over the harness documents: monotone stages, tables written") {
    val out = Files.createTempDirectory("corpus-").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val res = CorpusPipeline.curate(spark, docs, out,
      minQuality = 0.2, minTokens = 3, nearDupThreshold = 0.5)

    assert(res.input === 500)
    assert(res.afterQuality <= res.input)
    assert(res.afterExact <= res.afterQuality)
    assert(res.afterNear <= res.afterExact)
    assert(res.afterNear > 0)

    val curated = LakeTable.forPath(spark, s"$out/curated").toDF
    assert(curated.count() === res.afterNear)
    // curated corpus has no exact dups left
    assert(curated.select("fp").distinct().count() === curated.count())
    // stats view covers every predicted language present
    val stats = CorpusPipeline.langStats(spark, out)
    val langs = curated.select("lang_pred").distinct().count()
    assert(stats.count() === langs)
    assert(stats.agg(sum("n_docs")).head().getLong(0) === res.afterNear)
  }

  test("incremental curation: bloom-gated batch append + stats refresh") {
    val out = Files.createTempDirectory("corpus-inc-").toString
    val all = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "text")
    val base = all.where($"doc_id" % 2 === 0)
    CorpusPipeline.curate(spark, base, out,
      minQuality = 0.2, minTokens = 3, nearDupThreshold = 0.99)
    val curatedBefore = LakeTable.forPath(spark, s"$out/curated").toDF
      .count()

    // batch = genuinely new docs + exact copies of corpus docs (dropped
    // by the bloom gate) + an in-batch duplicate pair
    val newOnes = all.where($"doc_id" % 2 === 1)
    val corpusCopies = base.limit(20)
      .select(($"doc_id" + 500000).as("doc_id"), $"lang", $"text")
    val batch = newOnes.unionByName(corpusCopies)
      .unionByName(newOnes.limit(1)
        .select(($"doc_id" + 900000).as("doc_id"), $"lang", $"text"))
    val res = CorpusPipeline.curateIncremental(spark, batch, out,
      minQuality = 0.2, minTokens = 3, expectedCorpusItems = 1000L)

    val curated = LakeTable.forPath(spark, s"$out/curated").toDF
    assert(res.appended > 0 && res.appended < res.afterQuality,
      s"both outcomes must occur: $res")
    assert(curated.count() === curatedBefore + res.appended)
    // no fingerprint appears twice after the incremental pass
    assert(curated.select("fp").distinct().count() === curated.count())
    // corpus copies and the in-batch dup were rejected
    assert(curated.where($"doc_id" >= 500000L).count() === 0)

    // the incrementally-refreshed stats equal a from-scratch recompute
    val stats = CorpusPipeline.langStats(spark, out)
      .orderBy("lang_pred").collect().toSeq
    val recomputed = curated.groupBy($"lang_pred")
      .agg(count(lit(1)).as("n_docs"),
        round(sum($"quality") / count($"quality"), 4).as("avg_quality"),
        sum($"n_tokens").cast("long").as("total_tokens"))
      .orderBy("lang_pred").collect().toSeq
    assert(stats === recomputed)
  }

  test("exact duplicates are actually removed") {
    val out = Files.createTempDirectory("corpus-dup-").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    // inject exact duplicates with higher ids
    val dups = docs.withColumn("doc_id", col("doc_id") + 100000L)
    val withDups = docs.unionByName(dups)
    val res = CorpusPipeline.curate(spark, withDups, out,
      minQuality = 0.0, minTokens = 0, nearDupThreshold = 0.99)
    assert(res.input === 100)
    assert(res.afterExact === res.afterQuality / 2) // every doc had one copy
    val curated = LakeTable.forPath(spark, s"$out/curated").toDF
    // the kept ids are the originals (smallest per fingerprint)
    assert(curated.where(col("doc_id") >= 100000L).count() === 0)
  }

  test("transitive near-dup mode collapses chains to one representative") {
    val out = Files.createTempDirectory("corpus-chain-").toString
    import spark.implicits._
    // a 3-doc near-dup chain (each differs a little more from the head)
    // + distinct filler docs
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again while the observers take careful notes about it"
    val docs = (Seq(
      (1L, base),
      (2L, base + " with a small appended tail"),
      (3L, base + " with a small appended tail and a bit more drift")) ++
      (10L to 29L).map(i => (i,
        s"totally different document $i discussing topic$i " +
          s"alpha$i beta$i gamma$i delta$i epsilon$i zeta$i")))
      .toDF("doc_id", "text")
    val res = CorpusPipeline.curate(spark, docs, out,
      minQuality = 0.0, minTokens = 0, nearDupThreshold = 0.5,
      transitiveNearDups = true)
    val kept = LakeTable.forPath(spark, s"$out/curated").toDF
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L))
    assert(!kept.contains(2L) && !kept.contains(3L),
      s"chain should collapse to doc 1, kept: ${kept.filter(_ < 10)}")
    assert((10L to 29L).forall(kept.contains))
    assert(res.afterNear === res.afterExact - 2)
  }

  test("continuous curation: landing stream drives the incremental path") {
    val root = Files.createTempDirectory("corpus-stream-").toString
    val all = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "text")
    val base = all.where($"doc_id" % 2 === 0)
    CorpusPipeline.curate(spark, base, root,
      minQuality = 0.2, minTokens = 3, nearDupThreshold = 0.99)
    val before = LakeTable.forPath(spark, s"$root/curated").toDF.count()

    val wave1 = all.where($"doc_id" % 4 === 1)
    val wave2 = all.where($"doc_id" % 4 === 3)
    val landing = LakeTable.create(spark, s"$root/landing", wave1)
    def runOnce(): Unit = {
      val q = CorpusPipeline.curateContinuously(spark, s"$root/landing",
        root, s"$root/ckpt", minQuality = 0.2, minTokens = 3,
        expectedCorpusItems = 1000L)
      q.awaitTermination() // AvailableNow: drains the backlog, stops
    }
    runOnce()
    val afterW1 = LakeTable.forPath(spark, s"$root/curated").toDF.count()
    assert(afterW1 > before, s"wave 1 must append: $before -> $afterW1")

    // wave 2 adds new docs PLUS replays of wave-1 content (other ids):
    // the checkpoint feeds them through, the corpus gate drops them
    landing.append(wave2.unionByName(
      wave1.limit(5).select(($"doc_id" + 700000).as("doc_id"), $"lang", $"text")))
    runOnce()
    val curated = LakeTable.forPath(spark, s"$root/curated").toDF
    val afterW2 = curated.count()
    assert(afterW2 > afterW1)
    assert(curated.where($"doc_id" >= 700000L).count() === 0,
      "replayed content must not re-enter the corpus")
    assert(curated.select("fp").distinct().count() === afterW2)

    // restart with NO new landing commits: nothing to process, no drift
    runOnce()
    assert(LakeTable.forPath(spark, s"$root/curated").toDF.count() === afterW2)

    // the stream-maintained stats equal a from-scratch recompute
    val stats = CorpusPipeline.langStats(spark, root)
      .orderBy("lang_pred").collect().toSeq
    val recomputed = curated.groupBy($"lang_pred")
      .agg(count(lit(1)).as("n_docs"),
        round(sum($"quality") / count($"quality"), 4).as("avg_quality"),
        sum($"n_tokens").cast("long").as("total_tokens"))
      .orderBy("lang_pred").collect().toSeq
    assert(stats === recomputed)
  }

  test("continuous curation with NEAR-dup gates across waves (VERDICT r3 #6)") {
    val root = Files.createTempDirectory("corpus-neardup-").toString
    // paragraph-structured corpus with orthogonal embeddings; the
    // semantic gate's cluster space is built here and maintained per wave
    val corpus = Seq(
      (1L, "alpha one\nBOILER PLATE NOTICE\nbeta two", Array(1f, 0f, 0f, 0f)),
      (2L, "gamma three\ndelta four", Array(0f, 1f, 0f, 0f)))
      .toDF("doc_id", "text", "embedding")
    CorpusPipeline.curate(spark, corpus, root, minQuality = 0.0,
      minTokens = 0, nearDupThreshold = 0.99,
      vecCol = Some("embedding"), semNLists = 2)

    val landing = LakeTable.create(spark, s"$root/landing", Seq(
      // (a) corpus boilerplate spliced into an otherwise-new doc: the
      // whole-doc fingerprint is new, so only the PARAGRAPH gate catches it
      (10L, "epsilon five\nBOILER PLATE NOTICE\nzeta six", Array(0f, 0f, 1f, 0f)),
      // (b) text entirely new but embedding ~doc 1 (cos ≈ 0.99): only the
      // SEMANTIC gate catches it
      (11L, "totally fresh words here\nnothing shared at all",
        Array(0.99f, 0.14f, 0f, 0f)),
      // (c) genuinely new in both senses
      (12L, "eta seven\ntheta eight", Array(0f, 0f, 0f, 1f)))
      .toDF("doc_id", "text", "embedding"))

    def runOnce(): Unit = {
      val q = CorpusPipeline.curateContinuously(spark, s"$root/landing",
        root, s"$root/ckpt", minQuality = 0.0, minTokens = 0,
        expectedCorpusItems = 100L,
        paragraphScrub = true, vecCol = Some("embedding"))
      q.awaitTermination()
    }
    runOnce()
    val t1 = LakeTable.forPath(spark, s"$root/curated").toDF
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(t1(10L) === "epsilon five\nzeta six",
      "corpus boilerplate must scrub out of the appended doc")
    assert(!t1.contains(11L), "semantic near-dup of the corpus must drop")
    assert(t1(12L) === "eta seven\ntheta eight")

    // wave 2 dedups against WAVE-1 SURVIVORS, not just the initial
    // corpus: a paragraph first seen in wave 1 scrubs; a doc semantically
    // near a wave-1 appendee drops (the index grew between waves)
    landing.append(Seq(
      (20L, "epsilon five\niota nine", Array(1f, 1f, 1f, 1f)),
      (21L, "completely novel paragraph content", Array(0.1f, 0f, 0f, 0.99f)))
      .toDF("doc_id", "text", "embedding"))
    runOnce()
    val t2 = LakeTable.forPath(spark, s"$root/curated").toDF
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(t2(20L) === "iota nine",
      "a paragraph appended in wave 1 must scrub from wave 2")
    assert(!t2.contains(21L),
      "a semantic near-dup of a wave-1 appendee must drop in wave 2")
    // earlier state untouched
    assert(t2(10L) === "epsilon five\nzeta six" && t2(12L) === t1(12L))

    // the drift gate retrained after wave 1 (2 appended on a 2-doc
    // training set exceeds the 0.5 ratio → trained-count becomes 4) and
    // correctly did NOT retrain after wave 2 (1 appended ≤ 0.5 × 4)
    val trained = LakeTable.forPath(spark, s"$root/semindex/codebook")
      .snapshot.metaData.properties(graft.ops.Similarity.TRAINED_COUNT_PROP)
    assert(trained === "4", s"drift-gated retrain cadence wrong: $trained")
  }

  test("semantic index recovers rows a crash kept out of it (change feed)") {
    val root = Files.createTempDirectory("corpus-recover-").toString
    val corpus = Seq(
      (1L, "alpha one beta two", Array(1f, 0f, 0f, 0f)),
      (2L, "gamma three delta four", Array(0f, 1f, 0f, 0f)))
      .toDF("doc_id", "text", "embedding")
    CorpusPipeline.curate(spark, corpus, root, minQuality = 0.0,
      minTokens = 0, nearDupThreshold = 0.99,
      vecCol = Some("embedding"), semNLists = 2)

    // crash simulation: doc 30 reached the curated table but the index
    // append never ran (the old in-memory appendToIvfIndex shape lost
    // these vectors FOREVER — replays are swallowed by the content gates)
    val curated = LakeTable.forPath(spark, s"$root/curated")
    val lost = CorpusPipeline.annotate(
      Seq((30L, "epsilon five zeta six", Array(0f, 0f, 1f, 0f)))
        .toDF("doc_id", "text", "embedding"))
    curated.append(lost.select(
      curated.snapshot.schema.fieldNames.map(col).toSeq: _*))

    // the very next wave must drop a semantic near-dup of doc 30: the
    // start-of-wave catch-up sync folds the deferred vector in BEFORE
    // the gate runs
    val landing = LakeTable.create(spark, s"$root/landing", Seq(
      (31L, "wholly different words entirely", Array(0.1f, 0f, 0.99f, 0f)))
      .toDF("doc_id", "text", "embedding"))
    val q = CorpusPipeline.curateContinuously(spark, s"$root/landing",
      root, s"$root/ckpt", minQuality = 0.0, minTokens = 0,
      expectedCorpusItems = 100L, vecCol = Some("embedding"))
    q.awaitTermination()

    val ids = LakeTable.forPath(spark, s"$root/curated").toDF
      .select($"doc_id").as[Long].collect().toSet
    assert(ids.contains(30L))
    assert(!ids.contains(31L),
      "near-dup of the crash-deferred doc must drop in the NEXT wave")
    // and the vector itself is now indexed
    val indexed = LakeTable.forPath(spark, s"$root/semindex/assignments")
      .toDF.select($"id").as[Long].collect().toSet
    assert(indexed.contains(30L))
  }

  test("post-scrub fingerprint collisions dedup on the RECOMPUTED fp") {
    // fingerprint() collapses the paragraph separator, so a scrubbed doc
    // can fp-collide with a doc whose PARAGRAPH sets are disjoint — the
    // paragraph gate can't see it, only a doc-level dedup on the
    // post-scrub fingerprint can (ADVICE r4 #1)
    val root = Files.createTempDirectory("corpus-postscrub-").toString
    val corpus = Seq((1L, "p\nq"), (2L, "BOILER"))
      .toDF("doc_id", "text")
    CorpusPipeline.curate(spark, corpus, root, minQuality = 0.0,
      minTokens = 0, nearDupThreshold = 0.99)

    val batch = Seq(
      // A scrubs BOILER → "x y"; B is untouched "x\ny" — paragraphs
      // ("x y") vs ("x","y") are disjoint, but the normalized
      // fingerprints collide post-scrub → keep-one (min doc_id = A)
      (30L, "x y\nBOILER"),
      (31L, "x\ny"),
      // C scrubs BOILER → "p q", whose fingerprint equals corpus doc 1's
      // ("p\nq" normalizes to "p q") though no paragraph is shared —
      // the cross-corpus bloom gate must run on the post-scrub fp
      (32L, "p q\nBOILER"))
      .toDF("doc_id", "text")
    CorpusPipeline.curateIncremental(spark, batch, root, minQuality = 0.0,
      minTokens = 0, expectedCorpusItems = 100L, paragraphScrub = true)

    val texts = LakeTable.forPath(spark, s"$root/curated").toDF
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(texts(30L) === "x y")
    assert(!texts.contains(31L),
      "batch doc fp-colliding with a scrubbed batch neighbor must drop")
    assert(!texts.contains(32L),
      "scrubbed doc fp-colliding with a corpus doc must drop")
    // the curated invariant the leak would have broken
    val curated = LakeTable.forPath(spark, s"$root/curated").toDF
    assert(curated.select("fp").distinct().count() === curated.count())
  }

  test("empty initial corpus defers the semantic index to the first wave") {
    val root = Files.createTempDirectory("corpus-empty-").toString
    // every doc fails the token gate → curated is written EMPTY; the
    // index build must be skipped (training would throw after the
    // tables were already written — ADVICE r4 #2), not crash
    val junk = Seq((1L, "tiny", Array(1f, 0f, 0f, 0f)))
      .toDF("doc_id", "text", "embedding")
    val res = CorpusPipeline.curate(spark, junk, root, minQuality = 0.0,
      minTokens = 100, nearDupThreshold = 0.99,
      vecCol = Some("embedding"), semNLists = 2)
    assert(res.afterNear === 0L)
    assert(!LakeTable.isLakeTable(s"$root/semindex/codebook"))

    // wave 1 (non-empty): appends, then builds the deferred index from
    // the curated table and baselines the change feed
    CorpusPipeline.curateIncremental(spark,
      Seq((10L, "alpha one beta two", Array(1f, 0f, 0f, 0f)),
        (11L, "gamma three delta four", Array(0f, 1f, 0f, 0f)))
        .toDF("doc_id", "text", "embedding"),
      root, minQuality = 0.0, minTokens = 0, expectedCorpusItems = 100L,
      vecCol = Some("embedding"), semNLists = 2)
    assert(LakeTable.isLakeTable(s"$root/semindex/codebook"))
    val indexed = LakeTable.forPath(spark, s"$root/semindex/assignments")
      .toDF.select($"id").as[Long].collect().toSet
    assert(indexed === Set(10L, 11L))

    // wave 2 gates semantically against the deferred-built index
    CorpusPipeline.curateIncremental(spark,
      Seq((20L, "totally fresh words here", Array(0.99f, 0.14f, 0f, 0f)),
        (21L, "eta seven theta eight", Array(0f, 0f, 0f, 1f)))
        .toDF("doc_id", "text", "embedding"),
      root, minQuality = 0.0, minTokens = 0, expectedCorpusItems = 100L,
      vecCol = Some("embedding"), semNLists = 2)
    val ids = LakeTable.forPath(spark, s"$root/curated").toDF
      .select($"doc_id").as[Long].collect().toSet
    assert(!ids.contains(20L),
      "semantic near-dup of a wave-1 doc must drop once the index exists")
    assert(ids === Set(10L, 11L, 21L))
  }

  test("the deferral wave self-gates within-batch semantic near-dups") {
    val root = Files.createTempDirectory("corpus-selfgate-").toString
    // empty initial corpus → index deferred (as above)
    CorpusPipeline.curate(spark,
      Seq((1L, "tiny", Array(1f, 0f, 0f, 0f))).toDF("doc_id", "text", "embedding"),
      root, minQuality = 0.0, minTokens = 100, nearDupThreshold = 0.99,
      vecCol = Some("embedding"), semNLists = 2)
    assert(!LakeTable.isLakeTable(s"$root/semindex/codebook"))

    // wave 1 carries a SEMANTIC near-dup pair with different text (the
    // exact/paragraph gates are blind to it): docs 10/11 at cosine ≈
    // 0.99. Without the within-batch self-gate both would append and
    // the deferred build would bake the pair into the index permanently
    // — no retrain or sync ever removes indexed rows.
    CorpusPipeline.curateIncremental(spark,
      Seq((10L, "alpha one beta two", Array(1f, 0f, 0f, 0f)),
        (11L, "gamma three delta four", Array(0.99f, 0.14f, 0f, 0f)),
        (12L, "eta seven theta eight", Array(0f, 1f, 0f, 0f)))
        .toDF("doc_id", "text", "embedding"),
      root, minQuality = 0.0, minTokens = 0, expectedCorpusItems = 100L,
      vecCol = Some("embedding"), semNLists = 2)
    val ids = LakeTable.forPath(spark, s"$root/curated").toDF
      .select($"doc_id").as[Long].collect().toSet
    assert(ids === Set(10L, 12L),
      "the deferral wave must keep one representative per semantic pair")
    val indexed = LakeTable.forPath(spark, s"$root/semindex/assignments")
      .toDF.select($"id").as[Long].collect().toSet
    assert(indexed === Set(10L, 12L),
      "the deferred-built index must not contain the dropped near-dup")
  }

  test("missing index over a non-empty corpus builds BEFORE the gate") {
    val root = Files.createTempDirectory("corpus-noidx-").toString
    // the initial curate ran WITHOUT vecCol: a non-empty corpus exists
    // but no semindex does. The first vecCol wave must build the index
    // from the corpus and gate its own batch against it — not silently
    // skip the gate, append unguarded, and bake the near-dups in.
    CorpusPipeline.curate(spark,
      Seq((1L, "alpha one beta two", Array(1f, 0f, 0f, 0f)),
        (2L, "gamma three delta four", Array(0f, 1f, 0f, 0f)))
        .toDF("doc_id", "text", "embedding"),
      root, minQuality = 0.0, minTokens = 0, nearDupThreshold = 0.99)
    assert(!LakeTable.isLakeTable(s"$root/semindex/codebook"))

    CorpusPipeline.curateIncremental(spark,
      Seq((10L, "wholly new phrasing here", Array(0.99f, 0.14f, 0f, 0f)),
        (11L, "eta seven theta eight", Array(0f, 0f, 0f, 1f)))
        .toDF("doc_id", "text", "embedding"),
      root, minQuality = 0.0, minTokens = 0, expectedCorpusItems = 100L,
      vecCol = Some("embedding"), semNLists = 2)
    assert(LakeTable.isLakeTable(s"$root/semindex/codebook"))
    val ids = LakeTable.forPath(spark, s"$root/curated").toDF
      .select($"doc_id").as[Long].collect().toSet
    assert(!ids.contains(10L),
      "the just-built index must gate the SAME wave's semantic near-dup")
    assert(ids === Set(1L, 2L, 11L))
    // and the surviving appendee reached the index via the normal sync
    val indexed = LakeTable.forPath(spark, s"$root/semindex/assignments")
      .toDF.select($"id").as[Long].collect().toSet
    assert(indexed === Set(1L, 2L, 11L))
  }

  test("fuzzy gate across waves: corpus, same-wave, and wave-1-survivor near-dups drop") {
    val root = Files.createTempDirectory("corpus-fuzzy-").toString
    // distinct word-soup docs; the near-dups below append a short tail
    // (shingle Jaccard ~0.8 >= the 0.5 gate) without fingerprint-matching
    val corpus = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "red orange yellow green blue indigo violet crimson amber teal"))
      .toDF("doc_id", "text")
    CorpusPipeline.curate(spark, corpus, root, minQuality = 0.0,
      minTokens = 0, nearDupThreshold = 0.99, fuzzyIndex = true)
    assert(LakeTable.isLakeTable(s"$root/mhindex/postings"))

    val r1 = CorpusPipeline.curateIncremental(spark, Seq(
      // near-dup of corpus doc 1: ONLY the fuzzy gate catches it (the
      // fingerprint is new, no embeddings in play)
      (10L, "one two three four five six seven eight nine ten extra tail"),
      // genuinely new
      (11L, "wolf bear lynx otter marten badger weasel stoat ferret mink"),
      // same-wave near-dup of 11: the larger id drops
      (12L, "wolf bear lynx otter marten badger weasel stoat ferret mink bonus words"))
      .toDF("doc_id", "text"), root,
      minQuality = 0.0, minTokens = 0, fuzzyDedup = true)
    assert(r1.appended === 1, s"wave 1 must append only doc 11: $r1")
    val t1 = LakeTable.forPath(spark, s"$root/curated").toDF
      .select($"doc_id").as[Long].collect().toSet
    assert(t1 === Set(1L, 2L, 11L))

    // wave 2 gates against WAVE-1 SURVIVORS through the synced postings:
    // a near-dup of doc 11 drops even though 11 was never in curate()'s
    // initial build
    val r2 = CorpusPipeline.curateIncremental(spark, Seq(
      (20L, "wolf bear lynx otter marten badger weasel stoat ferret mink other suffix"),
      (21L, "completely novel content words never seen anywhere else today"))
      .toDF("doc_id", "text"), root,
      minQuality = 0.0, minTokens = 0, fuzzyDedup = true)
    assert(r2.appended === 1, s"wave 2 must append only doc 21: $r2")
    val t2 = LakeTable.forPath(spark, s"$root/curated").toDF
      .select($"doc_id").as[Long].collect().toSet
    assert(t2 === Set(1L, 2L, 11L, 21L))

    // exactly-once maintenance: every appended doc is in the postings
    // exactly once per band across the build + two syncs
    val posts = LakeTable.forPath(spark, s"$root/mhindex/postings").toDF
    assert(posts.select($"id").distinct().as[Long].collect().toSet ===
      Set(1L, 2L, 11L, 21L))
    assert(posts.groupBy($"id", $"key").count().where($"count" > 1).isEmpty)
  }

  test("compactIndexes purges both gate indexes after corpus churn") {
    val root = Files.createTempDirectory("corpus-compact-").toString
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(8)(r.nextGaussian().toFloat)
    }
    val corpus = Seq(
      (1L, "one two three four five six seven eight nine ten", vec(1)),
      (2L, "red orange yellow green blue indigo violet crimson amber teal", vec(2)),
      (3L, "wolf bear lynx otter marten badger weasel stoat ferret mink", vec(3)),
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa", vec(4)))
      .toDF("doc_id", "text", "embedding")
    CorpusPipeline.curate(spark, corpus, root, minQuality = 0.0,
      minTokens = 0, nearDupThreshold = 0.99, fuzzyIndex = true,
      vecCol = Some("embedding"), semNLists = 2)
    val curated = LakeTable.forPath(spark, s"$root/curated")
    val posts = LakeTable.forPath(spark, s"$root/mhindex/postings")
    val asg = LakeTable.forPath(spark, s"$root/semindex/assignments")
    val postsBefore = posts.toDF.count()
    val asgBefore = asg.toDF.count()

    // external churn: a takedown delete the pipeline never issued
    assert(curated.delete($"doc_id".isin(2L, 4L)) === 2L)
    val (fz, sm) = CorpusPipeline.compactIndexes(spark, root)
    assert(fz > 0 && sm > 0, s"both indexes must shrink: fuzzy=$fz sem=$sm")
    assert(posts.toDF.count() === postsBefore - fz)
    assert(asg.toDF.count() === asgBefore - sm)
    assert(posts.toDF.select($"id").as[Long].collect().toSet === Set(1L, 3L))
    assert(asg.toDF.select($"id").as[Long].collect().toSet === Set(1L, 3L))

    // idempotent
    assert(CorpusPipeline.compactIndexes(spark, root) === ((0L, 0L)))

    // the next wave still gates correctly: a near-dup of a SURVIVING doc
    // drops, a near-dup of a DELETED doc passes (its postings are gone,
    // and the text is genuinely absent from the corpus)
    val r = CorpusPipeline.curateIncremental(spark, Seq(
      (10L, "wolf bear lynx otter marten badger weasel stoat ferret mink tail", vec(10)),
      (11L, "red orange yellow green blue indigo violet crimson amber teal back", vec(11)))
      .toDF("doc_id", "text", "embedding"), root,
      minQuality = 0.0, minTokens = 0, fuzzyDedup = true,
      vecCol = Some("embedding"))
    assert(r.appended === 1, s"only the deleted doc's twin may re-enter: $r")
    assert(curated.toDF.select($"doc_id").as[Long].collect().toSet ===
      Set(1L, 3L, 11L))
  }

  test("maybeCompactIndexes fires only past the stats-estimated threshold") {
    val root = Files.createTempDirectory("corpus-autocompact-").toString
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(8)(r.nextGaussian().toFloat)
    }
    val words = Seq("one", "two", "red", "blue", "wolf", "bear", "alpha",
      "beta", "iron", "gold", "oak", "elm", "north", "south", "rain",
      "snow", "fast", "slow", "high", "low")
    val corpus = (0 until 20).map { i =>
      (i.toLong, (0 until 10).map(j => words((i * 7 + j * 3) % 20) + i)
        .mkString(" "), vec(i))
    }.toDF("doc_id", "text", "embedding")
    CorpusPipeline.curate(spark, corpus, root, minQuality = 0.0,
      minTokens = 0, nearDupThreshold = 0.99, fuzzyIndex = true,
      vecCol = Some("embedding"), semNLists = 2)
    val posts = LakeTable.forPath(spark, s"$root/mhindex/postings")
    val curated = LakeTable.forPath(spark, s"$root/curated")

    // 5% churn (one DV'd row): far below the 30% threshold — the
    // trigger must not even pay the purge's census pass (no new commit)
    curated.delete($"doc_id" === 0L)
    val pv = posts.snapshot.version
    assert(CorpusPipeline.maybeCompactIndexes(spark, root) === ((0L, 0L)))
    assert(posts.snapshot.version === pv,
      "below threshold the postings log must not move at all")

    // 60% churn (file rewrite → stats shrink): both indexes fire
    curated.delete($"doc_id" % 5 =!= 1L)
    val (fz, sm) = CorpusPipeline.maybeCompactIndexes(spark, root)
    assert(fz > 0 && sm > 0, s"heavy churn must trigger both: $fz/$sm")
    val live = curated.toDF.select($"doc_id").as[Long].collect().toSet
    assert(posts.toDF.select($"id").as[Long].collect().toSet === live)
    assert(LakeTable.forPath(spark, s"$root/semindex/assignments")
      .toDF.select($"id").as[Long].collect().toSet === live)
  }

  test("maybeCompactIndexes counts DV-masked corpus rows as dead") {
    val root = Files.createTempDirectory("corpus-dvchurn-").toString
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(8)(r.nextGaussian().toFloat)
    }
    val words = Seq("one", "two", "red", "blue", "wolf", "bear", "alpha",
      "beta", "iron", "gold", "oak", "elm", "north", "south", "rain",
      "snow", "fast", "slow", "high", "low")
    val corpus = (0 until 20).map { i =>
      (i.toLong, (0 until 10).map(j => words((i * 7 + j * 3) % 20) + i)
        .mkString(" "), vec(i))
    }.toDF("doc_id", "text", "embedding")
    CorpusPipeline.curate(spark, corpus, root, minQuality = 0.0,
      minTokens = 0, nearDupThreshold = 0.99, fuzzyIndex = true,
      vecCol = Some("embedding"), semNLists = 2)
    val curated = LakeTable.forPath(spark, s"$root/curated")
    val posts = LakeTable.forPath(spark, s"$root/mhindex/postings")
    // pack the corpus into one multi-row file so point deletes land as
    // DVs (1-row files would delete as whole-file metadata removes)
    curated.compact()
    assert(curated.snapshot.files.size === 1)

    // churn PURELY by point deletes, each wave under the per-file DV
    // rewrite threshold: footers still count every row, only the DV
    // cardinalities know 13/20 are dead. Without subtracting them the
    // stats-only estimate reads 0% stale and the trigger never fires.
    curated.delete($"doc_id" < 8L)  // 8 of 20 live → DV
    curated.delete($"doc_id" >= 15L) // 5 of 12 live → DV
    assert(curated.snapshot.files.exists(_.dvCardinality > 0),
      "the churn must be deletion-vector-masked, not file rewrites")
    assert(curated.snapshot.files.flatMap(_.stats.map(_.numRecords)).sum
      === 20L, "footer rows must still count the masked rows")

    val (fz, sm) = CorpusPipeline.maybeCompactIndexes(spark, root)
    assert(fz > 0 && sm > 0,
      s"DV-only churn past the threshold must trigger both purges: $fz/$sm")
    val live = curated.toDF.select($"doc_id").as[Long].collect().toSet
    assert(posts.toDF.select($"id").as[Long].collect().toSet === live)
  }

  test("maybeCompactIndexes skips (not fails) on a racing sync, next call purges") {
    val root = Files.createTempDirectory("corpus-race-").toString
    val words = Seq("one", "two", "red", "blue", "wolf", "bear", "alpha",
      "beta", "iron", "gold", "oak", "elm", "north", "south", "rain",
      "snow", "fast", "slow", "high", "low")
    def doc(i: Int) = (i.toLong,
      (0 until 10).map(j => words((i * 7 + j * 3) % 20) + i).mkString(" "))
    CorpusPipeline.curate(spark,
      (0 until 20).map(doc).toDF("doc_id", "text"), root,
      minQuality = 0.0, minTokens = 0, nearDupThreshold = 0.99,
      fuzzyIndex = true)
    val curated = LakeTable.forPath(spark, s"$root/curated")
    val posts = LakeTable.forPath(spark, s"$root/mhindex/postings")
    curated.delete($"doc_id" % 5 =!= 1L) // 80% churn → trigger fires

    // land a REAL racing sync inside the purge's pin-to-commit window:
    // the unattended trigger must swallow the conflict (the caller's
    // wave completes), not propagate it
    var raced = false
    graft.ops.Dedup.compactRaceHook = () => if (!raced) {
      raced = true
      // a whole wave (append + index sync) lands between the purge's
      // snapshot pin and its commit
      CorpusPipeline.curateIncremental(spark,
        Seq(doc(100)).toDF("doc_id", "text"), root,
        minQuality = 0.0, minTokens = 0, fuzzyDedup = true)
    }
    try {
      val (fz1, _) = CorpusPipeline.maybeCompactIndexes(spark, root)
      assert(raced, "the race hook must have fired")
      assert(fz1 === 0L, s"a racing sync must skip the purge, got $fz1")
      // the conflict was benign maintenance backoff: the NEXT trigger
      // (no race) purges everything that is genuinely stale
      val (fz2, _) = CorpusPipeline.maybeCompactIndexes(spark, root)
      assert(fz2 > 0L, "the following trigger must purge")
      val live = curated.toDF.select($"doc_id").as[Long].collect().toSet
      assert(posts.toDF.select($"id").as[Long].collect().toSet === live)
    } finally graft.ops.Dedup.compactRaceHook = () => ()
  }

  test("fuzzy gate: empty-corpus deferral self-gates the batch, then builds") {
    val root = Files.createTempDirectory("corpus-fuzzy-defer-").toString
    // the initial corpus loses every doc to the quality gate -> both
    // indexes defer; the first wave must still self-gate within-batch
    CorpusPipeline.curate(spark,
      Seq((1L, "x")).toDF("doc_id", "text"), root,
      minQuality = 0.9, minTokens = 50, fuzzyIndex = true)
    assert(!LakeTable.isLakeTable(s"$root/mhindex/postings"))

    val r1 = CorpusPipeline.curateIncremental(spark, Seq(
      (10L, "wolf bear lynx otter marten badger weasel stoat ferret mink"),
      (11L, "wolf bear lynx otter marten badger weasel stoat ferret mink bonus words"))
      .toDF("doc_id", "text"), root,
      minQuality = 0.0, minTokens = 0, fuzzyDedup = true)
    assert(r1.appended === 1,
      s"the deferral wave must self-gate the within-batch near-dup: $r1")
    // the deferred build landed AFTER the append and covers the survivor
    assert(LakeTable.isLakeTable(s"$root/mhindex/postings"))
    val posts = LakeTable.forPath(spark, s"$root/mhindex/postings").toDF
    assert(posts.select($"id").distinct().as[Long].collect().toSet === Set(10L))

    // the next wave gates against the deferred-built index normally
    val r2 = CorpusPipeline.curateIncremental(spark, Seq(
      (20L, "wolf bear lynx otter marten badger weasel stoat ferret mink extra suffix"))
      .toDF("doc_id", "text"), root,
      minQuality = 0.0, minTokens = 0, fuzzyDedup = true)
    assert(r2.appended === 0, "a near-dup of the deferral-wave survivor must drop")
  }

  test("fuzzy postings recover rows a crash kept out of them (change feed)") {
    val root = Files.createTempDirectory("corpus-fuzzy-recover-").toString
    CorpusPipeline.curate(spark, Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "red orange yellow green blue indigo violet crimson amber teal"))
      .toDF("doc_id", "text"), root, minQuality = 0.0,
      minTokens = 0, nearDupThreshold = 0.99, fuzzyIndex = true)

    // crash simulation: doc 30 reached the curated table but its
    // postings append never ran
    val curated = LakeTable.forPath(spark, s"$root/curated")
    val lost = CorpusPipeline.annotate(
      Seq((30L, "wolf bear lynx otter marten badger weasel stoat ferret mink"))
        .toDF("doc_id", "text"))
    curated.append(lost.select(
      curated.snapshot.schema.fieldNames.map(col).toSeq: _*))
    val posts = LakeTable.forPath(spark, s"$root/mhindex/postings").toDF
    assert(!posts.select($"id").as[Long].collect().toSet.contains(30L),
      "fixture must start with doc 30 missing from the postings")

    // the very next wave must drop a FUZZY near-dup of doc 30: the
    // start-of-wave catch-up sync folds the deferred postings in BEFORE
    // the gate runs
    val r = CorpusPipeline.curateIncremental(spark, Seq(
      (31L, "wolf bear lynx otter marten badger weasel stoat ferret mink tail bits"))
      .toDF("doc_id", "text"), root,
      minQuality = 0.0, minTokens = 0, fuzzyDedup = true)
    assert(r.appended === 0,
      "near-dup of the crash-deferred doc must drop in the NEXT wave")
    val indexed = LakeTable.forPath(spark, s"$root/mhindex/postings").toDF
      .select($"id").as[Long].collect().toSet
    assert(indexed.contains(30L), "the catch-up sync must have indexed doc 30")
  }

  test("re-curating an existing outRoot rebuilds corpus, stats, and indexes coherently") {
    val root = Files.createTempDirectory("corpus-recurate-").toString
    val docsA = Seq(
      (1L, "one two three four five six seven eight nine ten"),
      (2L, "red orange yellow green blue indigo violet crimson amber teal"))
      .toDF("doc_id", "text")
    CorpusPipeline.curate(spark, docsA, root, minQuality = 0.0,
      minTokens = 0, nearDupThreshold = 0.99, fuzzyIndex = true)

    // second curate over the SAME root with a different corpus: the
    // overwrite keeps the curated generation, the stats view refreshes
    // through the overwrite's change feed, and the fuzzy index rebuilds
    // fresh (its build resets the postings log)
    val docsB = Seq(
      (5L, "wolf bear lynx otter marten badger weasel stoat ferret mink"),
      (6L, "apple pear plum peach cherry apricot quince medlar fig date"))
      .toDF("doc_id", "text")
    CorpusPipeline.curate(spark, docsB, root, minQuality = 0.0,
      minTokens = 0, nearDupThreshold = 0.99, fuzzyIndex = true)

    val curated = LakeTable.forPath(spark, s"$root/curated").toDF
    assert(curated.select($"doc_id").as[Long].collect().toSet === Set(5L, 6L))
    // the incrementally-refreshed stats equal a from-scratch recompute
    val stats = CorpusPipeline.langStats(spark, root)
      .orderBy("lang_pred").collect().toSeq
    val recomputed = curated.groupBy($"lang_pred")
      .agg(count(lit(1)).as("n_docs"),
        round(sum($"quality") / count($"quality"), 4).as("avg_quality"),
        sum($"n_tokens").cast("long").as("total_tokens"))
      .orderBy("lang_pred").collect().toSeq
    assert(stats === recomputed,
      "stats after re-curate must describe the NEW corpus")
    // the fuzzy index describes only the new corpus and a wave dedups
    // against it
    val posts = LakeTable.forPath(spark, s"$root/mhindex/postings").toDF
    assert(posts.select($"id").as[Long].collect().toSet === Set(5L, 6L))
    val r = CorpusPipeline.curateIncremental(spark, Seq(
      (10L, "wolf bear lynx otter marten badger weasel stoat ferret mink tail bit"),
      (11L, "one two three four five six seven eight nine ten extra tail"))
      .toDF("doc_id", "text"), root,
      minQuality = 0.0, minTokens = 0, fuzzyDedup = true)
    assert(r.appended === 1,
      "near-dup of the NEW corpus drops; near-dup of the OLD corpus appends")
  }
}
