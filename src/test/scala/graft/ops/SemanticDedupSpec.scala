package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SemDeDup-style semantic dedup: cluster-bounded exact-cosine pairs.
  * Precision is structural (candidates verify with the same exact
  * arithmetic as the brute-force baseline); recall vs that baseline is
  * measured on a corpus whose near-dups are PERTURBED (not bit-equal),
  * so cluster-boundary splits are genuinely possible.
  */
class SemanticDedupSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private val dim = 16

  /** 6 well-separated cluster centers × 20 jittered members, plus a
    * near-dup for every 4th vector (small perturbation → cosine ≳ 0.99,
    * but NOT bit-identical — it can land on the far side of a centroid).
    */
  private lazy val vecs = {
    val rnd = new scala.util.Random(11)
    val centers = Array.fill(6)(Array.fill(dim)(rnd.nextGaussian() * 3))
    val base = (0 until 120).map { i =>
      val c = centers(i % 6)
      (i.toLong, c.zip(Array.fill(dim)(rnd.nextGaussian() * 0.3))
        .map { case (x, j) => (x + j).toFloat })
    }
    val dups = base.filter(_._1 % 4 == 0).map { case (id, v) =>
      (id + 1000L, v.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
    }
    (base ++ dups).toDF("vec_id", "embedding")
  }

  test("no false positives; recall >= 0.9 vs exact pairs") {
    val exact = Dedup.embeddingPairs(vecs, "embedding", "vec_id",
      threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.size >= 30) // the fixture really contains near-dups
    val sem = Dedup.semanticDedupPairs(vecs, "embedding", "vec_id",
      threshold = 0.9, nClusters = 6, nProbe = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sem.subsetOf(exact)) // exact verification → no false positives
    assert(sem.size.toDouble / exact.size >= 0.9,
      s"recall ${sem.size}/${exact.size}")
  }

  test("multi-probe beats single-probe on boundary pairs") {
    val one = Dedup.semanticDedupPairs(vecs, "embedding", "vec_id",
      threshold = 0.9, nClusters = 6, nProbe = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val two = Dedup.semanticDedupPairs(vecs, "embedding", "vec_id",
      threshold = 0.9, nClusters = 6, nProbe = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(one.subsetOf(two)) // probing more lists only ADDS candidates
  }

  test("emitted cosines are exact (equal to the brute-force values)") {
    val exact = Dedup.embeddingPairs(vecs, "embedding", "vec_id",
      threshold = 0.9)
      .select("id_a", "id_b", "cosine")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    Dedup.semanticDedupPairs(vecs, "embedding", "vec_id",
      threshold = 0.9, nClusters = 6, nProbe = 2)
      .select("id_a", "id_b", "cosine")
      .as[(Long, Long, Double)].collect()
      .foreach { case (a, b, c) =>
        assert(exact((a, b)) === c) // bit-equal, same expression
      }
  }

  test("keep-set: one representative (min id) per duplicate group") {
    val kept = Dedup.semanticDedup(vecs, "embedding", "vec_id",
      threshold = 0.99, nClusters = 6, nProbe = 2)
    val pairs = Dedup.semanticDedupPairs(vecs, "embedding", "vec_id",
      threshold = 0.99, nClusters = 6, nProbe = 2)
    val keptIds = kept.select("vec_id").as[Long].collect().toSet
    val losers = Dedup.components(pairs)
      .where(col("id") =!= col("component"))
      .select("id").as[Long].collect().toSet
    assert(keptIds.intersect(losers).isEmpty)
    assert(keptIds.size === vecs.count() - losers.size)
  }

  test("indexed variant: persisted cluster space, stable across batches") {
    val idx = java.nio.file.Files.createTempDirectory("semidx-").toString
    val (first, second) = {
      val all = vecs.as[(Long, Array[Float])].collect().sortBy(_._1)
      val (a, b) = all.splitAt(all.length / 2)
      (a.toSeq.toDF("vec_id", "embedding"), b.toSeq.toDF("vec_id", "embedding"))
    }
    Similarity.buildIvfIndex(first, "embedding", "vec_id", idx, nLists = 6)
    Similarity.appendToIvfIndex(second, "embedding", "vec_id", idx)

    val indexed = Dedup.semanticDedupPairsIndexed(spark, idx,
      threshold = 0.9, nProbe = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val exact = Dedup.embeddingPairs(vecs, "embedding", "vec_id",
      threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // same structural guarantees as the per-call variant: candidates
    // verify exactly (no false positives) and cluster-bounded recall
    // holds even though half the corpus was assigned incrementally
    assert(indexed.subsetOf(exact))
    assert(indexed.size.toDouble / exact.size >= 0.9,
      s"recall ${indexed.size}/${exact.size}")
  }

  test("deterministic under the seed") {
    def run() = Dedup.semanticDedupPairs(vecs, "embedding", "vec_id",
      threshold = 0.9, nClusters = 6, nProbe = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(run() === run())
  }
}
