package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hyperplane-LSH embedding dedup: recall vs the exact O(n²) baseline,
  * and the signature expression's agreement with plain SQL arithmetic.
  */
class EmbeddingLshSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private val dim = 16

  /** 40 base vectors + a jittered near-dup for every 4th one. */
  private lazy val vecs = {
    val rnd = new scala.util.Random(7)
    val base = (0 until 40).map { i =>
      (i.toLong, Array.fill(dim)((rnd.nextGaussian()).toFloat))
    }
    val dups = base.filter(_._1 % 4 == 0).map { case (id, v) =>
      (id + 1000L, v.map(x => x + 0.05f * rnd.nextGaussian().toFloat))
    }
    (base ++ dups).toDF("vec_id", "embedding")
  }

  test("recall >= 0.9 vs exact pairs at the same threshold") {
    val exact = Dedup.embeddingPairs(vecs, "embedding", "vec_id", threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty) // fixture really contains near-dups
    val lsh = Dedup.embeddingPairsLsh(vecs, "embedding", "vec_id",
      threshold = 0.8, dim = dim)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // LSH verifies candidates with the same exact cosine → no false
    // positives; recall is the only approximation
    assert(lsh.subsetOf(exact))
    assert(lsh.size.toDouble / exact.size >= 0.9,
      s"recall ${lsh.size}/${exact.size}")
  }

  test("candidate generation is banded, not all-pairs") {
    // with 8 bands of 4 bits over near-orthogonal vectors, candidate
    // pairs must be far below the n*(n-1)/2 cross-join count
    val n = vecs.count()
    val allPairs = n * (n - 1) / 2
    val candidates = Dedup.embeddingPairsLsh(vecs, "embedding", "vec_id",
      threshold = -1.0, dim = dim) // keep every verified candidate
      .count()
    assert(candidates < allPairs / 2, s"$candidates vs $allPairs")
  }

  test("hyperplane signature matches per-plane SQL sign bits") {
    val rnd = new java.util.Random(42L)
    val planes = Array.fill(4 * dim)(rnd.nextGaussian())
    val df = vecs.limit(5)
      .withColumn("nvec", Similarity.normalized(col("embedding")))
    val sig = df.withColumn("sig",
      org.apache.spark.sql.graft.VectorExpressions
        .hyperplaneBits(col("nvec"), planes, dim))
      .select("vec_id", "sig").as[(Long, Long)].collect().toMap
    // recompute each bit with the independent native dot product
    val bits = df.select(col("vec_id") +: (0 until 4).map { p =>
      val plane = array(planes.slice(p * dim, (p + 1) * dim).map(lit): _*)
      (org.apache.spark.sql.graft.VectorExpressions.dotD(col("nvec"), plane) > 0)
        .cast("long").as(s"b$p")
    }: _*).as[(Long, Long, Long, Long, Long)].collect()
    bits.foreach { case (id, b0, b1, b2, b3) =>
      val expectedSig = b0 | (b1 << 1) | (b2 << 2) | (b3 << 3)
      assert(sig(id) === expectedSig, s"vec $id")
    }
  }
}
