package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Skew-safe LSH banding (VERDICT r01 #3): a boilerplate-heavy corpus
  * lands everyone in the same band buckets; the salted sub-bucket join
  * must (a) bound per-reducer bucket size and (b) return EXACTLY the
  * unsalted result.
  */
class SkewLshSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  /** 60 docs sharing one long boilerplate preamble (hot LSH buckets) +
    * 20 unrelated docs; every 6th boilerplate doc has a true near-dup.
    */
  private lazy val docs = {
    val rnd = new scala.util.Random(11)
    val boiler = "terms and conditions apply to all usage of this service " +
      "please read carefully before proceeding with any request " * 3
    val base = (0 until 60).map { i =>
      (i.toLong, s"$boiler unique tail ${rnd.nextInt(99999)} doc number $i")
    }
    val dups = base.filter(_._1 % 6 == 0).map { case (id, t) =>
      (id + 1000L, t + " slightly changed")
    }
    val other = (100 until 120).map { i =>
      (i.toLong, Seq.fill(30)(s"w${rnd.nextInt(500)}").mkString(" "))
    }
    (base ++ dups ++ other).toDF("doc_id", "text")
  }

  test("salted join output equals the unsalted join output") {
    val unsalted = Dedup.minhashLsh(docs, "text", "doc_id",
      threshold = 0.5, maxBucket = Int.MaxValue)
      .as[(Long, Long, Double)].collect().toSet
    val salted = Dedup.minhashLsh(docs, "text", "doc_id",
      threshold = 0.5, maxBucket = 8)
      .as[(Long, Long, Double)].collect().toSet
    assert(unsalted.nonEmpty) // the boilerplate corpus really collides
    assert(salted === unsalted)
  }

  test("sub-bucketing bounds the per-reducer group size") {
    // rebuild the banded layout the way minhashLsh does and measure the
    // largest (band, bucket, sub) group after salting with cap 8
    val k = 8 * 4
    val withSig = docs
      .withColumn("__shs", graft.functions.TextFunctions.shingles(col("text"), 3))
      .where(size(col("__shs")) > 0)
      .withColumn("__sig",
        graft.functions.TextFunctions.minhashSignature(col("__shs"), k))
      .select(col("doc_id").as("id"), col("__sig"))
    val banded = withSig.select(
      col("id"),
      explode(array((0 until 8).map { b =>
        struct(lit(b).as("band"),
          array_join(slice(col("__sig"), b * 4 + 1, 4), ",").as("bucket"))
      }: _*)).as("bb"))
      .select(col("id"), col("bb.band"), col("bb.bucket"))

    val unsaltedMax = banded.groupBy("band", "bucket").count()
      .agg(max("count")).as[Long].head()
    assert(unsaltedMax >= 60) // the hot bucket really exists

    val saltedMax = Dedup.saltedSide(banded, maxBucket = 8, "a",
      gidFirst = true, payload = Seq.empty)
      .groupBy("band", "bucket", "__sub").count()
      .agg(max("count")).as[Long].head()
    // hash groups are uneven, but each sub-bucket side must stay within
    // a small factor of the cap — nowhere near the 60+-member hot bucket
    assert(saltedMax <= 3 * 8, s"max salted sub-bucket side: $saltedMax")
  }
}
