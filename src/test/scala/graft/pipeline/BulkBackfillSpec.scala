package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.lake.LakeTable

/** [[CorpusPipeline.curateBulk]] — the corpus-sized-backfill twin of
  * the micro-batch incremental path: all three cross-corpus gates
  * (exact bloom → fuzzy minhash → semantic IVF) run in their
  * AQE-degrading oversized mode, survivors bit-identical to the
  * micro-batch path, and — the scale contract, GateBroadcastSpec's
  * harness lifted to the pipeline — no plan touching either gate index
  * carries a batch-side BroadcastExchange.
  */
class BulkBackfillSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private val words = Seq("one", "two", "red", "blue", "wolf", "bear",
    "alpha", "beta", "iron", "gold", "oak", "elm", "north", "south",
    "rain", "snow", "fast", "slow", "high", "low")
  private val dim = 8

  private def text(i: Int) =
    (0 until 10).map(j => words((i * 7 + j * 3) % 20) + i).mkString(" ")
  // per-doc UNCLUSTERED vectors: two random 8-dim gaussians almost never
  // reach cosine 0.9, so only the deliberate twin below is semantic work
  private def vec(i: Int): Array[Float] = {
    val r = new scala.util.Random(i * 7919)
    Array.fill(dim)(r.nextGaussian().toFloat)
  }
  private def near(i: Int): Array[Float] = {
    val r = new scala.util.Random(i)
    vec(i).map(x => x + (r.nextGaussian() * 0.01).toFloat)
  }
  private def doc(i: Int) = (i.toLong, text(i), vec(i))

  /** A wave with true work for every gate: fresh docs, an exact corpus
    * duplicate, a fuzzy corpus near-dup, a semantic corpus twin, and an
    * intra-wave twin pair. */
  private def wave = (
    (100 until 130).map(doc) ++                              // fresh
      Seq((200L, text(3), vec(200)),                         // exact dup of corpus doc 3
        (201L, text(5) + " tail", vec(201)),                 // fuzzy near-dup of 5
        (202L, "totally different words here now", near(7)), // semantic twin of 7
        (203L, text(110), vec(110)))                         // intra-wave exact twin of 110
    ).toDF("doc_id", "text", "embedding")

  private def freshRoot(): String = {
    val root = Files.createTempDirectory("bulk-").toString
    CorpusPipeline.curate(spark, (0 until 20).map(doc)
      .toDF("doc_id", "text", "embedding"), root,
      minQuality = 0.0, minTokens = 0, nearDupThreshold = 0.99,
      fuzzyIndex = true, vecCol = Some("embedding"), semNLists = 3)
    root
  }

  private def curatedIds(root: String): Set[Long] =
    LakeTable.forPath(spark, s"$root/curated")
      .toDF.select($"doc_id").as[Long].collect().toSet

  test("bulk survivors match the micro-batch path through all three gates") {
    val (a, b) = (freshRoot(), freshRoot())
    val inc = CorpusPipeline.curateIncremental(spark, wave, b,
      minQuality = 0.0, minTokens = 0, fuzzyDedup = true,
      vecCol = Some("embedding"), semThreshold = 0.9)
    val bulk = CorpusPipeline.curateBulk(spark, wave, a,
      minQuality = 0.0, minTokens = 0, fuzzyDedup = true,
      vecCol = Some("embedding"), semThreshold = 0.9)
    assert(bulk === inc, "bulk must report the same wave accounting")
    assert(inc.appended < 34, "the fixture must contain true drops")
    assert(Set(200L, 201L, 202L, 203L).intersect(curatedIds(a)).isEmpty,
      "each gate's deliberate duplicate must have dropped")
    assert(curatedIds(a) === curatedIds(b),
      "oversized-mode gates must keep exactly the micro-batch survivors")
    // the gate indexes converge identically too
    assert(LakeTable.forPath(spark, s"$a/mhindex/postings").toDF
      .select($"id").as[Long].collect().toSet ===
      LakeTable.forPath(spark, s"$b/mhindex/postings").toDF
        .select($"id").as[Long].collect().toSet)
  }

  test("bulk wave: no gate-index plan broadcasts the batch side") {
    val root = freshRoot()
    // capture every executed plan across the whole bulk wave
    val plans = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          d: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    // both auto-broadcast knobs off: any BroadcastExchange in a captured
    // plan can only come from an explicit hint
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.listenerManager.register(l)
    try {
      val r = CorpusPipeline.curateBulk(spark, wave, root,
        minQuality = 0.0, minTokens = 0, fuzzyDedup = true,
        vecCol = Some("embedding"), semThreshold = 0.9)
      assert(r.appended > 0)
      // drain the async listener bus
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 20L * 1000L * 1000 * 1000
      while (stable < 5 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        val n = plans.size()
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
      import scala.jdk.CollectionConverters._
      val captured = plans.asScala.toVector
      val gatePlans = captured.filter(p =>
        p.contains("mhindex") || p.contains("semindex"))
      assert(gatePlans.nonEmpty, "the capture must have seen the gates")
      val offenders = gatePlans.filter(_.contains("BroadcastExchange"))
      assert(offenders.isEmpty,
        "a bulk wave must never broadcast into a gate-index join:\n" +
          offenders.headOption.getOrElse(""))
    } finally {
      spark.listenerManager.unregister(l)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
