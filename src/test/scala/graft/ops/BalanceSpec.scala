package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Class balancing ([[Balance]]): determinism under the seed,
  * proportion fidelity, and exact caps.
  */
class BalanceSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  // skewed strata: en 4000, de 1000, fr 200
  private def docs = (1 to 5200).map { i =>
    val lang = if (i <= 4000) "en" else if (i <= 5000) "de" else "fr"
    (i.toLong, lang)
  }.toDF("id", "lang")

  test("stratified sample is seeded-deterministic and proportional") {
    val fr = Map("en" -> 0.1, "de" -> 0.5, "fr" -> 1.0)
    val s1 = Balance.stratifiedSample(docs, "lang", fr).collect().toSet
    val s2 = Balance.stratifiedSample(docs, "lang", fr).collect().toSet
    assert(s1 === s2, "same seed must reproduce the same sample")
    val byLang = s1.groupBy(_.getString(1)).view.mapValues(_.size).toMap
    assert(byLang("fr") === 200) // fraction 1.0 keeps everything
    assert(math.abs(byLang("en") - 400) < 120, s"en ~10%: ${byLang("en")}")
    assert(math.abs(byLang("de") - 500) < 120, s"de ~50%: ${byLang("de")}")
  }

  test("capPerStratum enforces exact caps, minority passes through") {
    val capped = Balance.capPerStratum(docs, "lang", "id", maxRows = 300)
    val byLang = capped.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    assert(byLang === Map("en" -> 300L, "de" -> 300L, "fr" -> 200L))
    // deterministic: same rows both runs
    val again = Balance.capPerStratum(docs, "lang", "id", maxRows = 300)
    assert(capped.collect().toSet === again.collect().toSet)
    // a different seed picks a different (but same-sized) subset
    val other = Balance.capPerStratum(docs, "lang", "id", maxRows = 300, seed = 7L)
    assert(other.count() === capped.count())
    assert(other.collect().toSet !== capped.collect().toSet)
  }

  test("mixture follows weights, never oversamples, and is deterministic") {
    // en 4000 / de 1000 / fr 200 at weights .5/.3/.2: fr is the scarce
    // source (200/0.2 = 1000 pins the total) → expect ~500/~300/200
    val srcs = Seq(
      ("en", docs.where($"lang" === "en"), 0.5),
      ("de", docs.where($"lang" === "de"), 0.3),
      ("fr", docs.where($"lang" === "fr"), 0.2))
    val mix = Balance.mixture(srcs, "id")
    val byDs = mix.groupBy("dataset").count().as[(String, Long)].collect().toMap
    assert(byDs("fr") === 200L, "scarce source keeps everything (frac 1.0)")
    assert(math.abs(byDs("en") - 500L) < 80, byDs.toString)
    assert(math.abs(byDs("de") - 300L) < 80, byDs.toString)
    // deterministic: identical row set on a re-run
    val again = Balance.mixture(srcs, "id").collect().toSet
    assert(mix.collect().toSet === again)
  }

  test("shardShuffle: a permutation into contiguous per-shard positions") {
    val ids = spark.range(0, 1000).select($"id")
    val out = Balance.shardShuffle(ids, "id", numShards = 8)
    // every input row appears exactly once
    assert(out.count() === 1000L)
    assert(out.select("id").distinct().count() === 1000L)
    // shards are 0..7 and positions are 1..n within each shard
    val byShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .collect()
    assert(byShard.map(_.getInt(0)).toSet.subsetOf((0 until 8).toSet))
    byShard.foreach { r =>
      assert(r.getLong(2) === 1L && r.getLong(3) === r.getLong(1))
    }
    // md5 keying: deterministic across runs, and actually shuffled
    // (not id order)
    val again = Balance.shardShuffle(ids, "id", numShards = 8)
    assert(out.collect().toSet === again.collect().toSet)
    val firstShard = out.where($"shard" === 0).orderBy($"pos")
      .select("id").collect().map(_.getLong(0))
    assert(firstShard.length > 10 && !(firstShard.sorted sameElements firstShard),
      "in-shard order must be hash order, not id order")
  }

  test("holdoutSplit: stable under growth, exhaustive, shuffle-free") {
    val slices = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val small = Balance.holdoutSplit(docs.limit(1000), "id", slices)
      .select("id", "slice").as[(Long, String)].collect().toMap
    val full = Balance.holdoutSplit(docs, "id", slices)
      .select("id", "slice").as[(Long, String)].collect().toMap
    // a row's slice never changes when the corpus grows around it
    small.foreach { case (id, s) => assert(full(id) === s) }
    // fractions summing to 1 assign every row, roughly proportionally
    assert(full.size === 5200 && !full.values.exists(_ == null))
    val train = full.values.count(_ == "train").toDouble / full.size
    assert(train > 0.75 && train < 0.85, s"train frac $train")
    // sum < 1 leaves an explicit null holdout
    val held = Balance.holdoutSplit(docs, "id", Seq(("train", 0.5)))
      .where(col("slice").isNull).count()
    assert(held > 2000 && held < 3200)
    // map-side only: no exchange in the plan
    val plan = Balance.holdoutSplit(docs, "id", slices)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("balancingFractions keys by raw value: int strata sample correctly") {
    // regression: the map was keyed by String.valueOf, so sampleBy's
    // by-value lookup missed every non-string stratum and returned empty
    val intStrata = (1 to 1000).map(i => (i.toLong, if (i <= 800) 1 else 2))
      .toDF("id", "cls")
    val fr = Balance.balancingFractions(intStrata, "cls")
    assert(fr(2) === 1.0)
    assert(math.abs(fr(1) - 0.25) < 1e-9)
    val byCls = Balance.stratifiedSample(intStrata, "cls", fr)
      .groupBy("cls").count().as[(Int, Long)].collect().toMap
    assert(byCls(2) === 200L) // fraction 1.0 keeps everything
    assert(math.abs(byCls(1) - 200L) < 80, byCls.toString)
  }

  test("balancingFractions levels every stratum to the smallest") {
    val fr = Balance.balancingFractions(docs, "lang")
    assert(fr("fr") === 1.0)
    assert(math.abs(fr("en") - 0.05) < 1e-9)
    assert(math.abs(fr("de") - 0.2) < 1e-9)
    val balanced = Balance.stratifiedSample(docs, "lang", fr)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // Bernoulli sampling: expect ~200 per stratum
    balanced.values.foreach(n => assert(math.abs(n - 200L) < 80, balanced))
  }
}
