package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.lake.LakeTable

/** Mergeable HLL sketch state ([[Sketches]]): persisted fine-grained
  * sketches roll up by union, refresh by appending batch sketches.
  */
class SketchesSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("small cardinalities estimate exactly; rollup = union of state") {
    val df = (1L to 3000L).map(i => (i % 7, s"u${i % 97}")).toDF("g", "u")
    val state = Sketches.distinctSketches(df, Seq("g"), "u")
    val perG = Sketches.estimateDistinct(state, Seq("g"))
      .orderBy("g").as[(Long, Long)].collect().toSeq
    val exact = df.groupBy("g").agg(countDistinct("u").as("n"))
      .orderBy("g").as[(Long, Long)].collect().toSeq
    assert(perG === exact)
    // global rollup from the SAME stored state (no rescan)
    assert(Sketches.estimateDistinct(state, Seq.empty)
      .as[Long].head() === 97L)
  }

  test("large cardinality estimates within HLL error bounds") {
    val df = spark.range(0, 200000).select(($"id" % 3).as("g"), $"id".as("u"))
    val est = Sketches.estimateDistinct(
      Sketches.distinctSketches(df, Seq("g"), "u"), Seq.empty).as[Long].head()
    assert(math.abs(est - 200000L).toDouble / 200000 < 0.03,
      s"estimate $est off by more than 3%")
  }

  test("count-min heavy hitters: overestimate-only within eps*N") {
    // zipf-ish skew: value v appears ~N/v times
    val rows = (1 to 200).flatMap(v => Seq.fill(2000 / v)(s"val$v"))
    val df = rows.toDF("x")
    val n = rows.size.toLong
    val eps = 1e-3
    val exact = rows.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    val hh = Sketches.heavyHitters(df, "x", k = 10, eps = eps)
      .as[(String, Long)].collect()
    assert(hh.length === 10)
    // the true top value must surface first (largest margin)
    assert(hh.head._1 === "val1")
    hh.foreach { case (v, est) =>
      val truth = exact(v)
      assert(est >= truth, s"$v: CMS must never underestimate")
      assert(est <= truth + (eps * n).toLong + 1,
        s"$v: est $est exceeds eps*N bound over $truth")
    }
  }

  test("bounded candidate pass still surfaces the true heavy hitters") {
    // 10k-value domain, zipf-ish: distinct() enumeration would collect
    // 10k candidates; the freqItems pass keeps O(maxCandidates) state
    val rows = (1 to 10000).flatMap(v => Seq.fill(20000 / v max 1)(s"val$v"))
    val df = rows.toDF("x")
    val exact = rows.groupBy(identity).map { case (kk, vs) => kk -> vs.size.toLong }
    val topTrue = exact.toSeq.sortBy { case (v, c) => (-c, v) }.take(5).map(_._1)
    val hh = Sketches.heavyHitters(df, "x", k = 5, maxCandidates = Some(200))
      .as[(String, Long)].collect()
    assert(hh.map(_._1).toSeq === topTrue,
      s"bounded-candidate top-5 ${hh.toSeq} != true top-5 $topTrue")
    hh.foreach { case (v, est) => assert(est >= exact(v)) }
  }

  test("DEFAULT path is bounded: large domain never collects distinct()") {
    // 20k-value domain, zipf-ish — bigger than the 10k candidate cap, so
    // an exhaustive enumeration would be the old driver-collect hazard;
    // the default freqItems pass keeps O(10k) state and still surfaces
    // the true top-k
    val rows = (1 to 20000).flatMap(v => Seq.fill(40000 / v max 1)(s"val$v"))
    val df = rows.toDF("x")
    val exact = rows.groupBy(identity).map { case (kk, vs) => kk -> vs.size.toLong }
    val topTrue = exact.toSeq.sortBy { case (v, c) => (-c, v) }.take(5).map(_._1)
    val hh = Sketches.heavyHitters(df, "x", k = 5) // defaults
      .as[(String, Long)].collect()
    assert(hh.map(_._1).toSeq === topTrue,
      s"default-path top-5 ${hh.toSeq} != true top-5 $topTrue")
  }

  test("maxCandidates beyond freqItems' support floor is rejected") {
    val df = (1 to 10).map(i => s"v$i").toDF("x")
    val e = intercept[IllegalArgumentException] {
      Sketches.heavyHitters(df, "x", k = 5, maxCandidates = Some(20000))
    }
    assert(e.getMessage.contains("10000"))
  }

  test("count-min state merges across batches like any sketch") {
    val b1 = (1 to 1000).map(i => s"u${i % 10}").toDF("x")
    val b2 = (1 to 500).map(_ => "u3").toDF("x")
    // union of raw data vs the same data sketched in one pass: the
    // mergeable path is what frequencySketches' partial aggregation
    // exercises across partitions; assert the combined estimate
    val est = Sketches.heavyHitters(b1.unionByName(b2), "x", k = 1)
      .as[(String, Long)].head()
    assert(est._1 === "u3")
    assert(est._2 >= 600L) // 100 from b1 + 500 from b2
  }

  test("incremental maintenance: append a batch's sketches, union on read") {
    val path = Files.createTempDirectory("sketch-state-").toString
    val day1 = (1L to 500L).map(i => ("d1", s"u${i % 50}")).toDF("day", "u")
    val day2 = (1L to 500L).map(i => ("d2", s"u${i % 80}")).toDF("day", "u")
    val t = LakeTable.create(spark, path,
      Sketches.distinctSketches(day1, Seq("day"), "u"))
    // new day arrives: sketch ONLY the new rows, append the state
    t.append(Sketches.distinctSketches(day2, Seq("day"), "u"))
    val merged = Sketches.estimateDistinct(t.toDF, Seq.empty).as[Long].head()
    val exact = day1.unionByName(day2).select(countDistinct("u")).as[Long].head()
    assert(merged === exact) // u0..u79 overlap across days → union dedups
    // per-day grain still readable from the same table
    assert(Sketches.estimateDistinct(t.toDF, Seq("day")).orderBy("day")
      .as[(String, Long)].collect().toSeq === Seq(("d1", 50L), ("d2", 80L)))
  }

  test("KLL rollup from stored state: exact below k, merge == direct") {
    // 150 values over 3 days — fits level 0 (k=200), so state is exact
    val rows = (1 to 150).map(i => (s"d${i % 3}", i.toDouble)).toDF("day", "v")
    val state = Sketches.quantileSketches(rows, Seq("day"), "v")
    val global = Sketches.rollupQuantiles(state, Seq.empty, Seq(0.5))
      .as[Double].head()
    assert(global === 75.0 || global === 76.0, s"median $global")
    // rolling up stored state must equal sketching the raw data at once
    val direct = Sketches.rollupQuantiles(
      Sketches.quantileSketches(rows, Seq.empty, "v"), Seq.empty,
      Seq(0.25, 0.5, 0.95)).head()
    val rolled = Sketches.rollupQuantiles(state, Seq.empty,
      Seq(0.25, 0.5, 0.95)).head()
    assert(rolled === direct)
    // per-day grain still readable from the same state
    val perDay = Sketches.rollupQuantiles(state, Seq("day"), Seq(0.5))
      .orderBy("day").as[(String, Double)].collect()
    assert(perDay.length === 3 && perDay.forall(r => r._2 > 60 && r._2 < 90))
  }

  test("KLL rollup stays within rank-error bounds above k") {
    val n = 50000
    val rows = (1 to n).map(i => (s"g${i % 20}", i.toDouble)).toDF("g", "v")
    val state = Sketches.quantileSketches(rows, Seq("g"), "v")
    val Seq(q50, q95) = Seq(0.5, 0.95).map { q =>
      Sketches.rollupQuantiles(state, Seq.empty, Seq(q)).as[Double].head()
    }
    // normalized rank error ~1.65% at k=200; 20-way merge stays well
    // inside 3%
    assert(math.abs(q50 - n * 0.5) / n < 0.03, s"q50 $q50")
    assert(math.abs(q95 - n * 0.95) / n < 0.03, s"q95 $q95")
  }

  test("theta overlap: exact set algebra below lgK, from state alone") {
    // A = 0..999, B = 500..1499, C = 2000..2099 (disjoint from both)
    val rows = (0 to 999).map(i => ("A", s"v$i")) ++
      (500 to 1499).map(i => ("B", s"v$i")) ++
      (2000 to 2099).map(i => ("C", s"v$i"))
    val sk = Sketches.thetaSketches(rows.toDF("src", "v"), Seq("src"), "v")
    val got = Sketches.pairwiseOverlap(sk, "src").orderBy("a", "b")
      .as[(String, String, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("A", "B", 1000L, 1000L, 500L, 1500L, 0.333333),
      ("A", "C", 1000L, 100L, 0L, 1100L, 0.0),
      ("B", "C", 1000L, 100L, 0L, 1100L, 0.0)))
  }

  test("theta overlap stays sane above exact mode (sampling kicks in)") {
    val n = 60000
    val rows = (0 until n).map(i => ("A", s"v$i")) ++
      (n / 2 until n + n / 2).map(i => ("B", s"v$i"))
    val sk = Sketches.thetaSketches(rows.toDF("src", "v"), Seq("src"), "v")
    val r = Sketches.pairwiseOverlap(sk, "src")
      .as[(String, String, Long, Long, Long, Long, Double)].head()
    // intersection of sampled sketches carries more variance than a
    // plain distinct estimate — allow 10%
    assert(math.abs(r._5 - n / 2).toDouble / (n / 2) < 0.10, r)
    assert(math.abs(r._6 - n * 3 / 2).toDouble / (n * 3 / 2) < 0.10, r)
  }
}
