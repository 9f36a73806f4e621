package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TemporalJoinSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(m * 60000L)

  private def left = Seq(
    (1L, "u1", ts(10), "a"),
    (2L, "u1", ts(20), "b"),
    (3L, "u1", ts(5), "c"),
    (4L, "u2", ts(8), "d"),
    (5L, "u3", ts(30), "e")) // u3 has no right rows
    .toDF("id", "user", "t", "tag")

  private def right = Seq(
    ("u1", ts(8), 100.0),
    ("u1", ts(15), 200.0),
    ("u1", ts(20), 300.0), // equal-ts: visible to left id=2
    ("u2", ts(9), 400.0))  // after u2's only event
    .toDF("user", "rt", "rv")

  test("backward as-of picks the latest right row at-or-before") {
    val out = TemporalJoin.asofJoin(left, right, Seq("user"), "t", "rt")
      .orderBy("id")
      .select($"id", unix_millis($"rt") / 60000, $"rv")
      .as[(Long, Option[Double], Option[Double])].collect().toSeq
    assert(out === Seq(
      (1L, Some(8.0), Some(100.0)),   // 10 → rt=8
      (2L, Some(20.0), Some(300.0)),  // equal ts matches
      (3L, None, None),               // 5: nothing at-or-before
      (4L, None, None),               // 8: u2's right row is at 9
      (5L, None, None)))              // no right rows for u3
  }

  test("forward as-of picks the earliest right row at-or-after") {
    val out = TemporalJoin.asofJoin(left, right, Seq("user"), "t", "rt",
      forward = true)
      .orderBy("id")
      .select($"id", unix_millis($"rt") / 60000)
      .as[(Long, Option[Double])].collect().toSeq
    assert(out === Seq(
      (1L, Some(15.0)), (2L, Some(20.0)), (3L, Some(8.0)),
      (4L, Some(9.0)), (5L, None)))
  }

  test("tolerance nulls matches farther than the bound") {
    val out = TemporalJoin.asofJoin(left, right, Seq("user"), "t", "rt",
      toleranceMs = Some(3 * 60000L))
      .orderBy("id")
      .select($"id", $"rv").as[(Long, Option[Double])].collect().toSeq
    // id=1: t=10 matched rt=8 (2 min) ok; id=2 matched rt=20 (0) ok
    assert(out === Seq((1L, Some(100.0)), (2L, Some(300.0)),
      (3L, None), (4L, None), (5L, None)))
  }

  test("colliding right column names come back suffixed _right") {
    val r2 = right.withColumnRenamed("rv", "tag") // collides with left.tag
    val out = TemporalJoin.asofJoin(left, r2, Seq("user"), "t", "rt")
    assert(out.columns.toSeq ===
      Seq("id", "user", "t", "tag", "rt", "tag_right"))
  }

  test("NULL join keys never match (SQL equality, like ASOF JOIN)") {
    val l = Seq((1L, Option("u1"), ts(10)), (2L, Option.empty[String], ts(10)))
      .toDF("id", "user", "t")
    val r = Seq((Option("u1"), ts(5), 1.0), (Option.empty[String], ts(5), 2.0))
      .toDF("user", "rt", "rv")
    val out = TemporalJoin.asofJoin(l, r, Seq("user"), "t", "rt")
      .orderBy("id").select($"id", $"rv")
      .as[(Long, Option[Double])].collect().toSeq
    // the NULL-key left row survives but matches nothing
    assert(out === Seq((1L, Some(1.0)), (2L, None)))
  }

  test("NULL right timestamps never match (backward would sort them first)") {
    val l = Seq((1L, "u1", ts(10))).toDF("id", "user", "t")
    val r = Seq(("u1", Option.empty[Timestamp], 99.0),
      ("u1", Option(ts(5)), 1.0)).toDF("user", "rt", "rv")
    // ascending null-first ordering placed the null-rt row "before"
    // every left row — with no other right row it became a bogus match
    val out = TemporalJoin.asofJoin(l,
      r.where($"rv" === 99.0), Seq("user"), "t", "rt")
      .select($"rv").as[Option[Double]].collect().toSeq
    assert(out === Seq(None), "a null-timestamp right row must match nothing")
    // and it never shadows a real earlier row
    val out2 = TemporalJoin.asofJoin(l, r, Seq("user"), "t", "rt")
      .select($"rv").as[Option[Double]].collect().toSeq
    assert(out2 === Seq(Some(1.0)))
  }

  test("as-of plans with no join operator (union + window only)") {
    val out = TemporalJoin.asofJoin(left, right, Seq("user"), "t", "rt")
    val plan = out.queryExecution.executedPlan
    val joins = plan.collect {
      case j if j.nodeName.contains("Join") => j
    }
    assert(joins.isEmpty, s"expected a join-free as-of plan:\n$plan")
  }

  test("as-of matches a naive windowless reference on random data") {
    val n = 500
    val l = spark.range(n).select(
      $"id", concat(lit("u"), ($"id" % 7)).as("user"),
      timestamp_millis(($"id" * 7919) % 100000).as("t"))
    val r = spark.range(137).select(
      concat(lit("u"), ($"id" % 7)).as("user"),
      timestamp_millis(($"id" * 104729) % 100000).as("rt"),
      ($"id" * 1.5).as("rv"))
      .groupBy("user", "rt").agg(max("rv").as("rv"))
    val fast = TemporalJoin.asofJoin(l, r, Seq("user"), "t", "rt")
      .select($"id", $"rv")
    // reference: plain join + row_number
    val joined = l.join(r, l("user") === r("user") && l("t") >= r("rt"), "left")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"id").orderBy($"rt".desc)
    val slow = joined
      .withColumn("__rn", row_number().over(w))
      .where($"__rn" === 1).select($"id", $"rv")
    assert(fast.orderBy("id").collect().toSeq ===
      slow.orderBy("id").collect().toSeq)
  }

  test("range join matches a cross-join reference and never nested-loops") {
    val pts = spark.range(300).select(
      $"id", concat(lit("u"), ($"id" % 5)).as("user"),
      timestamp_millis(($"id" * 6151) % 50000).as("t"))
    val iv = spark.range(40).select(
      concat(lit("u"), ($"id" % 5)).as("user"),
      timestamp_millis(($"id" * 9973) % 50000).as("lo"),
      timestamp_millis(($"id" * 9973) % 50000 + 4000).as("hi"),
      ($"id" * 2.0).as("pv"))
    val fast = TemporalJoin.rangeJoin(pts, iv, Seq("user"), "t", "lo", "hi",
      binWidthMs = 3000)
    val slow = pts.alias("l").join(iv.alias("r"),
        col("l.user") === col("r.user") &&
          col("l.t") >= col("r.lo") && col("l.t") <= col("r.hi"))
      .select(col("l.id"), col("r.pv"))
    assert(fast.select("id", "pv").orderBy("id", "pv").collect().toSeq ===
      slow.orderBy("id", "pv").collect().toSeq)
    assert(fast.count() > 0) // fixture actually exercises matches
    val bad = fast.queryExecution.executedPlan.collect {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }
    assert(bad.isEmpty, "range join must stay an equi-join on (key, bin)")
  }

  test("degenerate and inverted intervals emit nothing") {
    val pts = Seq((1L, "u", ts(10))).toDF("id", "user", "t")
    val iv = Seq(("u", ts(20), ts(5), 1.0)).toDF("user", "lo", "hi", "pv")
    assert(TemporalJoin.rangeJoin(pts, iv, Seq("user"), "t", "lo", "hi",
      binWidthMs = 60000).count() === 0)
  }
}
