package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Profile]]: per-column stats correctness (nulls, exact distinct,
  * canonical min/max), column ordering, and the expand-free plan shape.
  */
class ProfileSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def df = Seq(
    (1L, Some(2.5), Some("b"), Some(Timestamp.valueOf("2024-01-02 03:04:05"))),
    (2L, Some(0.0), Some("a"), Some(Timestamp.valueOf("2024-01-01 00:00:00"))),
    (3L, Some(-0.0), None, None),
    (4L, None, Some("a"), Some(Timestamp.valueOf("2024-01-02 03:04:05"))),
    (5L, Some(2.5), Some("c"), None)
  ).toDF("id", "score", "tag", "ts")

  test("stats are exact; min/max canonical; rows follow input order") {
    val rows = Profile.profile(df, Seq("score", "tag", "id", "ts"))
      .as[(String, Long, Long, Long, String, String)].collect()
    assert(rows.map(_._1).toSeq === Seq("score", "tag", "id", "ts"))
    val byName = rows.map(r => r._1 -> r).toMap
    // -0.0 and 0.0 are ONE distinct value, matching grouping semantics
    assert(byName("score") === (("score", 5L, 1L, 2L, "0.0", "2.5")))
    assert(byName("tag") === (("tag", 5L, 1L, 3L, "a", "c")))
    assert(byName("id") === (("id", 5L, 0L, 5L, "1", "5")))
    // timestamps canonicalize to epoch micros
    assert(byName("ts")._5 === "1704067200000000")
    assert(byName("ts")._4 === 2L)
  }

  test("all-null column profiles to zero distinct, null min/max") {
    val d = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "t")
    val r = Profile.profile(d, Seq("t")).collect()(0)
    assert(r.getLong(2) === 2L && r.getLong(3) === 0L)
    assert(r.isNullAt(4) && r.isNullAt(5))
  }

  test("plan is expand-free: no multi-distinct row replication") {
    val plan = Profile.profile(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
  }
}
