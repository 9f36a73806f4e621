package graft.lake

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Constraint pushdown to the optimizer (NEXT.md r4 #4): a predicate
  * contradicting a CHECK constraint is answered empty from metadata —
  * the Scala read path lists zero files, the SQL path collapses the
  * scan branch to an empty LocalRelation at optimization time.
  */
class ConstraintPruneSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def freshTable(): LakeTable = {
    val dir = Files.createTempDirectory("cprune-").toString
    val t = LakeTable.create(spark, dir,
      Seq((1L, "AZ", 10.0), (2L, "CA", 20.0), (3L, "NY", 30.0))
        .toDF("id", "state", "amount"))
    t.addCheckConstraint("amount_range", "amount >= 0 AND amount < 100")
    t.addCheckConstraint("state_nn", "state IS NOT NULL")
    t
  }

  // ---- unit level: the satisfiability verdict itself -------------------
  // (behavioral reads below also pass via per-file stats on these small
  // fixtures; these pin the CONSTRAINT-derived verdict specifically)

  private def verdict(constraintSql: Seq[String], predSql: String,
      schema: org.apache.spark.sql.types.StructType): Boolean = {
    val p = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
    Stats.contradictsConstraints(
      p.parseExpression(predSql), constraintSql.map(p.parseExpression), schema)
  }

  test("constraint bounds prove predicates unsatisfiable") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("amount", DoubleType), StructField("n", LongType),
      StructField("tier", StringType), StructField("ts", TimestampType)))
    // two-sided numeric interval
    assert(verdict(Seq("amount >= 0 AND amount < 100"), "amount > 200", schema))
    assert(verdict(Seq("amount >= 0 AND amount < 100"), "amount = 150", schema))
    // one-sided bound completed by the sentinel
    assert(verdict(Seq("amount >= 0"), "amount < -5", schema))
    assert(verdict(Seq("n < 10"), "n >= 10", schema))
    // multiple constraints tighten jointly
    assert(verdict(Seq("n >= 5", "n <= 7"), "n > 8", schema))
    // IN list bounded
    assert(verdict(Seq("n IN (1, 2, 3)"), "n > 3", schema))
    // string equality
    assert(verdict(Seq("tier = 'GOLD'"), "tier = 'SILVER'", schema))
    // NOT NULL refutes IS NULL
    assert(verdict(Seq("tier IS NOT NULL"), "tier IS NULL", schema))
    // NOT in the constraint normalizes before bounding
    assert(verdict(Seq("NOT (n > 10)"), "n = 11", schema))
  }

  test("IN-list value sets prune gaps that intervals cannot") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("n", LongType), StructField("tier", StringType)))
    // 'B' lies INSIDE the [A, C] interval but outside the list
    assert(verdict(Seq("tier IN ('A', 'C')"), "tier = 'B'", schema))
    assert(verdict(Seq("tier IN ('A', 'C')"), "tier IN ('B', 'D')", schema))
    // numeric gap, with 3.0 == 3 canonicalization
    assert(verdict(Seq("n IN (1, 3, 5)"), "n = 4", schema))
    assert(!verdict(Seq("n IN (1, 3, 5)"), "n = 3.0", schema))
    // partial overlap stays satisfiable
    assert(!verdict(Seq("tier IN ('A', 'C')"), "tier IN ('C', 'D')", schema))
    // two constraints intersect their sets
    assert(verdict(Seq("tier IN ('A', 'B')", "tier IN ('B', 'C')"),
      "tier = 'A'", schema))
    // OR-shaped predicates never prune through the set path
    assert(!verdict(Seq("tier IN ('A', 'C')"),
      "tier = 'B' OR n > 5", schema))
  }

  test("range windows falling in a gap of the value list prune (NEXT r3 #5)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("n", LongType), StructField("tier", StringType)))
    // [3,5] sits strictly between allowed 1 and 9: each bound alone is
    // satisfiable, the conjunction is not
    assert(verdict(Seq("n IN (1, 9)"), "n >= 3 AND n <= 5", schema))
    assert(verdict(Seq("n IN (1, 9)"), "n > 1 AND n < 9", schema))
    // touching an allowed value keeps the window satisfiable
    assert(!verdict(Seq("n IN (1, 9)"), "n >= 3 AND n <= 9", schema))
    assert(!verdict(Seq("n IN (1, 9)"), "n >= 1 AND n <= 5", schema))
    // one-sided beyond the extremes (also caught by interval reasoning,
    // but must hold through the set path's combined tests)
    assert(verdict(Seq("n IN (1, 9)"), "n > 9", schema))
    assert(verdict(Seq("n IN (1, 9)"), "n < 1", schema))
    // string gap window: 'AB'..'AX' excludes both 'AA' and 'AZ'
    assert(verdict(Seq("tier IN ('AA', 'AZ')"), "tier >= 'AB' AND tier <= 'AX'", schema))
    assert(!verdict(Seq("tier IN ('AA', 'AZ')"), "tier >= 'AB'", schema))
    // mixed: equality + range on the same column combine
    assert(verdict(Seq("n IN (1, 5, 9)"), "n = 5 AND n > 6", schema))
    // literal-on-the-left comparisons flip correctly
    assert(verdict(Seq("n IN (1, 9)"), "3 <= n AND 5 >= n", schema))
    // reversed BETWEEN over a gap with NOT normalization
    assert(verdict(Seq("n IN (1, 9)"), "NOT (n < 3 OR n > 5)", schema))
  }

  test("<> subtraction and per-column OR shapes (NEXT r7 #7)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("n", LongType), StructField("tier", StringType)))
    // <> in the CONSTRAINT subtracts from an established value set
    assert(verdict(Seq("tier IN ('A', 'B')", "tier <> 'B'"),
      "tier = 'B'", schema))
    assert(!verdict(Seq("tier IN ('A', 'B')", "tier <> 'B'"),
      "tier = 'A'", schema))
    // <> alone implies nothing enumerable
    assert(!verdict(Seq("tier <> 'B'"), "tier = 'C'", schema))
    // <> in the PREDICATE excludes the last allowed value
    assert(verdict(Seq("n IN (7)"), "n <> 7", schema))
    assert(verdict(Seq("tier = 'GOLD'"), "tier <> 'GOLD'", schema))
    assert(!verdict(Seq("n IN (7, 8)"), "n <> 7", schema))
    // disjunction windows on ONE column combine
    assert(verdict(Seq("n IN (4, 5)"), "n < 3 OR n > 6", schema))
    assert(!verdict(Seq("n IN (4, 9)"), "n < 3 OR n > 6", schema))
    // an OR with a leg on another column still never excludes
    assert(!verdict(Seq("n IN (4, 5)"), "n < 3 OR tier = 'X'", schema))
  }

  test("LIKE prefix constraints and predicates (NEXT r7 #7)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("n", LongType), StructField("tier", StringType)))
    // CHECK (tier LIKE 'p%') bounds the interval: other prefixes prune
    assert(verdict(Seq("tier LIKE 'GOLD%'"), "tier = 'SILVER'", schema))
    assert(verdict(Seq("tier LIKE 'GOLD%'"), "tier LIKE 'SILV%'", schema))
    assert(!verdict(Seq("tier LIKE 'GOLD%'"), "tier = 'GOLD-PLUS'", schema))
    assert(verdict(Seq("tier LIKE 'GOLD%'"), "tier < 'GOLD'", schema))
    // prefix PREDICATE against a value set
    assert(verdict(Seq("tier IN ('ALPHA', 'CHARLIE')"), "tier LIKE 'B%'", schema))
    assert(!verdict(Seq("tier IN ('ALPHA', 'CHARLIE')"), "tier LIKE 'CH%'", schema))
    // non-prefix patterns imply nothing
    assert(!verdict(Seq("tier LIKE '%GOLD'"), "tier = 'SILVER'", schema))
    assert(!verdict(Seq("tier LIKE 'G_LD%'"), "tier = 'SILVER'", schema))
  }

  test("satisfiable or unsupported shapes never claim a contradiction") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("amount", DoubleType), StructField("tier", StringType)))
    assert(!verdict(Seq("amount >= 0 AND amount < 100"), "amount > 50", schema))
    assert(!verdict(Seq("amount >= 0"), "amount = 0", schema))
    // boundary inclusion: CHECK (x < 3) widens to max <= 3; x = 3 must
    // stay (conservatively) satisfiable
    assert(!verdict(Seq("amount < 3"), "amount = 3", schema))
    // unsupported constraint shape tightens nothing
    assert(!verdict(Seq("length(tier) = 2"), "tier = 'XXX'", schema))
    // one-sided string interval is inert on the missing side
    assert(!verdict(Seq("tier >= 'B'"), "tier > 'Z'", schema))
    // IS NULL on an unconstrained column is unknown
    assert(!verdict(Seq("amount >= 0"), "tier IS NULL", schema))
  }

  test("contradicting read is empty without touching any file") {
    val t = freshTable()
    val df = t.read(col("amount") > 200)
    assert(df.inputFiles.isEmpty)
    assert(df.isEmpty)
  }

  test("one-sided constraint prunes via sentinel bound") {
    val t = freshTable()
    // amount >= 0 alone (lower bound only) must prove amount < -5 empty
    assert(t.read(col("amount") < -5).inputFiles.isEmpty)
    // IS NULL on a NOT NULL column is provably empty
    assert(t.read(col("state").isNull).inputFiles.isEmpty)
  }

  test("satisfiable predicates still scan and return rows") {
    val t = freshTable()
    assert(t.read(col("amount") > 15).count() === 2)
    assert(t.read(col("amount") <= 99).count() === 3)
    // unsupported constraint shapes never block reads
    t.addCheckConstraint("state_len", "length(state) = 2")
    assert(t.read(col("amount") > 15).count() === 2)
  }

  test("string equality constraint prunes other values") {
    val dir = Files.createTempDirectory("cprune-str-").toString
    val t = LakeTable.create(spark, dir,
      Seq((1L, "GOLD"), (2L, "GOLD")).toDF("id", "tier"))
    t.addCheckConstraint("tier_fixed", "tier = 'GOLD'")
    assert(t.read(col("tier") === "SILVER").inputFiles.isEmpty)
    assert(t.read(col("tier") === "GOLD").count() === 2)
  }

  test("SQL filter contradicting constraints optimizes to empty relation") {
    val wh = Files.createTempDirectory("cprune-wh-").toString
    spark.conf.set("spark.sql.catalog.cp", "org.apache.spark.sql.graft.LakeCatalog")
    spark.conf.set("spark.sql.catalog.cp.warehouse", wh)
    Files.createDirectories(Paths.get(s"$wh/db"))
    val t = LakeTable.create(spark, s"$wh/db/t",
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount"))
    t.addCheckConstraint("amount_pos", "amount >= 0")

    val empty = spark.sql("SELECT * FROM cp.db.t WHERE amount < -1")
    assert(empty.queryExecution.optimizedPlan.collectFirst {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }.isDefined, s"expected LocalRelation:\n${empty.queryExecution.optimizedPlan}")
    assert(empty.isEmpty)

    // a join over the pruned branch folds away entirely
    val joined = spark.sql(
      """SELECT a.id FROM cp.db.t a
        |JOIN (SELECT * FROM cp.db.t WHERE amount < -1) b ON a.id = b.id""".stripMargin)
    assert(joined.isEmpty)
    assert(!joined.queryExecution.optimizedPlan.toString.contains("Join"),
      s"join should fold via PropagateEmptyRelation:\n${joined.queryExecution.optimizedPlan}")

    // satisfiable SQL filters still read
    assert(spark.sql("SELECT * FROM cp.db.t WHERE amount > 15").count() === 1)
  }
}
