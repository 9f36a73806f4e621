package graft.lake

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized soundness harness for constraint-implied pruning
  * ([[Stats.contradictsConstraints]], the engine behind
  * LakeConstraintPruneRule): whenever the evaluator declares a
  * predicate CONTRADICTED by a constraint set, no row satisfying the
  * constraints may satisfy the predicate. Checked against a brute-force
  * row universe filtered by the same constraint expressions — any
  * unsound "provably empty" claim surfaces as a surviving row.
  */
class ConstraintFuzzSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private val strs = Seq("a", "b", "m", "UTC+8", "zz", "zb")

  /** Small but adversarial row universe: grid over ints, doubles,
    * strings, plus nulls. */
  private lazy val universe = {
    val ints = (-5 to 25).map(Int.box) :+ null.asInstanceOf[Integer]
    val strsN = strs :+ null.asInstanceOf[String]
    val ds = Seq(-2.5, 0.0, 3.3, 7.0, 19.9).map(Double.box) :+
      null.asInstanceOf[java.lang.Double]
    for (i <- ints; s <- strsN; d <- ds)
      yield (i, s, d)
  }

  private def randomConstraint(rnd: scala.util.Random): Column =
    rnd.nextInt(8) match {
      case 0 => col("i") > rnd.nextInt(20) - 5
      case 1 => col("i") <= rnd.nextInt(20)
      case 2 => col("i").isin(Seq.fill(2 + rnd.nextInt(3))(rnd.nextInt(20)): _*)
      case 3 => col("s").isin(strs(rnd.nextInt(strs.length)),
        strs(rnd.nextInt(strs.length)))
      case 4 => col("s") >= strs(rnd.nextInt(strs.length))
      case 5 => col("s").startsWith(strs(rnd.nextInt(strs.length)).take(1))
      case 6 => col("d") < rnd.nextInt(15).toDouble
      case 7 => col("i").isNotNull
    }

  private def randomPred(rnd: scala.util.Random): Column = {
    def a: Column = rnd.nextInt(9) match {
      case 0 => col("i") === rnd.nextInt(40) - 10
      case 1 => col("i") > rnd.nextInt(40) - 10
      case 2 => col("i") < rnd.nextInt(20) - 8
      case 3 => col("s") === strs(rnd.nextInt(strs.length))
      case 4 => col("s") < strs(rnd.nextInt(strs.length))
      case 5 => col("s").like(strs(rnd.nextInt(strs.length)).take(1) + "%")
      case 6 => col("d") >= rnd.nextInt(30).toDouble - 5
      case 7 => col("i").isNull
      case 8 => col("i").isin(rnd.nextInt(30), rnd.nextInt(30))
    }
    rnd.nextInt(4) match {
      case 0 => a
      case 1 => a && a
      case 2 => a || a
      case 3 => !a
    }
  }

  private def resolve(c: Column) = {
    import org.apache.spark.sql.catalyst.optimizer.{ConstantFolding, ReplaceExpressions}
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val schema = df.schema
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    ConstantFolding(ReplaceExpressions(empty.where(c).queryExecution.analyzed))
      .collectFirst { case f: Filter => f.condition }
      .getOrElse(org.apache.spark.sql.catalyst.expressions.Literal(true))
  }

  private lazy val df = universe.toDF("i", "s", "d").cache()

  for (seed <- Seq(21L, 22L, 23L)) {
    test(s"contradiction claims are sound over a brute-force universe (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      var contradictionsSeen = 0
      (1 to 60).foreach { k =>
        val constraintCols = Seq.fill(1 + rnd.nextInt(2))(randomConstraint(rnd))
        val pred = randomPred(rnd)
        val constraints = constraintCols.map(resolve)
        if (Stats.contradictsConstraints(resolve(pred), constraints, df.schema)) {
          contradictionsSeen += 1
          // every row passing ALL constraints must fail the predicate —
          // CHECK semantics let NULL (unknown) pass, hence coalesce(true)
          val survivors = constraintCols
            .foldLeft(df)((d, c) => d.where(coalesce(c, lit(true))))
            .where(pred).count()
          assert(survivors === 0L,
            s"#$k: claimed contradiction but $survivors row(s) satisfy " +
              s"constraints ${constraintCols.mkString(" AND ")} and " +
              s"predicate $pred")
        }
      }
      // the universe and generators are tuned so some contradictions
      // occur; if none do, the test proves nothing
      assert(contradictionsSeen > 0,
        "no contradiction was ever claimed — harness is vacuous")
    }
  }
}
