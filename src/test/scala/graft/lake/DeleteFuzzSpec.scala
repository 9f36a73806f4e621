package graft.lake

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized DELETE soundness: for the same adversarial predicate zoo
  * as [[SkippingFuzzSpec]], `delete(pred)` must remove EXACTLY the rows
  * where the predicate is TRUE (NULL keeps the row — SQL semantics),
  * across every internal route a delete can take: full-file metadata
  * removes, deletion-vector sidecars, partial rewrites, and the
  * stats-pruned candidate location in front of them. The reference is
  * computed from the pre-delete state each step, so one unsound skip or
  * a mis-classified file surfaces as a row-count/content divergence.
  */
class DeleteFuzzSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private val strings = Seq(
    "", "a", "abc", "UTC+8", "zz", "￿", "a b", "%wild_")

  private def rows(rnd: scala.util.Random, n: Int, from: Int): Seq[FuzzRow] =
    (0 until n).map { j =>
      def nul[T >: Null](v: T): T = if (rnd.nextInt(10) == 0) null else v
      FuzzRow(
        Int.box(from + j), // unique key, never null — identifies rows
        nul(Long.box(rnd.nextLong() % 1000L)),
        nul(Double.box(math.rint(rnd.nextDouble() * 200 - 100) / 10)),
        nul(strings(rnd.nextInt(strings.length))),
        nul(Date.valueOf(f"2024-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d")),
        nul(Timestamp.valueOf(
          f"2024-06-${1 + rnd.nextInt(28)}%02d 0${rnd.nextInt(10)}:00:00")),
        nul(new java.math.BigDecimal(rnd.nextInt(2000) - 1000).movePointLeft(2)))
    }

  private def atom(rnd: scala.util.Random): Column = {
    def sLit = strings(rnd.nextInt(strings.length))
    rnd.nextInt(10) match {
      case 0 => col("i") % 7 === rnd.nextInt(7)
      case 1 => col("i") > rnd.nextInt(160)
      case 2 => col("l") <= rnd.nextLong() % 1000L
      case 3 => col("d") < math.rint(rnd.nextDouble() * 220 - 110) / 10
      case 4 => col("s") === sLit
      case 5 => col("s") >= sLit
      case 6 => col("s").startsWith(sLit.take(1))
      case 7 => col("dt") > Date.valueOf(f"2024-${1 + rnd.nextInt(12)}%02d-15")
      case 8 => col("s").isNull
      case 9 => col("dec") ===
        new java.math.BigDecimal(rnd.nextInt(2200) - 1100).movePointLeft(2)
    }
  }

  private def predicate(rnd: scala.util.Random): Column = {
    def a = { val x = atom(rnd); if (rnd.nextInt(4) == 0) !x else x }
    rnd.nextInt(3) match {
      case 0 => a
      case 1 => a && a
      case 2 => a || a
    }
  }

  for ((seed, useDvs) <- Seq((41L, true), (42L, true), (43L, false))) {
    test(s"random deletes remove exactly the TRUE rows " +
        s"(seed $seed${if (useDvs) ", DVs" else ", rewrite-only"})") {
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"del-fuzz-$seed-").toString
      val t = LakeTable.create(spark, dir,
        rows(rnd, 70, 0).toDF().coalesce(3))
      t.append(rows(rnd, 50, 1000).toDF().coalesce(2))

      (1 to 8).foreach { k =>
        val pred = predicate(rnd)
        val before = t.toDF.cache()
        val expectKeys = before.where(coalesce(pred, lit(false)))
          .select("i").as[Int].collect().toSet
        val expectSurvive = before.count() - expectKeys.size
        val deleted = t.delete(pred, useDvs = useDvs)
        val after = t.toDF.select("i").as[Int].collect()
        before.unpersist()
        assert(deleted === expectKeys.size.toLong,
          s"#$k $pred: reported $deleted, expected ${expectKeys.size}")
        assert(after.length === expectSurvive, s"#$k $pred: surviving count")
        assert(after.toSet.intersect(expectKeys).isEmpty,
          s"#$k $pred: rows that matched the predicate survived")
        // occasionally re-fill so later predicates still have rows
        if (t.toDF.count() < 40)
          t.append(rows(rnd, 40, 2000 + k * 100).toDF().coalesce(2))
      }
    }
  }
}
