package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized UPDATE soundness, completing the DML fuzz trio
  * ([[DeleteFuzzSpec]], [[MergeCascadeFuzzSpec]]): for adversarial
  * predicates over multi-file tables, `update(pred, set)` must rewrite
  * EXACTLY the rows where the predicate is TRUE (NULL keeps the row
  * unchanged) and leave every other row bit-identical — across the
  * stats-pruned candidate location, DV claiming, and rewrite routes.
  * The expected state is computed from the pre-update snapshot per
  * step, so an unsound skip (row silently not updated) and an
  * over-claim (row updated that should not be) both surface.
  */
class UpdateFuzzSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private val strings = Seq("", "a", "abc", "UTC+8", "zz", "￿", "a b")

  private def rows(rnd: scala.util.Random, n: Int, from: Int) =
    (0 until n).map { j =>
      def nulS(v: String): String = if (rnd.nextInt(8) == 0) null else v
      (Long.box(from + j),
        Double.box(math.rint(rnd.nextDouble() * 200 - 100) / 10),
        nulS(strings(rnd.nextInt(strings.length))))
    }

  /** (predicate, model-truth over (id, v, s)); null handling mirrors
    * SQL (a NULL verdict keeps the row). */
  private def predicate(rnd: scala.util.Random)
      : (Column, (Long, Double, String) => Boolean) = {
    def one: (Column, (Long, Double, String) => Boolean) = rnd.nextInt(6) match {
      case 0 =>
        val k = math.rint(rnd.nextDouble() * 220 - 110) / 10
        (col("v") < k, (_, v, _) => v < k)
      case 1 =>
        val k = strings(rnd.nextInt(strings.length))
        (col("s") === k, (_, _, s) => s != null && s == k)
      case 2 =>
        val k = strings(rnd.nextInt(strings.length))
        (col("s") >= k, (_, _, s) => s != null && Stats.strCmp(s, k) >= 0)
      case 3 =>
        val p = strings(rnd.nextInt(strings.length)).take(1)
        (col("s").startsWith(p), (_, _, s) => s != null && s.startsWith(p))
      case 4 => (col("s").isNull, (_, _, s) => s == null)
      case 5 =>
        val k = rnd.nextInt(40)
        (pmod(col("id"), lit(40)) === k,
          (id, _, _) => ((id % 40) + 40) % 40 == k)
    }
    val (c1, m1) = one
    val (c2, m2) = one
    rnd.nextInt(3) match {
      case 0 => (c1, m1)
      case 1 => (c1 && c2, (id, v, s) => m1(id, v, s) && m2(id, v, s))
      case 2 => (c1 || c2, (id, v, s) => m1(id, v, s) || m2(id, v, s))
    }
  }

  for ((seed, useDvs) <- Seq((61L, true), (62L, false))) {
    test(s"random updates rewrite exactly the TRUE rows " +
        s"(seed $seed${if (useDvs) ", DVs" else ", rewrite-only"})") {
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"upd-fuzz-$seed-").toString
      val t = LakeTable.create(spark, dir,
        rows(rnd, 60, 0).toDF("id", "v", "s").coalesce(3))
      t.append(rows(rnd, 40, 1000).toDF("id", "v", "s").coalesce(2))
      val model = scala.collection.mutable.Map[Long, (Double, String)]()
      t.toDF.collect().foreach(r =>
        model(r.getLong(0)) = (r.getDouble(1), r.getString(2)))

      (1 to 8).foreach { k =>
        val (pred, truth) = predicate(rnd)
        val delta = rnd.nextInt(50) + 1
        t.update(pred, Map("v" -> (col("v") + delta)),
          useDvs = useDvs)
        model.keys.toSeq.foreach { id =>
          val (v, s) = model(id)
          if (truth(id, v, s)) model(id) = (v + delta, s)
        }
        val got = t.toDF.collect()
          .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
        assert(got === model.toMap, s"#$k $pred (+$delta) diverged")
      }
    }
  }
}
