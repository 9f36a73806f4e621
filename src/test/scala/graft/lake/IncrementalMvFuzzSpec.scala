package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized refresh-vs-recompute for the incremental materialized
  * view: random source DML (inserts with null keys and null values,
  * extremum deletes, group-moving updates, merge upserts) interleaved
  * with refreshes at random points — after every refresh the view must
  * equal [[IncrementalMv.aggregate]] recomputed from the source. The
  * targeted spec pins each maintenance rule; this pins their
  * COMPOSITIONS (a group vanishing and reappearing across one delta,
  * the max leaving while the min arrives, multi-commit deltas folded in
  * one refresh). Values are integral doubles so incremental `old + Δ`
  * arithmetic is FP-exact against the recompute.
  */
class IncrementalMvFuzzSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private val groups = Seq("A", "B", "C", null)

  private def rows(rnd: scala.util.Random, n: Int, from: Long) =
    (0 until n).map { j =>
      (Long.box(from + j),
        groups(rnd.nextInt(groups.length)),
        if (rnd.nextInt(6) == 0) null
        else Double.box(rnd.nextInt(100).toDouble))
    }

  private def viewRows(df: org.apache.spark.sql.DataFrame) =
    df.select("g", "n", "sum_x", "nn_x", "min_x", "max_x").collect()
      .map(r => (Option(r.get(0)), r.getLong(1),
        Option(r.get(2)), r.getLong(3), Option(r.get(4)), Option(r.get(5))))
      .toSet

  for (seed <- Seq(81L, 82L)) {
    test(s"refresh == full recompute across random DML (seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val root = Files.createTempDirectory(s"mv-fuzz-$seed-").toString
      val src = LakeTable.create(spark, s"$root/src",
        rows(rnd, 30, 0).toDF("id", "g", "x").repartition(2),
        properties = Map(Cdc.PROP -> "true"))
      IncrementalMv.create(spark, s"$root/mv", s"$root/src",
        groupBy = Seq("g"), sumCols = Seq("x"), minMaxCols = Seq("x"))
      var nextId = 1000L
      var refreshes = 0

      (1 to 12).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 =>
            val n = 1 + rnd.nextInt(4)
            src.append(rows(rnd, n, nextId).toDF("id", "g", "x"))
            nextId += n
          case 1 =>
            val m = 3 + rnd.nextInt(7)
            src.delete(pmod(col("id"), lit(m)) === rnd.nextInt(m))
          case 2 =>
            val m = 3 + rnd.nextInt(7)
            if (rnd.nextBoolean())
              src.update(pmod(col("id"), lit(m)) === rnd.nextInt(m),
                Map("x" -> (coalesce(col("x"), lit(0.0)) + rnd.nextInt(40))))
            else // group move
              src.update(pmod(col("id"), lit(m)) === rnd.nextInt(m),
                Map("g" -> lit(groups(rnd.nextInt(3)))))
          case 3 =>
            val batch = (Seq.fill(3) {
              if (rnd.nextBoolean()) rnd.nextInt(30).toLong
              else { nextId += 1; nextId }
            }).distinct.map(id => (Long.box(id),
              groups(rnd.nextInt(groups.length)),
              Double.box(rnd.nextInt(100).toDouble)))
            src.merge(batch.toDF("id", "g", "x"), expr("t.id = s.id"))
        }
        if (rnd.nextBoolean()) {
          IncrementalMv.refresh(spark, s"$root/mv")
          refreshes += 1
          val got = viewRows(LakeTable.forPath(spark, s"$root/mv").toDF)
          val want = viewRows(IncrementalMv.aggregate(
            src.toDF, Seq("g"), Seq("x"), Seq("x")))
          assert(got === want, s"seed $seed after refresh #$refreshes")
        }
      }
      IncrementalMv.refresh(spark, s"$root/mv")
      val got = viewRows(LakeTable.forPath(spark, s"$root/mv").toDF)
      val want = viewRows(IncrementalMv.aggregate(
        src.toDF, Seq("g"), Seq("x"), Seq("x")))
      assert(got === want, s"seed $seed: final state diverged")
      assert(refreshes >= 2, "fixture should refresh mid-sequence")
    }
  }
}
