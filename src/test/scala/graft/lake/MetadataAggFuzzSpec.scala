package graft.lake

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized equivalence for the metadata-only aggregate rule: global
  * `count(*) / count(c) / min(c) / max(c)` through the catalog — where
  * the rule may answer from the commit log — must equal the same
  * aggregates computed by a forced scan, over random tables with
  * nulls, negatives, unicode strings, dates/timestamps, floats and
  * decimals (where the rule must BAIL, not approximate). Also asserts
  * the rule genuinely fires on a scan-free plan at least once, so the
  * harness can't pass by always falling back.
  */
class MetadataAggFuzzSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private val strings = Seq(
    "", "a", "zz", "￿", new String(Character.toChars(0x1F600)), "UTC+8")

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("maf-wh-").toString
    spark.conf.set("spark.sql.catalog.maf", "org.apache.spark.sql.graft.LakeCatalog")
    spark.conf.set("spark.sql.catalog.maf.warehouse", w)
    Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    w
  }

  private def rows(rnd: scala.util.Random, n: Int) =
    (0 until n).map { _ =>
      def nul[T >: Null](v: T): T = if (rnd.nextInt(7) == 0) null else v
      (nul(Int.box(rnd.nextInt(200) - 100)),
        nul(Double.box(rnd.nextDouble() * 50 - 25)),
        nul(strings(rnd.nextInt(strings.length))),
        nul(Date.valueOf(f"202${rnd.nextInt(5)}-0${1 + rnd.nextInt(9)}-1${rnd.nextInt(9)}")),
        nul(Timestamp.valueOf(f"2024-03-0${1 + rnd.nextInt(9)} 0${rnd.nextInt(9)}:30:00")),
        nul(new java.math.BigDecimal(rnd.nextInt(999) - 500).movePointLeft(1)))
    }

  private val aggSql =
    "count(*) AS c0, count(i) AS c1, min(i) AS mi, max(i) AS ma, " +
      "min(s) AS ms, max(s) AS mxs, min(dt) AS md, max(dt) AS mxd, " +
      "min(ts) AS mt, max(ts) AS mxt, count(dec) AS cd, " +
      "min(d) AS mdd, max(d) AS mxdd, min(dec) AS mde, max(dec) AS mxde"

  test("catalog aggregates equal forced-scan aggregates on random tables") {
    var sawFold = false
    for (seed <- Seq(101L, 102L, 103L)) {
      val rnd = new scala.util.Random(seed)
      val name = s"t$seed"
      val t = LakeTable.create(spark, s"$warehouse/db/$name",
        rows(rnd, 50).toDF("i", "d", "s", "dt", "ts", "dec").coalesce(2))
      t.append(rows(rnd, 40).toDF("i", "d", "s", "dt", "ts", "dec").coalesce(3))

      val viaCatalog = spark.sql(s"SELECT $aggSql FROM maf.db.$name")
      // the scan-only reference: aggregate the engine's own read plan
      val viaScan = t.toDF.selectExpr(aggSql.split(", ").toIndexedSeq: _*)
      assert(viaCatalog.collect().toSeq === viaScan.collect().toSeq,
        s"seed $seed: metadata answer diverges from the scan")

      // foldability probe on the FOLDABLE subset only (the full query
      // carries double/decimal min/max, which bail the rule by design —
      // one unfoldable expression keeps the whole query on the scan)
      val foldable =
        "count(*) AS c0, count(i) AS c1, min(i) AS mi, max(i) AS ma, " +
          "min(s) AS ms, max(s) AS mxs, min(dt) AS md, max(ts) AS mxt"
      val probe = spark.sql(s"SELECT $foldable FROM maf.db.$name")
      assert(probe.collect().toSeq ===
        t.toDF.selectExpr(foldable.split(", ").toIndexedSeq: _*).collect().toSeq,
        s"seed $seed: foldable subset diverges")
      val folded = probe.queryExecution.optimizedPlan.collectLeaves()
        .forall(_.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.logical.LocalRelation])
      if (folded) sawFold = true

      // after a DV delete the row-level answers must STILL be equal
      // (count(*) subtracts cardinality; min/max bail to the scan)
      t.delete(col("i") > 50)
      val afterCat = spark.sql(s"SELECT $aggSql FROM maf.db.$name")
      val afterScan = t.toDF.selectExpr(aggSql.split(", ").toIndexedSeq: _*)
      assert(afterCat.collect().toSeq === afterScan.collect().toSeq,
        s"seed $seed post-delete: metadata answer diverges")
    }
    assert(sawFold, "the rule never folded a query — harness is vacuous")
  }
}
