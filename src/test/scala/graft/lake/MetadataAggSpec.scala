package graft.lake

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Metadata-only aggregates ([[org.apache.spark.sql.graft.LakeMetadataAggRule]]):
  * count/min/max answered from commit-log stats without scanning, and
  * the bail-outs that keep the answers exact.
  */
class MetadataAggSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("metaagg-wh-").toString
    spark.conf.set("spark.sql.catalog.ma", "org.apache.spark.sql.graft.LakeCatalog")
    spark.conf.set("spark.sql.catalog.ma.warehouse", w)
    Files.createDirectories(Paths.get(s"$w/db"))
    w
  }

  private def isMetadataOnly(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collectFirst {
      case _: LocalRelation => ()
    }.nonEmpty &&
      df.queryExecution.optimizedPlan.collectFirst {
        case s if s.nodeName.contains("Relation") && !s.isInstanceOf[LocalRelation] => s
      }.isEmpty

  private def fixture(name: String): LakeTable = {
    warehouse
    val df = Seq(
      (1L, 10.0, Option("x")), (2L, -5.5, None),
      (3L, 99.25, Option("y")), (4L, 0.0, Option("z")))
      .toDF("id", "v", "s")
    val t = LakeTable.create(spark, s"$warehouse/db/$name", df)
    t.append(Seq((5L, 7.5, Option("w"))).toDF("id", "v", "s"))
    t
  }

  test("count(*), count(col), min, max fold from the log — no scan") {
    fixture("t1")
    val q = spark.sql(
      "SELECT count(*) AS n, count(s) AS ns, min(id) AS mi, max(id) AS mx FROM ma.db.t1")
    assert(isMetadataOnly(q), s"expected metadata-only:\n${q.queryExecution.optimizedPlan}")
    val r = q.collect().head
    assert(r.getLong(0) === 5)
    assert(r.getLong(1) === 4) // one null in s
    assert(r.getLong(2) === 1L)
    assert(r.getLong(3) === 5L)
    // float/double and count(NULL) deliberately bail (NaN/Infinity and
    // SQL-null semantics a stats fold can't prove) — but stay correct
    val qv = spark.sql("SELECT min(v) AS mn, count(NULL) AS cn FROM ma.db.t1")
    assert(!isMetadataOnly(qv))
    val rv = qv.collect().head
    assert(rv.getDouble(0) === -5.5 && rv.getLong(1) === 0L)
  }

  test("deletion vectors: count(*) subtracts, min/max bails to the scan") {
    warehouse
    // one 5-row file so a single-row delete is under dvMaxFraction → DV
    val t = LakeTable.create(spark, s"$warehouse/db/t2", Seq(
      (1L, 10.0, Option("x")), (2L, -5.5, None), (3L, 99.25, Option("y")),
      (4L, 0.0, Option("z")), (5L, 7.5, Option("w")))
      .toDF("id", "v", "s").coalesce(1))
    t.delete($"id" === 5) // DV masks the max of id
    assert(t.snapshot.files.exists(f => f.dvPath.isDefined || f.dvInline.isDefined),
      "fixture must actually create a deletion vector")
    val cnt = spark.sql("SELECT count(*) AS n FROM ma.db.t2")
    assert(isMetadataOnly(cnt), "count(*) should still fold (DV cardinality)")
    assert(cnt.as[Long].head() === 4)
    val mx = spark.sql("SELECT max(id) AS mx FROM ma.db.t2")
    assert(!isMetadataOnly(mx), "max over a DV'd table must scan")
    assert(mx.as[Long].head() === 4L) // id=5 was deleted
  }

  test("string min/max folds from short bounds, matching Spark's binary order") {
    fixture("t3")
    val q = spark.sql("SELECT min(s) AS m, max(s) AS x FROM ma.db.t3")
    assert(isMetadataOnly(q), s"string bounds should fold:\n${q.queryExecution.optimizedPlan}")
    val r = q.collect().head
    assert(r.getString(0) === "w" && r.getString(1) === "z")
    // non-ASCII: parquet's byte order == Spark's UTF8_BINARY order —
    // the fold MUST agree with the scan ("éclair" > "zzz" by bytes)
    LakeTable.create(spark, s"$warehouse/db/t3u",
      Seq((1L, "abc"), (2L, "éclair"), (3L, "zzz")).toDF("id", "s"))
    val qu = spark.sql("SELECT max(s) AS m FROM ma.db.t3u")
    assert(isMetadataOnly(qu))
    assert(qu.as[String].head() === "éclair")
    // bounds long enough to be truncation artifacts are not trusted
    LakeTable.create(spark, s"$warehouse/db/t3l",
      Seq((1L, "a" * 80), (2L, "b" * 80)).toDF("id", "s"))
    val ql = spark.sql("SELECT max(s) AS m FROM ma.db.t3l")
    assert(!isMetadataOnly(ql))
    assert(ql.as[String].head() === "b" * 80)
  }

  test("filters, grouping, and distinct keep the scan") {
    fixture("t4")
    assert(!isMetadataOnly(
      spark.sql("SELECT count(*) AS n FROM ma.db.t4 WHERE id > 2")))
    assert(!isMetadataOnly(
      spark.sql("SELECT s, count(*) AS n FROM ma.db.t4 GROUP BY s")))
    assert(!isMetadataOnly(
      spark.sql("SELECT count(DISTINCT id) AS n FROM ma.db.t4")))
    // and the values are right anyway
    assert(spark.sql("SELECT count(*) AS n FROM ma.db.t4 WHERE id > 2")
      .as[Long].head() === 3)
  }

  test("time travel answers from the pinned snapshot") {
    val t = fixture("t5") // v0 create, v1 append
    t.delete($"id" <= 2, useDvs = false) // v2
    val now = spark.sql("SELECT count(*) AS n FROM ma.db.t5")
    assert(isMetadataOnly(now) && now.as[Long].head() === 3)
    val v1 = spark.sql("SELECT count(*) AS n FROM ma.db.t5 VERSION AS OF 1")
    assert(isMetadataOnly(v1), "time-travel count should fold from its snapshot")
    assert(v1.as[Long].head() === 5)
  }

  test("Dataset.count() folds too") {
    fixture("t6")
    val df = spark.table("ma.db.t6")
    assert(df.count() === 5)
    // all-null column: min is provably null from nullCount == numRecords
    val t = LakeTable.create(spark, s"$warehouse/db/t7",
      Seq((1L, Option.empty[java.lang.Long]), (2L, None)).toDF("id", "v"))
    val q = spark.sql("SELECT min(v) AS m, count(v) AS n FROM ma.db.t7")
    assert(isMetadataOnly(q), s"all-null min should fold:\n${q.queryExecution.optimizedPlan}")
    val r = q.collect().head
    assert(r.isNullAt(0) && r.getLong(1) === 0)
  }
}
