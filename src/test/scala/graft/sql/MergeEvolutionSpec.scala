package graft.sql

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.lake.LakeTable

/** MERGE WITH SCHEMA EVOLUTION (Spark 4's native clause): source-only
  * columns evolve the target schema through the catalog's ALTER before
  * the merge rewrites rows — old rows read NULL for the new column,
  * merged rows carry the source value.
  */
class MergeEvolutionSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("WITH SCHEMA EVOLUTION adds source-only columns through the catalog") {
    val wh = Files.createTempDirectory("mev-wh-").toString
    spark.conf.set("spark.sql.catalog.mev", "org.apache.spark.sql.graft.LakeCatalog")
    spark.conf.set("spark.sql.catalog.mev.warehouse", wh)
    Files.createDirectories(Paths.get(s"$wh/db"))
    LakeTable.create(spark, s"$wh/db/t",
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    Seq((2L, "B", 20.0), (4L, "D", 40.0)).toDF("id", "v", "score")
      .createOrReplaceTempView("mev_src")

    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO mev.db.t t USING mev_src s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    val t = LakeTable.forPath(spark, s"$wh/db/t")
    assert(t.snapshot.schema.fieldNames.toSeq === Seq("id", "v", "score"))
    val got = t.toDF.orderBy("id")
      .as[(Long, String, Option[Double])].collect().toSeq
    assert(got === Seq(
      (1L, "a", None), (2L, "B", Some(20.0)),
      (3L, "c", None), (4L, "D", Some(40.0))))
  }

  test("Scala API: mergeClauses(schemaEvolution = true)") {
    val dir = Files.createTempDirectory("mev-scala-").toString
    val t = LakeTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    t.mergeClauses(
      Seq((1L, "A", 9L), (2L, "b", 2L)).toDF("id", "v", "extra").alias("s"),
      expr("t.id = s.id"),
      matchedClauses = Seq(graft.lake.MergeClause.Update(None, Map.empty)),
      notMatchedClauses = Seq(graft.lake.MergeClause.Insert(None, Map.empty)),
      notMatchedBySourceClauses = Seq.empty,
      schemaEvolution = true)
    assert(t.snapshot.schema.fieldNames.toSeq === Seq("id", "v", "extra"))
    assert(t.toDF.orderBy("id").as[(Long, String, Option[Long])].collect().toSeq
      === Seq((1L, "A", Some(9L)), (2L, "b", Some(2L))))
  }

  test("a source column differing only in case does not duplicate") {
    val dir = Files.createTempDirectory("mev-case-").toString
    val t = LakeTable.create(spark, dir, Seq((1L, 2.0)).toDF("id", "score"))
    t.mergeClauses(
      Seq((1L, 9.0), (2L, 3.0)).toDF("id", "Score").alias("s"),
      expr("t.id = s.id"),
      matchedClauses = Seq(graft.lake.MergeClause.Update(None, Map.empty)),
      notMatchedClauses = Seq(graft.lake.MergeClause.Insert(None, Map.empty)),
      notMatchedBySourceClauses = Seq.empty,
      schemaEvolution = true)
    assert(t.snapshot.schema.fieldNames.toSeq === Seq("id", "score"),
      "case-variant column must not become a duplicate")
    assert(t.toDF.orderBy("id").as[(Long, Double)].collect().toSeq
      === Seq((1L, 9.0), (2L, 3.0)))
  }

  test("explicit-assignment merges evolve only assigned source columns") {
    val dir = Files.createTempDirectory("mev-narrow-").toString
    val t = LakeTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    // source carries TWO new columns; the clauses assign only `extra` —
    // `junk` must not widen the target (no clause ever writes it)
    t.mergeClauses(
      Seq((1L, "A", 9L, 1.0), (2L, "b", 2L, 2.0))
        .toDF("id", "v", "extra", "junk").alias("s"),
      expr("t.id = s.id"),
      matchedClauses = Seq(graft.lake.MergeClause.Update(None,
        Map("v" -> expr("s.v"), "extra" -> expr("s.extra")))),
      notMatchedClauses = Seq(graft.lake.MergeClause.Insert(None,
        Map("id" -> expr("s.id"), "v" -> expr("s.v"),
          "extra" -> expr("s.extra")))),
      notMatchedBySourceClauses = Seq.empty,
      schemaEvolution = true)
    assert(t.snapshot.schema.fieldNames.toSeq === Seq("id", "v", "extra"),
      "only the assigned source-only column evolves")
    assert(t.toDF.orderBy("id").as[(Long, String, Option[Long])].collect().toSeq
      === Seq((1L, "A", Some(9L)), (2L, "b", Some(2L))))
  }

  test("without the clause, extra source columns do not evolve the schema") {
    val wh = Files.createTempDirectory("mev2-wh-").toString
    spark.conf.set("spark.sql.catalog.mev2", "org.apache.spark.sql.graft.LakeCatalog")
    spark.conf.set("spark.sql.catalog.mev2.warehouse", wh)
    Files.createDirectories(Paths.get(s"$wh/db"))
    LakeTable.create(spark, s"$wh/db/t",
      Seq((1L, "a")).toDF("id", "v"))
    Seq((1L, "A", 1.0)).toDF("id", "v", "score")
      .createOrReplaceTempView("mev2_src")
    spark.sql(
      """MERGE INTO mev2.db.t t USING mev2_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    val t = LakeTable.forPath(spark, s"$wh/db/t")
    assert(t.snapshot.schema.fieldNames.toSeq === Seq("id", "v"))
    assert(t.toDF.as[(Long, String)].collect().toSeq === Seq((1L, "A")))
  }
}
