package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Metadata-only column RENAME/DROP via parquet field ids (the
  * column-mapping semantics the reference demos with TBLPROPERTIES,
  * `02.delta_lake_primer.py:238-242`): no data files are rewritten, old
  * files resolve by field id, dropped ids are never resurrected.
  */
class ColumnMappingSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("colmap-").toString

  test("rename is metadata-only and old files read under the new name") {
    val path = tmp()
    val t = LakeTable.create(spark, path,
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount"))
    val filesBefore = t.snapshot.files.map(_.path).toSet

    t.alterRenameColumn("amount", "total")
    assert(t.snapshot.files.map(_.path).toSet === filesBefore) // no rewrite
    assert(t.toDF.columns.toSeq === Seq("id", "total"))
    assert(t.toDF.orderBy("id").select("total").as[Double].collect().toSeq ===
      Seq(10.0, 20.0)) // old files resolved by field id

    // appends after the rename interleave with pre-rename files
    t.append(Seq((3L, 30.0)).toDF("id", "total"))
    assert(t.toDF.orderBy("id").select("total").as[Double].collect().toSeq ===
      Seq(10.0, 20.0, 30.0))

    // filters (incl. stats skipping) stay correct across old+new files
    assert(t.read(col("total") > 15.0).count() === 2)
  }

  test("drop is metadata-only; freed-name reuse is refused while old files live") {
    val path = tmp()
    val t = LakeTable.create(spark, path,
      Seq((1L, "secret1", 1.0), (2L, "secret2", 2.0)).toDF("id", "s", "v"))
    t.alterDropColumn("s")
    assert(t.toDF.columns.toSeq === Seq("id", "v"))
    // dropped data stays invisible (field id retired)
    assert(!t.toDF.columns.contains("s"))

    // re-adding the SAME name is refused while pre-drop files are live:
    // a fresh field id keeps the DATA invisible, but those files'
    // name-keyed stats (nullCount(s)=0) would prove `s IS NULL` empty
    // even though every old row reads NULL for the new field — lost rows
    val e = intercept[IllegalArgumentException](t.alterAddColumn("s", "STRING"))
    assert(e.getMessage.contains("name-keyed stats"))

    // an overwrite retires every old-era file; the name becomes
    // reusable, reads NULL-correct, and new writes land normally
    t.overwrite(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"))
    t.alterAddColumn("s", "STRING")
    assert(t.toDF.where($"s".isNull).count() === 2)
    val rows = t.toDF.orderBy("id").select("s").as[String].collect().toSeq
    assert(rows === Seq(null, null), s"dropped data resurfaced: $rows")
    t.append(Seq((3L, 3.0, "fresh")).toDF("id", "v", "s"))
    assert(t.toDF.where($"s" === "fresh").count() === 1)
  }

  test("rename survives DML rewrites and time travel") {
    val path = tmp()
    val t = LakeTable.create(spark, path,
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "amount"))
    t.alterRenameColumn("amount", "total")
    t.update(col("id") === 2L, Map("total" -> lit(25.0)))
    assert(t.toDF.orderBy("id").select("total").as[Double].collect().toSeq ===
      Seq(10.0, 25.0, 30.0))
    // pre-rename version still reads under the OLD name
    val v0 = t.asOf(0)
    assert(v0.toDF.columns.toSeq === Seq("id", "amount"))
    assert(v0.toDF.orderBy("id").select("amount").as[Double].collect().toSeq ===
      Seq(10.0, 20.0, 30.0))
  }

  test("partition columns cannot be renamed or dropped") {
    val path = tmp()
    val t = LakeTable.create(spark, path,
      Seq((1L, "CA", 1.0)).toDF("id", "state", "v"), partitionBy = Seq("state"))
    intercept[IllegalArgumentException](t.alterRenameColumn("state", "region"))
    intercept[IllegalArgumentException](t.alterDropColumn("state"))
  }

  test("SQL ALTER TABLE RENAME/DROP COLUMN through the catalog") {
    val wh = Files.createTempDirectory("colmap-wh-").toString
    spark.conf.set("spark.sql.catalog.cm", "org.apache.spark.sql.graft.LakeCatalog")
    spark.conf.set("spark.sql.catalog.cm.warehouse", wh)
    Files.createDirectories(java.nio.file.Paths.get(s"$wh/db"))
    spark.sql(
      "CREATE TABLE cm.db.t AS SELECT * FROM VALUES (1, 'x', 1.5D), (2, 'y', 2.5D) v(id, tag, score)")
    spark.sql("ALTER TABLE cm.db.t RENAME COLUMN score TO rating")
    assert(spark.sql("SELECT rating FROM cm.db.t ORDER BY id")
      .as[Double].collect().toSeq === Seq(1.5, 2.5))
    spark.sql("ALTER TABLE cm.db.t DROP COLUMN tag")
    assert(spark.sql("SELECT * FROM cm.db.t").columns.toSeq === Seq("id", "rating"))
  }
}
