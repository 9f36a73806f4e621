package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Iceberg-style hidden partitioning: `PARTITIONED BY (year(d))` lays
  * files out under synthetic `__pt_year_d=YYYY` directories, the source
  * column stays in the data files, and the recorded value gives the
  * skipping evaluator a source-column range even without footer stats.
  */
class TransformPartitionSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def dated(lo: Int, hi: Int) =
    spark.range(lo, hi).select($"id",
      date_add(to_date(lit("1995-01-01")), ($"id" * 7).cast("int")).as("d"),
      ($"id" % 100).as("v"))

  test("year() layout: __pt dirs, source column in-file, content intact") {
    val path = Files.createTempDirectory("tp1-").toString
    val t = LakeTable.create(spark, path, dated(0, 300),
      partitionBy = Seq("year(d)"))
    val files = t.snapshot.files
    assert(files.nonEmpty)
    assert(files.forall(_.path.startsWith("__pt_year_d=")))
    assert(files.forall(_.partitionValues.keySet == Set("__pt_year_d")))
    // multiple years → multiple dirs
    assert(files.map(_.partitionValues("__pt_year_d")).distinct.size > 1)
    // the source column reads from the FILE (never reconstructed)
    assert(t.toDF.collect().toSet === dated(0, 300).collect().toSet)
    assert(t.toDF.schema.fieldNames.toSeq === Seq("id", "d", "v"))
  }

  test("reads prune on the source column via the transform dirs") {
    val path = Files.createTempDirectory("tp2-").toString
    val t = LakeTable.create(spark, path, dated(0, 300),
      partitionBy = Seq("year(d)"))
    val all = t.snapshot.files.size
    val scanned = t.read($"d" >= to_date(lit("1999-01-01"))).inputFiles.length
    assert(scanned < all, s"$scanned vs $all")
    assert(t.read($"d" >= to_date(lit("1999-01-01"))).count() ===
      dated(0, 300).where($"d" >= to_date(lit("1999-01-01"))).count())
  }

  test("transform range prunes even when footer stats are absent") {
    import org.apache.spark.sql.catalyst.expressions._
    def fileFor(year: Int) = AddFile(s"__pt_year_d=$year/x.parquet",
      Map("__pt_year_d" -> year.toString), 1L, 0L, stats = None)
    val schema = StructType(Seq(StructField("d", DateType)))
    val dAttr = AttributeReference("d", DateType)()
    val lit1999 = Literal(
      java.time.LocalDate.parse("1999-06-01").toEpochDay.toInt, DateType)
    def might(f: AddFile, e: Expression): Boolean =
      Stats.mightMatch(f, e, schema, Seq("year(d)"))
    assert(!might(fileFor(1995), GreaterThanOrEqual(dAttr, lit1999)))
    assert(might(fileFor(1999), GreaterThanOrEqual(dAttr, lit1999)))
    assert(might(fileFor(2000), GreaterThanOrEqual(dAttr, lit1999)))
    assert(!might(fileFor(2000), EqualTo(dAttr, lit1999)))
    assert(might(fileFor(1999), EqualTo(dAttr, lit1999)))
    assert(!might(fileFor(1998), EqualTo(dAttr, lit1999)))
  }

  test("truncate() and month() layouts") {
    val path = Files.createTempDirectory("tp3-").toString
    val df = Seq((1L, "alpha", 17L), (2L, "alps", 23L), (3L, "beta", 41L))
      .toDF("id", "name", "n")
    val t = LakeTable.create(spark, path, df,
      partitionBy = Seq("truncate(3,name)", "truncate(10,n)"))
    val pvs = t.snapshot.files.map(_.partitionValues)
    assert(pvs.forall(_.keySet ==
      Set("__pt_truncate3_name", "__pt_truncate10_n")))
    assert(pvs.map(_("__pt_truncate3_name")).toSet === Set("alp", "bet"))
    assert(pvs.map(_("__pt_truncate10_n")).toSet === Set("10", "20", "40"))
    assert(t.toDF.collect().toSet === df.collect().toSet)
    // string-prefix pruning
    assert(t.read($"name" === "zeta").inputFiles.length === 0)
  }

  test("DML and evolution across identity/transform generations") {
    val path = Files.createTempDirectory("tp4-").toString
    val t = LakeTable.create(spark, path, dated(0, 100)) // flat
    t.alterPartitionSpec(Seq("year(d)"))
    t.append(dated(100, 200)) // __pt layout generation
    assert(t.toDF.count() === 200)
    assert(t.delete($"v" === 50L) === 2L) // one row in each generation
    assert(t.toDF.count() === 198)
    // converge to the transform layout
    t.reorganize()
    assert(t.snapshot.files.forall(_.partitionValues.keySet == Set("__pt_year_d")))
    assert(t.toDF.count() === 198)
  }

  test("SQL: CREATE PARTITIONED BY (YEAR(c)), INSERT, SELECT, SET SPEC") {
    val w = Files.createTempDirectory("tp-wh-").toString
    spark.conf.set("spark.sql.catalog.tplake",
      "org.apache.spark.sql.graft.LakeCatalog")
    spark.conf.set("spark.sql.catalog.tplake.warehouse", w)
    Files.createDirectories(java.nio.file.Paths.get(s"$w/db"))
    spark.sql("""CREATE TABLE tplake.db.emp (
      id INT, nombre STRING, fecha_ingreso DATE)
      PARTITIONED BY (YEAR(fecha_ingreso))""")
    spark.sql("""INSERT INTO tplake.db.emp VALUES
      (1, 'ana',  DATE'2021-03-15'),
      (2, 'luis', DATE'2021-11-02'),
      (3, 'eva',  DATE'2023-07-09')""")
    val t = LakeTable.forPath(spark, s"$w/db/emp")
    assert(t.snapshot.metaData.partitionColumns === Seq("year(fecha_ingreso)"))
    assert(t.snapshot.files.forall(
      _.partitionValues.keySet == Set("__pt_year_fecha_ingreso")))
    assert(t.snapshot.files.map(
      _.partitionValues("__pt_year_fecha_ingreso")).toSet === Set("2021", "2023"))
    assert(spark.sql("SELECT count(*) FROM tplake.db.emp").head().getLong(0) === 3)
    assert(spark.sql(
      "SELECT nombre FROM tplake.db.emp WHERE fecha_ingreso >= DATE'2023-01-01'")
      .collect().map(_.getString(0)).toSeq === Seq("eva"))
    // spec evolution through SQL, with a transform entry
    spark.sql("ALTER TABLE tplake.db.emp SET PARTITION SPEC (month(fecha_ingreso))")
    assert(t.snapshot.metaData.partitionColumns === Seq("month(fecha_ingreso)"))
  }

  test("validation: types and shapes") {
    val path = Files.createTempDirectory("tp5-").toString
    val df = Seq((1L, "x")).toDF("id", "s")
    intercept[IllegalArgumentException](
      LakeTable.create(spark, path + "a", df, partitionBy = Seq("year(s)")))
    intercept[IllegalArgumentException](
      LakeTable.create(spark, path + "b", df, partitionBy = Seq("truncate(0,s)")))
    intercept[IllegalArgumentException](
      LakeTable.create(spark, path + "c", df, partitionBy = Seq("year(nope)")))
    val t = LakeTable.create(spark, path + "d", df)
    intercept[IllegalArgumentException](t.alterPartitionSpec(Seq("truncate(2,id)", "truncate(2,id)")))
    t.alterPartitionSpec(Seq("truncate(2,s)")) // valid: string truncate
  }

  test("parseDirKey round-trips and prefixSuccessor edges") {
    import PartitionTransforms._
    assert(parseDirKey("__pt_year_d") === Some(Transform("year", None, "d")))
    assert(parseDirKey("__pt_truncate4_na_me") ===
      Some(Transform("truncate", Some(4), "na_me")))
    assert(parseDirKey("d") === None)
    assert(parseDirKey("__pt_bogus_c") === None)
    assert(prefixSuccessor("ab") === Some("ac"))
    assert(prefixSuccessor("a￿") === Some("b"))
    assert(prefixSuccessor("￿") === None)
  }
}
