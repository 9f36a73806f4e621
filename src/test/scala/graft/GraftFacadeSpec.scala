package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class GraftFacadeSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("facade round-trip: create, reopen, convert, isTable") {
    val dir = Files.createTempDirectory("facade-").toString
    val t = Graft.createTable(spark, s"$dir/t",
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(Graft.isTable(s"$dir/t"))
    assert(Graft.table(spark, s"$dir/t").toDF.count() === 2)
    t.merge(Seq((3L, "c")).toDF("id", "v"), expr("t.id = s.id"))
    assert(Graft.table(spark, s"$dir/t").toDF.count() === 3)

    Seq((9L, "z")).toDF("id", "v").write.parquet(s"$dir/plain")
    val conv = Graft.convert(spark, s"$dir/plain")
    assert(conv.toDF.count() === 1)
    assert(!Graft.isTable(s"$dir/nope"))
  }
}
