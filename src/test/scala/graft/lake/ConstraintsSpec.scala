package graft.lake

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** CHECK constraints ([[Constraints]]): DDL, row-level enforcement on
  * every write path, and SQL-standard null semantics.
  */
class ConstraintsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmpDir(): String = Files.createTempDirectory("check-test-").toString

  private def base = Seq(
    (1L, "AZ", 10.0), (2L, "CA", 20.0), (3L, "NY", 30.0))
    .toDF("id", "state", "amount")

  test("add validates existing rows; enforcement rejects bad appends") {
    val t = LakeTable.create(spark, tmpDir(), base)
    t.addCheckConstraint("amount_pos", "amount > 0")
    assert(t.constraints === Map("amount_pos" -> "amount > 0"))
    // violating append fails wholesale — nothing lands
    val v = t.version
    val e = intercept[Exception] {
      t.append(Seq((4L, "TX", -1.0)).toDF("id", "state", "amount"))
    }
    assert(e.getMessage.contains("amount_pos") ||
      Option(e.getCause).exists(_.getMessage.contains("amount_pos")))
    assert(t.version === v)
    assert(t.toDF.count() === 3)
    // conforming append passes
    t.append(Seq((4L, "TX", 4.0)).toDF("id", "state", "amount"))
    assert(t.toDF.count() === 4)
  }

  test("adding a constraint existing rows violate fails") {
    val t = LakeTable.create(spark, tmpDir(), base)
    val e = intercept[IllegalArgumentException] {
      t.addCheckConstraint("too_strict", "amount > 15")
    }
    assert(e.getMessage.contains("existing rows violate"))
    assert(t.constraints.isEmpty)
  }

  test("NULL passes (SQL CHECK semantics); FALSE fails") {
    val t = LakeTable.create(spark, tmpDir(), base)
    t.addCheckConstraint("state_len", "length(state) = 2")
    // null state → constraint UNKNOWN → row accepted
    t.append(Seq((5L, Option.empty[String], 5.0)).toDF("id", "state", "amount"))
    assert(t.toDF.where($"id" === 5).count() === 1)
    intercept[Exception] {
      t.append(Seq((6L, Option("XXX"), 6.0)).toDF("id", "state", "amount"))
    }
  }

  test("UPDATE and MERGE enforce on the rows they produce") {
    val t = LakeTable.create(spark, tmpDir(), base)
    t.addCheckConstraint("amount_pos", "amount > 0")
    intercept[Exception] {
      t.update($"id" === 1, Map("amount" -> lit(-5.0)), useDvs = false)
    }
    intercept[Exception] {
      t.update($"id" === 1, Map("amount" -> lit(-5.0)), useDvs = true)
    }
    assert(t.toDF.where($"id" === 1).select("amount").as[Double].head() === 10.0)
    intercept[Exception] {
      t.merge(Seq((7L, "WA", -7.0)).toDF("id", "state", "amount"),
        expr("t.id = s.id"))
    }
    assert(t.toDF.count() === 3)
    // valid merge still works
    t.merge(Seq((7L, "WA", 7.0)).toDF("id", "state", "amount"),
      expr("t.id = s.id"))
    assert(t.toDF.count() === 4)
  }

  test("drop removes enforcement") {
    val t = LakeTable.create(spark, tmpDir(), base)
    t.addCheckConstraint("amount_pos", "amount > 0")
    t.dropConstraint("amount_pos")
    assert(t.constraints.isEmpty)
    t.append(Seq((8L, "HI", -8.0)).toDF("id", "state", "amount"))
    assert(t.toDF.where($"amount" < 0).count() === 1)
    intercept[IllegalArgumentException] { t.dropConstraint("nope") }
  }

  test("SQL DDL + SQL INSERT enforcement through the catalog") {
    val wh = Files.createTempDirectory("check-wh-").toString
    spark.conf.set("spark.sql.catalog.ck", "org.apache.spark.sql.graft.LakeCatalog")
    spark.conf.set("spark.sql.catalog.ck.warehouse", wh)
    Files.createDirectories(Paths.get(s"$wh/db"))
    LakeTable.create(spark, s"$wh/db/t", base)
    spark.sql("ALTER TABLE ck.db.t ADD CONSTRAINT amount_pos CHECK (amount > 0)")
    val t = LakeTable.forPath(spark, s"$wh/db/t")
    assert(t.constraints === Map("amount_pos" -> "amount > 0"))
    val e = intercept[Exception] {
      spark.sql("INSERT INTO ck.db.t VALUES (9, 'UT', -9.0)")
    }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(t => Option(t.getMessage).toSeq ++ msgs(t.getCause))
    assert(msgs(e).exists(_.contains("amount_pos")))
    assert(spark.sql("SELECT count(*) FROM ck.db.t").as[Long].head() === 3)
    spark.sql("INSERT INTO ck.db.t VALUES (9, 'UT', 9.0)")
    assert(spark.sql("SELECT count(*) FROM ck.db.t").as[Long].head() === 4)
    spark.sql("ALTER TABLE ck.db.t DROP CONSTRAINT amount_pos")
    spark.sql("INSERT INTO ck.db.t VALUES (10, 'NV', -1.0)")
    assert(spark.sql("SELECT count(*) FROM ck.db.t").as[Long].head() === 5)
  }

  test("the streaming sink enforces constraints per epoch") {
    val src = Files.createTempDirectory("check-stream-src-").toString
    val dst = Files.createTempDirectory("check-stream-dst-").toString
    LakeTable.create(spark, src, Seq((1L, 1.0), (2L, -2.0)).toDF("id", "v"))
    val t = LakeTable.create(spark, dst,
      Seq.empty[(Long, Double)].toDF("id", "v"))
    t.addCheckConstraint("v_pos", "v > 0")
    val q = spark.readStream
      .format("org.apache.spark.sql.graft.LakeSourceProvider")
      .option("path", src).load()
      .writeStream
      .format("org.apache.spark.sql.graft.LakeSourceProvider")
      .option("path", dst)
      .option("checkpointLocation",
        Files.createTempDirectory("check-stream-ckpt-").toString)
      .start()
    val e = intercept[Exception] { q.processAllAvailable() }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(t => Option(t.getMessage).toSeq ++ msgs(t.getCause))
    assert(msgs(e).exists(_.contains("v_pos")) ||
      msgs(e).exists(_.contains("CHECK")),
      s"expected a constraint failure, got: ${msgs(e).take(3)}")
    q.stop()
    assert(t.toDF.count() === 0) // the epoch never committed
  }

  test("constraints use the full function surface (analyzer, not bare parser)") {
    val t = LakeTable.create(spark, tmpDir(), base)
    t.addCheckConstraint("state_upper", "state = upper(state) AND id % 2 >= 0")
    t.append(Seq((11L, "WA", 1.0)).toDF("id", "state", "amount"))
    intercept[Exception] {
      t.append(Seq((12L, "wa", 1.0)).toDF("id", "state", "amount"))
    }
  }
}
