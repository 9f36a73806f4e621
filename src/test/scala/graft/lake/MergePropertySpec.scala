package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property-style test (SURVEY §5.3): random sequences of MERGE upserts
  * applied to a LakeTable must equal the same operations applied to an
  * in-memory map (last-writer-wins per key), for many seeded runs.
  */
class MergePropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def randomBatches(seed: Long): Seq[Seq[(Long, Double)]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(3) {
      val n = 1 + rnd.nextInt(6)
      Seq.fill(n)((rnd.nextLong(10), rnd.nextInt(1000).toDouble))
        .groupBy(_._1).map(_._2.head).toSeq // merge rejects dup source keys
    }
  }

  for (seed <- 1L to 6L) {
    test(s"merge sequence == last-writer-wins map (seed $seed)") {
      val path = Files.createTempDirectory("merge-prop-").toString
      val t = LakeTable.create(spark, path,
        Seq((0L, 0.0), (1L, 1.0)).toDF("id", "v"))
      val model = scala.collection.mutable.Map(0L -> 0.0, 1L -> 1.0)

      randomBatches(seed).foreach { batch =>
        t.merge(batch.toDF("id", "v"), expr("t.id = s.id"))
        batch.foreach { case (k, v) => model(k) = v }
      }
      val got = t.toDF.as[(Long, Double)].collect().toMap
      assert(got === model.toMap)
    }
  }

  // Same property through the SQL path (VERDICT round-1 #1): literal
  // MERGE INTO statements via the DSv2 catalog must hit the identical
  // rewrite engine.
  // one warehouse for all seeds: a DSv2 catalog binds its warehouse at
  // first initialization, not per query
  private lazy val sqlWarehouse: String = {
    val wh = Files.createTempDirectory("merge-sql-wh-").toString
    spark.conf.set("spark.sql.catalog.mp", "org.apache.spark.sql.graft.LakeCatalog")
    spark.conf.set("spark.sql.catalog.mp.warehouse", wh)
    Files.createDirectories(java.nio.file.Paths.get(s"$wh/db"))
    wh
  }

  for (seed <- 11L to 13L) {
    test(s"SQL MERGE sequence == last-writer-wins map (seed $seed)") {
      val wh = sqlWarehouse
      LakeTable.create(spark, s"$wh/db/t$seed",
        Seq((0L, 0.0), (1L, 1.0)).toDF("id", "v"))
      val model = scala.collection.mutable.Map(0L -> 0.0, 1L -> 1.0)

      randomBatches(seed).foreach { batch =>
        batch.toDF("id", "v").createOrReplaceTempView("mp_src")
        spark.sql(
          s"""MERGE INTO mp.db.t$seed t USING mp_src s ON t.id = s.id
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        batch.foreach { case (k, v) => model(k) = v }
      }
      val got = spark.sql(s"SELECT id, v FROM mp.db.t$seed")
        .as[(Long, Double)].collect().toMap
      assert(got === model.toMap)
    }
  }

  test("multi-clause SQL MERGE: conditional update/delete + by-source") {
    val wh = sqlWarehouse
    LakeTable.create(spark, s"$wh/db/mc",
      Seq((1L, 10.0, "keep"), (2L, 20.0, "keep"), (3L, 30.0, "keep"),
        (9L, 90.0, "stale")).toDF("id", "v", "tag"))
    Seq((1L, 100.0), (2L, -1.0), (4L, 40.0)).toDF("id", "v")
      .createOrReplaceTempView("mc_src")
    // matched & v<0 → delete; matched otherwise → update;
    // not matched → insert; not matched by source & tag='stale' → delete
    spark.sql(
      s"""MERGE INTO mp.db.mc t USING mc_src s ON t.id = s.id
         |WHEN MATCHED AND s.v < 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (id, v, tag) VALUES (s.id, s.v, 'new')
         |WHEN NOT MATCHED BY SOURCE AND t.tag = 'stale' THEN DELETE""".stripMargin)
    val got = spark.sql("SELECT id, v, tag FROM mp.db.mc ORDER BY id")
      .as[(Long, Double, String)].collect().toSeq
    assert(got === Seq(
      (1L, 100.0, "keep"), // updated
      (3L, 30.0, "keep"),  // untouched (no by-source clause hit)
      (4L, 40.0, "new")))  // inserted; 2 deleted (v<0), 9 deleted (stale)
  }

  test("by-source UPDATE marks unmatched target rows") {
    val path = Files.createTempDirectory("merge-bys-").toString
    val t = LakeTable.create(spark, path,
      Seq((1L, "a"), (2L, "a"), (3L, "a")).toDF("id", "status"))
    t.mergeClauses(Seq(Tuple1(2L)).toDF("id"), expr("t.id = s.id"),
      matchedClauses = Seq(MergeClause.Update(None,
        Map("status" -> lit("seen")))),
      notMatchedClauses = Seq.empty,
      notMatchedBySourceClauses = Seq(MergeClause.Update(None,
        Map("status" -> lit("missing")))))
    assert(t.toDF.orderBy("id").as[(Long, String)].collect().toSeq ===
      Seq((1L, "missing"), (2L, "seen"), (3L, "missing")))
  }

  test("clause order wins: first applicable clause applies") {
    val path = Files.createTempDirectory("merge-order-").toString
    val t = LakeTable.create(spark, path, Seq((1L, 5.0)).toDF("id", "v"))
    t.mergeClauses(Seq((1L, 7.0)).toDF("id", "v"), expr("t.id = s.id"),
      matchedClauses = Seq(
        MergeClause.Update(Some(expr("s.v > 0")), Map("v" -> expr("s.v"))),
        MergeClause.Delete(None)), // never reached for v>0
      notMatchedClauses = Seq.empty,
      notMatchedBySourceClauses = Seq.empty)
    assert(t.toDF.as[(Long, Double)].collect().toSeq === Seq((1L, 7.0)))
  }

  test("merge-delete sequence == map removal") {
    val path = Files.createTempDirectory("merge-del-").toString
    val init = (0L to 9L).map(i => (i, i.toDouble))
    val t = LakeTable.create(spark, path, init.toDF("id", "v"))
    val model = scala.collection.mutable.Map(init: _*)
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val doomed = Seq.fill(3)(rnd.nextLong(10)).distinct
      t.merge(doomed.map(k => Tuple1(k)).toDF("id"), expr("t.id = s.id"),
        whenMatchedUpdate = None, whenMatchedDelete = true,
        whenNotMatchedInsert = None)
      doomed.foreach(model.remove)
    }
    assert(t.toDF.as[(Long, Double)].collect().toMap === model.toMap)
  }
}
