package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property test for the full DML surface including the deletion-vector
  * paths: a random interleaving of append / delete / update / merge on a
  * keyed table must equal the same operations applied to an in-memory
  * map — across DV sidecars, partial rewrites, and full-file removes.
  */
class DmlPropertySpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  for ((seed, bucketed) <- Seq((1L, false), (2L, false), (3L, false),
      (4L, false), (5L, true), (6L, true))) {
    test(s"random DML sequence == model (seed $seed" +
        (if (bucketed) ", bucketed)" else ")")) {
      val rnd = new scala.util.Random(seed)
      val path = Files.createTempDirectory(s"dml-prop-$seed-").toString
      val init = (0L until 40L).map(i => (i, i.toDouble))
      val t =
        if (bucketed) LakeTable.create(spark, path,
          init.toDF("id", "v").repartition(3),
          bucketBy = Seq("id"), numBuckets = 4)
        else LakeTable.create(spark, path,
          init.toDF("id", "v").repartition(3))
      t.setProperties(Map(Cdc.PROP -> "true"))
      val model = scala.collection.mutable.Map(init: _*)
      var nextId = 1000L

      (1 to 8).foreach { _ =>
        rnd.nextInt(4) match {
          case 0 => // append fresh keys
            val rows = Seq.fill(1 + rnd.nextInt(4)) {
              val id = nextId; nextId += 1
              (id, rnd.nextInt(100).toDouble)
            }
            t.append(rows.toDF("id", "v"))
            rows.foreach { case (k, v) => model(k) = v }
          case 1 => // predicate delete (small → DV; sometimes large)
            val m = 3 + rnd.nextInt(17)
            val r = rnd.nextInt(m)
            t.delete(pmod(col("id"), lit(m)) === r)
            model.keys.filter(k => ((k % m) + m) % m == r).toSeq
              .foreach(model.remove)
          case 2 => // predicate update
            val m = 3 + rnd.nextInt(17)
            val r = rnd.nextInt(m)
            val add = rnd.nextInt(50).toDouble
            t.update(pmod(col("id"), lit(m)) === r,
              Map("v" -> (col("v") + add)))
            model.keys.filter(k => ((k % m) + m) % m == r).toSeq
              .foreach(k => model(k) = model(k) + add)
          case 3 => // merge upsert on key
            val keys = (Seq.fill(3)(rnd.nextLong(40)) ++
              Seq.fill(2)(nextId + rnd.nextInt(3))).distinct
            nextId += 3 // merge may insert into the id range; don't reuse
            val rows = keys.map(k => (k, rnd.nextInt(100).toDouble))
            t.merge(rows.toDF("id", "v"), expr("t.id = s.id"))
            rows.foreach { case (k, v) => model(k) = v }
        }
      }
      val got = t.toDF.as[(Long, Double)].collect().toMap
      assert(got === model.toMap)
      // and the history replays to the same state through a fresh handle
      val fresh = LakeTable.forPath(spark, path)
      assert(fresh.toDF.count() === model.size)

      // CDC completeness: folding the change feed version by version
      // (insert/update_postimage = put, delete = remove) reconstructs
      // the final table exactly — no change escapes the feed
      val folded = scala.collection.mutable.Map[Long, Double]()
      t.tableChanges(0)
        .select(col("id"), col("v"), col(Cdc.CHANGE_TYPE),
          col("_commit_version"))
        .collect()
        .groupBy(_.getLong(3)).toSeq.sortBy(_._1)
        .foreach { case (_, rows) =>
          rows.foreach { r =>
            r.getString(2) match {
              case Cdc.INSERT | Cdc.UPDATE_POST =>
                folded(r.getLong(0)) = r.getDouble(1)
              case Cdc.DELETE => folded.remove(r.getLong(0))
              case Cdc.UPDATE_PRE => ()
            }
          }
        }
      assert(folded.toMap === model.toMap,
        "change feed fold diverged from the table state")

      // bucketed tables: every surviving file keeps exactly its bucket
      if (bucketed) {
        val snap = t.snapshot
        assert(snap.files.forall(_.bucket.isDefined))
        snap.files.take(5).foreach { f =>
          val distinct = spark.read.parquet(s"$path/${f.path}")
            .select(Bucketing.bucketId(Seq(col("id")), 4)).distinct()
            .as[Int].collect().toSeq
          assert(distinct === Seq(f.bucket.get),
            s"bucket impurity in ${f.path}")
        }
      }
    }
  }
}
