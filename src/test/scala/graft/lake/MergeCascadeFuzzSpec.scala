package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Randomized model check for the FULL merge clause cascade —
  * conditional multi-clause `WHEN MATCHED` (update/delete), conditional
  * `WHEN NOT MATCHED` inserts, and `WHEN NOT MATCHED BY SOURCE`
  * update/delete — against an in-memory row model applying the
  * documented semantics (first clause whose condition holds wins; no
  * clause → keep matched/by-source rows, drop not-matched source rows).
  * MergePropertySpec pins the plain upsert; this exercises clause
  * order, per-clause conditions referencing both sides, SET * vs
  * explicit assignments, and the by-source paths, over both the DV and
  * rewrite-only routes.
  */
class MergeCascadeFuzzSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private type R = (Double, String) // v, tag (id is the key)

  // conditions over (t, s) with their model twins
  private val matchedConds: Seq[(Option[Column], (Long, R, R) => Boolean)] = Seq(
    (None, (_, _, _) => true),
    (Some(col("s.v") > col("t.v")), (_, t, s) => s._1 > t._1),
    (Some(col("t.tag") === "A"), (_, t, _) => t._2 == "A"),
    (Some(pmod(col("s.id"), lit(3)) === 0), (id, _, _) => id % 3 == 0),
    (Some(col("t.v") < 50.0), (_, t, _) => t._1 < 50.0))

  private val bySourceConds: Seq[(Option[Column], (Long, R) => Boolean)] = Seq(
    (None, (_, _) => true),
    (Some(col("t.tag") === "B"), (_, t) => t._2 == "B"),
    (Some(col("t.v") > 70.0), (_, t) => t._1 > 70.0))

  private val insertConds: Seq[(Option[Column], (Long, R) => Boolean)] = Seq(
    (None, (_, _) => true),
    (Some(col("s.v") > 20.0), (_, s) => s._1 > 20.0),
    (Some(pmod(col("s.id"), lit(2)) === 0), (id, _) => id % 2 == 0))

  // matched-update assignment sets with model twins (t, s) → new row
  private val updateSets: Seq[(Map[String, Column], (R, R) => R)] = Seq(
    (Map.empty, (_, s) => s), // UPDATE SET *
    (Map("v" -> (col("t.v") + col("s.v"))), (t, s) => (t._1 + s._1, t._2)),
    (Map("tag" -> lit("upd")), (t, _) => (t._1, "upd")))

  private val bySourceSets: Seq[(Map[String, Column], R => R)] = Seq(
    (Map("v" -> (col("t.v") * 2)), t => (t._1 * 2, t._2)),
    (Map("tag" -> lit("stale")), t => (t._1, "stale")))

  private val insertSets: Seq[(Map[String, Column], (Long, R) => R)] = Seq(
    (Map.empty, (_, s) => s), // INSERT *
    (Map("id" -> col("s.id"), "v" -> (col("s.v") + 1), "tag" -> lit("new")),
      (_, s) => (s._1 + 1, "new")))

  private val tagPool = Seq("A", "B", "C")

  for ((seed, useDvs) <- Seq((51L, true), (52L, true), (53L, false))) {
    test(s"merge cascade == row model (seed $seed" +
        (if (useDvs) ")" else ", rewrite-only)")) {
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"merge-fuzz-$seed-").toString
      val init = (0L until 40L)
        .map(i => (i, rnd.nextInt(100).toDouble, tagPool(rnd.nextInt(3))))
      val t = LakeTable.create(spark, dir,
        init.toDF("id", "v", "tag").repartition(3))
      val model = scala.collection.mutable.Map[Long, R](
        init.map { case (i, v, g) => i -> ((v, g)) }: _*)
      var nextId = 500L

      (1 to 6).foreach { step =>
        // source: some existing keys, some new — unique ids
        val existing = rnd.shuffle(model.keys.toSeq).take(3 + rnd.nextInt(5))
        val fresh = Seq.fill(1 + rnd.nextInt(4)) { nextId += 1; nextId }
        val srcRows = (existing ++ fresh)
          .map(id => (id, rnd.nextInt(100).toDouble, tagPool(rnd.nextInt(3))))
        val src = srcRows.toDF("id", "v", "tag")

        // random clause lists (at least one clause overall)
        def matchedClause(): (MergeClause, (Long, R, R) => Option[Option[R]]) = {
          val (cond, cm) = matchedConds(rnd.nextInt(matchedConds.length))
          if (rnd.nextInt(3) == 0)
            (MergeClause.Delete(cond),
              (id, t0, s0) => if (cm(id, t0, s0)) Some(None) else None)
          else {
            val (set, um) = updateSets(rnd.nextInt(updateSets.length))
            (MergeClause.Update(cond, set),
              (id, t0, s0) => if (cm(id, t0, s0)) Some(Some(um(t0, s0))) else None)
          }
        }
        def bySourceClause(): (MergeClause, (Long, R) => Option[Option[R]]) = {
          val (cond, cm) = bySourceConds(rnd.nextInt(bySourceConds.length))
          if (rnd.nextInt(3) == 0)
            (MergeClause.Delete(cond),
              (id, t0) => if (cm(id, t0)) Some(None) else None)
          else {
            val (set, um) = bySourceSets(rnd.nextInt(bySourceSets.length))
            (MergeClause.Update(cond, set),
              (id, t0) => if (cm(id, t0)) Some(Some(um(t0))) else None)
          }
        }
        def insertClause(): (MergeClause.Insert, (Long, R) => Option[R]) = {
          val (cond, cm) = insertConds(rnd.nextInt(insertConds.length))
          val (set, im) = insertSets(rnd.nextInt(insertSets.length))
          (MergeClause.Insert(cond, set),
            (id, s0) => if (cm(id, s0)) Some(im(id, s0)) else None)
        }

        val matched = Seq.fill(rnd.nextInt(3))(matchedClause())
        val bySource = Seq.fill(rnd.nextInt(2))(bySourceClause())
        val inserts = Seq.fill(
          if (matched.isEmpty && bySource.isEmpty) 1 else rnd.nextInt(2))(
          insertClause())

        t.mergeClauses(src, expr("t.id = s.id"),
          matchedClauses = matched.map(_._1),
          notMatchedClauses = inserts.map(_._1),
          notMatchedBySourceClauses = bySource.map(_._1),
          useDvs = useDvs)

        // model: one pass over the PRE-state
        val srcById = srcRows.map { case (i, v, g) => i -> ((v, g)) }.toMap
        val pre = model.toMap
        pre.foreach { case (id, t0) =>
          srcById.get(id) match {
            case Some(s0) =>
              matched.iterator.map(_._2(id, t0, s0)).collectFirst {
                case Some(outcome) => outcome
              } match {
                case Some(Some(nr)) => model(id) = nr
                case Some(None) => model.remove(id)
                case None => () // no clause applied: keep
              }
            case None =>
              bySource.iterator.map(_._2(id, t0)).collectFirst {
                case Some(outcome) => outcome
              } match {
                case Some(Some(nr)) => model(id) = nr
                case Some(None) => model.remove(id)
                case None => ()
              }
          }
        }
        srcById.foreach { case (id, s0) =>
          if (!pre.contains(id))
            inserts.iterator.map(_._2(id, s0)).collectFirst {
              case Some(nr) => nr
            }.foreach(nr => model(id) = nr)
        }

        val got = t.toDF.select("id", "v", "tag").collect()
          .map(r => r.getLong(0) -> ((r.getDouble(1), r.getString(2)))).toMap
        assert(got === model.toMap,
          s"seed $seed step $step: matched=${matched.map(_._1)} " +
            s"inserts=${inserts.map(_._1)} bySource=${bySource.map(_._1)}")
      }
    }
  }
}
