package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Advisory → action (VERDICT r12 #5): a table with a RECORDED
  * clustering column ([[ClusterMaintenance.CLUSTER_BY_PROP]], written by
  * single-axis zOrderBy / optimizeIncrementalBy commits) gets its layout
  * maintained at checkpoint boundaries on the index-maintenance lane —
  * churn past the layer budget fires EXACTLY ONE incremental-clustering
  * commit; a clean layout (or the advisory not holding, or auto=false)
  * fires nothing.
  */
class AutoClusterSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  /** Clustered bloom-indexed base; v0 create + v1 zOrderBy (records the
    * clustering column). */
  private def clustered(path: String,
      props: Map[String, String] = Map.empty): LakeTable = {
    val df = (0L until 2000L).map(i => (i, s"r$i")).toDF("id", "v")
      .repartition(8, $"id")
    val t = LakeTable.create(spark, path, df,
      properties = Map(BloomIndex.COLS_PROP -> "id",
        graft.lake.ConsolidatedKeyIndex.MIN_FILES_PROP -> "1000000") ++ props)
    t.zOrderBy("id") // v1 — records graft.cluster.by=id
    assert(t.snapshot.metaData.properties
      .get(ClusterMaintenance.CLUSTER_BY_PROP).contains("id"))
    t
  }

  /** One full-domain scatter file (breaks the range layout). */
  private def scatter(t: LakeTable, seed: Long): Unit =
    t.append((0 until 40).map(i => (i * 50L + seed, s"s$seed-$i"))
      .toDF("id", "v").repartition(1))

  /** One narrow out-of-domain file (disjoint — keeps the layout clean). */
  private def clean(t: LakeTable, k: Long): Unit =
    t.append((0 until 10).map(i => (100000L + k * 100 + i, s"c$k-$i"))
      .toDF("id", "v").repartition(1))

  test("churn past the budget fires exactly one commit at the boundary; clean churn fires none") {
    val path = Files.createTempDirectory("autoclu-").toString
    val t = clustered(path)
    // v2..v10: nine appends, the last five full-domain scatter → depth
    // 6 > maxLayers 4 by the v10 boundary
    (1L to 4L).foreach(clean(t, _))
    (1L to 5L).foreach(scatter(t, _))
    assert(t.snapshot.version === 10L)
    LakeLog.awaitMaintenance()
    val after = t.snapshot
    assert(after.version === 11L,
      "the boundary must have fired exactly one maintenance commit")
    val (op, params) = t.log.readCommit(11L)
      .flatMap(_.commitInfo).map(ci => (ci.operation, ci.parameters)).head
    assert(op === "OPTIMIZE BY" && params.get("mode").contains("incremental"))
    assert(t.toDF.count() === 2000L + 4 * 10 + 5 * 40)
    // point reads are back inside the layer budget
    assert(t.read($"id" === 777L).inputFiles.length <= 4)

    // idempotent + bounded: the NEXT boundary with only layout-clean
    // churn plans a no-op — no commit beyond the appends themselves
    (5L to 13L).foreach(clean(t, _)) // v12..v20
    assert(t.snapshot.version === 20L)
    LakeLog.awaitMaintenance()
    assert(t.snapshot.version === 20L,
      "a clean layout at the boundary must not commit")
  }

  test("graft.cluster.auto=false records the column but never auto-fires") {
    val path = Files.createTempDirectory("autoclu-off-").toString
    val t = clustered(path,
      props = Map(ClusterMaintenance.AUTO_PROP -> "false"))
    (1L to 9L).foreach(scatter(t, _)) // v2..v10 boundary, heavy churn
    LakeLog.awaitMaintenance()
    assert(t.snapshot.version === 10L,
      "auto=false must leave maintenance to the operator")
    // the operator's manual call still works and records/keeps the column
    assert(t.optimizeIncrementalBy("id", maxLayers = 2) === 9)
  }

  test("below the advisory threshold the bloom carries wide INs: trigger stays closed") {
    val path = Files.createTempDirectory("autoclu-fpp-").toString
    // fpp 1e-4 → 1-(1-fpp)^1000 ≈ 0.095 < 0.5: the advisory never
    // fires, so neither does the auto-maintenance
    val t = clustered(path, props = Map(BloomIndex.FPP_PROP -> "0.0001"))
    (1L to 9L).foreach(scatter(t, _))
    LakeLog.awaitMaintenance()
    assert(t.snapshot.version === 10L,
      "below the advisory threshold maintenance waits for the operator")
  }

  test("multi-column curve clustering clears the recorded column") {
    val path = Files.createTempDirectory("autoclu-multi-").toString
    val df = (0L until 2000L).map(i => (i, (i * 7) % 2000, s"r$i"))
      .toDF("x", "y", "v").repartition(8, $"x")
    val t = LakeTable.create(spark, path, df)
    t.zOrderBy("x")
    assert(t.snapshot.metaData.properties
      .get(ClusterMaintenance.CLUSTER_BY_PROP).contains("x"))
    t.hilbertBy("x", "y")
    assert(!t.snapshot.metaData.properties
      .contains(ClusterMaintenance.CLUSTER_BY_PROP),
      "a curve layout must not be auto-maintained on one axis")
  }
}
