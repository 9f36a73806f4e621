package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.lake.LakeTable
import graft.pipeline.CorpusPipeline

/** [[IndexMeta]] — the gate indexes' observability surface: recorded
  * source triple, exactly-once sync pointer, footer-stats live rows, and
  * the stale estimate the maintenance trigger acts on, as DataFrames and
  * via `DESCRIBE (MINHASH|IVF) INDEX AT` / `SHOW INDEXES AT` SQL.
  */
class IndexMetaSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private val words = Seq("one", "two", "red", "blue", "wolf", "bear",
    "alpha", "beta", "iron", "gold", "oak", "elm", "north", "south",
    "rain", "snow", "fast", "slow", "high", "low")

  private def corpus(n: Int) = (0 until n).map { i =>
    val r = new scala.util.Random(i)
    (i.toLong,
      (0 until 10).map(j => words((i * 7 + j * 3) % 20) + i).mkString(" "),
      Array.fill(8)(r.nextGaussian().toFloat))
  }.toDF("doc_id", "text", "embedding")

  test("describeMinhash: source triple, sync pointer, stale estimate lifecycle") {
    val root = Files.createTempDirectory("imeta-mh-").toString
    val (srcPath, idxPath) = (s"$root/src", s"$root/idx")
    val t = LakeTable.create(spark, srcPath,
      corpus(20).select("doc_id", "text"),
      properties = Map(graft.lake.Cdc.PROP -> "true"))
    Dedup.buildMinhashIndexFromTable(spark, idxPath, srcPath,
      "text", "doc_id", 3, 8, 4)

    def info() = IndexMeta.describeMinhash(spark, idxPath).collect().head
    val fresh = info()
    assert(fresh.getAs[String]("kind") === "minhash")
    assert(fresh.getAs[String]("config") ===
      "shingleN=3,bands=8,rowsPerBand=4")
    assert(fresh.getAs[String]("source_path") === srcPath)
    assert(fresh.getAs[String]("source_generation")
      === t.snapshot.metaData.id)
    assert(fresh.getAs[Long]("synced_through") === t.snapshot.version,
      "build baseline = the source version the postings cover through")
    assert(fresh.getAs[Long]("indexed_rows") === 20L * 8)
    assert(fresh.getAs[Long]("source_live_rows") === 20L)
    assert(fresh.getAs[Double]("est_stale_fraction") === 0.0)

    // sync moves the pointer, keeps staleness at zero
    t.append(Seq((100L, "wholly new words entirely fresh text here now"))
      .toDF("doc_id", "text"))
    Dedup.syncMinhashIndexFromTable(spark, idxPath, srcPath,
      "text", "doc_id")
    val synced = info()
    assert(synced.getAs[Long]("synced_through") === t.snapshot.version)
    assert(synced.getAs[Long]("indexed_rows") === 21L * 8)
    assert(synced.getAs[Double]("est_stale_fraction") === 0.0)

    // churn raises the estimate; compaction brings it back to zero
    t.delete($"doc_id" < 10L)
    val churned = info()
    assert(churned.getAs[Long]("source_live_rows") === 11L)
    assert(churned.getAs[Double]("est_stale_fraction") > 0.4,
      s"10/21 dead should estimate ~0.48, got $churned")
    assert(Dedup.compactMinhashIndex(spark, idxPath, "doc_id") === 10L * 8)
    assert(info().getAs[Double]("est_stale_fraction") === 0.0)
  }

  test("describeIvf: codebook state and sync pointer") {
    val root = Files.createTempDirectory("imeta-ivf-").toString
    val (srcPath, idxPath) = (s"$root/src", s"$root/idx")
    val rnd = new scala.util.Random(7)
    val t = LakeTable.create(spark, srcPath,
      (0 until 60).map(i => (i.toLong,
        Array.fill(8)(rnd.nextGaussian().toFloat))).toDF("vec_id", "vec"),
      properties = Map(graft.lake.Cdc.PROP -> "true"))
    Similarity.rebuildIvfIndexFromTable(spark, idxPath, srcPath,
      "vec", "vec_id", nLists = 4)

    val row = IndexMeta.describeIvf(spark, idxPath).collect().head
    assert(row.getAs[String]("kind") === "ivf")
    assert(row.getAs[String]("config")
      === s"nLists=4,trainedCount=60,idCol=vec_id")
    assert(row.getAs[String]("source_path") === srcPath)
    assert(row.getAs[String]("source_generation") === t.snapshot.metaData.id)
    assert(row.getAs[Long]("synced_through") === t.snapshot.version)
    assert(row.getAs[Long]("indexed_rows") === 60L)
    assert(row.getAs[Double]("est_stale_fraction") === 0.0)
  }

  test("SHOW INDEXES / DESCRIBE INDEX over a curated pipeline root") {
    val root = Files.createTempDirectory("imeta-sql-").toString
    CorpusPipeline.curate(spark, corpus(16), root, minQuality = 0.0,
      minTokens = 0, nearDupThreshold = 0.99, fuzzyIndex = true,
      vecCol = Some("embedding"), semNLists = 2)

    val shown = spark.sql(s"SHOW INDEXES AT '$root'").collect()
    assert(shown.map(_.getAs[String]("kind")).sorted.toSeq
      === Seq("ivf", "minhash"))
    assert(shown.forall(_.getAs[Double]("est_stale_fraction") === 0.0))
    assert(shown.forall(_.getAs[String]("source_path") === s"$root/curated"))

    val desc = spark.sql(
      s"DESCRIBE MINHASH INDEX AT '$root/mhindex'").collect().head
    assert(desc.getAs[String]("kind") === "minhash")
    assert(desc.getAs[Long]("indexed_rows") === 16L * 8)

    // churn is visible through the SQL surface too
    LakeTable.forPath(spark, s"$root/curated").delete($"doc_id" >= 8L)
    val stale = spark.sql(s"SHOW INDEXES AT '$root'").collect()
    assert(stale.forall(_.getAs[Double]("est_stale_fraction") > 0.4))

    // a root with no indexes: zero rows, full schema
    val none = spark.sql(
      s"SHOW INDEXES AT '${Files.createTempDirectory("imeta-none-")}'")
    assert(none.columns.toSeq.take(3)
      === Seq("kind", "index_path", "index_version"))
    assert(none.count() === 0L)
  }
}
