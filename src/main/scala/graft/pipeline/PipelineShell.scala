package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.LakeTable
import graft.sql.SqlSurface

/** CLI driving the full medallion pipeline + SQL surface end-to-end:
  * fixtures → bronze → silver → gold ALS, then SQL over the gold tables.
  * Usage: runMain graft.pipeline.PipelineShell <workDir>
  */
object PipelineShell {
  def main(args: Array[String]): Unit = {
    val Array(workDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", s"$workDir/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val res = MovieLens.runAll(spark, workDir)
    println(f"[pipeline-shell] gold ALS rmse=${res.rmse}%.4f " +
      s"userRecs=${res.nUserRecs} movieRecs=${res.nItemRecs}")

    SqlSurface.registerLakeTable(spark, "user_recs",
      s"$workDir/gold/user_recommendations")
    SqlSurface.registerLakeTable(spark, "movies", s"$workDir/silver/movies")
    val top = spark.sql("""
      SELECT e.user_id, e.rec.movie_id, m.title, round(e.rec.rating, 2) AS score
      FROM (SELECT user_id, explode(recommendations) AS rec
            FROM user_recs WHERE user_id = 1) e
      JOIN movies m ON e.rec.movie_id = m.movie_id
      ORDER BY score DESC""")
    println("[pipeline-shell] top recs for user 1:")
    top.show(5, truncate = false)

    val movies = LakeTable.forPath(spark, s"$workDir/silver/movies")
    println(s"[pipeline-shell] silver movies v${movies.version}: " +
      s"${movies.toDF.count()} rows, years " +
      movies.toDF.agg(min(col("year")), max(col("year"))).head().toSeq.mkString(".."))
    spark.stop()
  }
}
