package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.lake.LakeTable

/** End-to-end medallion replay (SURVEY §5.4): fixture CSVs → bronze →
  * silver (golden invariants the reference display()s) → gold ALS with
  * seeded reproducibility.
  */
class MovieLensSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private lazy val root = {
    val r = Files.createTempDirectory("movielens-").toString
    MovieLens.writeFixtures(s"$r/landing")
    MovieLens.bronze(spark, r)
    MovieLens.silver(spark, r)
    r
  }

  test("bronze: all four datasets ingested with hinted schemas") {
    val movies = LakeTable.forPath(spark, s"$root/bronze/movies").toDF
    assert(movies.count() === 100)
    assert(movies.schema("movieId").dataType.typeName === "long")
    val ratings = LakeTable.forPath(spark, s"$root/bronze/ratings").toDF
    assert(ratings.schema("rating").dataType.typeName === "double")
    assert(ratings.count() > 500)
  }

  test("silver movies: title/year parsed, genres split, sentinel removed") {
    val movies = LakeTable.forPath(spark, s"$root/silver/movies").toDF
    assert(movies.where($"year".isNull).count() === 0)
    assert(movies.where($"title".rlike("\\(\\d{4}\\)")).count() === 0)
    // sentinel "(no genres listed)" never appears inside genres arrays
    assert(movies.where(array_contains($"genres", "(no genres listed)")).count() === 0)
    // the reference's invariant probe: no rescued rows leaked to silver
    assert(movies.schema.fieldNames.toSet.contains("genres"))
    val m1214 = movies.where($"movie_id" === 1214)
    assert(m1214.count() === 1)
  }

  test("silver ratings: rated_at is a real timestamp") {
    val ratings = LakeTable.forPath(spark, s"$root/silver/ratings").toDF
    assert(ratings.schema("rated_at").dataType.typeName === "timestamp")
    // fixture ts ∈ [1.5e9, 1.6e9) sec ≈ 2017-07 .. 2020-09
    assert(ratings.where(year($"rated_at") < 2017 || year($"rated_at") > 2020)
      .count() === 0)
  }

  test("silver links/trailers: URLs built") {
    val links = LakeTable.forPath(spark, s"$root/silver/links").toDF
    assert(links.where(!$"imdb_url".startsWith("https://www.imdb.com/title/tt"))
      .count() === 0)
    val trailers = LakeTable.forPath(spark, s"$root/silver/trailers").toDF
    assert(trailers.where(!$"youtube_url".contains("youtube.com/watch?v=yt"))
      .count() === 0)
  }

  test("gold ALS: seeded, reasonable RMSE, top-5 recs served") {
    val res = MovieLens.gold(spark, root)
    // synthetic ratings ⇒ can't match the reference's 0.878 exactly; the
    // contract is seeded reproducibility + sane error (σ≈0.5 noise)
    assert(res.rmse > 0 && res.rmse < 1.5, s"rmse=${res.rmse}")
    assert(res.nUserRecs === 60)
    assert(res.nItemRecs === 100)
    val recs = LakeTable.forPath(spark, s"$root/gold/user_recommendations").toDF
    assert(recs.select(size($"recommendations")).as[Int].collect().forall(_ === 5))
    // seeded reproducibility: same seed ⇒ same rmse
    val res2 = MovieLens.gold(spark, root)
    assert(math.abs(res2.rmse - res.rmse) < 1e-9)
  }

  test("CV grid (rank 5 vs 10, 3-fold) picks rank 10 — VERDICT r01 #6") {
    val cv = MovieLens.tuneRank(spark, root)
    assert(cv.bestRank === 10, s"avg metrics: ${cv.avgMetricsByRank}")
    assert(cv.bestRmse > 0 && cv.bestRmse < 1.0, s"rmse=${cv.bestRmse}")
    // lower CV error for the winning rank, mirroring the reference's grid
    assert(cv.avgMetricsByRank(10) <= cv.avgMetricsByRank(5))
  }
}
