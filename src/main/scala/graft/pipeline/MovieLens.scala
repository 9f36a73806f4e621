package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.{Engine, IngestDataset, LoaderConfig}
import graft.lake.LakeTable

/** The reference's flagship medallion pipeline re-expressed on this
  * engine (SURVEY §7.8, the `notebooks/05.movielens` set): CSV landing → bronze
  * (incremental loader with schema hints) → silver (native-function
  * cleaning — the reference's python `@udf parse_title` becomes
  * regexp_extract, `02.movielens-silver.py:121-160`) → gold (ALS
  * recommender + top-5 recommendations, `03.movielens-gold.py`).
  *
  * Layout under `root`: landing/<ds>/, bronze/<ds>, silver/<ds>,
  * gold/<ds> — all lake tables past landing.
  */
object MovieLens {

  /** Deterministic MovieLens-shaped fixture CSVs (FIXTURES.md §2,
    * seed-stable): includes the seed-scenario movie ids
    * {1214,480,260,541,2571,296,356,593}.
    */
  def writeFixtures(landingRoot: String, nMovies: Int = 100, nUsers: Int = 60,
      seed: Long = 42L): Unit = {
    val rnd = new scala.util.Random(seed)
    val genresPool = Seq("Action", "Comedy", "Drama", "Sci-Fi", "Thriller",
      "Romance", "Animation", "Crime")
    val mustHave = Seq(1214L, 480L, 260L, 541L, 2571L, 296L, 356L, 593L)
    val movieIds = (mustHave ++ (1L to nMovies.toLong)
      .filterNot(mustHave.contains)).take(nMovies)

    def writeCsv(ds: String, header: String, rows: Seq[String]): Unit = {
      val dir = Paths.get(landingRoot, ds)
      Files.createDirectories(dir)
      Files.write(dir.resolve(s"$ds.csv"),
        (header +: rows).mkString("\n").getBytes(StandardCharsets.UTF_8))
    }

    val movies = movieIds.map { id =>
      val year = 1970 + rnd.nextInt(50)
      val gs =
        if (rnd.nextDouble() < 0.05) "(no genres listed)"
        else rnd.shuffle(genresPool).take(1 + rnd.nextInt(3)).mkString("|")
      s"""$id,"Movie $id ($year)",$gs"""
    }
    writeCsv("movies", "movieId,title,genres", movies)

    // ratings carry a RANK-10 latent structure (taste · movie factors)
    // plus noise, so the reference's CV grid (rank 5 vs 10,
    // `03.movielens-gold.py:86-111`) has real structure to find — pure
    // noise would make the smaller rank win by underfitting less
    def latent(kind: Int, id: Long): Array[Double] = {
      val r = new scala.util.Random(seed * 7919 + kind * 131 + id)
      Array.fill(10)(r.nextGaussian() * 0.5)
    }
    val ratings = for {
      u <- 1L to nUsers.toLong
      m <- rnd.shuffle(movieIds).take(40 + rnd.nextInt(10))
    } yield {
      val structure = latent(1, u).zip(latent(2, m)).map(p => p._1 * p._2).sum
      val r = math.max(0.5, math.min(5.0, 3.0 + structure + 0.3 * rnd.nextGaussian()))
      val rounded = math.round(r * 2) / 2.0
      val ts = 1500000000L + rnd.nextInt(100000000)
      s"$u,$m,$rounded,$ts"
    }
    writeCsv("ratings", "userId,movieId,rating,timestamp", ratings)

    writeCsv("links", "movieId,imdbId,tmdbId",
      movieIds.map(id => s"$id,tt${1000000 + id},${2000 + id}"))
    writeCsv("trailers", "youtubeId,movieId,title",
      movieIds.map(id => s"yt$id,$id,Trailer $id"))
  }

  /** Bronze: 4 incremental CSV ingestions with the reference's schema
    * hints (`01.movielens-bronze.py:46,65,84,103`).
    */
  def bronze(spark: SparkSession, root: String): Unit = {
    val hints = Map(
      "movies" -> "movieId long, title string, genres string",
      "ratings" -> "userId long, movieId long, rating double, timestamp long",
      "links" -> "movieId long, imdbId string, tmdbId string",
      "trailers" -> "youtubeId string, movieId long, title string")
    val datasets = hints.toSeq.map { case (ds, hint) =>
      IngestDataset(
        name = s"movielens_$ds",
        sourceDir = s"$root/landing/$ds",
        tableDir = s"$root/bronze/$ds",
        checkpointDir = s"$root/ckpt/$ds",
        loader = LoaderConfig(format = "csv",
          schemaLocation = s"$root/schema/$ds", schemaHints = Some(hint)))
    }
    val e = new Engine(spark, datasets)
    e.start(); e.awaitAll()
  }

  /** Silver: cleaning with native functions only
    * (`02.movielens-silver.py:121-238`).
    */
  def silver(spark: SparkSession, root: String): Unit = {
    def readBronze(ds: String): DataFrame =
      LakeTable.forPath(spark, s"$root/bronze/$ds").toDF

    // movies: "Name (1995)" → title + year int; genres split, sentinel removed
    val movies = readBronze("movies")
      .where(col("_rescued_data").isNull)
      .select(
        col("movieId").as("movie_id"),
        trim(regexp_extract(col("title"), "^(.*)\\((\\d{4})\\)\\s*$", 1)).as("title"),
        regexp_extract(col("title"), "^(.*)\\((\\d{4})\\)\\s*$", 2)
          .cast("int").as("year"),
        array_remove(split(col("genres"), "\\|"), "(no genres listed)").as("genres"))
    LakeTable.create(spark, s"$root/silver/movies", movies, mode = "overwrite")

    // ratings: unix seconds → timestamp
    val ratings = readBronze("ratings")
      .where(col("_rescued_data").isNull)
      .select(
        col("userId").as("user_id"),
        col("movieId").as("movie_id"),
        col("rating"),
        to_timestamp(from_unixtime(col("timestamp"))).as("rated_at"))
    LakeTable.create(spark, s"$root/silver/ratings", ratings, mode = "overwrite")

    // links: imdb/tmdb URL building (concat + lit)
    val links = readBronze("links")
      .select(
        col("movieId").as("movie_id"),
        col("imdbId").as("imdb_id"),
        concat(lit("https://www.imdb.com/title/"), col("imdbId")).as("imdb_url"),
        col("tmdbId").as("tmdb_id"),
        concat(lit("https://www.themoviedb.org/movie/"), col("tmdbId")).as("tmdb_url"))
    LakeTable.create(spark, s"$root/silver/links", links, mode = "overwrite")

    val trailers = readBronze("trailers")
      .select(
        col("movieId").as("movie_id"),
        col("youtubeId").as("youtube_id"),
        concat(lit("https://www.youtube.com/watch?v="), col("youtubeId")).as("youtube_url"))
    LakeTable.create(spark, s"$root/silver/trailers", trailers, mode = "overwrite")
  }

  final case class GoldResult(rmse: Double, nUserRecs: Long, nItemRecs: Long)

  /** Gold: seeded ALS (same hyperparameters as the reference's best CV
    * model: rank=10, maxIter=5, regParam=0.1, nonnegative,
    * coldStartStrategy=drop, seed=42, 80/20 split —
    * `03.movielens-gold.py:63-129`) + top-5 recommendations per user and
    * per movie served as gold lake tables.
    */
  def gold(spark: SparkSession, root: String, seed: Long = 42L): GoldResult = {
    val ratings = LakeTable.forPath(spark, s"$root/silver/ratings").toDF
      .select(
        col("user_id").cast("int").as("user"),
        col("movie_id").cast("int").as("item"),
        col("rating").cast("float"))
    val Array(train, test) = ratings.randomSplit(Array(0.8, 0.2), seed)

    val als = new ALS()
      .setRank(10).setMaxIter(5).setRegParam(0.1)
      .setNonnegative(true).setColdStartStrategy("drop").setSeed(seed)
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
    val model = als.fit(train)

    val rmse = new RegressionEvaluator()
      .setMetricName("rmse").setLabelCol("rating").setPredictionCol("prediction")
      .evaluate(model.transform(test))

    val userRecs = model.recommendForAllUsers(5)
      .select(col("user").as("user_id"),
        col("recommendations").cast("array<struct<movie_id:int,rating:float>>"))
    LakeTable.create(spark, s"$root/gold/user_recommendations", userRecs,
      mode = "overwrite")
    val itemRecs = model.recommendForAllItems(5)
      .select(col("item").as("movie_id"),
        col("recommendations").cast("array<struct<user_id:int,rating:float>>"))
    LakeTable.create(spark, s"$root/gold/movie_recommendations", itemRecs,
      mode = "overwrite")

    GoldResult(rmse,
      LakeTable.forPath(spark, s"$root/gold/user_recommendations").toDF.count(),
      LakeTable.forPath(spark, s"$root/gold/movie_recommendations").toDF.count())
  }

  final case class CvResult(bestRank: Int, bestRmse: Double,
    avgMetricsByRank: Map[Int, Double])

  /** The reference's hyperparameter search (`03.movielens-gold.py:86-111`):
    * CrossValidator over rank ∈ {5, 10}, 3-fold, RMSE evaluator — the
    * tuning step whose winning config [[gold]] hardcodes. Returns the
    * best rank, the held-out RMSE of the refit best model, and the CV
    * average metric per rank.
    */
  def tuneRank(spark: SparkSession, root: String, seed: Long = 42L): CvResult = {
    val ratings = LakeTable.forPath(spark, s"$root/silver/ratings").toDF
      .select(
        col("user_id").cast("int").as("user"),
        col("movie_id").cast("int").as("item"),
        col("rating").cast("float"))
    val Array(train, test) = ratings.randomSplit(Array(0.8, 0.2), seed)

    val als = new ALS()
      .setMaxIter(5).setRegParam(0.1)
      .setNonnegative(true).setColdStartStrategy("drop").setSeed(seed)
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
    val evaluator = new RegressionEvaluator()
      .setMetricName("rmse").setLabelCol("rating").setPredictionCol("prediction")
    val ranks = Array(5, 10)
    val grid = new ParamGridBuilder().addGrid(als.rank, ranks).build()
    val cv = new CrossValidator()
      .setEstimator(als).setEvaluator(evaluator)
      .setEstimatorParamMaps(grid).setNumFolds(3).setSeed(seed)
    val model = cv.fit(train)
    val best = model.bestModel.asInstanceOf[ALSModel]
    val rmse = evaluator.evaluate(best.transform(test))
    CvResult(best.rank, rmse, ranks.zip(model.avgMetrics).toMap)
  }

  /** Full pipeline; returns the gold metrics. */
  def runAll(spark: SparkSession, root: String, seed: Long = 42L): GoldResult = {
    writeFixtures(s"$root/landing", seed = seed)
    bronze(spark, root)
    silver(spark, root)
    gold(spark, root, seed)
  }
}
