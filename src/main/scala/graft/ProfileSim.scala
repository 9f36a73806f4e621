package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for heavy catalog queries (not part of the driver
  * contract; run manually via `runMain graft.ProfileSim <sfDir>`).
  */
object ProfileSim {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[prof] $tag%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    // warm-up
    spark.range(0, 1000000).selectExpr("sum(id)").collect()

    import graft.ops.Similarity._
    val data = graft.tables.Tables.embeddings(spark, sfDir)
    val queries = data.where(col("vec_id") % 100 === 0)

    timed("read+count")(data.count())
    val d = data.select(col("vec_id").as("id"), normalized(col("embedding")).as("nvec"))
      .repartition(col("id"))
    timed("normalize+repartition")(d.write.mode("overwrite").format("noop").save())
    timed("dim head")(data.select(size(col("embedding"))).head())
    timed("sample collect") {
      d.orderBy(xxhash64(col("id"), lit(42L))).limit(4096)
        .select("nvec").collect()
    }
    timed("full ivfTopK") {
      ivfTopK(data, "embedding", "vec_id", queries, "embedding", "vec_id",
        k = 5, nLists = 8, nprobe = 3)
        .orderBy(col("q_id"), col("rank"))
        .write.mode("overwrite").format("noop").save()
    }
    timed("full ivfTopK again") {
      ivfTopK(data, "embedding", "vec_id", queries, "embedding", "vec_id",
        k = 5, nLists = 8, nprobe = 3)
        .orderBy(col("q_id"), col("rank"))
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
