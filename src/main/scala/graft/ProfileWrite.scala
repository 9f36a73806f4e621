package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-bench for the staging-write fixed cost (not part of the
  * driver contract): times small parquet writes under different configs
  * to attribute the ~0.23 s per-commit cost measured in the lifecycle
  * queries. Usage: runMain graft.ProfileWrite <sfDir>
  */
object ProfileWrite {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = graft.tables.Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    def timed(tag: String, n: Int = 6)(body: Int => Unit): Unit = {
      val ts = (1 to n).map { i =>
        val t0 = System.nanoTime(); body(i); (System.nanoTime() - t0) / 1e9
      }
      println(f"[w] $tag%-46s min ${ts.min}%.3f med ${ts.sorted.apply(n / 2)}%.3f")
    }
    def tmp() = java.nio.file.Files.createTempDirectory("pw-").toString
    // warm
    orders.where(col("o_orderkey") % 11 === 0).repartition(4)
      .write.mode("overwrite").parquet(tmp() + "/w")

    timed("filter+repartition(4).parquet  [AQE on]") { i =>
      orders.where(col("o_orderkey") % 11 === (i % 11)).repartition(4)
        .write.mode("overwrite").parquet(tmp() + "/t")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    timed("filter+repartition(4).parquet  [AQE off]") { i =>
      orders.where(col("o_orderkey") % 11 === (i % 11)).repartition(4)
        .write.mode("overwrite").parquet(tmp() + "/t")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    timed("filter.parquet (no repartition) [AQE on]") { i =>
      orders.where(col("o_orderkey") % 11 === (i % 11))
        .write.mode("overwrite").parquet(tmp() + "/t")
    }
    timed("noop filter+repartition(4)      [AQE on]") { i =>
      orders.where(col("o_orderkey") % 11 === (i % 11)).repartition(4)
        .write.mode("overwrite").format("noop").save()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    timed("noop filter+repartition(4)      [AQE off]") { i =>
      orders.where(col("o_orderkey") % 11 === (i % 11)).repartition(4)
        .write.mode("overwrite").format("noop").save()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    timed("reused-df repartition write     [AQE on]") { _ =>
      orders.where(col("o_orderkey") % 11 === 3).repartition(4)
        .write.mode("overwrite").parquet(tmp() + "/t")
    }
    spark.stop()
  }
}
