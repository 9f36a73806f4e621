package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.lake.{LakeTable, MergeClause}

object ProfileLake {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-job breakdown: where a 2-second merge actually spends its time
    val profJobs = sys.env.contains("PROF_JOBS")
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    if (profJobs) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          // properties is a nullable field on the event
          val props = Option(e.properties)
          jobStarts.put(e.jobId, (e.time,
            props.flatMap(p => Option(p.getProperty("spark.job.description")))
              .orElse(props.flatMap(p => Option(p.getProperty("callSite.short"))))
              .getOrElse("?")))
        }
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val (t0, desc) = jobStarts.getOrDefault(e.jobId, (e.time, "?"))
          jobStarts.remove(e.jobId) // bounded under PROF_REPS-long runs
          println(f"[job] ${e.jobId}%3d ${(e.time - t0) / 1e3}%7.3f s  ${desc.take(90)}")
        }
      })
    def timed(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[prof] $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    // warm
    {
      val w = java.nio.file.Files.createTempDirectory("pw-").toString
      val df = spark.range(0, 100).selectExpr("id", "id * 1.0 as v")
      val t = LakeTable.create(spark, s"$w/t", df)
      t.merge(df.withColumn("v", col("v") + 1), expr("t.id = s.id"))
    }
    // PROF_REPS=n loops the create/merge/read cycle n times — long runs
    // give external samplers (jstack) enough merge wall-time to attribute
    // the driver-side share of the per-commit fixed cost
    val reps = sys.env.get("PROF_REPS").flatMap(_.toIntOption).getOrElse(2)
    for (rep <- 1 to reps) {
      val customer = graft.tables.Tables.customer(spark, sfDir)
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      val dir = java.nio.file.Files.createTempDirectory("pl-").toString
      var t: LakeTable = null
      timed(s"create rep$rep") { t = LakeTable.create(spark, s"$dir/t", customer) }
      val source = customer.where(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), (col("c_acctbal") + 100).as("new_bal"))
        .unionByName(customer.where(col("c_custkey") % 7 === 0)
          .select((col("c_custkey") + 1000000).as("c_custkey"), lit(1.0).as("new_bal")))
      timed(s"merge rep$rep") {
        t.mergeClauses(source, col("t.c_custkey") === col("s.c_custkey"),
          matchedClauses = Seq(
            MergeClause.Delete(Some(col("t.c_acctbal") < 0)),
            MergeClause.Update(None, Map("c_acctbal" -> col("s.new_bal")))),
          notMatchedClauses = Seq(MergeClause.Insert(None, Map(
            "c_custkey" -> col("s.c_custkey"), "c_name" -> lit("merged"),
            "c_acctbal" -> col("s.new_bal"), "c_mktsegment" -> lit("NONE")))),
          notMatchedBySourceClauses = Seq.empty)
      }
      timed(s"read rep$rep") {
        t.toDF.write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
