package graft.ops

import org.apache.spark.sql.functions._

/** Measurement harness for VERDICT r8 "next round" #1: what does
  * compacting a churned minhash index actually cost, and what does the
  * stale-candidate tax look like before/after? Run with
  *
  *   sbt "Test/runMain graft.ops.IndexCompactionBench [sfDir]"
  *
  * Builds the postings index over the sf documents table, syncs one
  * wave, deletes 50% of the source, then measures: a gate probe against
  * the STALE index (extra candidates, all removed by exact
  * verification), the compaction itself (touched-file rewrite), and the
  * same probe against the compacted index. Numbers land in
  * BASELINE.md §R.
  */
object IndexCompactionBench {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.TestSpark.session
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("compact-bench-").toString
    val docs = graft.tables.Tables.documents(spark, sf).select("doc_id", "text")

    def timed[A](label: String)(body: => A): A = {
      System.gc()
      val t0 = System.nanoTime()
      val a = body
      println(f"[compact-bench] $label%s: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    def materialize(df: org.apache.spark.sql.DataFrame): Long = df.count()

    val t = timed("corpus create")(graft.lake.LakeTable.create(spark,
      s"$root/src", docs.where(col("doc_id") % 10 =!= 0),
      properties = Map(graft.lake.Cdc.PROP -> "true")))
    timed("index build")(Dedup.buildMinhashIndexFromTable(spark,
      s"$root/idx", s"$root/src", "text", "doc_id"))
    val post = graft.lake.LakeTable.forPath(spark, s"$root/idx/postings")
    println(s"[compact-bench] postings rows=${post.toDF.count()} " +
      s"files=${post.snapshot.files.size}")

    t.append(docs.where(col("doc_id") % 10 === 0))
    timed("sync")(Dedup.syncMinhashIndexFromTable(spark,
      s"$root/idx", s"$root/src", "text", "doc_id"))

    timed("delete 50% of source")(t.delete(col("doc_id") % 2 === 0))

    val wave = docs.where(col("doc_id") % 20 === 5).limit(500)
      .select((col("doc_id") + 9000000L).as("doc_id"),
        concat(col("text"), lit(" probe tail")).as("text"))
      .cache()
    wave.count()
    timed("gate vs STALE index (warm-up)")(materialize(
      Dedup.minhashNewAgainstIndex(spark, s"$root/idx", wave,
        "text", "doc_id", threshold = 0.5)))
    timed("gate vs STALE index")(materialize(
      Dedup.minhashNewAgainstIndex(spark, s"$root/idx", wave,
        "text", "doc_id", threshold = 0.5)))

    val before = post.snapshot.files.size
    val dropped = timed("compactMinhashIndex")(
      Dedup.compactMinhashIndex(spark, s"$root/idx", "doc_id"))
    val ci = post.snapshot.commits.last._2
    println(s"[compact-bench] dropped=$dropped touched=${
      ci.parameters.getOrElse("touchedFiles", "?")} skipped=${
      ci.parameters.getOrElse("skippedFiles", "?")} filesBefore=$before " +
      s"filesAfter=${post.snapshot.files.size} " +
      s"rowsAfter=${post.toDF.count()}")

    timed("gate vs COMPACTED index")(materialize(
      Dedup.minhashNewAgainstIndex(spark, s"$root/idx", wave,
        "text", "doc_id", threshold = 0.5)))
    timed("second compact (no-op)")(
      Dedup.compactMinhashIndex(spark, s"$root/idx", "doc_id"))

    // ---- IVF arm: churn LOCALIZED to one inverted list — the purge
    // must rewrite only that list's partition files and skip the rest
    // (the file-granularity win minhash postings can't show: band keys
    // scatter, cluster membership doesn't)
    println("[compact-bench] --- IVF partition-locality arm ---")
    val dim = 16
    val rnd = new scala.util.Random(99)
    val centers = Array.fill(16)(Array.fill(dim)(rnd.nextGaussian() * 4))
    val vecs = (0 until 200000).map { i =>
      val c = centers(i % 16)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.2).toFloat))
    }
    val vsrc = timed("ivf corpus create")(graft.lake.LakeTable.create(spark,
      s"$root/vsrc", spark.createDataFrame(vecs).toDF("vec_id", "embedding"),
      properties = Map(graft.lake.Cdc.PROP -> "true")))
    timed("ivf index build")(Similarity.rebuildIvfIndexFromTable(spark,
      s"$root/vidx", s"$root/vsrc", "embedding", "vec_id", nLists = 16))
    val asg = graft.lake.LakeTable.forPath(spark, s"$root/vidx/assignments")
    val filesBefore = asg.snapshot.files.size
    // delete exactly one list's members (cluster membership from the
    // index itself) — churn that a real takedown/retention sweep shows
    val oneList = asg.toDF.where(col("list_id") === 0)
      .select(col("id")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet.toSeq.sorted.take(5000)
    timed(s"delete list-0 members (${oneList.size} rows)")(
      vsrc.delete(col("vec_id").isin(oneList: _*)))
    val dropped2 = timed("compactIvfIndex")(
      Similarity.compactIvfIndex(spark, s"$root/vidx", "vec_id"))
    val ci2 = asg.snapshot.commits.last._2
    println(s"[compact-bench] ivf dropped=$dropped2 touched=${
      ci2.parameters.getOrElse("touchedFiles", "?")} skipped=${
      ci2.parameters.getOrElse("skippedFiles", "?")} " +
      s"filesBefore=$filesBefore filesAfter=${asg.snapshot.files.size}")
  }
}
