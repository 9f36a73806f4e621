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
  }
}
