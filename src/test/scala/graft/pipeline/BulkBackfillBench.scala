package graft.pipeline

import org.apache.spark.sql.functions._

/** Measurement harness for the bulk-backfill path (VERDICT r9 #5): a
  * corpus-sized wave pushed through [[CorpusPipeline.curateBulk]] — all
  * three gates in their AQE-degrading oversized mode — vs the same wave
  * through the micro-batch [[CorpusPipeline.curateIncremental]]. Run with
  *
  *   sbt "Test/runMain graft.pipeline.BulkBackfillBench [sfDir]"
  *
  * The corpus is half the sf documents table (with joined embeddings);
  * the wave is the other half plus near-dup salt, so every gate does
  * real work at corpus scale. Numbers land in BASELINE.md §S.
  */
object BulkBackfillBench {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.TestSpark.session
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[A](label: String)(body: => A): A = {
      System.gc()
      val t0 = System.nanoTime()
      val a = body
      println(f"[bulk-bench] $label%s: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }

    // documents ⋈ embeddings (vec_id keys a subset of doc ids; docs
    // without one get a deterministic hash-derived vector so the
    // semantic gate covers the whole corpus)
    val docs = graft.tables.Tables.documents(spark, sf)
      .select("doc_id", "text")
    val emb = graft.tables.Tables.embeddings(spark, sf)
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val dim = 64 // the embeddings table's dimensionality
    val hashVec = transform(sequence(lit(1), lit(dim)), i =>
      (pmod(xxhash64(col("doc_id"), i), lit(1000)).cast("float") - 500.0f) / 500.0f)
    val all = docs.join(emb, Seq("doc_id"), "left")
      .withColumn("embedding",
        coalesce(col("embedding").cast("array<float>"), hashVec))

    val corpusHalf = all.where($"doc_id" % 2 === 0)
    val waveFresh = all.where($"doc_id" % 2 === 1)
    // near-dup salt: 5% of the corpus re-enters with a textual tail
    val salt = corpusHalf.where($"doc_id" % 40 === 0)
      .select(($"doc_id" + 10000000L).as("doc_id"),
        concat($"text", lit(" backfill tail")).as("text"),
        $"embedding")
    val wave = waveFresh.unionByName(salt).cache()
    val waveN = wave.count()

    def run(label: String,
        go: (String, org.apache.spark.sql.DataFrame) => CorpusPipeline.IncrementResult)
        : Unit = {
      val root = java.nio.file.Files.createTempDirectory("bulk-bench-").toString
      timed(s"$label: initial curate")(
        CorpusPipeline.curate(spark, corpusHalf, root, minQuality = 0.0,
          minTokens = 0, nearDupThreshold = 0.99, fuzzyIndex = true,
          vecCol = Some("embedding"), semNLists = 16))
      val r = timed(s"$label: wave ($waveN docs)")(go(root, wave))
      println(s"[bulk-bench] $label: appended ${r.appended} of ${r.input}")
    }

    run("bulk", (root, w) => CorpusPipeline.curateBulk(spark, w, root,
      minQuality = 0.0, minTokens = 0, fuzzyDedup = true,
      vecCol = Some("embedding")))
    run("incremental", (root, w) => CorpusPipeline.curateIncremental(spark,
      w, root, minQuality = 0.0, minTokens = 0, fuzzyDedup = true,
      vecCol = Some("embedding")))

    wave.unpersist()
    spark.stop()
  }
}
