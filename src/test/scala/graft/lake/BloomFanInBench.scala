package graft.lake

import org.apache.spark.sql.functions._

/** Measurement harness for VERDICT r7 "next round" #5: a point lookup
  * that min/max cannot exclude opens ONE bloom sidecar per candidate
  * file — how bad is that fan-in at a large file count? Run with
  *
  *   sbt "Test/runMain graft.lake.BloomFanInBench [nFiles]"
  *
  * Builds an unclustered bloom-indexed table of `nFiles` files (each
  * file's id range spans the domain, so min/max never excludes and the
  * bloom is consulted for EVERY live file), then measures a cold point
  * read (every sidecar read from disk), a warm one (cache), and the
  * distributed-path variant (executor-side sidecar reads). Numbers are
  * recorded in BASELINE.md §Q.
  */
object BloomFanInBench {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(20000)
    val rowsPerFile = 20
    val spark = graft.TestSpark.session
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("bloom-fanin-").toString

    // ids hash-scattered across files: every file's (min, max) spans
    // ~the whole domain, so range skipping is structurally blind — the
    // worst case the bloom index exists for
    val df = spark.range(0L, nFiles.toLong * rowsPerFile)
      .select(col("id"), (col("id") % 1000).as("v"))
      .repartition(nFiles, col("id"))
    val t0 = System.nanoTime()
    val t = LakeTable.create(spark, s"$root/t", df,
      properties = Map(BloomIndex.COLS_PROP -> "id"))
    val buildSec = (System.nanoTime() - t0) / 1e9
    val files = t.snapshot.files.size
    println(f"[fanin] built $files%d files (+sidecars) in $buildSec%.1f s")

    // MID-DOMAIN keys: P(a file's min exceeds the key or its max falls
    // below it) ~ 2·(1/2)^rowsPerFile — range skipping is structurally
    // blind, so the bloom is consulted for (essentially) EVERY file;
    // a low key would let min/max shortcut most of the fan-in and
    // measure the wrong thing
    val mid = nFiles.toLong * rowsPerFile / 2
    def probe(label: String, t: LakeTable, key: Long): Unit = {
      BloomMetrics.reset()
      val t1 = System.nanoTime()
      val n = t.read(col("id") === key).count()
      val sec = (System.nanoTime() - t1) / 1e9
      println(f"[fanin] $label%s: $sec%.2f s, rows=$n%d, " +
        f"bloom-skipped=${BloomMetrics.skippedByBloom.get()}%d of $files%d")
    }
    probe("cold driver-side point read ", t, mid + 1)
    probe("warm driver-side point read ", t, mid + 1)
    probe("fresh-key driver point read ", t, mid + 3) // sidecars cached

    // distributed path: candidates resolve through the checkpoint scan,
    // sidecars read ON EXECUTORS in parallel
    spark.conf.set("spark.graft.log.distributedThreshold", "1")
    try {
      LakeLog.snapshotCache.clear()
      val t2 = LakeTable.forPath(spark, s"$root/t")
      probe("warm distributed point read", t2, mid + 5) // sidecar cache shared in-JVM
      probe("dist fresh-key point read  ", t2, mid + 7)
    } finally spark.conf.unset("spark.graft.log.distributedThreshold")

    graft.TestFs.rmRf(java.nio.file.Paths.get(root))
    spark.stop()
  }
}
