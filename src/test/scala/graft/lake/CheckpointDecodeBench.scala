package graft.lake

/** Measurement harness for NEXT r8 follow-up #0: how fast does the
  * DRIVER-side resolution path decode a checkpoint? Decides whether
  * `readMultipart`'s serial per-part `Checkpoint.read` loop needs a
  * thread pool. No Spark needed — the codec is plain parquet-hadoop.
  *
  *   sbt "Test/runMain graft.lake.CheckpointDecodeBench [rows] [parts]"
  *
  * Numbers recorded in NEXT.md (round-9 follow-up #0).
  */
object CheckpointDecodeBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(1000000)
    val parts = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val dir = java.nio.file.Files.createTempDirectory("ckpt-decode-")
    val perPart = rows / parts

    def mkAdd(i: Int) = AddFile(
      path = f"part-$i%08d-0000-4000-8000-000000000000-c000.snappy.parquet",
      partitionValues = Map.empty, size = 123456L, modificationTime = 1700000000000L + i,
      stats = Some(FileStats(20L,
        Map("id" -> (i * 20L).toString, "v" -> "aaaa"),
        Map("id" -> (i * 20L + 19).toString, "v" -> "zzzz"),
        Map("id" -> 0L, "v" -> 0L))))

    val meta = MetaData("bench-id", "id BIGINT, v STRING", Seq.empty,
      Map.empty, 1700000000000L, None)
    val partPaths = (1 to parts).map { p =>
      val path = dir.resolve(LakeLog.multipartCheckpointFileName(100L, p, parts))
      val head: Iterator[Action] =
        if (p == 1) Iterator.single(Action.of(meta)) else Iterator.empty
      val base = (p - 1) * perPart
      Checkpoint.write(path,
        (head ++ (0 until perPart).iterator.map(i => Action.of(mkAdd(base + i)))).toSeq)
      path
    }

    // serial decode, as readMultipart does today; warm-up rep first
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = partPaths.map(Checkpoint.read(_).size).sum
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[decode] rep $rep%d: $n%d actions in $sec%.2f s " +
        f"(${n / sec / 1e6}%.2f M rows/s serial)")
    }
    // parallel decode across parts — the candidate improvement
    for (rep <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = partPaths.par2map(Checkpoint.read(_).size).sum
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[decode] parallel rep $rep%d: $n%d actions in $sec%.2f s")
    }
    graft.TestFs.rmRf(dir)
  }

  private implicit class ParOps[A](private val xs: Seq[A]) extends AnyVal {
    def par2map[B](f: A => B): Seq[B] = {
      import java.util.concurrent.Executors
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = Executors.newFixedThreadPool(math.min(xs.size, 8))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try Await.result(Future.sequence(xs.map(x => Future(f(x)))), Duration.Inf)
      finally pool.shutdown()
    }
  }
}
