package graft.lake

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Row shape for [[SkippingFuzzSpec]] — top-level so the encoder can
  * instantiate it without an outer pointer. */
case class FuzzRow(i: Integer, l: java.lang.Long, d: java.lang.Double,
    s: String, dt: Date, ts: Timestamp, dec: java.math.BigDecimal)

/** Randomized SOUNDNESS harness for the data-skipping evaluator: for a
  * zoo of random predicates over multi-file tables with adversarial
  * values (supplementary characters, '+', empty strings, nulls, decimal
  * scales, date/timestamp literals), the pruned read must return
  * exactly the rows a full unpruned scan returns. Every skipping bug
  * this engine has had — UTF-16 vs code-point order, URL-decoded
  * partition values, truncating-cast unwrap, unscaled decimal stats —
  * would surface here as a lost row; the harness also asserts pruning
  * is not vacuous (some file is actually skipped across the run).
  */
class SkippingFuzzSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private val strings = Seq(
    "", "a", "abc", "UTC+8", "zz", "￿",
    new String(Character.toChars(0x1F600)), // supplementary
    "café", "a b", "%wild_", "nul\u0000byte")

  // partition VALUES become directory names; this container's JVM runs a
  // non-UTF-8 locale, so non-ASCII dir names fail in java.nio (an
  // environment limit, not engine behavior — Hive escaping leaves them
  // literal). ASCII-only pool, still covering the escaping-sensitive
  // shapes ('+', '=', ':', '%', space).
  private val asciiStrings = Seq(
    "a", "abc", "UTC+8", "zz", "a b", "%wild_", "k=v", "t:x", "dot.y")

  private def randomRows(rnd: scala.util.Random, n: Int,
      pool: Seq[String]): Seq[FuzzRow] =
    (0 until n).map { _ =>
      def nul[T >: Null](v: T): T = if (rnd.nextInt(10) == 0) null else v
      FuzzRow(
        nul(Int.box(rnd.nextInt(50) - 10)),
        nul(Long.box(rnd.nextLong() % 1000L)),
        nul(Double.box(math.rint(rnd.nextDouble() * 200 - 100) / 10)),
        nul(pool(rnd.nextInt(pool.length))),
        nul(Date.valueOf(f"2024-${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d")),
        nul(Timestamp.valueOf(
          f"2024-06-${1 + rnd.nextInt(28)}%02d 0${rnd.nextInt(10)}:00:00")),
        nul(new java.math.BigDecimal(rnd.nextInt(2000) - 1000).movePointLeft(2)))
    }

  /** One random atom over a random column. Literals mix values present
    * in the data with near-misses. */
  private def atom(rnd: scala.util.Random): Column = {
    def sLit = strings(rnd.nextInt(strings.length))
    def iLit = rnd.nextInt(60) - 15
    def dLit = math.rint(rnd.nextDouble() * 220 - 110) / 10
    def dtLit = Date.valueOf(f"2024-${1 + rnd.nextInt(12)}%02d-15")
    def decLit = new java.math.BigDecimal(rnd.nextInt(2200) - 1100).movePointLeft(2)
    rnd.nextInt(12) match {
      case 0 => col("i") === iLit
      case 1 => col("i") > iLit
      case 2 => col("l") <= rnd.nextLong() % 1000L
      case 3 => col("d") < dLit
      case 4 => col("s") === sLit
      case 5 => col("s") >= sLit
      case 6 => col("s").startsWith(sLit.take(1 + rnd.nextInt(2)))
      case 7 => col("dt") > dtLit
      case 8 => col("ts") <= lit(Timestamp.valueOf("2024-06-15 05:00:00"))
      case 9 => col("dec") === decLit
      case 10 => if (rnd.nextBoolean()) col("s").isNull else col("i").isNotNull
      case 11 => rnd.nextInt(3) match {
        case 0 => col("i").isin(iLit, iLit + 3, iLit - 7)
        case 1 => col("s").like(sLit.take(1) + "%")
        case 2 => col("d").cast("int") === rnd.nextInt(12) - 6
      }
    }
  }

  private def predicate(rnd: scala.util.Random, depth: Int = 2): Column =
    if (depth == 0 || rnd.nextInt(3) == 0) {
      val a = atom(rnd)
      if (rnd.nextInt(4) == 0) !a else a
    } else if (rnd.nextBoolean())
      predicate(rnd, depth - 1) && predicate(rnd, depth - 1)
    else
      predicate(rnd, depth - 1) || predicate(rnd, depth - 1)

  /** The test-side twin of the engine's filter resolution, to count
    * pruned files (the engine's own is private). */
  private def resolve(c: Column, schema: org.apache.spark.sql.types.StructType) = {
    import org.apache.spark.sql.catalyst.optimizer.{ConstantFolding, ReplaceExpressions}
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    ConstantFolding(ReplaceExpressions(empty.where(c).queryExecution.analyzed))
      .collectFirst { case f: Filter => f.condition }
      .getOrElse(org.apache.spark.sql.catalyst.expressions.Literal(true))
  }

  private def fullScan(t: LakeTable): DataFrame = {
    val snap = t.snapshot
    spark.read.schema(snap.schema).option("basePath", t.path)
      .parquet(snap.files.map(f => s"${t.path}/${f.path}"): _*)
  }

  // the bloom arm runs the identical predicate zoo over a bloom-indexed
  // copy (adversarial strings included): a hash-parity or probe-order
  // bug surfaces here as a lost row, and non-vacuity asserts the bloom
  // actually proved absences across the run
  for ((seed, partitioned, bloom) <- Seq(
      (11L, false, false), (12L, false, false), (13L, true, false),
      (14L, false, true))) {
    test(s"random predicates lose no rows through pruning " +
        s"(seed $seed${if (partitioned) ", partitioned" else ""}" +
        s"${if (bloom) ", bloom-indexed" else ""})") {
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"skip-fuzz-$seed-").toString
      val pby = if (partitioned) Seq("s") else Seq.empty
      val pool = if (partitioned) asciiStrings else strings
      val props =
        if (bloom) Map(BloomIndex.COLS_PROP -> "i,l,s,dt,ts,dec",
          BloomIndex.FPP_PROP -> "0.01")
        else Map.empty[String, String]
      val t = LakeTable.create(spark, dir,
        randomRows(rnd, 60, pool).toDF().coalesce(2), partitionBy = pby,
        properties = props)
      t.append(randomRows(rnd, 60, pool).toDF().coalesce(3))
      t.append(randomRows(rnd, 40, pool).toDF().coalesce(2))
      val snap = t.snapshot
      assert(snap.files.size >= 4, "fixture must span several files")
      val pcs = snap.metaData.partitionColumns

      val reference = fullScan(t)
      var prunedSomething = false
      if (bloom) BloomMetrics.reset()
      (1 to 40).foreach { k =>
        val pred = predicate(rnd)
        val resolved = resolve(pred, snap.schema)
        val survivors =
          snap.files.count(f => Stats.mightMatch(f, resolved, snap.schema, pcs))
        if (survivors < snap.files.size) prunedSomething = true
        val got = t.read(pred).groupBy().agg(
          count(lit(1)), sum("i"), sum("l")).collect().head
        val want = reference.where(pred).groupBy().agg(
          count(lit(1)), sum("i"), sum("l")).collect().head
        assert(got === want,
          s"predicate #$k $pred lost rows (pruned ${snap.files.size - survivors}" +
            s"/${snap.files.size} files): got $got, want $want")
      }
      assert(prunedSomething,
        "no predicate pruned any file — the harness is vacuous")
      if (bloom) assert(BloomMetrics.skippedByBloom.get() > 0,
        "the bloom never proved an absence — the bloom arm is vacuous")
    }
  }
}
