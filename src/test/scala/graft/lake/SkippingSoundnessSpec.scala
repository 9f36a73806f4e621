package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Regression tests for the soundness fixes a directory-wide review of
  * the lake layer surfaced: each of these encodes a way the engine
  * could silently LOSE rows (unsound skipping, partition-value
  * corruption, stale pruning bounds) or destroy data (vacuum through a
  * pinned handle), and each failed before its fix.
  */
class SkippingSoundnessSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("lake-sound-").toString

  test("vacuum through a time-travel handle is refused") {
    val path = tmpDir()
    val t = LakeTable.create(spark, path,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.append(Seq((3L, "c")).toDF("id", "v"))
    // the pinned snapshot's file set is NOT the live set — a vacuum
    // from here would age out every post-v0 file by mtime and delete
    // current table data
    val e = intercept[IllegalArgumentException] { t.asOf(0).vacuum(0) }
    assert(e.getMessage.contains("time-travel"))
    assert(t.toDF.count() === 3)
  }

  test("partition values containing '+' round-trip (no URL-decode corruption)") {
    val path = tmpDir()
    val t = LakeTable.create(spark,
      path,
      Seq(("UTC+8", 1L), ("UTC-5", 2L)).toDF("tz", "id"),
      partitionBy = Seq("tz"))
    // the writer leaves '+' literal in the dir name (Hive escaping);
    // URLDecoder turned it into a space, so the recorded partition
    // value never equaled the queried literal again
    assert(t.snapshot.files.exists(_.partitionValues.get("tz").contains("UTC+8")))
    assert(t.read(col("tz") === "UTC+8").count() === 1)
    t.delete(col("tz") === "UTC+8")
    assert(t.toDF.count() === 1)
  }

  test("truncating casts do not prune on the child column's stats") {
    val path = tmpDir()
    // one file whose double stats are [3.5, 3.9]: every row satisfies
    // cast(v as int) === 3, but comparing the literal 3 against the
    // child stats "proves" min > 3 and skipped the file — the delete
    // silently removed nothing
    val t = LakeTable.create(spark, path,
      Seq((1L, 3.5), (2L, 3.7), (3L, 3.9)).toDF("id", "v").coalesce(1))
    assert(t.read(col("v").cast("int") === 3).count() === 3)
    t.delete(col("v").cast("int") === 3)
    assert(t.toDF.count() === 0)
  }

  test("exact widening casts still prune") {
    val path = tmpDir()
    val t = LakeTable.create(spark, path,
      Seq((1L, 10), (2L, 20)).toDF("id", "v").coalesce(1))
    // int→long is value-preserving: the cast unwraps and stats skip
    assert(t.read(col("v").cast("long") === 99L).count() === 0)
    assert(t.read(col("v").cast("long") === 10L).count() === 1)
  }

  test("string stats compare in UTF-8 byte order (supplementary chars)") {
    val path = tmpDir()
    // min = U+FFFD, max = U+1F600 in byte order; UTF-16 code-unit order
    // says U+FFFD > U+1F600's surrogates, so the old compare proved
    // min > literal and skipped the file that CONTAINS the literal
    val emoji = new String(Character.toChars(0x1F600))
    val t = LakeTable.create(spark, path,
      Seq((1L, "�"), (2L, emoji)).toDF("id", "s").coalesce(1))
    // the test must exercise the comparison, not a stats-absent
    // fallback: byte order puts U+FFFD below the emoji
    val st = t.snapshot.files.head.stats.get
    assert(st.minValues.get("s").contains("�"), st.minValues)
    assert(st.maxValues.get("s").contains(emoji), st.maxValues)
    assert(t.read(col("s") === emoji).count() === 1)
    t.delete(col("s") === emoji)
    assert(t.toDF.select("s").as[String].collect().toSeq === Seq("�"))
  }

  test("merge range pruning skips order-incompatible key types") {
    val path = tmpDir()
    // source key is STRING: lexicographic min/max is ("10", "9") — an
    // empty numeric range that pruned the k=9 file, so its matched row
    // was never claimed and the merge INSERTED a duplicate instead of
    // updating
    val t = LakeTable.create(spark, path,
      Seq((9, "old9"), (10, "old10"), (100, "old100")).toDF("k", "v"))
    val src = Seq(("9", "new9"), ("10", "new10")).toDF("k", "v")
    t.merge(src, expr("t.k = s.k"),
      whenMatchedUpdate = Some(Map.empty),
      whenNotMatchedInsert = Some(Map.empty))
    val rows = t.toDF.as[(Int, String)].collect().toMap
    assert(t.toDF.count() === 3, "no duplicate keys may appear")
    assert(rows(9) === "new9" && rows(10) === "new10" && rows(100) === "old100")
  }

  test("restore reverts table properties, not just the schema") {
    val path = tmpDir()
    val t = LakeTable.create(spark, path, Seq((1L, "a")).toDF("id", "v"))
    t.setProperties(Map("pipeline.stage" -> "bronze"))
    assert(t.snapshot.metaData.properties.get("pipeline.stage").contains("bronze"))
    t.restore(0)
    assert(!t.snapshot.metaData.properties.contains("pipeline.stage"),
      "v0 had no properties — the restore must revert the metadata too")
  }

  test("decimal footer stats are scaled and decimal predicates prune") {
    val path = tmpDir()
    val df = Seq("1.23", "4.56").toDF("raw")
      .select(col("raw").cast("decimal(10,2)").as("d"))
    val t = LakeTable.create(spark, path, df.coalesce(1))
    val stats = t.snapshot.files.head.stats.get
    // precision 10 stores as INT64: the footer's unscaled 123 must
    // re-scale to the same canonical rendering the aggregation path
    // writes, or the two stats populations are incomparable forever
    assert(stats.minValues.get("d").contains("1.23"), stats.minValues)
    assert(stats.maxValues.get("d").contains("4.56"), stats.maxValues)
    assert(t.read(col("d") === new java.math.BigDecimal("1.23")).count() === 1)
    assert(t.read(col("d") === new java.math.BigDecimal("9.99")).count() === 0)
  }

  test("footer string bounds merge across row groups in code-point order") {
    // a file with TWO row groups: the first holds U+FFFF values, the
    // second a supplementary character (U+1F600). UTF-16 code units
    // order "￿" ABOVE the surrogate pair, so the pre-fix per-block
    // merge recorded max = U+FFFF — and an exact match on the true max
    // (the emoji) "proved" max < literal and skipped the file.
    val dir = tmpDir()
    val pad = "x" * 200 // push each group past the tiny block size
    val hi = "￿" + pad
    val emoji = new String(Character.toChars(0x1F600)) + pad
    val rows = (0 until 150).map(i => (i.toLong, hi)) ++
      (150 until 300).map(i => (i.toLong, emoji))
    rows.toDF("id", "s").coalesce(1).write
      .option("parquet.block.size", "1024")
      .option("parquet.page.size", "1024")
      .mode("overwrite").parquet(dir)
    val file = graft.util.Fs.listDir(java.nio.file.Paths.get(dir))
      .map(_.toString).filter(_.endsWith(".parquet")).head
    // the scenario needs >1 row group, or the merge never runs
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(file),
        spark.sparkContext.hadoopConfiguration))
    val nBlocks = try reader.getFooter.getBlocks.size finally reader.close()
    assert(nBlocks > 1, s"fixture must span row groups, got $nBlocks")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType)))
    val stats = Stats.collectFromFooters(spark, schema, Seq(file))
      .values.head
    assert(stats.maxValues.get("s").contains(emoji),
      s"file max must be the code-point max, got ${stats.maxValues.get("s")}")
    assert(stats.minValues.get("s").contains(hi), stats.minValues)
  }
}
