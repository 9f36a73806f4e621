package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** LIKE-'p%' / startsWith file skipping: matching rows lie in the
  * lexicographic range [p, incrementLast(p)), so footer min/max stats
  * can prove a file empty for a prefix predicate — the string analog of
  * numeric range skipping. Only the single-trailing-%% LIKE shape maps
  * to a prefix; every other pattern must stay unskipped.
  */
class PrefixSkippingSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  private def freshTable(): LakeTable = {
    val dir = Files.createTempDirectory("skip-prefix-").toString
    // two files, disjoint prefix ranges: AA..AZ and MA..MZ
    val df = (('A' to 'Z').map(c => s"AA$c") ++ ('A' to 'Z').map(c => s"MA$c"))
      .toDF("s").repartitionByRange(2, $"s")
    LakeTable.create(spark, s"$dir/t", df)
  }

  test("prefix predicates skip files whose range excludes the prefix") {
    val t = freshTable()
    // 'AA%' hits only the first file; 'MA%' only the second
    assert(t.read(col("s").startsWith("AA")).inputFiles.length === 1)
    assert(t.read(col("s").like("MA%")).inputFiles.length === 1)
    // a prefix between the two files' ranges hits neither
    assert(t.read(col("s").like("E%")).inputFiles.isEmpty)
    // beyond both ranges
    assert(t.read(col("s").startsWith("Z")).inputFiles.isEmpty)
    // results stay correct where files do match
    assert(t.read(col("s").like("AA%")).count() === 26)
    assert(t.read(col("s").like("X%")).count() === 0)
  }

  test("non-prefix LIKE shapes never skip") {
    val t = freshTable()
    // leading/inner wildcards carry no range — all files scanned
    assert(t.read(col("s").like("%AZ")).inputFiles.length === 2)
    assert(t.read(col("s").like("A_C%")).inputFiles.length === 2)
    assert(t.read(col("s").like("%A%")).count() === 52)
    // negated prefix must not flip into an unsound skip
    assert(t.read(!col("s").startsWith("AA")).count() === 26)
  }

  test("prefix skipping composes with DML candidate selection") {
    val t = freshTable()
    t.delete(col("s").like("MA%"))
    assert(t.toDF.count() === 26)
    assert(t.read(col("s").startsWith("AA")).count() === 26)
  }
}
