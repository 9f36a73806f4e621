package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke + invariants for the SparkEntry query catalog on sf0.001. The
  * value-level oracle comparison runs in the driver (Verify + DuckDB);
  * here we assert the structural contract.
  */
class QueryCatalogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  private val sf = "/root/testdata/sf0.001"

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query names are unique") {
    val names = SparkEntry.allDefs.map(_.name)
    assert(names.distinct.size === names.size)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  for (q <- SparkEntry.allDefs) {
    test(s"${q.name} executes and is non-empty-schema") {
      val df = q.build(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("q1_pricing_summary groups are the 6 flag/status pairs") {
    val rows = SparkEntry.queries("q1_pricing_summary")(spark, sf).collect()
    assert(rows.length === 6)
  }

  test("j4_left_join keeps all customers") {
    val n = SparkEntry.queries("j4_left_join")(spark, sf).count()
    val nCust = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(n === nCust)
  }
}
