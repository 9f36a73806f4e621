package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Token-budget sequence packing ([[Packing]]). */
class PackingSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session
  import spark.implicits._

  test("greedy packing: budget respected up to the final doc's overhang") {
    val docs = Seq(
      ("a", 1L, 300L), ("a", 2L, 300L), // seq 0 (600 = budget + overhang)
      ("a", 3L, 300L), ("a", 4L, 700L), // seq 1 (starts at cum 600/900)
      ("b", 5L, 100L), ("b", 6L, 100L), ("b", 7L, 100L))
      .toDF("shard", "id", "n")
    val packed = Packing.packGreedy(docs, "id", "n", budget = 512L, Seq("shard"))
      .select("shard", "id", "seq_id")
      .as[(String, Long, Long)].collect().toMap2
    // shard a: cum 300,600,900,1600 → starts 0,300,600,900 → seq 0,0,1,1
    assert(packed(("a", 1L)) === 0L && packed(("a", 2L)) === 0L)
    assert(packed(("a", 3L)) === 1L && packed(("a", 4L)) === 1L)
    // shard b packs all three into one sequence
    assert(Seq(5L, 6L, 7L).map(i => packed(("b", i))).distinct === Seq(0L))
  }

  test("every doc is assigned; sequences never interleave shards") {
    val docs = (1L to 200L).map(i => (s"s${i % 5}", i, (i % 90) + 10))
      .toDF("shard", "id", "n")
    val packed = Packing.packGreedy(docs, "id", "n", 256L, Seq("shard"))
    assert(packed.count() === 200)
    assert(packed.where($"seq_id".isNull).count() === 0)
    // within each (shard, seq): token sum minus the LAST doc stays under
    // budget (greedy guarantee)
    val bad = Packing.sequences(packed, "n", Seq("shard"))
      .alias("sq")
      .join(packed.groupBy("shard", "seq_id")
        .agg(max("id").as("last_id")), Seq("shard", "seq_id"))
      .join(packed.select($"shard", $"id".as("last_id"), $"n".as("last_n")),
        Seq("shard", "last_id"))
      .where($"n_tokens" - $"last_n" >= 256)
    assert(bad.count() === 0)
  }

  private implicit class ToMap2(rows: Array[(String, Long, Long)]) {
    def toMap2: Map[(String, Long), Long] =
      rows.map { case (s, i, q) => (s, i) -> q }.toMap
  }
}
