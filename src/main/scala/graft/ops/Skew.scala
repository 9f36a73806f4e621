package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins (builder brief: "salting for skew,
  * AQE for runtime re-plan"). AQE's skew-join split handles most cases
  * at runtime; explicit salting remains the tool when one hot key
  * dominates a shuffle join whose build side can't broadcast.
  */
object Skew {

  /** Salted equi-join: the left (large, skewed) side gets a random salt
    * in [0, saltFactor); the right side is replicated across every salt
    * value; the join key becomes (key, salt), spreading each hot key
    * over `saltFactor` reducers. Result columns = left ++ right (join
    * key deduplicated), exactly like `left.join(right, key)`.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // the RIGHT side is replicated saltFactor×, so any join type that
    // emits unmatched right rows would emit each of them saltFactor
    // times; left-preserving types are the only sound ones here
    require(Set("inner", "left", "leftouter", "left_outer", "leftsemi",
      "left_semi", "semi", "leftanti", "left_anti", "anti", "cross")
      .contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin replicates the right side; join type '$joinType' would " +
        "duplicate unmatched right rows — salt the other side instead")
    val salted = left.withColumn("__salt",
      (rand(42) * saltFactor).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
