package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing: assign documents to fixed-budget
  * training sequences (the "pack short documents into 2k/8k-token
  * examples" step of an LLM data pipeline) without splitting documents.
  *
  * Greedy-in-order packing as ONE window pass per shard: running token
  * sum over the shard's deterministic order, sequence id =
  * floor((cumsum - n_tokens) / budget) — a document starts a new
  * sequence when the budget would overflow BEFORE it. A sequence can
  * exceed the budget only by its final document's overhang (the
  * standard greedy guarantee); oversized single documents get their own
  * sequence.
  *
  * Scale shape: the window partitions by `shardCols`, so per-task state
  * is one shard's documents — shard by date/language/hash-bucket and
  * the pass is embarrassingly parallel. No global ordering, no
  * single-partition window.
  */
object Packing {

  def packGreedy(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budget: Long,
      shardCols: Seq[String]): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shardCols.nonEmpty,
      "packing needs shard columns — a global window cannot scale")
    val w = Window.partitionBy(shardCols.map(col): _*).orderBy(col(idCol))
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn("seq_id",
        floor((col("__cum") - col(tokenCol)) / budget))
      .drop("__cum")
  }

  /** Per-sequence summary (docs, tokens) — the frame a packing job
    * would hand to the tokenizer stage. */
  def sequences(packed: DataFrame, tokenCol: String,
      shardCols: Seq[String]): DataFrame =
    packed.groupBy((shardCols :+ "seq_id").map(col): _*)
      .agg(count(lit(1)).as("n_docs"), sum(col(tokenCol)).as("n_tokens"))
}
