package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Lexical retrieval over a document corpus: BM25 scoring, composed
  * entirely from relational operators so Catalyst owns the plan.
  *
  * Scale shape — no per-query corpus scan once factored:
  *  1. the corpus side reduces to a POSTINGS frame (doc_id, term, tf,
  *     doc length) via one explode + one aggregation — at 100 TB this
  *     is the inverted index a pipeline would persist (partitioned by
  *     term for pruning);
  *  2. per query: filter postings to the query's terms (partition
  *     prune / pushed filter), join the tiny per-term IDF table
  *     (broadcast), one groupBy(doc) for the score sum, top-k.
  * Nothing is quadratic, the only wide shuffle keys on (term) then
  * (doc_id).
  */
object Search {

  /** The persisted-index half: per-(doc, term) term frequencies plus
    * per-doc lengths. */
  def postings(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("doc_len", size(col("__toks")))
      .where(col("doc_len") > 0)
      .select(col("doc_id"), col("doc_len"), explode(col("__toks")).as("term"))
      .groupBy("doc_id", "doc_len", "term")
      .agg(count(lit(1)).as("tf"))

  /** BM25 top-N for one query over the corpus (k1/b = classic
    * defaults). Score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·len/avg));
    * idf = ln(1 + (N - df + ½)/(df + ½)).
    */
  def bm25(
      docs: DataFrame, textCol: String, idCol: String,
      query: Seq[String],
      topN: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "bm25 needs at least one query term")
    // r13 (opt guide §1.2): the post-everything shape tokenized the
    // corpus THREE times — stats re-derived per-doc lengths from the
    // full postings aggregate (explode + two aggs), hits filtered a
    // second full postings build, and docFreq re-evaluated hits. Now:
    // corpus constants come straight off the tokenized docs (no explode,
    // no postings agg), the term filter lands BELOW the postings
    // aggregate (only query-term occurrences aggregate), and the tiny
    // hits frame (query terms × matching docs) materializes once for
    // both docFreq and the scoring join.
    val toksLen = docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("doc_len", size(col("__toks")))
      .where(col("doc_len") > 0)
    val stats = toksLen.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("doc_len")).as("avg_len"))
    val terms = query.map(_.toLowerCase).distinct
    // persistedCut keeps lineage (r14): executor-loss-recoverable.
    val hits = org.apache.spark.sql.graft.Bridge.persistedCut(toksLen
      .select(col("doc_id"), col("doc_len"), explode(col("__toks")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy("doc_id", "doc_len", "term")
      .agg(count(lit(1)).as("tf")))
    val docFreq = hits.groupBy("term")
      .agg(countDistinct(col("doc_id")).cast("double").as("df"))
    hits
      .join(broadcast(docFreq), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib",
        col("idf") * (col("tf") * (lit(k1) + 1)) /
          (col("tf") + lit(k1) *
            (lit(1 - b) + lit(b) * col("doc_len") / col("avg_len"))))
      .groupBy("doc_id")
      .agg(round(sum(col("contrib")), 4).as("score"),
        count(lit(1)).as("n_terms"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topN)
  }
}
