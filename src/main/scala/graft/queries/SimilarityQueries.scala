package graft.queries

import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.tables.Tables

/** Similarity search over the embeddings table (builder brief): exact
  * brute-force cosine top-k with a full DuckDB oracle, and the IVF
  * bucketed variant (approximate → rows-only check; recall-vs-exact is
  * asserted in SimilaritySpec).
  */
object SimilarityQueries extends QueryGroup {

  /** Deterministic query set: every 100th vector. */
  private def queriesOf(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.embeddings(s, d).where(col("vec_id") % 100 === 0)

  /** Exact cosine top-5 per query — ground truth for sim1 (brute force)
    * and sim2v (IVF probed exhaustively, provably the same result). */
  private val bruteForceSql = s"""
        WITH q AS (
          SELECT vec_id AS q_id, ${OracleSql.normalizedSql("embedding")} AS q_nvec
          FROM embeddings WHERE vec_id % 100 = 0
        ), e AS (
          SELECT vec_id AS id, ${OracleSql.normalizedSql("embedding")} AS nvec
          FROM embeddings
        ), scored AS (
          SELECT q.q_id, e.id,
                 ${OracleSql.dotNormalizedSql("e.nvec", "q.q_nvec")} AS cosine
          FROM e, q
        ), ranked AS (
          SELECT q_id, id, cosine,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY cosine DESC, id) AS rank
          FROM scored
        )
        SELECT q_id, rank, id, cosine FROM ranked
        WHERE rank <= 5 ORDER BY q_id, rank"""

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "sim1_cosine_topk",
      (s, d) =>
        Similarity.bruteForceTopK(
          Tables.embeddings(s, d), "embedding", "vec_id",
          queriesOf(s, d), "embedding", "vec_id", k = 5)
          .orderBy(col("q_id"), col("rank")),
      Some(bruteForceSql)),

    QueryDef(
      "sim2_ivf_topk",
      (s, d) =>
        Similarity.ivfTopK(
          Tables.embeddings(s, d), "embedding", "vec_id",
          queriesOf(s, d), "embedding", "vec_id",
          k = 5, nLists = 8, nprobe = 3)
          .orderBy(col("q_id"), col("rank")),
      None),

    // ===== product-quantization ANN: the scan reads m-byte codes (64×
    // compression) and scores them with codegen'd ADC table lookups;
    // the top k·refine candidates re-rank EXACTLY, so emitted cosines
    // are exact and only the candidate choice is approximate (rows-only
    // driver check; recall bound + cosine-exactness in
    // DedupSimilaritySpec).
    QueryDef(
      "sim3_pq_topk",
      (s, d) =>
        Similarity.pqTopK(
          Tables.embeddings(s, d), "embedding", "vec_id",
          queriesOf(s, d), "embedding", "vec_id",
          k = 5, m = 16, codebookK = 16, refine = 4)
          .orderBy(col("q_id"), col("rank")),
      None),

    // ===== the IVF machinery hash-checked (VERDICT r2 #4), d8-style:
    // with nprobe = nLists every inverted list is probed, so each vector
    // is scored against each query exactly once (a vector lives in ONE
    // list) and the result is PROVABLY the exact brute-force top-k —
    // codebook training, centroid assignment, the probe join, and the
    // ranking window all get the full row/schema/hash oracle. sim2
    // keeps the genuinely-approximate nprobe=3 path (recall bounds in
    // SimilaritySpec); every returned neighbor's cosine and rank must
    // match DuckDB's recomputation bit-for-bit here.
    QueryDef(
      "sim2v_ivf_fullprobe",
      (s, d) =>
        Similarity.ivfTopK(
          Tables.embeddings(s, d), "embedding", "vec_id",
          queriesOf(s, d), "embedding", "vec_id",
          k = 5, nLists = 8, nprobe = 8)
          .orderBy(col("q_id"), col("rank")),
      Some(bruteForceSql)),

    // ===== the PQ machinery hash-checked (VERDICT r3 #3), sim2v-style:
    // with k·refine ≥ the corpus the ADC pass keeps EVERY row as a
    // candidate, so the exact re-rank spans the corpus and the output is
    // PROVABLY brute-force top-k — codebook training, PqEncode, the ADC
    // table/scan, and the re-rank window all run under the full
    // row/schema/hash oracle. sim3 keeps the genuinely-approximate
    // refine=4 path (recall bound in DedupSimilaritySpec); cosines here
    // must match DuckDB's recomputation bit-for-bit.
    QueryDef(
      "sim3v_pq_fullrefine",
      (s, d) =>
        Similarity.pqTopK(
          Tables.embeddings(s, d), "embedding", "vec_id",
          queriesOf(s, d), "embedding", "vec_id",
          k = 5, m = 16, codebookK = 16, refine = 1 << 20)
          .orderBy(col("q_id"), col("rank")),
      Some(bruteForceSql))
  )
}
