package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the retrieval/embedding prep step
  * of a training pipeline: split each document into overlapping
  * `chunkWords`-token windows advancing by `strideWords`, so long
  * documents become embeddable units without losing cross-boundary
  * context (stride < chunk ⇒ adjacent chunks share chunk−stride
  * tokens).
  *
  * Map-side only at any scale: tokenize → `sequence` of window starts →
  * `explode` → `slice`/`array_join`, all codegen'd built-ins; the only
  * shuffle a caller pays is whatever they do downstream. Window starts
  * are token offsets, so `chunk_start` doubles as a stable chunk id and
  * an ordering key. A window whose tokens are fully contained in the
  * previous window (the short tail once the end of the document is
  * already covered) is dropped — every emitted chunk contributes new
  * tokens, and every token is in ≥1 chunk.
  *
  * Tokenization is bare whitespace splitting (case PRESERVED — chunks
  * feed embedders, unlike the lower-cased analysis tokens of
  * [[graft.functions.TextFunctions.tokens]]); the SQL twin mirrors it
  * with `string_split_regex` so an external engine reproduces chunks
  * byte-for-byte.
  */
object Chunking {

  /** Output: (idCol, chunk_start, n_tokens, chunk_text), one row per
    * window; empty/whitespace-only docs emit nothing.
    */
  def chunkByWords(df: DataFrame, idCol: String, textCol: String,
      chunkWords: Int, strideWords: Int): DataFrame = {
    require(chunkWords > 0 && strideWords > 0, "chunk and stride must be positive")
    require(strideWords <= chunkWords, "stride beyond chunk width would skip tokens")
    val words = filter(split(col(textCol), "\\s+"), t => length(t) > 0)
    df.select(col(idCol), words.as("__w"))
      .select(col(idCol), col("__w"),
        explode(sequence(lit(0), greatest(size(col("__w")) - 1, lit(0)),
          lit(strideWords))).as("chunk_start"))
      // keep a window iff it adds tokens past the previous window's end
      .where(col("chunk_start") === 0 ||
        col("chunk_start") + (chunkWords - strideWords) < size(col("__w")))
      .select(col(idCol), col("chunk_start"),
        slice(col("__w"), col("chunk_start") + 1, lit(chunkWords)).as("__c"))
      .where(size(col("__c")) > 0)
      .select(col(idCol), col("chunk_start"),
        size(col("__c")).as("n_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }

  /** DuckDB twin of [[chunkByWords]] over table `tbl`; same output
    * columns and row set.
    */
  def chunkByWordsSql(tbl: String, idCol: String, textCol: String,
      chunkWords: Int, strideWords: Int): String = s"""
    WITH w AS (
      SELECT $idCol,
             list_filter(string_split_regex($textCol, '\\s+'),
                         t -> length(t) > 0) AS words
      FROM $tbl),
    s AS (
      SELECT $idCol, words,
             unnest(generate_series(0, greatest(len(words)-1, 0),
                                    $strideWords)) AS chunk_start
      FROM w)
    SELECT $idCol, CAST(chunk_start AS INT) AS chunk_start,
           CAST(len(words[chunk_start+1 : chunk_start+$chunkWords]) AS INT)
             AS n_tokens,
           array_to_string(words[chunk_start+1 : chunk_start+$chunkWords],
                           ' ') AS chunk_text
    FROM s
    WHERE (chunk_start = 0
           OR chunk_start + ${chunkWords - strideWords} < len(words))
      AND len(words[chunk_start+1 : chunk_start+$chunkWords]) > 0"""
}
