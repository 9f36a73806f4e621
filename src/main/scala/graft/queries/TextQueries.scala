package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.tables.Tables

/** Text-analysis operators over the documents table (builder brief:
  * language-ID, quality scoring, token counting, fingerprinting). The
  * oracle SQL is GENERATED from the same constants as the Spark
  * implementation (TextFunctions.*Sql) so values match by construction.
  */
object TextQueries extends QueryGroup {

  import TextFunctions._

  val defs: Seq[QueryDef] = Seq(

    // ===== token counting: whitespace + BPE-ish subword + punct counts.
    QueryDef(
      "t1_token_stats",
      (s, d) =>
        // sort the NARROW input first, compute after (opt guide §8
        // "decide with small rows"): a global sort's range-sampling pass
        // executes its child subtree once more, so ordering AFTER the
        // projection evaluated the expensive text expressions twice per
        // row. Sorting the (doc_id, text) source rows samples only the
        // scan; the analysis expressions run exactly once, above the
        // exchange. Same rows, same order (doc_id is the sort key either
        // way), pinned by the unchanged oracle.
        Tables.documents(s, d)
          .orderBy(col("doc_id"))
          .select(
            col("doc_id"),
            tokenCount(col("text")).as("n_tokens"),
            subwordCount(col("text")).as("n_subwords"),
            punctCount(col("text")).as("n_punct"),
            length(col("text")).cast("int").as("n_chars_actual")),
      Some(s"""
        SELECT doc_id,
               ${tokenCountSql("text")} AS n_tokens,
               ${subwordCountSql("text")} AS n_subwords,
               ${punctCountSql("text")} AS n_punct,
               CAST(length(text) AS INT) AS n_chars_actual
        FROM documents ORDER BY doc_id""")),

    // ===== language-ID heuristic (stopword argmax) + agreement with the
    // dataset's lang label.
    QueryDef(
      "t2_lang_id",
      (s, d) =>
        Tables.documents(s, d) // sort-then-compute: see t1
          .orderBy(col("doc_id"))
          .select(col("doc_id"), langId(col("text")).as("lang_pred")),
      Some(s"""
        SELECT doc_id, ${langIdSql("text")} AS lang_pred
        FROM documents ORDER BY doc_id""")),

    // ===== quality score (length/stopword/punct/distinct ratios).
    QueryDef(
      "t3_quality_score",
      (s, d) =>
        Tables.documents(s, d) // sort-then-compute: see t1
          .orderBy(col("doc_id"))
          .select(col("doc_id"), qualityScore(col("text")).as("quality")),
      Some(s"""
        SELECT doc_id, ${qualityScoreSql("text")} AS quality
        FROM documents ORDER BY doc_id""")),

    // ===== content fingerprint (md5 of normalized text).
    QueryDef(
      "t4_fingerprint",
      (s, d) =>
        Tables.documents(s, d) // sort-then-compute: see t1
          .orderBy(col("doc_id"))
          .select(col("doc_id"), fingerprint(col("text")).as("fp")),
      Some(s"""
        SELECT doc_id, ${fingerprintSql("text")} AS fp
        FROM documents ORDER BY doc_id""")),

    // ===== per-language quality aggregate (text ops compose with the
    // relational surface).
    QueryDef(
      "t5_quality_by_lang",
      (s, d) =>
        Tables.documents(s, d)
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_docs"),
            round(avg(qualityScore(col("text"))), 4).as("avg_quality"),
            round(avg(tokenCount(col("text")).cast("double")), 4).as("avg_tokens"))
          .orderBy(col("lang")),
      Some(s"""
        SELECT lang, count(*) AS n_docs,
               round(avg(${qualityScoreSql("text")}), 4) AS avg_quality,
               round(avg(CAST(${tokenCountSql("text")} AS DOUBLE)), 4) AS avg_tokens
        FROM documents GROUP BY lang ORDER BY lang""")),

    // ===== the training-data curation pipeline END TO END: score →
    // filter (quality + language agreement) → exact-dedup (min doc_id
    // per fingerprint) → per-language yield. The composition — not just
    // each stage — sits under the rows+schema+hash gate.
    QueryDef(
      "t6_curation_pipeline",
      (s, d) => {
        val scored = Tables.documents(s, d).select(
          col("doc_id"), col("lang"),
          qualityScore(col("text")).as("quality"),
          langId(col("text")).as("lang_pred"),
          tokenCount(col("text")).as("n_tokens"),
          fingerprint(col("text")).as("fp"))
        val filtered = scored.where(col("quality") >= 0.5)
        // survivor selection via ONE window pass instead of
        // aggregate + self-join back: the join shape evaluated the four
        // text expressions TWICE (once per subtree side — Spark reuses
        // no un-cached subplan) and shuffled `filtered` twice. The
        // window computes min(doc_id) and count(*) over the same fp
        // partitioning in a single shuffle of a single scoring pass;
        // rows kept (doc_id = group min, carrying n_copies = group
        // count) are identical, pinned by the unchanged oracle.
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
        val dedup = filtered
          .withColumn("n_copies", count(lit(1)).over(w))
          .withColumn("__mn", min(col("doc_id")).over(w))
          .where(col("doc_id") === col("__mn"))
        dedup
          .groupBy(col("lang_pred"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_copies")).as("n_raw"),
            sum(col("n_tokens").cast("long")).as("total_tokens"),
            sum(when(col("lang_pred") === col("lang"), 1L).otherwise(0L))
              .as("n_label_agree"))
          .orderBy(col("lang_pred"))
      },
      Some(s"""
        WITH scored AS (
          SELECT doc_id, lang,
                 ${qualityScoreSql("text")} AS quality,
                 ${langIdSql("text")} AS lang_pred,
                 ${tokenCountSql("text")} AS n_tokens,
                 ${fingerprintSql("text")} AS fp
          FROM documents),
        filtered AS (
          SELECT * FROM scored WHERE quality >= 0.5),
        dedup AS (
          SELECT fp, min(doc_id) AS doc_id, count(*) AS n_copies
          FROM filtered GROUP BY fp)
        SELECT f.lang_pred, count(*) AS n_docs,
               CAST(sum(d.n_copies) AS BIGINT) AS n_raw,
               CAST(sum(f.n_tokens) AS BIGINT) AS total_tokens,
               CAST(sum(CASE WHEN f.lang_pred = f.lang THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_label_agree
        FROM dedup d JOIN filtered f ON d.fp = f.fp AND d.doc_id = f.doc_id
        GROUP BY f.lang_pred ORDER BY f.lang_pred""")),

    // ===== BM25 lexical retrieval (graft.ops.Search): postings =
    // explode + aggregate (the persistable inverted index), scoring =
    // broadcast-IDF join + one groupBy — same arithmetic in DuckDB.
    QueryDef(
      "t7_bm25_search",
      (s, d) =>
        graft.ops.Search.bm25(Tables.documents(s, d), "text", "doc_id",
          query = Seq("spark", "vector", "stream"), topN = 10),
      Some(s"""
        WITH toks AS (
          SELECT doc_id, ${tokensSql("text")} AS toks FROM documents),
        post AS (
          SELECT doc_id, doc_len, term, count(*) AS tf FROM (
            SELECT doc_id, len(toks) AS doc_len, unnest(toks) AS term
            FROM toks WHERE len(toks) > 0)
          GROUP BY doc_id, doc_len, term),
        stats AS (
          SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(doc_len) AS avg_len
          FROM (SELECT doc_id, any_value(doc_len) AS doc_len
                FROM post GROUP BY doc_id)),
        hits AS (
          SELECT * FROM post WHERE term IN ('spark', 'vector', 'stream')),
        df AS (
          SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
          FROM hits GROUP BY term)
        SELECT h.doc_id,
               round(sum(
                 ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5)) *
                 (h.tf * (1.2 + 1)) /
                 (h.tf + 1.2 * (1 - 0.75 + 0.75 * h.doc_len / s.avg_len))
               ), 4) AS score,
               count(*) AS n_terms
        FROM hits h JOIN df ON h.term = df.term CROSS JOIN stats s
        GROUP BY h.doc_id
        ORDER BY score DESC, doc_id LIMIT 10""")),

    // ===== token-budget sequence packing (graft.ops.Packing): greedy
    // in-order packing per language shard as one window pass — the
    // "pack short docs into fixed-token training examples" step.
    QueryDef(
      "t8_sequence_packing",
      (s, d) => {
        val toks = Tables.documents(s, d).select(
          col("lang"), col("doc_id"),
          tokenCount(col("text")).cast("long").as("n_tokens"))
        graft.ops.Packing.sequences(
          graft.ops.Packing.packGreedy(toks, "doc_id", "n_tokens",
            budget = 512L, shardCols = Seq("lang")),
          "n_tokens", Seq("lang"))
          .orderBy(col("lang"), col("seq_id"))
      },
      Some(s"""
        WITH toks AS (
          SELECT lang, doc_id,
                 CAST(${tokenCountSql("text")} AS BIGINT) AS n_tokens
          FROM documents),
        packed AS (
          SELECT lang, n_tokens,
                 CAST(FLOOR(CAST(
                   sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id)
                     - n_tokens AS DOUBLE) / 512) AS BIGINT) AS seq_id
          FROM toks)
        SELECT lang, seq_id, count(*) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens
        FROM packed GROUP BY lang, seq_id ORDER BY lang, seq_id""")),

    // ===== per-stratum capping (class balancing): every language is
    // downsampled to at most 40 docs by a seeded-hash order. WHICH rows
    // survive is engine-specific (xxhash64 order), but HOW MANY is
    // exact — the oracle checks the per-stratum counts.
    QueryDef(
      "bal1_cap_stratum",
      (s, d) =>
        graft.ops.Balance.capPerStratum(
          Tables.documents(s, d).select(col("doc_id"), col("lang")),
          "lang", "doc_id", maxRows = 40)
          .groupBy(col("lang")).agg(count(lit(1)).as("n"))
          .orderBy(col("lang")),
      Some("""
        SELECT lang, least(count(*), 40) AS n
        FROM documents GROUP BY lang ORDER BY lang""")),

    // ===== dataset MIXTURE weighting (the training-mix step): three
    // synthetic corpora (doc_id mod 3) mixed at 0.5/0.3/0.2 by the
    // deterministic md5-threshold sampler — both engines compute the
    // SAME hash and the SAME double fractions from the SAME counts, so
    // the emitted row set is identical and fully hash-checked (unlike
    // RNG samplers, whose row choice is engine-private).
    QueryDef(
      "mix1_dataset_mixture",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id")
        graft.ops.Balance.mixture(Seq(
          ("books", docs.where(col("doc_id") % 3 === 1), 0.3),
          ("code", docs.where(col("doc_id") % 3 === 2), 0.2),
          ("web", docs.where(col("doc_id") % 3 === 0), 0.5)),
          "doc_id")
          .select(col("dataset"), col("doc_id"))
          .orderBy(col("dataset"), col("doc_id"))
      },
      Some("""
        WITH src AS (
          SELECT doc_id,
                 CASE doc_id % 3 WHEN 0 THEN 'web' WHEN 1 THEN 'books'
                      ELSE 'code' END AS dataset,
                 CASE doc_id % 3 WHEN 0 THEN CAST(0.5 AS DOUBLE)
                      WHEN 1 THEN CAST(0.3 AS DOUBLE)
                      ELSE CAST(0.2 AS DOUBLE) END AS wt
          FROM documents),
        c AS (SELECT dataset, wt, count(*) AS n FROM src GROUP BY dataset, wt),
        t AS (SELECT min(n / wt) AS total FROM c),
        f AS (SELECT dataset,
                     least(CAST(1.0 AS DOUBLE), wt * (SELECT total FROM t) / n)
                       AS frac
              FROM c)
        SELECT s.dataset, s.doc_id
        FROM src s JOIN f ON s.dataset = f.dataset
        WHERE (('0x' || substr(md5(CAST(s.doc_id AS VARCHAR)), 1, 8))::BIGINT)
              / 4294967296.0 < f.frac
        ORDER BY s.dataset, s.doc_id""")),

    // ===== deterministic SHUFFLE-INTO-SHARDS (the training-order step):
    // md5-keyed shard assignment + in-shard rank. Both engines compute
    // the same md5, so shard AND position hash-check exactly — a
    // trainer reading shard files in pos order sees the identical
    // example stream from either engine.
    QueryDef(
      "mix2_shard_shuffle",
      (s, d) =>
        graft.ops.Balance.shardShuffle(
          Tables.documents(s, d).select(col("doc_id")), "doc_id",
          numShards = 8)
          .select(col("shard"), col("pos"), col("doc_id"))
          .orderBy(col("shard"), col("pos")),
      Some("""
        WITH keyed AS (
          SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS k,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                      % 8 AS INT) AS shard
          FROM documents)
        SELECT shard,
               CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id)
                    AS BIGINT) AS pos,
               doc_id
        FROM keyed ORDER BY shard, pos""")),

    // ===== deterministic train/val/test HOLDOUT split: slice = which
    // cumulative-hash window the doc id falls in. A row's slice is a
    // pure function of its id (no RNG, no count pass), so it never
    // drifts as the corpus grows — the contamination boundary a
    // training pipeline needs. The oracle mirrors the SAME cumulative
    // double arithmetic (0.8, then 0.8+0.1) — spelling the boundary
    // 0.9 would be a DIFFERENT double and could flip a knife-edge row.
    QueryDef(
      "split1_holdout",
      (s, d) =>
        graft.ops.Balance.holdoutSplit(
          Tables.documents(s, d).select(col("doc_id")), "doc_id",
          Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
          .select(col("slice"), col("doc_id"))
          .orderBy(col("slice"), col("doc_id")),
      Some("""
        WITH h AS (
          SELECT doc_id,
                 (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT)
                   / 4294967296.0 AS u
          FROM documents)
        SELECT CASE
                 WHEN u < CAST(0.8 AS DOUBLE) THEN 'train'
                 WHEN u < CAST(0.8 AS DOUBLE) + CAST(0.1 AS DOUBLE) THEN 'val'
                 WHEN u < CAST(0.8 AS DOUBLE) + CAST(0.1 AS DOUBLE)
                          + CAST(0.1 AS DOUBLE) THEN 'test'
               END AS slice, doc_id
        FROM h ORDER BY slice, doc_id""")),

    // ===== sliding-window CHUNKING (RAG/embedding prep): 32-token
    // windows advancing by 16, so adjacent chunks share 16 tokens of
    // context. chunk_start (a token offset) is the stable chunk id;
    // redundant short tails (fully inside the previous window) are
    // dropped. Map-side only — tokenize, sequence of starts, explode,
    // slice — the SQL twin generated by the op itself.
    QueryDef(
      "chunk1_doc_chunks",
      (s, d) =>
        graft.ops.Chunking.chunkByWords(
          Tables.documents(s, d), "doc_id", "text",
          chunkWords = 32, strideWords = 16)
          .orderBy(col("doc_id"), col("chunk_start")),
      Some(graft.ops.Chunking.chunkByWordsSql(
        "documents", "doc_id", "text", chunkWords = 32, strideWords = 16)
        + "\n    ORDER BY doc_id, chunk_start")),

    // ===== intra-document REPETITION filter (Gopher-style quality
    // rule): 1 - distinct/total 3-grams. The fixture's word soup has
    // near-zero natural repetition, so every 5th sampled doc is DOUBLED
    // (text || text) — its n-grams all repeat and the ratio jumps ~0.5,
    // exercising both outcomes. Integer counts + fixed-order division →
    // bit-identical doubles, full hash check.
    QueryDef(
      "rep1_repetition_filter",
      (s, d) => {
        val aug = Tables.documents(s, d)
          .where(col("doc_id") % 10 === 0)
          .select(col("doc_id"),
            when(col("doc_id") % 50 === 0,
              concat(col("text"), lit(" "), col("text")))
              .otherwise(col("text")).as("text"))
        // repartition = pipeline breaker: the n-gram ratio computes ONCE
        // per row; `kept` reads the materialized column instead of
        // re-running the token pipeline (CollapseProject would otherwise
        // inline it into every use)
        aug.select(col("doc_id"),
          repetitionRatio(col("text"), 3).as("rep3"))
          .repartition(col("doc_id"))
          .select(col("doc_id"), col("rep3"),
            (col("rep3") <= 0.2).as("kept"))
          .orderBy(col("doc_id"))
      },
      Some(s"""
        WITH aug AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 50 = 0 THEN text || ' ' || text
                      ELSE text END AS text
          FROM documents WHERE doc_id % 10 = 0)
        SELECT doc_id,
               ${repetitionRatioSql("text", 3)} AS rep3,
               (${repetitionRatioSql("text", 3)}) <= 0.2 AS kept
        FROM aug ORDER BY doc_id""")),

    // ===== PII redaction (curation-pipeline scrub step): emails and
    // IPv4 addresses replaced by placeholder tags, with per-doc match
    // counts. The fixture has no PII, so deterministic synthetic
    // addresses derived from doc_id are appended to every 3rd sampled
    // doc — identically in both engines — keeping the oracle
    // non-vacuous. Patterns are Java-regex/RE2 portable.
    QueryDef(
      "t9_pii_redaction",
      (s, d) => {
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val ip = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
        val aug = Tables.documents(s, d)
          .where(col("doc_id") % 10 === 0)
          .select(col("doc_id"),
            when(col("doc_id") % 3 === 0,
              concat(col("text"), lit(" contact user"),
                col("doc_id").cast("string"), lit("@example.com from "),
                (col("doc_id") % 200 + 10).cast("string"), lit("."),
                (col("doc_id") % 250).cast("string"), lit("."),
                (col("doc_id") % 100).cast("string"), lit(".7")))
              .otherwise(col("text")).as("text"))
        aug.orderBy(col("doc_id")) // sort-then-compute: see t1
          .select(
          col("doc_id"),
          regexp_count(col("text"), lit(email)).cast("long").as("n_emails"),
          regexp_count(col("text"), lit(ip)).cast("long").as("n_ips"),
          regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
            ip, "<IP>").as("redacted"))
      },
      Some("""
        WITH aug AS (
          SELECT doc_id,
                 CASE WHEN doc_id % 3 = 0 THEN
                   text || ' contact user' || doc_id || '@example.com from '
                        || (doc_id % 200 + 10) || '.' || (doc_id % 250)
                        || '.' || (doc_id % 100) || '.7'
                 ELSE text END AS text
          FROM documents WHERE doc_id % 10 = 0)
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
                 AS n_emails,
               CAST(len(regexp_extract_all(text,
                 '\b\d{1,3}(\.\d{1,3}){3}\b')) AS BIGINT) AS n_ips,
               regexp_replace(regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>',
                 'g'), '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g') AS redacted
        FROM aug ORDER BY doc_id"""))
  )
}
