package graft.queries

import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Advanced relational surface: grouping sets, subqueries (IN / EXISTS /
  * scalar), pivot, explode (UDTF shape), statistical aggregates, richer
  * string functions, ordinal sorts. Completes SURVEY §2 rows A7, O2, X3
  * -adjacent surface with oracle twins.
  */
object AdvancedQueries extends QueryGroup {

  val defs: Seq[QueryDef] = Seq(

    // ===== GROUPING SETS via SQL on a registered view.
    QueryDef(
      "a8_grouping_sets",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("gq_orders")
        s.sql("""
          SELECT coalesce(o_orderstatus, '<all>') AS status,
                 coalesce(o_orderpriority, '<all>') AS priority,
                 count(*) AS n
          FROM gq_orders
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          ORDER BY status, priority""")
      },
      Some("""
        SELECT coalesce(o_orderstatus, '<all>') AS status,
               coalesce(o_orderpriority, '<all>') AS priority,
               count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY status, priority""")),

    // ===== TPC-H-Q18-shaped: HAVING + IN-subquery join-back.
    QueryDef(
      "q18_large_orders",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val ord = Tables.orders(s, d)
        val big = li.groupBy(col("l_orderkey"))
          .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
          .where(col("total_qty") > 150)
        ord.join(big, col("o_orderkey") === big("l_orderkey"))
          .select(col("o_orderkey"), col("o_custkey"), col("total_qty"))
          .orderBy(col("total_qty").desc, col("o_orderkey"))
      },
      Some("""
        SELECT o_orderkey, o_custkey, total_qty
        FROM orders
        JOIN (SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING round(sum(l_quantity), 2) > 150) big
          ON o_orderkey = big.l_orderkey
        ORDER BY total_qty DESC, o_orderkey""")),

    // ===== scalar subquery: customers above average balance.
    QueryDef(
      "sq1_scalar_subquery",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("gq_customer")
        s.sql("""
          SELECT c_custkey, c_acctbal
          FROM gq_customer
          WHERE c_acctbal > (SELECT avg(c_acctbal) FROM gq_customer)
          ORDER BY c_custkey""")
      },
      Some("""
        SELECT c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        ORDER BY c_custkey""")),

    // ===== UNION ALL (bag semantics, vs U1's UNION DISTINCT).
    QueryDef(
      "u6_union_all",
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nk"))
        val sup = Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("nk"))
        c.unionAll(sup).groupBy(col("nk")).agg(count(lit(1)).as("n"))
          .orderBy(col("nk"))
      },
      Some("""
        SELECT nk, count(*) AS n FROM (
          SELECT CAST(c_nationkey AS INT) AS nk FROM customer
          UNION ALL
          SELECT CAST(s_nationkey AS INT) AS nk FROM supplier)
        GROUP BY nk ORDER BY nk""")),

    // ===== explode/unnest (UDTF-shaped lateral).
    QueryDef(
      "x1_explode_words",
      (s, d) =>
        Tables.part(s, d)
          .select(col("p_partkey"), explode(split(col("p_name"), " ")).as("word"))
          .groupBy(col("word")).agg(count(lit(1)).as("n"))
          .orderBy(col("word")),
      Some("""
        SELECT word, count(*) AS n
        FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
        GROUP BY word ORDER BY word""")),

    // ===== pivot (Spark .pivot ≡ CASE-WHEN sums in ANSI SQL).
    QueryDef(
      "p10_pivot",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_linestatus"))
          .pivot("l_returnflag", Seq("A", "N", "R"))
          .agg(round(sum(col("l_quantity")), 2))
          .withColumnsRenamed(Map("A" -> "qty_a", "N" -> "qty_n", "R" -> "qty_r"))
          .orderBy(col("l_linestatus")),
      Some("""
        SELECT l_linestatus,
               round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS qty_a,
               round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS qty_n,
               round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS qty_r
        FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // ===== statistical aggregates (rounded: running-moment order differs
    // across engines in the last ulps).
    QueryDef(
      "a9_stats_agg",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
            round(var_samp(col("l_quantity")), 4).as("var_qty"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
            round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_qp"))
          .orderBy(col("l_returnflag")),
      Some("""
        SELECT l_returnflag,
               round(stddev_samp(l_quantity), 4) AS sd_qty,
               round(var_samp(l_quantity), 4) AS var_qty,
               round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
               round(covar_samp(l_quantity, l_extendedprice), 4) AS cov_qp
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ===== exact percentile / median (linear interpolation both sides).
    QueryDef(
      "a10_percentile",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(col("o_orderstatus"))
          .agg(
            round(expr("percentile(o_totalprice, 0.5)"), 4).as("median_price"),
            round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90_price"))
          .orderBy(col("o_orderstatus")),
      Some("""
        SELECT o_orderstatus,
               round(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
               round(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ===== mergeable HLL sketch state (graft.ops.Sketches): daily
    // per-type sketches persisted as state, rolled up per type by
    // UNIONING sketches — never rescanning raw rows. At the fixture's
    // cardinality (150 users) the DataSketches HLL is in its exact
    // coupon range, so the estimate equals DuckDB's true distinct.
    QueryDef(
      "a11_sketch_distinct",
      (s, d) => {
        val daily = graft.ops.Sketches.distinctSketches(
          Tables.events(s, d)
            .select(to_date(col("ts")).as("day"), col("event_type"), col("user_id")),
          Seq("day", "event_type"), "user_id")
        graft.ops.Sketches.estimateDistinct(daily, Seq("event_type"))
          .orderBy(col("event_type"))
      },
      Some("""
        SELECT event_type, count(DISTINCT user_id) AS distinct_count
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ===== mergeable quantile sketch (Spark's percentile_approx — GK
    // state, partial-aggregates map-side like any sketch). accuracy 1e5
    // exceeds every sf0.01 group size, so the sketch answers EXACTLY
    // there and the DuckDB discrete-quantile oracle hash-matches; at
    // bench scale (sf0.1+) the same query runs genuinely approximate.
    QueryDef(
      "a12_quantile_sketch",
      (s, d) => {
        val qs = percentile_approx(col("l_extendedprice"),
          array(lit(0.25), lit(0.5), lit(0.75), lit(0.95)), lit(100000))
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(qs.as("qarr"), count(lit(1)).as("n"))
          .select(col("l_returnflag"),
            element_at(col("qarr"), 1).as("q25"),
            element_at(col("qarr"), 2).as("q50"),
            element_at(col("qarr"), 3).as("q75"),
            element_at(col("qarr"), 4).as("q95"),
            col("n"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        SELECT l_returnflag,
               quantile_disc(l_extendedprice, 0.25) AS q25,
               quantile_disc(l_extendedprice, 0.5) AS q50,
               quantile_disc(l_extendedprice, 0.75) AS q75,
               quantile_disc(l_extendedprice, 0.95) AS q95,
               count(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ===== count-min heavy hitters (graft.ops.Sketches.heavyHitters):
    // mergeable CMS state + candidate probes. With ε=1e-3 and a
    // 5-value domain the deterministic (seeded) sketch is collision-free
    // here, so estimates equal DuckDB's exact counts; the ε·N
    // overestimate bound is asserted separately in SketchesSpec.
    QueryDef(
      "a13_heavy_hitters",
      (s, d) =>
        graft.ops.Sketches.heavyHitters(
          Tables.events(s, d), "event_type", k = 5)
          .select(col("event_type"), col("est_count"))
          .orderBy(col("est_count").desc, col("event_type")),
      Some("""
        SELECT event_type, count(*) AS est_count
        FROM events GROUP BY event_type
        ORDER BY est_count DESC, event_type LIMIT 5""")),

    // ===== theta-sketch SOURCE OVERLAP (graft.ops.Sketches): per-source
    // distinct-shingle state, then pairwise |A∩B|/|A∪B|/jaccard from the
    // sketches ALONE — the cross-source duplication audit HLL state
    // can't answer (no intersection). At lgK=14 every source (~1.4k
    // shingles) and union stays in theta EXACT mode, so the estimates
    // equal DuckDB's exact set arithmetic; at bench scale the same
    // query runs genuinely approximate. Shingles enter the sketch as
    // their compiled one-pass xxhash64 (d2's convention: distinct
    // hashes ≡ distinct shingles modulo ~1e-10 collisions) — the HOF
    // shingle chain re-evaluates tokenization per window inside the
    // lambda, and longs beat strings through the shuffle.
    QueryDef(
      "a14_source_overlap",
      (s, d) => {
        val sh = Tables.documents(s, d).select(col("source"),
          explode(org.apache.spark.sql.graft.TextExpressions
            .shingleHashes64(lower(col("text")), 3)).as("sh"))
        graft.ops.Sketches.pairwiseOverlap(
          graft.ops.Sketches.thetaSketches(sh, Seq("source"), "sh"), "source")
          .orderBy(col("a"), col("b"))
      },
      Some(s"""
        WITH g AS (
          SELECT source,
                 unnest(${graft.functions.TextFunctions.shinglesSql("text", 3)})
                   AS sh
          FROM documents),
        d AS (SELECT DISTINCT source, sh FROM g),
        c AS (SELECT source, count(*) AS n FROM d GROUP BY source),
        i AS (SELECT x.source AS a, y.source AS b, count(*) AS n_common
              FROM d x JOIN d y ON x.sh = y.sh AND x.source < y.source
              GROUP BY 1, 2)
        SELECT ca.source AS a, cb.source AS b, ca.n AS n_a, cb.n AS n_b,
               coalesce(i.n_common, 0) AS n_common,
               ca.n + cb.n - coalesce(i.n_common, 0) AS n_union,
               round(CAST(coalesce(i.n_common, 0) AS DOUBLE) /
                     CAST(ca.n + cb.n - coalesce(i.n_common, 0) AS DOUBLE),
                     6) AS jaccard
        FROM c ca JOIN c cb ON ca.source < cb.source
        LEFT JOIN i ON i.a = ca.source AND i.b = cb.source
        ORDER BY a, b""")),

    // ===== KLL quantile-state ROLLUP (graft.ops.Sketches): sketch at
    // the fine (source, lang) grain, then answer per-SOURCE quantiles
    // by MERGING the stored blobs (kllMerge typed Aggregator) — the
    // persisted-state path, never a rescan. k=2048 keeps every sketch
    // and merge in KLL exact mode at fixture scale, where the
    // inclusive-rank quantile definition coincides with DuckDB's
    // quantile_disc (verified: per-grain AND merged values identical);
    // at larger scale the same query degrades to ~1.65% rank error.
    QueryDef(
      "a15_quantile_rollup",
      (s, d) => {
        val state = graft.ops.Sketches.quantileSketches(
          Tables.documents(s, d), Seq("source", "lang"), "n_chars", k = 2048)
        graft.ops.Sketches.rollupQuantiles(state, Seq("source"),
          Seq(0.25, 0.5, 0.95)).orderBy(col("source"))
      },
      Some("""
        SELECT source,
               CAST(quantile_disc(n_chars, 0.25) AS DOUBLE) AS q25,
               CAST(quantile_disc(n_chars, 0.5) AS DOUBLE) AS q50,
               CAST(quantile_disc(n_chars, 0.95) AS DOUBLE) AS q95
        FROM documents GROUP BY source ORDER BY source""")),

    // ===== one-pass dataset profiling (graft.ops.Profile): per-column
    // row/null/distinct counts + canonical min/max — the data-quality
    // gate a curation pipeline stores per ingest batch. Oracle mirrors
    // the canonical encodings (timestamps as epoch micros).
    QueryDef(
      "prof1_profile_orders",
      (s, d) =>
        graft.ops.Profile.profile(Tables.orders(s, d),
          Seq("o_custkey", "o_orderpriority", "o_orderstatus", "o_totalprice"))
          .orderBy(col("col_name")),
      Some("""
        SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
               count(*) - count(o_custkey) AS n_nulls,
               count(DISTINCT o_custkey) AS n_distinct,
               CAST(min(o_custkey) AS VARCHAR) AS min_value,
               CAST(max(o_custkey) AS VARCHAR) AS max_value
        FROM orders
        UNION ALL
        SELECT 'o_orderpriority', count(*),
               count(*) - count(o_orderpriority),
               count(DISTINCT o_orderpriority),
               min(o_orderpriority), max(o_orderpriority)
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', count(*),
               count(*) - count(o_orderstatus),
               count(DISTINCT o_orderstatus),
               min(o_orderstatus), max(o_orderstatus)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', count(*),
               count(*) - count(o_totalprice),
               count(DISTINCT o_totalprice),
               CAST(min(o_totalprice) AS VARCHAR),
               CAST(max(o_totalprice) AS VARCHAR)
        FROM orders
        ORDER BY col_name""")),

    // ===== richer string functions.
    QueryDef(
      "f19_string_more",
      (s, d) =>
        Tables.nation(s, d)
          .select(
            col("n_nationkey").cast("int").as("nk"),
            lpad(col("n_name"), 12, ".").as("padded"),
            reverse(col("n_name")).as("rev"),
            replace(col("n_name"), lit("A"), lit("@")).as("replaced"),
            substring(col("n_name"), 2, 3).as("mid"),
            initcap(lower(col("n_name"))).as("title_case"))
          .orderBy(col("nk")),
      Some("""
        SELECT CAST(n_nationkey AS INT) AS nk,
               lpad(n_name, 12, '.') AS padded,
               reverse(n_name) AS rev,
               replace(n_name, 'A', '@') AS replaced,
               substring(n_name, 2, 3) AS mid,
               -- DuckDB initcap is not a builtin: title-case word-by-word
               array_to_string(
                 list_transform(string_split(lower(n_name), ' '),
                   w -> upper(w[1]) || w[2:]), ' ') AS title_case
        FROM nation ORDER BY nk""")),

    // ===== date arithmetic.
    QueryDef(
      "f20_date_arith",
      (s, d) =>
        Tables.orders(s, d)
          .select(
            col("o_orderkey"),
            date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
            datediff(lit(java.sql.Date.valueOf("1999-01-01")),
              col("o_orderdate").cast("date")).cast("int").as("days_to_99"),
            last_day(col("o_orderdate").cast("date")).as("month_end"))
          .orderBy(col("o_orderkey")),
      Some("""
        SELECT o_orderkey,
               CAST(o_orderdate AS DATE) + 30 AS due_date,
               CAST(datediff('day', CAST(o_orderdate AS DATE),
                    DATE '1999-01-01') AS INT) AS days_to_99,
               last_day(CAST(o_orderdate AS DATE)) AS month_end
        FROM orders ORDER BY o_orderkey""")),

    // ===== ordinal sort (O2) through SQL.
    QueryDef(
      "o2_ordinal_sort",
      (s, d) => {
        Tables.supplier(s, d).createOrReplaceTempView("gq_supplier")
        s.sql("""
          SELECT s_suppkey, s_name, round(s_acctbal, 2) AS bal
          FROM gq_supplier ORDER BY 3 DESC, 1""")
      },
      Some("""
        SELECT s_suppkey, s_name, round(s_acctbal, 2) AS bal
        FROM supplier ORDER BY 3 DESC, 1""")),

    // ===== gap-based sessionization over the events stream table (the
    // event-pipeline gold op; graft.ops.Sessionize).
    QueryDef(
      "e2_sessionize",
      (s, d) =>
        graft.ops.Sessionize.sessions(
          Tables.events(s, d), "user_id", "ts", gapMinutes = 30)
          .orderBy(col("user_id"), col("session_seq")),
      Some("""
        WITH e AS (
          SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        ), tagged AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR CAST(floor(epoch(ts)) AS BIGINT)
                           - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                      THEN 1 ELSE 0 END AS new_s,
                 event_id
          FROM e
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), seq AS (
          SELECT user_id, ts,
                 CAST(sum(new_s) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS session_seq
          FROM tagged
        )
        SELECT user_id, session_seq, count(*) AS n_events,
               min(ts) AS session_start, max(ts) AS session_end
        FROM seq GROUP BY user_id, session_seq
        ORDER BY user_id, session_seq""")),

    // ===== null-handling functions.
    QueryDef(
      "f21_null_funcs",
      (s, d) =>
        Tables.orders(s, d)
          .select(
            col("o_orderkey"),
            nullif(col("o_orderstatus"), lit("O")).as("status_or_null"),
            coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("status_label"),
            when(col("o_totalprice") > 150000, col("o_totalprice")).as("big_or_null"))
          .orderBy(col("o_orderkey")),
      Some("""
        SELECT o_orderkey,
               nullif(o_orderstatus, 'O') AS status_or_null,
               coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_label,
               CASE WHEN o_totalprice > 150000 THEN o_totalprice END AS big_or_null
        FROM orders ORDER BY o_orderkey"""))
  )
}
