package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.lake.{Bucketing, Cdc, LakeTable, MergeClause}
import graft.tables.Tables

/** Driver-checkable lake DML (NEXT.md r2 #6): each query materializes a
  * THROWAWAY lake table from the harness parquet, runs the DML through
  * the real commit-log engine, and returns a deterministic result the
  * DuckDB oracle reproduces with plain SQL over the same inputs — putting
  * MERGE clause cascade, the change data feed, and the bucketed-join read
  * path under the rows+schema+hash gate, not just ScalaTest.
  */
object LakeQueries extends QueryGroup {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  override def defs: Seq[QueryDef] = Seq(

    // multi-clause MERGE with SQL cascade: matched+negative-balance rows
    // delete, other matched rows update, unmatched source rows insert
    QueryDef("lake1_merge_clauses", (s, d) => {
      val customer = Tables.customer(s, d)
        .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      val t = LakeTable.create(s, tmp("lake-merge-"), customer)
      val source = customer.where(col("c_custkey") % 3 === 0)
        .select(col("c_custkey"), (col("c_acctbal") + 100).as("new_bal"))
        .unionByName(customer.where(col("c_custkey") % 7 === 0)
          .select((col("c_custkey") + 1000000).as("c_custkey"),
            lit(1.0).as("new_bal")))
      t.mergeClauses(source, col("t.c_custkey") === col("s.c_custkey"),
        matchedClauses = Seq(
          MergeClause.Delete(Some(col("t.c_acctbal") < 0)),
          MergeClause.Update(None, Map("c_acctbal" -> col("s.new_bal")))),
        notMatchedClauses = Seq(MergeClause.Insert(None, Map(
          "c_custkey" -> col("s.c_custkey"),
          "c_name" -> lit("merged"),
          "c_acctbal" -> col("s.new_bal"),
          "c_mktsegment" -> lit("NONE")))),
        notMatchedBySourceClauses = Seq.empty)
      t.toDF.select(col("c_custkey"), col("c_name"),
        round(col("c_acctbal"), 2).as("c_acctbal"), col("c_mktsegment"))
        .orderBy("c_custkey")
    }, oracle = Some("""
      WITH src AS (
        SELECT c_custkey, c_acctbal + 100 AS new_bal
        FROM customer WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey + 1000000 AS c_custkey, 1.0 AS new_bal
        FROM customer WHERE c_custkey % 7 = 0)
      SELECT t.c_custkey, t.c_name,
             round(CASE WHEN s.c_custkey IS NOT NULL THEN s.new_bal
                        ELSE t.c_acctbal END, 2) AS c_acctbal,
             t.c_mktsegment
      FROM customer t LEFT JOIN src s ON t.c_custkey = s.c_custkey
      WHERE NOT (s.c_custkey IS NOT NULL AND t.c_acctbal < 0)
      UNION ALL
      SELECT s.c_custkey, 'merged' AS c_name, round(s.new_bal, 2) AS c_acctbal,
             'NONE' AS c_mktsegment
      FROM src s LEFT JOIN customer t ON t.c_custkey = s.c_custkey
      WHERE t.c_custkey IS NULL
      ORDER BY c_custkey""")),

    // change data feed: DELETE then UPDATE on a CDF table; the replayed
    // feed (insert/delete/update pre+post) aggregates per change type
    QueryDef("lake2_cdc_feed", (s, d) => {
      val customer = Tables.customer(s, d).select("c_custkey", "c_acctbal")
      val t = LakeTable.create(s, tmp("lake-cdc-"), customer,
        properties = Map(Cdc.PROP -> "true"))
      t.delete(col("c_custkey") % 10 === 0)
      t.update(col("c_acctbal") < 0,
        Map("c_acctbal" -> (col("c_acctbal") * 2)))
      t.tableChanges(0)
        .groupBy(col(Cdc.CHANGE_TYPE).as("change_type"))
        .agg(count(lit(1)).as("n"),
          sum("c_custkey").as("key_sum"),
          round(sum("c_acctbal"), 2).as("bal_sum"))
        .orderBy("change_type")
    }, oracle = Some("""
      WITH changes AS (
        SELECT 'insert' AS change_type, c_custkey, c_acctbal FROM customer
        UNION ALL
        SELECT 'delete', c_custkey, c_acctbal FROM customer
        WHERE c_custkey % 10 = 0
        UNION ALL
        SELECT 'update_preimage', c_custkey, c_acctbal FROM customer
        WHERE c_custkey % 10 <> 0 AND c_acctbal < 0
        UNION ALL
        SELECT 'update_postimage', c_custkey, c_acctbal * 2 FROM customer
        WHERE c_custkey % 10 <> 0 AND c_acctbal < 0)
      SELECT change_type, count(*) AS n,
             CAST(sum(c_custkey) AS BIGINT) AS key_sum,
             round(sum(c_acctbal), 2) AS bal_sum
      FROM changes GROUP BY change_type ORDER BY change_type""")),

    // time travel under the gate: three versions (create / append /
    // delete), each read back via asOf and aggregated — DuckDB rebuilds
    // the same three states from the raw table
    QueryDef("lake4_time_travel", (s, d) => {
      val nation = Tables.nation(s, d)
      val t = LakeTable.create(s, tmp("lake-tt-"), nation) // v0
      t.append(nation.select((col("n_nationkey") + 1000).as("n_nationkey"),
        col("n_name"), col("n_regionkey"))) // v1
      t.delete(col("n_nationkey") % 2 === 1) // v2
      (0 to 2).map { v =>
        t.asOf(v).toDF.agg(
          lit(v).as("version"),
          count(lit(1)).as("n_rows"),
          sum(col("n_nationkey").cast("long")).as("key_sum"))
          .select("version", "n_rows", "key_sum")
      }.reduce(_ unionByName _).orderBy("version")
    }, oracle = Some("""
      WITH v1 AS (
        SELECT n_nationkey FROM nation
        UNION ALL SELECT n_nationkey + 1000 FROM nation)
      SELECT 0 AS version, count(*) AS n_rows,
             CAST(sum(n_nationkey) AS BIGINT) AS key_sum FROM nation
      UNION ALL
      SELECT 1, count(*), CAST(sum(n_nationkey) AS BIGINT) FROM v1
      UNION ALL
      SELECT 2, count(*), CAST(sum(n_nationkey) AS BIGINT) FROM v1
      WHERE n_nationkey % 2 <> 1
      ORDER BY version""")),

    // incrementally-maintained aggregate view: create at v0, run DML on
    // the source, refresh from the CHANGE FEED (cost ∝ changed rows) —
    // the oracle recomputes the same aggregate from the final state
    QueryDef("lake5_incremental_mv", (s, d) => {
      val customer = Tables.customer(s, d)
        .select("c_custkey", "c_mktsegment", "c_acctbal")
      val srcPath = tmp("lake-mv-src-")
      val t = LakeTable.create(s, srcPath, customer,
        properties = Map(Cdc.PROP -> "true"))
      val mvPath = tmp("lake-mv-") + "/mv"
      graft.lake.IncrementalMv.create(s, mvPath, srcPath,
        Seq("c_mktsegment"), Seq("c_acctbal"))
      t.delete(col("c_custkey") % 10 === 0)
      t.update(col("c_acctbal") < 0,
        Map("c_acctbal" -> (col("c_acctbal") * 2)))
      t.append(customer.where(col("c_custkey") % 7 === 0)
        .select((col("c_custkey") + 500000).as("c_custkey"),
          col("c_mktsegment"), (col("c_acctbal") + 10).as("c_acctbal")))
      graft.lake.IncrementalMv.refresh(s, mvPath)
      LakeTable.forPath(s, mvPath).toDF
        .select(col("c_mktsegment"), col("n"),
          round(col("sum_c_acctbal"), 2).as("bal_sum"),
          col("nn_c_acctbal").as("nn"))
        .orderBy("c_mktsegment")
    }, oracle = Some("""
      WITH final AS (
        SELECT c_mktsegment,
               CASE WHEN c_acctbal < 0 THEN c_acctbal * 2
                    ELSE c_acctbal END AS c_acctbal
        FROM customer WHERE c_custkey % 10 <> 0
        UNION ALL
        SELECT c_mktsegment, c_acctbal + 10
        FROM customer WHERE c_custkey % 7 = 0)
      SELECT c_mktsegment, count(*) AS n,
             round(sum(c_acctbal), 2) AS bal_sum,
             count(c_acctbal) AS nn
      FROM final GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Iceberg-style partition-spec EVOLUTION under the oracle gate:
    // create unpartitioned, evolve to PARTITIONED BY o_orderstatus
    // (metadata-only), append a second slice in the new hive layout,
    // run a DML that spans BOTH generations, then aggregate behind a
    // partition filter — the read must prune the new generation on its
    // directory values, read the old generation's in-file column, and
    // apply the delete everywhere. DuckDB rebuilds the final state from
    // the raw table.
    QueryDef("lake6_partition_evolution", (s, d) => {
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
      val t = LakeTable.create(s, tmp("lake-pevo-"),
        orders.where(col("o_orderkey") % 2 === 0)) // v0: unpartitioned
      t.alterPartitionSpec(Seq("o_orderstatus")) // v1: metadata-only
      t.append(orders.where(col("o_orderkey") % 2 === 1)) // v2: p= layout
      t.delete(col("o_orderstatus") === "P" && col("o_custkey") % 5 === 0)
      t.reorganize() // converge to ONE layout; result must be unchanged
      t.toDF.where(col("o_orderstatus") =!= "O")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("o_orderkey")).as("key_sum"))
        .orderBy("o_orderstatus")
    }, oracle = Some("""
      SELECT o_orderstatus, count(*) AS n,
             CAST(sum(o_orderkey) AS BIGINT) AS key_sum
      FROM orders
      WHERE NOT (o_orderstatus = 'P' AND o_custkey % 5 = 0)
        AND o_orderstatus <> 'O'
      GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Iceberg-style HIDDEN PARTITIONING under the oracle gate: the table
    // is PARTITIONED BY year(o_orderdate) — files lay out under synthetic
    // __pt_year_o_orderdate=YYYY dirs, the source column stays in-file —
    // then a cross-year DML runs and a date-range aggregate reads back.
    // The filter prunes whole year directories via each file's recorded
    // transform value (plus footer stats); DuckDB rebuilds the final
    // state from the raw table.
    QueryDef("lake7_hidden_partitioning", (s, d) => {
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      val t = LakeTable.create(s, tmp("lake-hpart-"), orders,
        partitionBy = Seq("year(o_orderdate)"))
      t.delete(col("o_custkey") % 7 === 0)
      t.toDF
        .where(col("o_orderdate") >= to_date(lit("1996-01-01")) &&
          col("o_orderdate") < to_date(lit("1998-01-01")))
        .groupBy(year(col("o_orderdate")).cast("int").as("yr"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy("yr")
    }, oracle = Some("""
      SELECT CAST(year(o_orderdate) AS INT) AS yr, count(*) AS n,
             round(sum(o_totalprice), 2) AS total
      FROM orders
      WHERE o_custkey % 7 <> 0
        AND o_orderdate >= TIMESTAMP'1996-01-01'
        AND o_orderdate < TIMESTAMP'1998-01-01'
      GROUP BY 1 ORDER BY yr""")),

    // the consolidated bloom key index end-to-end under the oracle: an
    // UNCLUSTERED key over many small files (round-robin — min/max can
    // never prune a point probe), eleven commits so the checkpoint
    // boundary publishes the bit-sliced index, then a literal IN-list
    // point lookup resolves through the layered probe (consolidated
    // slices for covered files, sidecars for the post-checkpoint tail)
    QueryDef("lake8_consolidated_lookup", (s, d) => {
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val t = LakeTable.create(s, tmp("lake-ckidx-"),
        orders.where(col("o_orderkey") % 11 === 0).repartition(4),
        properties = Map(
          graft.lake.BloomIndex.COLS_PROP -> "o_orderkey",
          graft.lake.ConsolidatedKeyIndex.MIN_FILES_PROP -> "1"))
      (1 to 10).foreach(i =>
        t.append(orders.where(col("o_orderkey") % 11 === i).repartition(4)))
      graft.lake.LakeLog.awaitMaintenance() // index published at v10
      // deterministic literal keys (the 24 smallest), so the probe runs
      // the bloom path the oracle can reproduce with a plain IN subquery
      val keys = orders.select("o_orderkey").distinct()
        .orderBy("o_orderkey").limit(24)
        .collect().map(_.getLong(0)).toSeq
      t.read(col("o_orderkey").isin(keys: _*))
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy("o_orderkey")
    }, oracle = Some("""
      SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
      FROM orders
      WHERE o_orderkey IN (
        SELECT o_orderkey FROM (
          SELECT DISTINCT o_orderkey FROM orders
          ORDER BY o_orderkey LIMIT 24))
      ORDER BY o_orderkey""")),

    // the compiled wide-IN fast path end-to-end under the oracle
    // (VERDICT r11 round-12 #1): ~480 literal keys compile ONCE
    // (sorted compare forms + typed bloom hashes — Stats.InFast) and
    // prune per file by window binary-search + batched index bit
    // tests. The table is Z-ORDERed by the key first — the documented
    // remedy for the wide-IN residual: on an unclustered layout
    // 1−(1−fpp)^width of the files stay genuine bloom candidates (a
    // data cost no index removes), while clustered files hold disjoint
    // key ranges so the window excludes most files before any bloom
    // consult. An explicit checkpoint() after the clustering rewrite
    // publishes the consolidated index over the clustered files (the
    // operator move after any bulk reorganization), so the probe
    // serves batched.
    QueryDef("lake9_clustered_wide_in", (s, d) => {
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val t = LakeTable.create(s, tmp("lake-widein-"),
        orders.repartition(24, col("o_orderkey")), // hash-scattered
        properties = Map(
          graft.lake.BloomIndex.COLS_PROP -> "o_orderkey",
          graft.lake.ConsolidatedKeyIndex.MIN_FILES_PROP -> "1"))
      t.zOrderBy("o_orderkey") // v1: 24 disjoint key-range files
      t.checkpoint() // publish the consolidated index NOW
      graft.lake.LakeLog.awaitMaintenance()
      // deterministic WIDE key set, width-capped so the literal list
      // stays ~480 at every SF: wide enough that an unclustered layout
      // would keep ~every file as a bloom candidate
      val keys = orders.select("o_orderkey").distinct()
        .where(col("o_orderkey") % 31 === 7)
        .orderBy("o_orderkey").limit(480)
        .collect().map(_.getLong(0)).toSeq
      t.read(col("o_orderkey").isin(keys: _*))
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy("o_orderkey")
    }, oracle = Some("""
      SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
      FROM orders
      WHERE o_orderkey IN (
        SELECT o_orderkey FROM (
          SELECT DISTINCT o_orderkey FROM orders
          WHERE o_orderkey % 31 = 7
          ORDER BY o_orderkey LIMIT 480))
      ORDER BY o_orderkey""")),

    // tiered clustering MAINTENANCE under the oracle: the clustered
    // base takes append churn; optimizeIncrementalBy merges ONLY the
    // layout-breaking residue into a fresh disjoint run (the base run
    // is never rewritten — at 100 TB the wide-IN remedy is only
    // affordable if maintaining it costs churn, not the table), and
    // the wide IN then reads the maintained layout through the same
    // compiled fast path as lake9. DuckDB rebuilds the final content
    // from the raw table; the layout work must be invisible to it.
    QueryDef("lake10_incremental_cluster", (s, d) => {
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val t = LakeTable.create(s, tmp("lake-optinc-"),
        orders.where(col("o_orderkey") % 4 === 0)
          .repartition(16, col("o_orderkey")),
        properties = Map(
          graft.lake.BloomIndex.COLS_PROP -> "o_orderkey",
          graft.lake.ConsolidatedKeyIndex.MIN_FILES_PROP -> "1"))
      t.zOrderBy("o_orderkey") // clustered base: 16 disjoint ranges
      (1 to 3).foreach(i => // churn: 6 files, each spanning the domain
        t.append(orders.where(col("o_orderkey") % 4 === i).repartition(2)))
      t.optimizeIncrementalBy("o_orderkey", maxLayers = 2)
      t.checkpoint()
      graft.lake.LakeLog.awaitMaintenance()
      val keys = orders.select("o_orderkey").distinct()
        .where(col("o_orderkey") % 37 === 11)
        .orderBy("o_orderkey").limit(400)
        .collect().map(_.getLong(0)).toSeq
      t.read(col("o_orderkey").isin(keys: _*))
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy("o_orderkey")
    }, oracle = Some("""
      SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
      FROM orders
      WHERE o_orderkey IN (
        SELECT o_orderkey FROM (
          SELECT DISTINCT o_orderkey FROM orders
          WHERE o_orderkey % 37 = 11
          ORDER BY o_orderkey LIMIT 400))
      ORDER BY o_orderkey""")),

    // STRING-key wide IN through the compiled fast path (VERDICT r12
    // #3): lake9 pins long keys; this row pins the string forms —
    // InFast's UTF-8 byte-order compare windows (Stats.strCmp) over a
    // range-clustered STRING layout (single-column zOrderBy range
    // partitions the raw column, so files hold disjoint c_name ranges
    // and the ~400-literal IN's window binary-search excludes most
    // files before any bloom consult). c_name is the o_clerk shape:
    // "Customer#000000001", high-cardinality, prefix-heavy — the
    // worst case for naive lexical handling, pinned hash-green here.
    QueryDef("lake11_string_clustered_in", (s, d) => {
      val customer = Tables.customer(s, d)
        .select("c_custkey", "c_name", "c_acctbal")
      val t = LakeTable.create(s, tmp("lake-strin-"),
        customer.repartition(24, col("c_name")), // hash-scattered
        properties = Map(
          graft.lake.BloomIndex.COLS_PROP -> "c_name",
          graft.lake.ConsolidatedKeyIndex.MIN_FILES_PROP -> "1"))
      t.zOrderBy("c_name") // v1: 24 disjoint string-range files
      t.checkpoint()
      graft.lake.LakeLog.awaitMaintenance()
      val keys = customer.where(col("c_custkey") % 3 === 1)
        .select("c_name").orderBy("c_name").limit(400)
        .collect().map(_.getString(0)).toSeq
      t.read(col("c_name").isin(keys: _*))
        .select(col("c_custkey"), col("c_name"),
          round(col("c_acctbal"), 2).as("c_acctbal"))
        .orderBy("c_custkey")
    }, oracle = Some("""
      SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal
      FROM customer
      WHERE c_name IN (
        SELECT c_name FROM (
          SELECT c_name FROM customer
          WHERE c_custkey % 3 = 1
          ORDER BY c_name LIMIT 400))
      ORDER BY c_custkey""")),

    // multi-column CURVE-clustered read under the oracle (VERDICT r12
    // #6): hilbertBy interleaves quantile-bucketed coordinates through
    // the continuous Hilbert curve, so per-file min/max stays tight on
    // BOTH columns and a 2-D box predicate range-excludes most files —
    // the layout where neither single-column sort helps (a o_custkey
    // sort spreads o_totalprice and vice versa). The audited bench
    // shape is 0 joins / 1 display-sort exchange + the scanned-file
    // count (∝ the box, not the table).
    QueryDef("lake12_hilbert_box", (s, d) => {
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val t = LakeTable.create(s, tmp("lake-hilbert-"),
        orders.repartition(24, col("o_orderkey"))) // hash-scattered
      t.hilbertBy("o_custkey", "o_totalprice")
      t.read(col("o_custkey").between(40, 90),
          col("o_totalprice").between(50000, 150000))
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy("o_orderkey")
    }, oracle = Some("""
      SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
      FROM orders
      WHERE o_custkey BETWEEN 40 AND 90
        AND o_totalprice BETWEEN 50000 AND 150000
      ORDER BY o_orderkey""")),

    // the bucketed DSv2 read path end-to-end: two co-bucketed lake tables
    // joined through the catalog (storage-partitioned join — zero join
    // shuffles, asserted in BucketingSpec; values gated here)
    QueryDef("lake3_bucketed_join", (s, d) => {
      // Spark caches catalog instances by name with their init-time conf,
      // so REUSE the session's warehouse once set (repeat invocations in
      // one session would otherwise read a stale first warehouse)
      val wh = s.conf.getOption("spark.sql.catalog.lakeq.warehouse")
        .getOrElse {
          val w = tmp("lake-spj-")
          s.conf.set("spark.sql.catalog.lakeq",
            "org.apache.spark.sql.graft.LakeCatalog")
          s.conf.set("spark.sql.catalog.lakeq.warehouse", w)
          w
        }
      Files.createDirectories(java.nio.file.Paths.get(s"$wh/db"))
      LakeTable.create(s, s"$wh/db/orders",
        Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice"),
        bucketBy = Seq("o_custkey"), numBuckets = 8, mode = "overwrite")
      LakeTable.create(s, s"$wh/db/customer",
        Tables.customer(s, d).select("c_custkey", "c_mktsegment"),
        bucketBy = Seq("c_custkey"), numBuckets = 8, mode = "overwrite")
      s.sql("""
        SELECT c.c_mktsegment, count(*) AS n_orders,
               round(sum(o.o_totalprice), 2) AS revenue
        FROM lakeq.db.orders o JOIN lakeq.db.customer c
          ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""")
    }, oracle = Some("""
      SELECT c.c_mktsegment, count(*) AS n_orders,
             round(sum(o.o_totalprice), 2) AS revenue
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""")))
}
