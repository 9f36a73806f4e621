package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Scans, projections, filters, aggregations, sorts, set ops —
  * SURVEY.md §2.1/2.3/2.5/2.6/2.7 rows S1-S3, P1-P9, A1-A7, O1-O3, U1/U5.
  * All pure built-in Catalyst operators: filters/projections push to the
  * parquet scan, aggregates run partial+final hash agg, top-k plans
  * TakeOrderedAndProject — no shuffle beyond the agg/sort boundary.
  */
object RelationalQueries extends QueryGroup {

  private val cutoff = Timestamp.valueOf("1998-09-02 00:00:00")

  val defs: Seq[QueryDef] = Seq(

    // ===== Flagship: TPC-H-Q1-shaped pricing summary (scan→filter→agg→sort
    // spine of the reference: delta_lake_primer.py:62-66,370-376).
    QueryDef(
      "q1_pricing_summary",
      (s, d) =>
        Tables.lineitem(s, d)
          .where(col("l_shipdate") <= lit(cutoff))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            round(avg(col("l_extendedprice")), 4).as("avg_price"),
            round(avg(col("l_discount")), 4).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus""")),

    // ===== S1+P1: parquet scan with projection/alias (column-pruned read).
    QueryDef(
      "s1_scan_project",
      (s, d) =>
        Tables.lineitem(s, d)
          .select(
            col("l_orderkey").as("okey"),
            col("l_linenumber").as("lineno"),
            col("l_extendedprice").as("price"))
          // (okey, lineno) is NOT unique in the synthetic lineitem —
          // price completes a total order.
          .orderBy(col("okey"), col("lineno"), col("price")),
      Some("""
        SELECT l_orderkey AS okey, l_linenumber AS lineno,
               l_extendedprice AS price
        FROM lineitem ORDER BY okey, lineno, price""")),

    // ===== P2+P3: derived column + compound predicate (pushdown visible as
    // PushedFilters on l_quantity/l_returnflag).
    QueryDef(
      "p2_filter_derived",
      (s, d) =>
        Tables.lineitem(s, d)
          .where(col("l_quantity").between(10, 20) && col("l_returnflag") === "R")
          // no round(): both engines compute the identical IEEE double for
          // the same per-row expression; rounding would *introduce* a
          // half-case divergence (Spark rounds the shortest-decimal repr,
          // DuckDB the binary value).
          .withColumn("revenue", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("revenue"))
          .orderBy(col("l_orderkey"), col("l_linenumber"), col("revenue")),
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity,
               l_extendedprice * (1.0 - l_discount) AS revenue
        FROM lineitem
        WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag = 'R'
        ORDER BY l_orderkey, l_linenumber, revenue""")),

    // ===== P9: casts (double→int, int→string, string compare).
    QueryDef(
      "p9_cast",
      (s, d) =>
        Tables.orders(s, d)
          .select(
            col("o_orderkey"),
            // floor() both sides: Spark CAST(double AS BIGINT) truncates,
            // DuckDB rounds — floor is the portable form.
            floor(col("o_totalprice")).cast("long").as("price_long"),
            col("o_custkey").cast("string").as("cust_str"))
          .orderBy(col("o_orderkey"), col("price_long")),
      Some("""
        SELECT o_orderkey,
               CAST(floor(o_totalprice) AS BIGINT) AS price_long,
               CAST(o_custkey AS VARCHAR) AS cust_str
        FROM orders ORDER BY o_orderkey, price_long""")),

    // ===== A1: groupBy+count (partial+final hash agg).
    QueryDef(
      "a1_count_by_status",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus")),
      Some("""
        SELECT o_orderstatus, count(*) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ===== A2: groupBy+sum/min/max on one col.
    QueryDef(
      "a2_acctbal_by_nation",
      (s, d) =>
        Tables.customer(s, d)
          .groupBy(col("c_nationkey"))
          .agg(
            round(sum(col("c_acctbal")), 2).as("sum_bal"),
            round(min(col("c_acctbal")), 2).as("min_bal"),
            round(max(col("c_acctbal")), 2).as("max_bal"))
          .orderBy(col("c_nationkey")),
      Some("""
        SELECT c_nationkey, round(sum(c_acctbal), 2) AS sum_bal,
               round(min(c_acctbal), 2) AS min_bal,
               round(max(c_acctbal), 2) AS max_bal
        FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""")),

    // ===== A4: ungrouped (global) aggregate — single-row result.
    QueryDef(
      "a4_global_agg",
      (s, d) =>
        Tables.orders(s, d)
          .agg(
            count(lit(1)).as("n_orders"),
            round(max(col("o_totalprice")), 2).as("max_price"),
            round(min(col("o_totalprice")), 2).as("min_price"),
            round(avg(col("o_totalprice")), 4).as("avg_price")),
      Some("""
        SELECT count(*) AS n_orders, round(max(o_totalprice), 2) AS max_price,
               round(min(o_totalprice), 2) AS min_price,
               round(avg(o_totalprice), 4) AS avg_price
        FROM orders""")),

    // ===== A5: distinct projection (reference: ingesta_incremental
    // [json].py:145-148 `select distinct`).
    QueryDef(
      "a5_distinct",
      (s, d) =>
        Tables.lineitem(s, d)
          .select(col("l_returnflag"), col("l_linestatus"))
          .distinct()
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""
        SELECT DISTINCT l_returnflag, l_linestatus
        FROM lineitem ORDER BY l_returnflag, l_linestatus""")),

    // ===== A7a: count_distinct (exact).
    QueryDef(
      "a7_count_distinct",
      (s, d) =>
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"))
          .agg(
            countDistinct(col("l_orderkey")).as("n_orders"),
            countDistinct(col("l_suppkey")).as("n_supps"))
          .orderBy(col("l_returnflag")),
      Some("""
        SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
               count(DISTINCT l_suppkey) AS n_supps
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ===== A7b: ROLLUP with grouping_id — null group keys coalesced to a
    // sentinel so null-ordering differences can't bite the sort.
    QueryDef(
      "a7_rollup",
      (s, d) =>
        Tables.orders(s, d)
          .rollup(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"))
          .select(
            coalesce(col("o_orderstatus"), lit("<all>")).as("status"),
            coalesce(col("o_orderpriority"), lit("<all>")).as("priority"),
            col("n"), col("sum_price"))
          .orderBy(col("status"), col("priority")),
      Some("""
        SELECT coalesce(o_orderstatus, '<all>') AS status,
               coalesce(o_orderpriority, '<all>') AS priority,
               count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
        FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY status, priority""")),

    // ===== A7c: CUBE.
    QueryDef(
      "a7_cube",
      (s, d) =>
        Tables.lineitem(s, d)
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(round(sum(col("l_quantity")), 2).as("qty"))
          .select(
            coalesce(col("l_returnflag"), lit("<all>")).as("rf"),
            coalesce(col("l_linestatus"), lit("<all>")).as("ls"),
            col("qty"))
          .orderBy(col("rf"), col("ls")),
      Some("""
        SELECT coalesce(l_returnflag, '<all>') AS rf,
               coalesce(l_linestatus, '<all>') AS ls,
               round(sum(l_quantity), 2) AS qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY rf, ls""")),

    // ===== O1: top-k — Spark plans TakeOrderedAndProject (no full sort of
    // all partitions at scale; per-partition heap + driver merge).
    QueryDef(
      "o1_topk_orders",
      (s, d) =>
        Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10),
      Some("""
        SELECT o_orderkey, o_totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // ===== U1: union (distinct nation keys appearing on either side).
    QueryDef(
      "u1_union",
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nk"))
        val sup = Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("nk"))
        c.unionByName(sup).distinct().orderBy(col("nk"))
      },
      Some("""
        SELECT CAST(c_nationkey AS INT) AS nk FROM customer
        UNION
        SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
        ORDER BY nk""")),

    // ===== U5a: intersect.
    QueryDef(
      "u5_intersect",
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nk"))
        val sup = Tables.supplier(s, d).select(col("s_nationkey").cast("int").as("nk"))
        c.intersect(sup).orderBy(col("nk"))
      },
      Some("""
        SELECT CAST(c_nationkey AS INT) AS nk FROM customer
        INTERSECT
        SELECT CAST(s_nationkey AS INT) AS nk FROM supplier
        ORDER BY nk""")),

    // ===== U5b: except (nations with customers but no suppliers).
    QueryDef(
      "u5_except",
      (s, d) => {
        // nations with customers but no high-balance supplier — the
        // unfiltered variant was an always-empty EXCEPT (vacuous oracle,
        // VERDICT r01); the s_acctbal cut leaves a nonzero remainder
        val c = Tables.customer(s, d).select(col("c_nationkey").cast("int").as("nk"))
        val sup = Tables.supplier(s, d).where(col("s_acctbal") > 8000)
          .select(col("s_nationkey").cast("int").as("nk"))
        c.except(sup).orderBy(col("nk"))
      },
      Some("""
        SELECT CAST(c_nationkey AS INT) AS nk FROM customer
        EXCEPT
        SELECT CAST(s_nationkey AS INT) AS nk FROM supplier WHERE s_acctbal > 8000
        ORDER BY nk"""))
  )
}
