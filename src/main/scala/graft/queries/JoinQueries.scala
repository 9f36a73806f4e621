package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Join surface — SURVEY.md §2.4 J4 (inner/left/semi/anti/full, equi +
  * theta, broadcast vs shuffle). Scale notes:
  *  - dimension tables (region/nation/supplier/part at TPC-H ratios) are
  *    broadcast explicitly — at 100 TB the fact side never shuffles for
  *    these joins;
  *  - fact-fact joins (orders⋈lineitem) shuffle on the join key; AQE
  *    handles skew/coalescing at runtime.
  */
object JoinQueries extends QueryGroup {

  val defs: Seq[QueryDef] = Seq(

    // ===== TPC-H-Q3-shaped: fact-fact shuffle join + broadcast dim, agg,
    // top-k by revenue.
    QueryDef(
      "q3_shipping_priority",
      (s, d) => {
        val cust = Tables.customer(s, d).where(col("c_mktsegment") === "BUILDING")
        val ord = Tables.orders(s, d)
          .where(col("o_orderdate") < lit(Timestamp.valueOf("1995-03-15 00:00:00")))
        val li = Tables.lineitem(s, d)
          .where(col("l_shipdate") > lit(Timestamp.valueOf("1995-03-15 00:00:00")))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // ===== TPC-H-Q5-shaped: 6-way star join, dims broadcast.
    QueryDef(
      "q5_revenue_by_nation",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val ord = Tables.orders(s, d)
        val cust = Tables.customer(s, d)
        val sup = Tables.supplier(s, d)
        val nat = Tables.nation(s, d)
        val reg = Tables.region(s, d)
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(sup),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("r_name"), col("n_name"))
      },
      Some("""
        SELECT r_name, n_name,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name""")),

    // ===== J4 left outer: order counts per customer including zero-order
    // customers (null-safe count of right-side key).
    QueryDef(
      "j4_left_join",
      (s, d) => {
        val cust = Tables.customer(s, d)
        val ord = Tables.orders(s, d)
        cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"), col("c_name"))
          .agg(count(col("o_orderkey")).as("n_orders"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name ORDER BY c_custkey""")),

    // ===== J4 left semi: customers that have at least one open order
    // (EXISTS) — semi join never duplicates the left side.
    QueryDef(
      "j4_semi_join",
      (s, d) => {
        val cust = Tables.customer(s, d)
        val open = Tables.orders(s, d).where(col("o_orderstatus") === "O")
        cust.join(open, col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        ORDER BY c_custkey""")),

    // ===== J4 left anti: customers with no orders at all (NOT EXISTS).
    QueryDef(
      "j4_anti_join",
      (s, d) => {
        // customers with no URGENT order: a nonzero anti join at every SF
        // (every customer has SOME order in the fixture, so the unfiltered
        // variant was vacuous — VERDICT r01 "what's wrong" #1)
        val cust = Tables.customer(s, d)
        val urgent = Tables.orders(s, d)
          .where(col("o_orderpriority") === "1-URGENT")
        cust.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        ORDER BY c_custkey""")),

    // ===== J4 full outer: per-nation customer vs supplier presence.
    QueryDef(
      "j4_full_outer",
      (s, d) => {
        val c = Tables.customer(s, d)
          .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
        val sup = Tables.supplier(s, d)
          .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
        c.join(sup, col("c_nationkey") === col("s_nationkey"), "full_outer")
          .select(
            coalesce(col("c_nationkey"), col("s_nationkey")).cast("int").as("nk"),
            coalesce(col("n_cust"), lit(0L)).as("n_cust"),
            coalesce(col("n_supp"), lit(0L)).as("n_supp"))
          .orderBy(col("nk"))
      },
      Some("""
        WITH c AS (SELECT c_nationkey, count(*) AS n_cust
                   FROM customer GROUP BY c_nationkey),
             s AS (SELECT s_nationkey, count(*) AS n_supp
                   FROM supplier GROUP BY s_nationkey)
        SELECT CAST(coalesce(c_nationkey, s_nationkey) AS INT) AS nk,
               coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
        FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
        ORDER BY nk""")),

    // ===== J4 theta: equi join + non-equi residual (lineitems priced above
    // part retail price).
    QueryDef(
      "j4_theta_join",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val p = Tables.part(s, d)
        li.join(broadcast(p),
            col("l_partkey") === col("p_partkey") &&
              col("l_extendedprice") > col("p_retailprice") * col("l_quantity"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_above"))
          .orderBy(col("p_brand"))
      },
      Some("""
        SELECT p_brand, count(*) AS n_above
        FROM lineitem JOIN part
          ON l_partkey = p_partkey
         AND l_extendedprice > p_retailprice * l_quantity
        GROUP BY p_brand ORDER BY p_brand"""))
  )
}
