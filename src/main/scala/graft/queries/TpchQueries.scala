package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Additional TPC-H-shaped queries deepening the scan→join→agg spine
  * (Q4, Q6, Q10, Q14 analogs adapted to the harness schema).
  */
object TpchQueries extends QueryGroup {

  private def ts(s: String) = lit(Timestamp.valueOf(s + " 00:00:00"))

  val defs: Seq[QueryDef] = Seq(

    // ===== Q6-shaped: forecast revenue — pure filter + global agg, the
    // canonical pushdown showcase.
    QueryDef(
      "q6_forecast_revenue",
      (s, d) =>
        Tables.lineitem(s, d)
          .where(col("l_shipdate") >= ts("1995-01-01") &&
            col("l_shipdate") < ts("1997-01-01") &&
            col("l_discount").between(0.02, 0.08) &&
            col("l_quantity") < 24)
          .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue")),
      Some("""
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.02 AND 0.08
          AND l_quantity < 24""")),

    // ===== Q4-shaped: order-priority checking via EXISTS semi join.
    QueryDef(
      "q4_order_priority",
      (s, d) => {
        val ord = Tables.orders(s, d)
          .where(col("o_orderdate") >= ts("1996-01-01") &&
            col("o_orderdate") < ts("1997-01-01"))
        val late = Tables.lineitem(s, d).select(col("l_orderkey"))
        ord.join(late, ord("o_orderkey") === late("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ===== Q10-shaped: returned-item reporting — customer revenue lost
    // to returns, top 20.
    QueryDef(
      "q10_returned_items",
      (s, d) => {
        val cust = Tables.customer(s, d)
        val ord = Tables.orders(s, d)
        val li = Tables.lineitem(s, d).where(col("l_returnflag") === "R")
        val nat = Tables.nation(s, d)
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""
        SELECT c_custkey, c_name, n_name,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // ===== Q14-shaped: promo revenue share — conditional agg over a join.
    QueryDef(
      "q14_promo_share",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val p = Tables.part(s, d)
        li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .agg(
            round(
              sum(when(col("p_type").startsWith("PROMO"),
                col("l_extendedprice") * (lit(1.0) - col("l_discount")))
                .otherwise(0.0)) * 100.0 /
                sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
              4).as("promo_pct"))
      },
      Some("""
        SELECT round(
                 sum(CASE WHEN p_type LIKE 'PROMO%'
                     THEN l_extendedprice * (1.0 - l_discount)
                     ELSE 0.0 END) * 100.0 /
                 sum(l_extendedprice * (1.0 - l_discount)), 4) AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey"""))
  )
}
