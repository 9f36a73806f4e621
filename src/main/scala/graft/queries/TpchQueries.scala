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
        FROM lineitem JOIN part ON l_partkey = p_partkey""")),

    // ===== Q7-shaped: volume shipping between two nations — the nation
    // table joins TWICE under different roles (supplier side, customer
    // side); both roles broadcast, the fact-fact join is the only
    // shuffle.
    QueryDef(
      "q7_volume_shipping",
      (s, d) => {
        val n1 = Tables.nation(s, d)
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, d)
          .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
        Tables.lineitem(s, d)
          .where(col("l_shipdate") >= ts("1995-01-01") &&
            col("l_shipdate") < ts("1997-01-01"))
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
          .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
          .where((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("l_year"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some("""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR
               (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),

    // ===== Q8-shaped: market share of one supplier nation within a
    // customer region, per year — 7-way star with a region roll-up and
    // a conditional-ratio aggregate.
    QueryDef(
      "q8_market_share",
      (s, d) => {
        val n1 = Tables.nation(s, d)
          .select(col("n_nationkey").as("c_nk"), col("n_regionkey"))
        val n2 = Tables.nation(s, d)
          .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
        val volume = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d).where(col("p_type") === "ECONOMY")),
            col("l_partkey") === col("p_partkey"))
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .where(col("o_orderdate") >= ts("1995-01-01") &&
            col("o_orderdate") < ts("1997-01-01"))
          .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
          .join(broadcast(Tables.region(s, d).where(col("r_name") === "AMERICA")),
            col("n_regionkey") === col("r_regionkey"))
          .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
          .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(round(
            sum(when(col("supp_nation") === "NATION_3", volume).otherwise(0.0)) /
              sum(volume), 4).as("mkt_share"))
          .orderBy(col("o_year"))
      },
      Some("""
        SELECT year(o_orderdate) AS o_year,
               round(sum(CASE WHEN n2.n_name = 'NATION_3'
                          THEN l_extendedprice * (1.0 - l_discount)
                          ELSE 0.0 END) /
                     sum(l_extendedprice * (1.0 - l_discount)), 4) AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
          AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY o_year ORDER BY o_year""")),

    // ===== Q9-shaped: profit by supplier nation and year over a part
    // name pattern (no partsupp table in the harness schema, so profit
    // is revenue rather than revenue minus supply cost).
    QueryDef(
      "q9_profit_by_nation",
      (s, d) =>
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d).where(col("p_name").like("%red%"))),
            col("l_partkey") === col("p_partkey"))
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("profit"))
          .orderBy(col("nation"), col("o_year")),
      Some("""
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ===== Q13-shaped: customer order-count distribution — left outer
    // join with an extra join-side predicate, then a two-level count
    // histogram.
    QueryDef(
      "q13_customer_distribution",
      (s, d) => {
        val ord = Tables.orders(s, d)
        val cust = Tables.customer(s, d)
        val perCust = cust.join(ord,
          cust("c_custkey") === ord("o_custkey") &&
            ord("o_orderpriority") =!= "1-URGENT", "left")
          .groupBy(cust("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
        perCust.groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""
        SELECT c_count, count(*) AS custdist
        FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC""")),

    // ===== Q15-shaped: top supplier by quarterly revenue — aggregate
    // reused as both join input and scalar-max subquery.
    QueryDef(
      "q15_top_supplier",
      (s, d) => {
        val revenue = Tables.lineitem(s, d)
          .where(col("l_shipdate") >= ts("1996-01-01") &&
            col("l_shipdate") < ts("1996-04-01"))
          .groupBy(col("l_suppkey"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("total_revenue"))
        // r13: cut the per-supplier aggregate once — the scalar-max arm
        // re-evaluated the whole lineitem aggregation as its second
        // plan copy; `revenue` is one small row per supplier at any
        // scale, so an eager materialization costs one tiny write and
        // both consumers (the join side and the max) read it.
        // persistedCut keeps lineage (r14): executor-loss-recoverable.
        val revenueM = org.apache.spark.sql.graft.Bridge.persistedCut(revenue)
        val maxRev = revenueM.agg(max(col("total_revenue")).as("mr"))
        Tables.supplier(s, d)
          .join(revenueM, col("s_suppkey") === col("l_suppkey"))
          .join(broadcast(maxRev), col("total_revenue") === col("mr"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
          .orderBy(col("s_suppkey"))
      },
      Some("""
        WITH revenue AS (
          SELECT l_suppkey,
                 round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey""")),

    // ===== Q17-shaped: small-quantity-order revenue — correlated scalar
    // subquery (per-part average quantity) expressed as an aggregate
    // self-join.
    QueryDef(
      "q17_small_quantity",
      (s, d) => {
        // r13: the per-part threshold becomes a WINDOW over the
        // brand-filtered join instead of a full-table aggregate joined
        // back. The broadcast part join keeps EVERY lineitem row of a
        // Brand#23 partkey (partkey determines the part), so
        // avg(l_quantity) over the partkey partition of the joined rows
        // equals the old whole-lineitem per-partkey average for every
        // surviving row — and lineitem is scanned once, with only brand
        // rows shuffling, instead of twice with a full-table aggregate.
        val wPart17 = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_partkey"))
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d).where(col("p_brand") === "Brand#23")),
            col("l_partkey") === col("p_partkey"))
          .withColumn("qty_thresh", avg(col("l_quantity")).over(wPart17) * 0.2)
          .where(col("l_quantity") < col("qty_thresh"))
          .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
      },
      Some("""
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < (
            SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = p_partkey)""")),

    // ===== Q19-shaped: discounted revenue under OR'd bracket predicates
    // — each disjunct pairs part attributes with lineitem ranges; the
    // common p_partkey join is the only join.
    QueryDef(
      "q19_bracket_revenue",
      (s, d) =>
        Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
          .where(
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
              col("l_quantity").between(1, 11)) ||
              (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
                col("l_quantity").between(10, 20)) ||
              (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
                col("l_quantity").between(20, 30)))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue")),
      Some("""
        SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)""")),

    // ===== Q22-shaped: wealthy customers with no urgent orders — scalar
    // average subquery + anti join + per-nation rollup. (Every customer
    // in the harness data has SOME order, so the anti join targets the
    // urgent subset to keep the result non-vacuous.)
    QueryDef(
      "q22_wealthy_inactive",
      (s, d) => {
        val cust = Tables.customer(s, d)
        val avgBal = cust.where(col("c_acctbal") > 0.0)
          .agg(avg(col("c_acctbal")).as("ab"))
        val urgent = Tables.orders(s, d)
          .where(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey"))
        cust.join(broadcast(avgBal), col("c_acctbal") > col("ab"))
          .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("numcust"),
            round(sum(col("c_acctbal")), 2).as("totacctbal"))
          .orderBy(col("n_name"))
      },
      Some("""
        SELECT n_name, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY n_name ORDER BY n_name""")),

    // ===== Q2-shaped: min-cost supplier — correlated MIN subquery over a
    // 5-way join with a region filter. The harness has no partsupp, so
    // lineitem is the part↔supplier bridge and unit price
    // (l_extendedprice / l_quantity) stands in for ps_supplycost; both
    // engines compute the SAME IEEE doubles, so the min-equality join is
    // exact.
    QueryDef(
      "q2_min_cost_supplier",
      (s, d) => {
        val offers = Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_suppkey"),
            (col("l_extendedprice") / col("l_quantity")).as("unit"))
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)
            .where(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
        // r13: min-per-part via a WINDOW over offers instead of
        // aggregate + join back — the join shape evaluated the whole
        // offers subtree (lineitem + three dimension joins) twice, once
        // per side. The window computes min(unit) within the same
        // l_partkey partitioning in one evaluation and drops a join;
        // rows kept (unit = partition min) are identical, oracle
        // unchanged.
        val wPart = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_partkey"))
        val cheapest = offers
          .withColumn("min_unit", min(col("unit")).over(wPart))
          .where(col("unit") === col("min_unit"))
        Tables.part(s, d)
          .where(col("p_size").isin(5, 15, 25, 35, 45) && col("p_type") === "LARGE")
          .join(cheapest, col("p_partkey") === col("l_partkey"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"),
            col("p_partkey"), round(col("unit"), 4).as("unit_cost"))
          .distinct()
          .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
            col("p_partkey"))
      },
      Some("""
        WITH offers AS (
          SELECT l_partkey, l_suppkey, l_extendedprice / l_quantity AS unit,
                 s_acctbal, s_name, n_name
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE')
        SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey,
               round(unit, 4) AS unit_cost
        FROM part JOIN offers ON p_partkey = l_partkey
        WHERE p_size IN (5, 15, 25, 35, 45) AND p_type = 'LARGE'
          AND unit = (SELECT min(unit) FROM offers o
                      WHERE o.l_partkey = p_partkey)
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""")),

    // ===== Q11-shaped: important parts — per-group value vs a scalar
    // fraction of the global total (HAVING against a subquery). Value =
    // quantity-weighted volume from one nation's suppliers; quantities
    // are whole numbers, so the double sums are exact and the threshold
    // compare is engine-stable.
    QueryDef(
      "q11_important_parts",
      (s, d) => {
        val natLines = Tables.lineitem(s, d)
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)
            .where(col("n_name") === "NATION_7")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("l_partkey"), col("l_quantity"))
        // r13: cut the per-part aggregate once — the scalar-threshold arm
        // re-evaluated the whole natLines join+aggregate as its second
        // plan copy; byPart is one small row per part at any scale.
        // persistedCut keeps lineage (r14): executor-loss-recoverable.
        val byPart = org.apache.spark.sql.graft.Bridge.persistedCut(
          natLines.groupBy(col("l_partkey"))
            .agg(sum(col("l_quantity")).as("value")))
        val threshold = byPart.agg((sum(col("value")) * 0.002).as("thr"))
        byPart.join(broadcast(threshold), col("value") > col("thr"))
          .select(col("l_partkey"), col("value"))
          .orderBy(col("value").desc, col("l_partkey"))
      },
      Some("""
        WITH natlines AS (
          SELECT l_partkey, l_quantity
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          WHERE n_name = 'NATION_7'),
        bypart AS (
          SELECT l_partkey, sum(l_quantity) AS value
          FROM natlines GROUP BY l_partkey)
        SELECT l_partkey, value FROM bypart
        WHERE value > (SELECT sum(value) * 0.002 FROM bypart)
        ORDER BY value DESC, l_partkey""")),

    // ===== Q12-shaped: shipping-priority split — join + conditional
    // aggregation (CASE inside SUM), grouped by a line attribute
    // (l_returnflag stands in for the absent l_shipmode).
    QueryDef(
      "q12_priority_by_flag",
      (s, d) => {
        val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        Tables.lineitem(s, d)
          .where(col("l_shipdate") >= ts("1995-01-01") &&
            col("l_shipdate") < ts("1996-01-01"))
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_returnflag"))
          .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
          .orderBy(col("l_returnflag"))
      },
      Some("""
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ===== Q16-shaped: supplier diversity per part group — NOT-IN
    // exclusion subquery + multi-key COUNT DISTINCT (negative-balance
    // suppliers stand in for the complaints filter).
    QueryDef(
      "q16_part_supplier_counts",
      (s, d) => {
        val excluded = Tables.supplier(s, d)
          .where(col("s_acctbal") < 0).select(col("s_suppkey").as("xk"))
        Tables.lineitem(s, d)
          .join(Tables.part(s, d)
            .where(col("p_type") =!= "MEDIUM" && col("p_size").isin(1, 9, 19, 29, 39, 49)),
            col("l_partkey") === col("p_partkey"))
          .join(broadcast(excluded), col("l_suppkey") === col("xk"), "left_anti")
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
            col("p_size"))
      },
      Some("""
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type <> 'MEDIUM' AND p_size IN (1, 9, 19, 29, 39, 49)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")),

    // ===== Q20-shaped: dominant suppliers — nested aggregate subquery
    // (a supplier qualifies when its 1995 shipped quantity of some 'red'
    // part exceeds 30% of that part's total) feeding a semi join.
    // Quantities are whole numbers → exact double sums.
    QueryDef(
      "q20_dominant_suppliers",
      (s, d) => {
        val y95 = Tables.lineitem(s, d)
          .where(col("l_shipdate") >= ts("1995-01-01") &&
            col("l_shipdate") < ts("1996-01-01"))
          .join(Tables.part(s, d).where(col("p_name").startsWith("red")),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          .agg(sum(col("l_quantity")).as("sq"))
        // r13: the per-part total becomes a WINDOW over y95 instead of
        // aggregate + join back — the join shape evaluated the whole
        // y95 subtree (filtered lineitem ⋈ part + aggregate) twice,
        // once per side. Same partkey partitioning, one evaluation,
        // one less join; rows kept are identical (oracle unchanged).
        val wPart20 = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_partkey"))
        val dominant = y95
          .withColumn("tot", sum(col("sq")).over(wPart20))
          .where(col("sq") > col("tot") * 0.3)
          .select(col("l_suppkey")).distinct()
        Tables.supplier(s, d)
          .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_name"), col("s_acctbal"))
          .orderBy(col("s_name"))
      },
      Some("""
        WITH y95 AS (
          SELECT l_partkey, l_suppkey, sum(l_quantity) AS sq
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
            AND p_name LIKE 'red%'
          GROUP BY l_partkey, l_suppkey)
        SELECT s_name, s_acctbal FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM y95 a
          WHERE sq > 0.3 * (SELECT sum(sq) FROM y95 b
                            WHERE b.l_partkey = a.l_partkey))
        ORDER BY s_name""")),

    // ===== Q21-shaped: suppliers who kept orders waiting — the
    // EXISTS + NOT-EXISTS pattern. "Late" is shipping >90 days
    // after the order date (the harness has no commit/receipt dates);
    // a supplier waits an order when it shipped late, ANOTHER supplier
    // shipped in the same order, and NO other supplier shipped late.
    //
    // Plan (round 5): the literal double self-join (late ⋈ lineitem
    // semi, late ⋈ late anti — two row-carrying sortMerge joins on
    // orderkey, the catalog's only SMJ entries) rewrites to per-order
    // counts: EXISTS another supplier ⟺ distinct suppliers in the
    // order ≥ 2, NOT EXISTS another late supplier ⟺ distinct LATE
    // suppliers = 1 (the candidate itself is one of them). The
    // self-joins become two narrow (orderkey, count) aggregates joined
    // back on the key — at 100 TB the shuffles carry 12-byte rows
    // instead of the (orderkey, suppkey) pair sets, and a hot order
    // (many lines) collapses map-side in the partial agg instead of
    // skewing a sort-merge join.
    QueryDef(
      "q21_waiting_suppliers",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        val late = li
          .join(Tables.orders(s, d).where(col("o_orderstatus") === "F"),
            col("l_orderkey") === col("o_orderkey"))
          .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
          .select(col("l_orderkey"), col("l_suppkey"))
          .distinct()
        val nsupp = li.groupBy(col("l_orderkey").as("k2"))
          .agg(count_distinct(col("l_suppkey")).as("__nsupp"))
        // r13: the late-count arm becomes a WINDOW over `late` itself —
        // the aggregate-and-join-back shape evaluated the late subtree
        // (lineitem ⋈ orders + distinct) twice, once per join side; the
        // window counts within the same orderkey partitioning in ONE
        // evaluation and drops a join. late is (ok, sk)-distinct, so
        // count(*) over the orderkey partition is exactly the old
        // __nlate; rows kept are identical (oracle unchanged).
        val wOrd = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_orderkey"))
        val waiting = late.alias("l1")
          .withColumn("__nlate", count(lit(1)).over(wOrd))
          .where(col("__nlate") === 1)
          .join(nsupp, col("l_orderkey") === col("k2"))
          .where(col("__nsupp") >= 2)
        waiting
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)
            .where(col("n_name").isin("NATION_3", "NATION_4"))),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
      },
      Some("""
        WITH late AS (
          SELECT DISTINCT l_orderkey, l_suppkey
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F'
            AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        SELECT s_name, count(*) AS numwait
        FROM late l1
        JOIN supplier ON l1.l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_3', 'NATION_4')
          AND EXISTS (SELECT 1 FROM (SELECT DISTINCT l_orderkey, l_suppkey
                                     FROM lineitem) l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY s_name ORDER BY numwait DESC, s_name"""))
  )
}
