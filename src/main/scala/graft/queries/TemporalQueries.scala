package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.TemporalJoin
import graft.tables.Tables

/** Temporal join operators over the events table, oracle-checked against
  * DuckDB's native ASOF JOIN / interval join.
  */
object TemporalQueries extends QueryGroup {

  override def defs: Seq[QueryDef] = Seq(

    // AS-OF: each view/click event picks the user's most recent purchase
    // at-or-before it (union + window — zero joins; see TemporalJoin)
    QueryDef("aj1_asof_join", (s, d) => {
      val ev = Tables.events(s, d)
      val left = ev.where(col("event_type").isin("view", "click"))
        .select("event_id", "user_id", "ts", "value")
      val right = ev.where(col("event_type") === "purchase")
        .groupBy("user_id", "ts")
        .agg(max("value").as("purch_value"))
        .select(col("user_id"), col("ts").as("purch_ts"), col("purch_value"))
      TemporalJoin.asofJoin(left, right, Seq("user_id"), "ts", "purch_ts")
        .select(col("event_id"), col("user_id"),
          round(col("value"), 2).as("value"),
          unix_millis(col("purch_ts")).as("purch_ms"),
          round(col("purch_value"), 2).as("purch_value"))
        .orderBy("event_id")
    }, oracle = Some("""
      WITH l AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE event_type IN ('view', 'click')),
      r AS (
        SELECT user_id, ts, max(value) AS purch_value FROM events
        WHERE event_type = 'purchase' GROUP BY user_id, ts)
      SELECT l.event_id, l.user_id, round(l.value, 2) AS value,
             epoch_ms(r.ts) AS purch_ms,
             round(r.purch_value, 2) AS purch_value
      FROM l ASOF LEFT JOIN r
        ON l.user_id = r.user_id AND l.ts >= r.ts
      ORDER BY l.event_id""")),

    // range join: events inside the 30-minute window after any purchase
    // by the same user (binned equi-join — never a nested-loop join)
    QueryDef("rj1_range_join", (s, d) => {
      val ev = Tables.events(s, d)
      val pts = ev.where(col("event_type").isin("view", "click", "error"))
        .select("event_id", "user_id", "ts")
      val iv = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("lo"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("hi"),
          col("value").as("pv"))
      TemporalJoin.rangeJoin(pts, iv, Seq("user_id"), "ts", "lo", "hi",
        binWidthMs = 30L * 60 * 1000)
        .groupBy("event_id")
        .agg(count(lit(1)).as("n_windows"),
          round(sum("pv"), 2).as("purch_sum"))
        .orderBy("event_id")
    }, oracle = Some("""
      WITH p AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type IN ('view', 'click', 'error')),
      iv AS (
        SELECT user_id, ts AS lo, ts + INTERVAL 30 MINUTE AS hi,
               value AS pv
        FROM events WHERE event_type = 'purchase')
      SELECT p.event_id, count(*) AS n_windows,
             round(sum(iv.pv), 2) AS purch_sum
      FROM p JOIN iv
        ON p.user_id = iv.user_id AND p.ts >= iv.lo AND p.ts <= iv.hi
      GROUP BY p.event_id ORDER BY p.event_id""")))
}
