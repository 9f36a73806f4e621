package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import graft.tables.Tables

/** Scalar-function surface — SURVEY.md §2.8 (string/date/array/json/misc).
  * Everything here is a codegen'd built-in (`functions._`), no UDFs —
  * the reference's python `@udf` parse_title becomes native regexp_extract
  * (SURVEY X1).
  */
object FunctionQueries extends QueryGroup {

  val defs: Seq[QueryDef] = Seq(

    // ===== F2/F3/F16: upper/concat/substring/length.
    QueryDef(
      "f2_string_funcs",
      (s, d) =>
        Tables.customer(s, d)
          .select(
            col("c_custkey"),
            upper(col("c_name")).as("name_upper"),
            concat(col("c_mktsegment"), lit("#"), col("c_custkey").cast("string")).as("seg_tag"),
            substring(col("c_name"), 1, 8).as("name_prefix"),
            length(col("c_name")).cast("int").as("name_len"))
          .orderBy(col("c_custkey")),
      Some("""
        SELECT c_custkey, upper(c_name) AS name_upper,
               c_mktsegment || '#' || CAST(c_custkey AS VARCHAR) AS seg_tag,
               substring(c_name, 1, 8) AS name_prefix,
               CAST(length(c_name) AS INT) AS name_len
        FROM customer ORDER BY c_custkey""")),

    // ===== F4: regexp_extract (reference: label-from-path,
    // 05.ingesta_incremental [imagenes].py:48-50).
    QueryDef(
      "f4_regexp_extract",
      (s, d) =>
        Tables.part(s, d)
          .select(
            col("p_partkey"),
            regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"),
            regexp_extract(col("p_brand"), "(\\d+)$", 1).as("brand_num"))
          .orderBy(col("p_partkey")),
      Some("""
        SELECT p_partkey,
               regexp_extract(p_type, '^(\w+)', 1) AS type_head,
               regexp_extract(p_brand, '(\d+)$', 1) AS brand_num
        FROM part ORDER BY p_partkey""")),

    // ===== F6/F7/F8: array ops — split, element_at, array_contains,
    // array_remove, size (reference: genres split/remove,
    // 02.movielens-silver.py:139-152).
    QueryDef(
      "f6_array_ops",
      (s, d) =>
        Tables.part(s, d)
          .withColumn("words", split(col("p_name"), " "))
          .select(
            col("p_partkey"),
            element_at(col("words"), 1).as("first_word"),
            array_contains(col("words"), "green").as("has_green"),
            size(array_remove(col("words"), "green")).cast("int").as("n_rest"))
          .orderBy(col("p_partkey")),
      Some("""
        SELECT p_partkey,
               string_split(p_name, ' ')[1] AS first_word,
               list_contains(string_split(p_name, ' '), 'green') AS has_green,
               CAST(length(list_filter(string_split(p_name, ' '),
                    w -> w <> 'green')) AS INT) AS n_rest
        FROM part ORDER BY p_partkey""")),

    // ===== F9/F10/F17: date/timestamp parts + truncation on o_orderdate.
    QueryDef(
      "f9_date_funcs",
      (s, d) =>
        Tables.orders(s, d)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).as("yr"),
            month(col("o_orderdate")).as("mo"),
            dayofmonth(col("o_orderdate")).as("dom"),
            date_trunc("month", col("o_orderdate")).as("month_start"))
          .orderBy(col("o_orderkey")),
      Some("""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS yr,
               CAST(month(o_orderdate) AS INT) AS mo,
               CAST(day(o_orderdate) AS INT) AS dom,
               date_trunc('month', o_orderdate) AS month_start
        FROM orders ORDER BY o_orderkey""")),

    // ===== F17: derived-column partition transform year() as group key
    // (Iceberg YEAR partition transform, 03.iceberg_primer.py:124).
    QueryDef(
      "f17_year_transform",
      (s, d) =>
        Tables.orders(s, d)
          .groupBy(year(col("o_orderdate")).as("yr"))
          .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
          .orderBy(col("yr")),
      Some("""
        SELECT CAST(year(o_orderdate) AS INT) AS yr, count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY 1 ORDER BY yr""")),

    // ===== F14: JSON field extraction from the events props payload
    // (from_json decode spine of event ingestion, SURVEY §2.8 F14).
    QueryDef(
      "f14_json_extract",
      (s, d) =>
        Tables.events(s, d) // sort-then-compute (see TextQueries t1):
          .orderBy(col("event_id")) // sample the narrow key, parse once
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast(IntegerType).as("k")),
      Some("""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INT) AS k
        FROM events ORDER BY event_id""")),

    // ===== Events aggregate (the Kafka-envelope table at rest): per-type
    // counts and value stats.
    QueryDef(
      "e1_events_by_type",
      (s, d) =>
        Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            round(sum(col("value")), 2).as("sum_value"),
            round(avg(col("value")), 4).as("avg_value"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("event_type")),
      Some("""
        SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value,
               round(avg(value), 4) AS avg_value,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // ===== F13: conditional expressions (CASE WHEN / when-otherwise).
    QueryDef(
      "f13_case_when",
      (s, d) =>
        Tables.orders(s, d)
          .select(
            col("o_orderkey"),
            when(col("o_totalprice") >= 200000, "high")
              .when(col("o_totalprice") >= 100000, "mid")
              .otherwise("low").as("bucket"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("bucket")),
      Some("""
        SELECT CASE WHEN o_totalprice >= 200000 THEN 'high'
                    WHEN o_totalprice >= 100000 THEN 'mid'
                    ELSE 'low' END AS bucket,
               count(*) AS n
        FROM orders GROUP BY 1 ORDER BY bucket"""))
  )
}
