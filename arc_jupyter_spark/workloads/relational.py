"""Relational operator coverage: one named query per operator family
from SURVEY.md §2 (joins, aggregation, grouping sets, windows, set ops,
sort/limit, subqueries, CTEs, scalar functions, JSON, pivot, typing,
diff, metadata, statistics).

Every query is paired with a DuckDB oracle. Floating aggregates are
rounded identically on both sides (double fp sums agree to ~1e-9
between engines; rounding removes last-bit noise from the value hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from arc_jupyter_spark.context import ArcContext
from arc_jupyter_spark.operators.transform import SQLTransform
from arc_jupyter_spark.workloads.base import load_views, query

# --------------------------------------------------------------------
# q01 — scan → filter → hash agg → sort (TPC-H Q1 shape). Flagship.
# Runs through the SQLTransform stage to exercise the stage layer.
# --------------------------------------------------------------------

Q01_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2)                                       AS sum_qty,
  ROUND(SUM(l_extendedprice), 2)                                  AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)               AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
  ROUND(AVG(l_quantity), 4)                                       AS avg_qty,
  ROUND(AVG(l_extendedprice), 4)                                  AS avg_price,
  ROUND(AVG(l_discount), 6)                                       AS avg_disc,
  COUNT(*)                                                        AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q01_pricing_summary", oracle=Q01_SQL)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "lineitem")
    ctx = ArcContext(spark)
    return SQLTransform(name="q01", sql=Q01_SQL, output_view="q01_out").execute(ctx)


# --------------------------------------------------------------------
# q02 — broadcast join (fact ⋈ small dims). DataFrame API + explicit
# broadcast; at 100 TB part/supplier stay broadcast-able dims.
# --------------------------------------------------------------------

Q02_ORACLE = """
SELECT p.p_brand,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_size <= 15
GROUP BY p.p_brand
ORDER BY p.p_brand
"""


@query("q02_broadcast_join", oracle=Q02_ORACLE)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "lineitem", "part")
    li = spark.table("lineitem")
    part = spark.table("part").where(F.col("p_size") <= 15)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(li.l_extendedprice * (1 - li.l_discount)), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("p_brand")
    )


# --------------------------------------------------------------------
# q03 — 3-way join + group + deterministic top-k (TakeOrdered).
# --------------------------------------------------------------------

Q03_ORACLE = """
SELECT o.o_orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderpriority
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
"""


@query("q03_topk_join", oracle=Q03_ORACLE)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "customer", "orders", "lineitem")
    c = spark.table("customer").where(F.col("c_mktsegment") == "BUILDING")
    o = spark.table("orders")
    l = spark.table("lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.round(F.sum(l.l_extendedprice * (1 - l.l_discount)), 2).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------
# q04 — left-semi join (EXISTS).
# --------------------------------------------------------------------

Q04_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q04_semi_join", oracle=Q04_ORACLE)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "orders", "lineitem")
    o = spark.table("orders")
    l = spark.table("lineitem").where(F.col("l_quantity") > 45)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------
# q05 — left-anti join (NOT EXISTS).
# --------------------------------------------------------------------

Q05_ORACLE = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@query("q05_anti_join", oracle=Q05_ORACLE)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "customer", "orders")
    c = spark.table("customer")
    o = spark.table("orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------
# q06 — parameterized filter + global agg (${param} injection path).
# --------------------------------------------------------------------

Q06_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '${start_date} 00:00:00'
  AND l_shipdate <  TIMESTAMP '${end_date} 00:00:00'
  AND l_discount BETWEEN ${discount=0.05} - 0.01 AND ${discount=0.05} + 0.01
  AND l_quantity < ${max_qty=24}
"""

Q06_ORACLE = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 - 0.01 AND 0.05 + 0.01
  AND l_quantity < 24
"""


@query("q06_param_filter", oracle=Q06_ORACLE)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "lineitem")
    ctx = ArcContext(spark, env={"start_date": "1996-01-01", "end_date": "1997-01-01"})
    return SQLTransform(name="q06", sql=Q06_SQL, output_view="q06_out").execute(ctx)


# --------------------------------------------------------------------
# q07 — left outer join + null-aware aggregates.
# --------------------------------------------------------------------

Q07_ORACLE = """
SELECT o.o_orderstatus,
       COUNT(*) AS n_rows,
       COUNT(l.l_orderkey) AS n_lineitems,
       ROUND(SUM(COALESCE(l.l_quantity, 0)), 2) AS total_qty
FROM orders o LEFT JOIN lineitem l
  ON o.o_orderkey = l.l_orderkey AND l.l_quantity > 49
GROUP BY o.o_orderstatus
ORDER BY o.o_orderstatus
"""


@query("q07_outer_join", oracle=Q07_ORACLE)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "orders", "lineitem")
    o = spark.table("orders")
    l = spark.table("lineitem")
    joined = o.join(l, (o.o_orderkey == l.l_orderkey) & (l.l_quantity > 49), "left")
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("l_orderkey").alias("n_lineitems"),
            F.round(F.sum(F.coalesce(l.l_quantity, F.lit(0))), 2).alias("total_qty"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------
# q08 — full outer join of two aggregates.
# --------------------------------------------------------------------

Q08_ORACLE = """
SELECT COALESCE(c.nk, s.nk) AS nationkey,
       COALESCE(c.n_cust, 0) AS n_cust,
       COALESCE(s.n_supp, 0) AS n_supp
FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
FULL OUTER JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
  ON c.nk = s.nk
ORDER BY nationkey
"""


@query("q08_full_outer", oracle=Q08_ORACLE)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "customer", "supplier")
    c = spark.table("customer").groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_cust")
    )
    s = spark.table("supplier").groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    return (
        c.join(s, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


# --------------------------------------------------------------------
# q09 — window: per-group top-N via row_number.
# --------------------------------------------------------------------

Q09_ORACLE = """
SELECT o_custkey, o_orderkey, rn FROM (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 2
ORDER BY o_custkey, rn
"""


@query("q09_window_topn", oracle=Q09_ORACLE)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        spark.table("orders")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "rn")
        .orderBy("o_custkey", "rn")
    )


# --------------------------------------------------------------------
# q10 — window: running sum with a ROWS frame.
# --------------------------------------------------------------------

Q10_ORACLE = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       ROUND(SUM(l_quantity) OVER (
         PARTITION BY l_suppkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
FROM lineitem
WHERE l_suppkey <= 5
ORDER BY l_suppkey, l_orderkey, l_linenumber
"""


@query("q10_window_running", oracle=Q10_ORACLE)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spark.table("lineitem")
        .where(F.col("l_suppkey") <= 5)
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.round(F.sum("l_quantity").over(w), 2).alias("running_qty"),
        )
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------
# q11 — ROLLUP + GROUPING() — multi-level aggregates in one pass.
# --------------------------------------------------------------------

Q11_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
       CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@query("q11_rollup", oracle=Q11_SQL)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "lineitem")
    return spark.sql(Q11_SQL)


# --------------------------------------------------------------------
# q12 — CUBE.
# --------------------------------------------------------------------

Q12_SQL = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       ROUND(SUM(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


@query("q12_cube", oracle=Q12_SQL)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "lineitem")
    return spark.sql(Q12_SQL)


# --------------------------------------------------------------------
# q13 — set operations: INTERSECT / EXCEPT / UNION ALL, tagged.
# --------------------------------------------------------------------

Q13_SQL = """
SELECT 'both' AS side, nk FROM (
  SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier
)
UNION ALL
SELECT 'cust_only' AS side, nk FROM (
  SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier
)
ORDER BY side, nk
"""


@query("q13_setops", oracle=Q13_SQL)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "customer", "supplier")
    return spark.sql(Q13_SQL)


# --------------------------------------------------------------------
# q14 — DISTINCT aggregates.
# --------------------------------------------------------------------

Q14_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_suppkey) AS n_supps,
       ROUND(SUM(DISTINCT l_quantity), 2) AS sum_distinct_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("q14_distinct_agg", oracle=Q14_SQL)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "lineitem")
    return spark.sql(Q14_SQL)


# --------------------------------------------------------------------
# q15 — string scalar functions.
# --------------------------------------------------------------------

Q15_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n,
       ROUND(AVG(LENGTH(c_name)), 4) AS avg_name_len,
       MIN(UPPER(SUBSTR(c_name, 1, 8))) AS min_prefix,
       SUM(CASE WHEN c_name LIKE '%1%' THEN 1 ELSE 0 END) AS n_with_one,
       MAX(CONCAT(c_mktsegment, '#', LOWER(SUBSTR(c_name, 1, 4)))) AS max_tag
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@query("q15_string_funcs", oracle=Q15_SQL)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "customer")
    return spark.sql(Q15_SQL)


# --------------------------------------------------------------------
# q16 — datetime scalar functions.
# --------------------------------------------------------------------

Q16_SQL = """
SELECT CAST(YEAR(o_orderdate) AS INT) AS yr,
       CAST(MONTH(o_orderdate) AS INT) AS mo,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY 1, 2
ORDER BY 1, 2
"""


@query("q16_datetime_funcs", oracle=Q16_SQL)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "orders")
    return spark.sql(Q16_SQL)


# --------------------------------------------------------------------
# q17 — math scalar functions.
# --------------------------------------------------------------------

Q17_SQL = """
SELECT l_linestatus,
       CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_floor_qty,
       CAST(SUM(CAST(CEIL(l_extendedprice / 1000) AS BIGINT)) AS BIGINT) AS sum_ceil_kprice,
       ROUND(SUM(POWER(l_discount, 2)), 4) AS sum_disc_sq,
       CAST(SUM(l_orderkey % 7) AS BIGINT) AS sum_mod,
       ROUND(SUM(ABS(l_extendedprice - 1000.0)), 2) AS sum_absdev,
       ROUND(SUM(SQRT(l_quantity)), 4) AS sum_sqrt_qty
FROM lineitem
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


@query("q17_math_funcs", oracle=Q17_SQL)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "lineitem")
    return spark.sql(Q17_SQL)


# --------------------------------------------------------------------
# q18 — CASE WHEN bucketing.
# --------------------------------------------------------------------

Q18_SQL = """
SELECT CASE WHEN l_quantity < 10 THEN 'low'
            WHEN l_quantity < 30 THEN 'mid'
            ELSE 'high' END AS bucket,
       COUNT(*) AS n,
       ROUND(AVG(l_extendedprice), 4) AS avg_price
FROM lineitem
GROUP BY 1
ORDER BY 1
"""


@query("q18_case_buckets", oracle=Q18_SQL)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "lineitem")
    return spark.sql(Q18_SQL)


# --------------------------------------------------------------------
# q19 — uncorrelated scalar subquery.
# --------------------------------------------------------------------

Q19_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_above_avg
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


@query("q19_scalar_subquery", oracle=Q19_SQL)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "customer")
    return spark.sql(Q19_SQL)


# --------------------------------------------------------------------
# q20 — IN subquery.
# --------------------------------------------------------------------

Q20_SQL = """
SELECT o_orderpriority, COUNT(*) AS n
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q20_in_subquery", oracle=Q20_SQL)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "orders", "customer")
    return spark.sql(Q20_SQL)


# --------------------------------------------------------------------
# q21 — correlated EXISTS.
# --------------------------------------------------------------------

Q21_SQL = """
SELECT COUNT(*) AS n_suppliers
FROM supplier s
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity >= 49.5
)
"""


@query("q21_correlated_exists", oracle=Q21_SQL)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(Q21_SQL)


# --------------------------------------------------------------------
# q22 — CTE + join of aggregates.
# --------------------------------------------------------------------

Q22_SQL = """
WITH supplier_revenue AS (
  SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS rev
  FROM lineitem GROUP BY l_suppkey
)
SELECT COUNT(*) AS n_supp,
       ROUND(MAX(rev), 2) AS max_rev,
       ROUND(MIN(rev), 2) AS min_rev,
       ROUND(AVG(rev), 2) AS avg_rev
FROM supplier_revenue
"""


@query("q22_cte", oracle=Q22_SQL)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "lineitem")
    return spark.sql(Q22_SQL)


# --------------------------------------------------------------------
# q23 — pivot (conditional aggregation on the oracle side).
# --------------------------------------------------------------------

Q23_ORACLE = """
SELECT l_returnflag,
       ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS O,
       ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS F
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("q23_pivot", oracle=Q23_ORACLE)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "lineitem")
    pivoted = (
        spark.table("lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .orderBy("l_returnflag")
    )
    return pivoted.select(
        "l_returnflag",
        F.coalesce(F.col("O"), F.lit(0.0)).alias("O"),
        F.coalesce(F.col("F"), F.lit(0.0)).alias("F"),
    )


# --------------------------------------------------------------------
# q24 — lateral view / explode (word frequencies over documents).
# --------------------------------------------------------------------

Q24_ORACLE = """
SELECT word, COUNT(*) AS n FROM (
  SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS word
  FROM documents
) t
GROUP BY word HAVING COUNT(*) >= 50
ORDER BY word
"""


@query("q24_explode_words", oracle=Q24_ORACLE)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "documents")
    words = spark.table("documents").select(
        F.explode(
            F.filter(F.split(F.lower("text"), " "), lambda x: x != "")
        ).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 50)
        .orderBy("word")
    )


# --------------------------------------------------------------------
# q25 — JSON scalar functions over events.props.
# --------------------------------------------------------------------

Q25_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
       ROUND(AVG(CAST(props->>'$.k' AS INTEGER)), 4) AS avg_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@query("q25_json_funcs", oracle=Q25_ORACLE)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        spark.table("events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).cast("bigint").alias("sum_k"),
            F.round(F.avg(k), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------
# q26 — window lag/lead over event time.
# --------------------------------------------------------------------

Q26_ORACLE = """
SELECT user_id,
       COUNT(*) AS n_gaps,
       ROUND(AVG(delta), 4) AS avg_delta
FROM (
  SELECT user_id,
         value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
  FROM events
) t
WHERE delta IS NOT NULL AND user_id <= 20
GROUP BY user_id
ORDER BY user_id
"""


@query("q26_window_lag", oracle=Q26_ORACLE)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    deltas = (
        spark.table("events")
        .withColumn("delta", F.col("value") - F.lag("value").over(w))
        .where(F.col("delta").isNotNull() & (F.col("user_id") <= 20))
    )
    return (
        deltas.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_gaps"), F.round(F.avg("delta"), 4).alias("avg_delta"))
        .orderBy("user_id")
    )


# --------------------------------------------------------------------
# q27 — event-time tumbling window (F.window ↔ time_bucket).
# --------------------------------------------------------------------

Q27_ORACLE = """
SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
HAVING COUNT(*) >= 3
ORDER BY 1, 2
"""


@query("q27_time_window", oracle=Q27_ORACLE)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "events")
    return (
        spark.table("events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .where(F.col("n") >= 3)
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


# --------------------------------------------------------------------
# q28 — as-of join: for each error event, the most recent strictly
# earlier click by the same user. Spark has no ASOF JOIN — composed
# from a union + running last_value window (one shuffle on user_id),
# which is exactly the scale-safe pattern (no range explosion).
# DuckDB oracle uses its native ASOF JOIN.
# --------------------------------------------------------------------

Q28_ORACLE = """
SELECT e.event_id, c.click_us AS matched_click_us
FROM (SELECT event_id, user_id, epoch_us(ts) AS err_us FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT user_id, epoch_us(ts) AS click_us FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.err_us > c.click_us
ORDER BY e.event_id
"""


@query("q28_asof_join", oracle=Q28_ORACLE)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "events")
    ev = spark.table("events").select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    tagged = ev.where(F.col("event_type").isin("error", "click")).select(
        "event_id",
        "user_id",
        "us",
        F.when(F.col("event_type") == "click", F.col("us")).alias("click_us"),
        (F.col("event_type") == "error").alias("is_error"),
    )
    # order clicks before errors at identical timestamps? No — strict
    # inequality: sort by (us, is_error) so a click at the same us sorts
    # first but must NOT match; we therefore lag the running-click by
    # excluding current-row clicks via frame end = -1 when same ts —
    # simplest exact form: running max over rows with us < current us.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("us"), F.col("is_error").cast("int"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    matched = tagged.withColumn("matched_click_us", F.last("click_us", ignorenulls=True).over(w))
    return (
        matched.where(F.col("is_error"))
        .select("event_id", "matched_click_us")
        .orderBy("event_id")
    )


# --------------------------------------------------------------------
# q29 — range self-join: event pairs of the same user within 10 min.
# --------------------------------------------------------------------

Q29_SQL = """
SELECT a.user_id, COUNT(*) AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id <> b.event_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 10 MINUTE
GROUP BY a.user_id
HAVING COUNT(*) >= 1
ORDER BY a.user_id
"""

Q29_ORACLE = """
SELECT a.user_id, COUNT(*) AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id <> b.event_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 10 MINUTE
GROUP BY a.user_id
HAVING COUNT(*) >= 1
ORDER BY a.user_id
"""


@query("q29_range_join", oracle=Q29_ORACLE)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "events")
    return spark.sql(Q29_SQL)


# --------------------------------------------------------------------
# q30 — statistics (the StatisticsExtract family, exact aggregates).
# --------------------------------------------------------------------

Q30_SQL = """
SELECT COUNT(*) AS n,
       ROUND(MIN(l_quantity), 2) AS min_qty,
       ROUND(MAX(l_quantity), 2) AS max_qty,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(STDDEV_SAMP(l_quantity), 4) AS std_qty,
       ROUND(MIN(l_extendedprice), 2) AS min_price,
       ROUND(MAX(l_extendedprice), 2) AS max_price,
       ROUND(AVG(l_extendedprice), 4) AS avg_price
FROM lineitem
"""


@query("q30_statistics", oracle=Q30_SQL)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir, "lineitem")
    return spark.sql(Q30_SQL)
