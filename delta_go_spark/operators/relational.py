"""Relational data-plane operators (SURVEY.md §2 Part B).

The reference delegates the data plane to the compute engine
(/root/reference/README.md:14-16); here the compute engine is Spark.  Every
query is declared with the DataFrame API so Catalyst handles pushdown,
pruning, join selection and AQE; small dimension tables are broadcast
explicitly so the plan is shuffle-free on the dimension side at any scale.

Float policy: every aggregate over doubles is rounded (2dp for money sums,
4dp for averages) and kept as double on BOTH the Spark and the DuckDB oracle
side, so partial-aggregation order cannot flip the value hash.

Each entry in QUERIES is name -> (spark_builder, duckdb_oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from delta_go_spark.session import load_table


def _r2(c):  # money sums
    return F.round(c, 2)


def _r4(c):  # averages / ratios
    return F.round(c, 4)


# ---------------------------------------------------------------------------
# q1: pricing summary (TPC-H Q1 shape) — scan + filter + hash aggregate.
# Scale notes: single shuffle on 2 low-cardinality keys; map-side partial
# aggregation collapses each input partition to ~6 rows before the exchange.
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r2(F.sum("l_quantity")).alias("sum_qty"),
            _r2(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sum_disc_price"),
            _r2(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
                )
            ).alias("sum_charge"),
            _r4(F.avg("l_quantity")).alias("avg_qty"),
            _r4(F.avg("l_extendedprice")).alias("avg_price"),
            _r4(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                           AS sum_qty,
       round(sum(l_extendedprice), 2)                                      AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                   AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)     AS sum_charge,
       round(avg(l_quantity), 4)                                           AS avg_qty,
       round(avg(l_extendedprice), 4)                                      AS avg_price,
       round(avg(l_discount), 4)                                           AS avg_disc,
       count(*)                                                            AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q3: shipping priority (TPC-H Q3 shape) — selective dim filter, two joins,
# aggregate, deterministic top-k.  customer is broadcast (dimension-sized);
# orders<->lineitem co-shuffle on the order key.
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q5: local supplier volume (TPC-H Q5 shape) — 6-way join.  region/nation/
# supplier/customer are broadcast; the only shuffle join is
# orders<->lineitem on the order key.
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


Q5_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# q6: forecast revenue (TPC-H Q6 shape) — pure scan + filter + global agg.
# All three predicates push to the parquet scan (PushedFilters); the result
# is a single row, so the final exchange moves ~one row per partition.
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(_r2(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# q10: returned items (TPC-H Q10 shape) — join + group on a wide key set,
# deterministic top-20.
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Window functions: per-customer top-3 orders by price.  One shuffle on
# o_custkey; rank computed inside the sorted partition, no second pass.
def window_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


WINDOW_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# Window running aggregate: cumulative revenue per customer over order dates
# (rows-frame running sum + lag).
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        _r2(F.sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0))).alias(
            "cum_spend"
        ),
        _r2(F.lag("o_totalprice", 1).over(w)).alias("prev_price"),
    )


WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
         AS cum_spend,
       round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey), 2)
         AS prev_price
FROM orders
"""


# ---------------------------------------------------------------------------
# Grouping sets: ROLLUP over status/priority.
def rollup_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            _r2(F.sum("o_totalprice")).alias("sum_price"),
            F.count(F.lit(1)).alias("order_count"),
        )
        .orderBy(
            F.asc_nulls_first("o_orderstatus"), F.asc_nulls_first("o_orderpriority")
        )
    )


ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority,
       round(sum(o_totalprice), 2) AS sum_price,
       count(*)                    AS order_count
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


# ---------------------------------------------------------------------------
# Grouping sets: CUBE over returnflag/linestatus.
def cube_lineitem_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            _r2(F.sum("l_quantity")).alias("sum_qty"),
        )
        .orderBy(F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus"))
    )


CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
       count(*)                  AS n_items,
       round(sum(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
"""


# ---------------------------------------------------------------------------
# Set operations: customers that placed orders but never returned an item
# (EXCEPT = left-anti at plan level), plus distinct.
def setops_loyal_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    with_orders = orders.select(F.col("o_custkey").alias("custkey")).distinct()
    with_big_returns = (
        li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 30))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    return with_orders.exceptAll(with_big_returns).orderBy("custkey")


SETOPS_SQL = """
SELECT DISTINCT o_custkey AS custkey FROM orders
EXCEPT
SELECT DISTINCT o_custkey AS custkey
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R' AND l_quantity > 30
ORDER BY custkey
"""


# ---------------------------------------------------------------------------
# Set operations: UNION ALL + INTERSECT — customers in two segments that
# also have an open order.
def setops_segment_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    seg = (
        cust.filter(F.col("c_mktsegment") == "MACHINERY")
        .select(F.col("c_custkey").alias("custkey"))
        .unionByName(
            cust.filter(F.col("c_mktsegment") == "BUILDING").select(
                F.col("c_custkey").alias("custkey")
            )
        )
    )
    open_orders = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return seg.intersect(open_orders).orderBy("custkey")


SETOPS_INTERSECT_SQL = """
SELECT custkey FROM (
  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
  UNION ALL
  SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
)
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
ORDER BY custkey
"""


# ---------------------------------------------------------------------------
# Scalar string functions over part.
def string_functions_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("name_upper"),
        F.lower(F.col("p_brand")).alias("brand_lower"),
        F.substring(F.col("p_type"), 1, 5).alias("type_prefix"),
        F.length(F.col("p_name")).alias("name_len"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_size").cast("string")).alias("brand_size"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "_").alias("name_devoweled"),
        F.coalesce(F.nullif(F.col("p_brand"), F.lit("")), F.lit("UNKNOWN")).alias("brand_or_unknown"),
        _r2(F.col("p_retailprice") * 1.1).alias("price_bumped"),
    ).orderBy("p_partkey")


STRING_FUNCS_SQL = """
SELECT p_partkey,
       upper(p_name)                                   AS name_upper,
       lower(p_brand)                                  AS brand_lower,
       substring(p_type, 1, 5)                         AS type_prefix,
       length(p_name)                                  AS name_len,
       p_brand || '#' || CAST(p_size AS VARCHAR)       AS brand_size,
       trim(p_name)                                    AS name_trim,
       regexp_replace(p_name, '[aeiou]', '_', 'g')     AS name_devoweled,
       coalesce(nullif(p_brand, ''), 'UNKNOWN')        AS brand_or_unknown,
       round(p_retailprice * 1.1, 2)                   AS price_bumped
FROM part
ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# Scalar date functions + conditional (CASE WHEN) over orders.
def date_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.quarter(d).alias("order_quarter"),
        F.date_add(d, 30).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).alias("age_days"),
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month_start"),
        F.when(F.col("o_totalprice") > 200000, F.lit("big"))
        .when(F.col("o_totalprice") > 50000, F.lit("mid"))
        .otherwise(F.lit("small"))
        .alias("price_band"),
    ).orderBy("o_orderkey")


DATE_FUNCS_SQL = """
SELECT o_orderkey,
       year(CAST(o_orderdate AS DATE))                        AS order_year,
       month(CAST(o_orderdate AS DATE))                       AS order_month,
       day(CAST(o_orderdate AS DATE))                         AS order_day,
       quarter(CAST(o_orderdate AS DATE))                     AS order_quarter,
       CAST(o_orderdate AS DATE) + 30                         AS due_date,
       datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS age_days,
       CAST(date_trunc('month', o_orderdate) AS DATE)         AS month_start,
       CASE WHEN o_totalprice > 200000 THEN 'big'
            WHEN o_totalprice > 50000  THEN 'mid'
            ELSE 'small' END                                  AS price_band
FROM orders
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# Aggregates: count-distinct + conditional aggregation over events.
def agg_event_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            _r2(F.sum("value")).alias("sum_value"),
            _r4(F.avg("value")).alias("avg_value"),
            _r2(F.min("value")).alias("min_value"),
            _r2(F.max("value")).alias("max_value"),
            F.sum(F.when(F.col("value") > 50, 1).otherwise(0)).alias("n_high_value"),
        )
        .orderBy("event_type")
    )


AGG_EVENTS_SQL = """
SELECT event_type,
       count(DISTINCT user_id)                       AS n_users,
       count(*)                                      AS n_events,
       round(sum(value), 2)                          AS sum_value,
       round(avg(value), 4)                          AS avg_value,
       round(min(value), 2)                          AS min_value,
       round(max(value), 2)                          AS max_value,
       CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_value,
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Time-bucketed aggregation over the event stream (batch analog of the
# streaming windowed agg; the streaming variant lives in streaming/).
def events_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            # date_trunc returns TIMESTAMP_LTZ; cast straight back to NTZ so
            # the result is identical under ANY session/driver time zone
            # (NTZ→LTZ→NTZ with one session TZ is the identity).
            F.date_trunc("hour", F.col("ts")).cast("timestamp_ntz").alias("hour_ts"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _r2(F.sum("value")).alias("sum_value"),
        )
        .orderBy("hour_ts", "event_type")
    )


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour_ts,
       event_type,
       count(*)               AS n_events,
       round(sum(value), 2)   AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY hour_ts, event_type
"""


# ---------------------------------------------------------------------------
# Join variants: left outer + semi + anti in one inventory.
def join_left_outer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    agg = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_big_orders"),
        _r2(F.sum("o_totalprice")).alias("big_total"),
    )
    return (
        cust.join(agg, cust.c_custkey == agg.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("n_big_orders"), F.lit(0)).alias("n_big_orders"),
            F.coalesce(F.col("big_total"), F.lit(0.0)).alias("big_total"),
        )
        .orderBy("c_custkey")
    )


JOIN_LEFT_SQL = """
SELECT c_custkey, c_name,
       coalesce(n_big_orders, 0)   AS n_big_orders,
       coalesce(big_total, 0.0)    AS big_total
FROM customer
LEFT JOIN (
  SELECT o_custkey,
         count(*)                  AS n_big_orders,
         round(sum(o_totalprice), 2) AS big_total
  FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey
) ON c_custkey = o_custkey
ORDER BY c_custkey
"""


def join_semi_anti_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    has_big = supp.join(li, supp.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name", F.lit("has_big_shipment").alias("bucket")
    )
    no_big = supp.join(li, supp.s_suppkey == li.l_suppkey, "left_anti").select(
        "s_suppkey", "s_name", F.lit("no_big_shipment").alias("bucket")
    )
    return has_big.unionByName(no_big).orderBy("s_suppkey")


JOIN_SEMI_ANTI_SQL = """
SELECT s_suppkey, s_name, 'has_big_shipment' AS bucket
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_quantity > 45)
UNION ALL
SELECT s_suppkey, s_name, 'no_big_shipment' AS bucket
FROM supplier
WHERE s_suppkey NOT IN (SELECT l_suppkey FROM lineitem WHERE l_quantity > 45)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Approximate distinct (HLL sketch).  Sketches differ across engines, so
# there is no SQL oracle; tests assert relative error against the exact
# count instead.
def approx_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .orderBy("event_type")
    )


QUERIES: dict = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "approx_distinct_events": (approx_distinct_events, None),
    "q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "q5_local_supplier_volume": (q5_local_supplier_volume, Q5_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "q10_returned_items": (q10_returned_items, Q10_SQL),
    "window_topk_orders": (window_topk_orders, WINDOW_TOPK_SQL),
    "window_running_revenue": (window_running_revenue, WINDOW_RUNNING_SQL),
    "rollup_order_totals": (rollup_order_totals, ROLLUP_SQL),
    "cube_lineitem_counts": (cube_lineitem_counts, CUBE_SQL),
    "setops_loyal_customers": (setops_loyal_customers, SETOPS_SQL),
    "setops_segment_intersect": (setops_segment_intersect, SETOPS_INTERSECT_SQL),
    "string_functions_part": (string_functions_part, STRING_FUNCS_SQL),
    "date_functions_orders": (date_functions_orders, DATE_FUNCS_SQL),
    "agg_event_users": (agg_event_users, AGG_EVENTS_SQL),
    "events_hourly_rollup": (events_hourly_rollup, EVENTS_HOURLY_SQL),
    "join_left_outer_orders": (join_left_outer_orders, JOIN_LEFT_SQL),
    "join_semi_anti_suppliers": (join_semi_anti_suppliers, JOIN_SEMI_ANTI_SQL),
}
