"""Scale-join patterns as first-class, oracle-backed operators.

Three of the load-bearing techniques for 100 TB joins are demonstrated
(and hash-verified) here rather than only described in docstrings:

- **Bucketed co-located join**: both sides written `bucketBy` on the join
  key, so the sort-merge join runs with ZERO shuffle of either side — at
  scale this is the difference between re-shuffling 100 TB per join and
  reading pre-shuffled data in place.  (Spark bucketing; the plan pin in
  tests/test_plan_shapes.py asserts no Exchange under the SortMergeJoin.)

- **Salted skew join**: a 70 %-hot key is spread over SALT_N sub-keys on
  the fact side while the dimension side is replicated SALT_N ways, so no
  single task owns the hot key.  AQE's skew-join split handles moderate
  skew automatically; explicit salting is the deterministic tool for the
  pathological case and is what this operator pins.

- **Dynamic partition pruning**: the fact table written partitioned on
  the join key, pruned at run time by a subquery filter built from the
  filtered dimension side (dpp_join_orders below).

All queries return plain aggregates whose DuckDB oracles are the
unsalted / unbucketed / unpartitioned joins — a hash match proves the
physical rewrite changed nothing semantic.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_go_spark.session import load_table

_BUCKET_CACHE = os.path.join(tempfile.gettempdir(), "dgs-bucket-cache")

SALT_N = 8


def _cache_path(sf_dir: str, table: str, variant: str) -> str:
    """One rendering of the derived-table cache path scheme (sf key +
    fixture content signature) shared by every writer in this module —
    the r7 stale-cache fix must not need re-applying per copy.  Rendered
    through session.fixture_cache_path (r10): same physical path as the
    old hand-rendered string, one scheme repo-wide."""
    from delta_go_spark.session import fixture_cache_path, fixture_sig

    sig = fixture_sig(sf_dir, table)
    return fixture_cache_path("bucket", sf_dir, f"{table}_{variant}_{sig}")


def _bucketed_table(
    spark: SparkSession, sf_dir: str, table: str, key_col: str, n_buckets: int = 8
) -> str:
    """Write `table` bucketed+sorted by `key_col` once per (sf, table,
    fixture content); returns the catalog name.  External table (explicit
    path) so the vanilla driver session needs no writable warehouse dir.

    The fixture signature in the cache key means a regenerated fixture
    under the same sf path can never be served a stale bucketed copy
    (r7 verdict finding): a new signature lands in a new path + catalog
    name, and the (tableExists AND isdir) check fails for the old one.

    REGISTER, don't rewrite (r13): the catalog is in-memory per session,
    so the old overwrite-on-miss form rewrote the shared on-disk cache
    from EVERY fresh session — correct serially but a race under
    concurrent sessions (one overwrites the part files while another's
    cached file listing still points at the old names: FAILED_READ_FILE).
    Now a published cache (the _SUCCESS marker Spark writes last) is
    re-registered via CREATE TABLE ... CLUSTERED BY ... LOCATION — the
    bucket spec lands in the catalog with zero data writes (the
    exchange-free plan is pinned either way in test_plan_shapes) — and a
    MISSING cache is built in a process-private staging dir and PUBLISHED
    by atomic rename: concurrent builders either win the rename or
    discard their copy, and readers only ever see a complete directory."""
    import shutil
    import uuid

    path = _cache_path(sf_dir, table, "bkt")
    # catalog identifiers cannot carry dots (sf0.001) — sanitize the name
    name = f"dgs_{os.path.basename(path)}".replace(".", "_").replace("-", "_")
    if spark.catalog.tableExists(name) and os.path.isdir(path):
        return name
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        stamp = f"{os.getpid()}_{uuid.uuid4().hex[:8]}"
        tmp_path = f"{path}.stage_{stamp}"
        tmp_name = f"{name}_stage_{stamp}"
        (
            load_table(spark, sf_dir, table)
            .write.mode("overwrite")
            .bucketBy(n_buckets, key_col)
            .sortBy(key_col)
            .option("path", tmp_path)
            .format("parquet")
            .saveAsTable(tmp_name)
        )
        # external table: DROP removes only the catalog entry, files stay
        spark.sql(f"DROP TABLE {tmp_name}")
        try:
            os.rename(tmp_path, path)
        except OSError:
            # another session published first — its copy is identical
            # (same content-signed inputs); discard ours
            shutil.rmtree(tmp_path, ignore_errors=True)
    sch = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in spark.read.parquet(path).schema.fields
    )
    spark.sql(
        f"CREATE TABLE {name} ({sch}) USING parquet "
        f"CLUSTERED BY ({key_col}) SORTED BY ({key_col}) "
        f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
    )
    return name


def bucketed_join_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders on the order key with BOTH sides bucketed by it:
    the merge-hinted sort-merge join consumes bucket-local data — no
    Exchange on either side (plan-pinned).  At 100 TB this is the
    pre-shuffled fact/fact join layout."""
    li = spark.table(_bucketed_table(spark, sf_dir, "lineitem", "l_orderkey"))
    od = spark.table(_bucketed_table(spark, sf_dir, "orders", "o_orderkey"))
    j = li.hint("merge").join(
        od.hint("merge"), li["l_orderkey"] == od["o_orderkey"]
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.sum("l_linenumber").alias("line_checksum"),
        )
        .orderBy("o_orderpriority")
    )


BUCKETED_JOIN_SQL = """
SELECT o_orderpriority,
       count(*) AS n_items,
       round(sum(l_extendedprice), 2) AS sum_price,
       CAST(sum(l_linenumber) AS BIGINT) AS line_checksum
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def skew_key() -> F.Column:
    """The deliberately-skewed join key: ~70 % of events collapse onto
    customer key 1, the rest spread over the customer key range."""
    # pmod (never negative) — the oracle mirrors it as ((x%1000)+1000)%1000
    # because SQL % keeps the dividend's sign
    return F.when(F.col("event_id") % 10 < 7, F.lit(1)).otherwise(
        F.pmod(F.col("user_id"), F.lit(1000)) + 1
    )


def salted_skew_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events ⋈ customer on a 70 %-hot key, SALTED: the fact side gets a
    deterministic salt in [0, SALT_N) and the dimension side is exploded
    SALT_N ways, so the hot key's rows land on SALT_N tasks instead of
    one.  The oracle is the UNSALTED join — the hash match proves salting
    is a pure physical rewrite."""
    ev = load_table(spark, sf_dir, "events").select(
        skew_key().alias("ck"),
        F.pmod(F.col("event_id"), F.lit(SALT_N)).alias("salt"),
        # per-row integer cents BEFORE the sum: float SUM order differs
        # across engines, integer sums do not
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_N - 1))))
    )
    # merge hint: salting is a SHUFFLE-join technique — if the dimension
    # were broadcastable you would broadcast instead of salt, so the
    # operator pins the shuffle form rather than letting the tiny test
    # fixture flip it to a broadcast join
    j = ev.join(
        cust.hint("merge"),
        (ev["ck"] == cust["c_custkey"]) & (ev["salt"] == cust["salt"]),
    )
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("value_cents"),
        )
        .orderBy("c_mktsegment")
    )


SALTED_SKEW_JOIN_SQL = """
SELECT c_mktsegment,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents
FROM (SELECT CASE WHEN event_id % 10 < 7 THEN 1
                  ELSE (((user_id % 1000) + 1000) % 1000) + 1 END AS ck,
             value
      FROM events) e
JOIN customer ON e.ck = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


QUERIES: dict = {
    "bucketed_join_lineitem": (bucketed_join_lineitem, BUCKETED_JOIN_SQL),
    "salted_skew_join_events": (salted_skew_join_events, SALTED_SKEW_JOIN_SQL),
}


# ---------------------------------------------------------------------------
# Dynamic partition pruning (DPP): the third load-bearing 100 TB join
# layout.  The fact table is WRITTEN partitioned on the join key (here
# order month); at run time Catalyst turns the filtered dimension side
# into a subquery filter on the fact scan's PartitionFilters, so a
# quarter's query reads 3 of ~80 month partitions — the fact scan is
# pruned by a predicate that only exists after the dim filter runs,
# which no static pushdown can do.  The oracle is the plain filtered
# aggregate over raw orders: the hash match proves pruning changed
# nothing semantic, and the plan pin (dynamicpruningexpression in the
# scan) proves the pruning actually happened rather than a full scan.
_DPP_QUARTER = "1995-Q1"


def _month_partitioned_orders(spark: SparkSession, sf_dir: str) -> str:
    """Write orders partitioned by o_month (yyyy-MM) once per fixture
    content; returns the parquet path (partition discovery re-derives the
    o_month column on read)."""
    import shutil

    from delta_go_spark.session import load_table

    path = _cache_path(sf_dir, "orders", "pmonth")
    # _SUCCESS is Spark's completed-write marker: a crashed partial write
    # leaves a directory WITHOUT it, which must be rebuilt, never served
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        shutil.rmtree(path, ignore_errors=True)
        (
            load_table(spark, sf_dir, "orders")
            .withColumn(
                "o_month", F.date_format("o_orderdate", "yyyy-MM")
            )
            .write.mode("overwrite")
            .partitionBy("o_month")
            .parquet(path)
        )
    return path


def dpp_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders (partitioned by month) ⋈ a filtered month dimension: the
    quarter filter lives ONLY on the dim side, so the months reaching the
    fact scan arrive via DPP's dynamic subquery filter."""
    fact = spark.read.parquet(_month_partitioned_orders(spark, sf_dir))
    months = spark.sql(
        """
        SELECT date_format(m, 'yyyy-MM') AS o_month,
               concat(year(m), '-Q', quarter(m)) AS o_quarter
        FROM (SELECT explode(sequence(DATE '1992-01-01', DATE '1998-12-01',
                                      INTERVAL 1 MONTH)) AS m)
        """
    )
    dim = months.filter(F.col("o_quarter") == _DPP_QUARTER)
    j = fact.join(F.broadcast(dim), "o_month")
    return (
        j.groupBy("o_month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
            ).alias("price_cents"),
            F.sum("o_orderkey").alias("key_checksum"),
        )
        .orderBy("o_month")
    )


DPP_JOIN_SQL = """
SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
       count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS price_cents,
       CAST(sum(o_orderkey) AS BIGINT) AS key_checksum
FROM orders
WHERE year(o_orderdate) = 1995 AND quarter(o_orderdate) = 1
GROUP BY 1
ORDER BY 1
"""


QUERIES["dpp_join_orders"] = (dpp_join_orders, DPP_JOIN_SQL)


# ---------------------------------------------------------------------------
# Stats-driven PARTIAL salting — the maintained frequency state consumed by
# a join planner.  Uniform salting (salted_skew_join_events above) taxes
# EVERY key with a SALT_N-way dimension replication; at 100 TB replicating
# a large dimension eight ways is itself a shuffle-volume cost.  When a
# key-frequency table already exists (the FrequencyStateMaintainer keeps
# one fresh at O(change) per batch — streaming/windows.py), the planner
# reads heavy hitters at O(distinct) with NO corpus scan and salts ONLY
# them: hot fact rows spread over salt_n sub-keys, hot dimension rows
# replicate salt_n ways, and the cold remainder joins 1:1 un-replicated.
# The oracle is the UNSALTED join — a hash match proves partial salting is
# a pure physical rewrite.


def heavy_hitters(freq: DataFrame, hot_frac: float = 0.05) -> list:
    """Values owning more than `hot_frac` of the mass in a (val, cnt)
    frequency table.  By construction at most floor(1/hot_frac) values
    can each exceed that share, so the collect is a bounded O(1/hot_frac)
    driver-side reduction, never a corpus scan.  In production `freq` is
    the MAINTAINED frequency state
    (FrequencyStateMaintainer.current_frequencies), so skew detection
    costs one O(distinct) aggregate and stays fresh through churn.

    `freq` is consumed by TWO jobs (the total, then the filtered
    collect) — a caller passing an UNMATERIALIZED corpus aggregate
    should localCheckpoint it first or the corpus scan runs twice."""
    total = freq.agg(F.sum("cnt").alias("t")).first()["t"] or 0
    rows = freq.filter(F.col("cnt") > float(total) * hot_frac).collect()
    return [r["val"] for r in rows]


def hotkey_salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    hot_keys: list,
    salt_expr: F.Column,
    salt_n: int = SALT_N,
) -> DataFrame:
    """`fact` ⋈ `dim` on the shared column `on`, salting ONLY `hot_keys`:
    hot fact rows get `pmod(salt_expr, salt_n)` (any deterministic
    integer column over the fact side), cold rows salt 0; hot dimension
    rows explode to all salt_n sub-keys, cold rows stay single.  Result
    rows are identical to the plain join — salting only changes WHERE
    the hot key's rows land (salt_n tasks instead of one).  An empty
    hot set degrades to the plain join with no salt columns at all."""
    if not hot_keys:
        return fact.join(dim, on)
    fact_s = fact.withColumn(
        "_salt",
        F.when(F.col(on).isin(hot_keys), F.pmod(salt_expr, F.lit(salt_n)))
        .otherwise(F.lit(0))
        .cast("int"),
    )
    dim_s = dim.withColumn(
        "_salt",
        # no cast around the explode — a generator cannot nest inside
        # another expression; sequence(int, int) already yields ints
        F.explode(
            F.when(
                F.col(on).isin(hot_keys),
                F.sequence(F.lit(0), F.lit(salt_n - 1)),
            ).otherwise(F.sequence(F.lit(0), F.lit(0)))
        ),
    )
    # merge hint for the same reason as salted_skew_join_events: salting
    # is a SHUFFLE-join technique, pin the shuffle form against the tiny
    # fixture flipping it to a broadcast join
    return fact_s.join(dim_s.hint("merge"), [on, "_salt"]).drop("_salt")


def hotkey_salted_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events ⋈ customer on the 70 %-hot key, salted only for the keys
    the frequency table marks hot (here: exactly key 1 at hot_frac 0.05
    — non-vacuous at every sf).  The fixture derives the frequency table
    with value_frequencies, the same (val, cnt) shape the
    FrequencyStateMaintainer serves in production without a corpus
    scan."""
    from delta_go_spark.operators.coverage import value_frequencies

    ev = load_table(spark, sf_dir, "events").select(
        skew_key().alias("ck"),
        F.col("event_id"),
        # per-row integer cents BEFORE the sum: float SUM order differs
        # across engines, integer sums do not
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    # materialized once: heavy_hitters runs two jobs over it, and the
    # maintained-state production path this stands in for is already a
    # stored table
    freq = (
        value_frequencies(ev.select("ck"), ["ck"])
        .select(F.col("val").cast("long").alias("val"), "cnt")
        .localCheckpoint()
    )
    hot = heavy_hitters(freq, hot_frac=0.05)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"), "c_mktsegment"
    )
    j = hotkey_salted_join(ev, cust, "ck", hot, salt_expr=F.col("event_id"))
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("value_cents"),
            F.countDistinct("ck").alias("n_custs"),
        )
        .orderBy("c_mktsegment")
    )


HOTKEY_SALTED_JOIN_SQL = """
SELECT c_mktsegment,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS value_cents,
       CAST(count(DISTINCT ck) AS BIGINT) AS n_custs
FROM (SELECT CASE WHEN event_id % 10 < 7 THEN 1
                  ELSE (((user_id % 1000) + 1000) % 1000) + 1 END AS ck,
             value
      FROM events) e
JOIN customer ON e.ck = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


QUERIES["hotkey_salted_join_events"] = (
    hotkey_salted_join_events,
    HOTKEY_SALTED_JOIN_SQL,
)


# ---------------------------------------------------------------------------
# Space-filling-curve locality audit: the measurable reason this engine
# offers OPTIMIZE ... CLUSTER BY hilbert(a, b) (maintenance.hilbert_cluster)
# next to Z-order.  Both curves index the same 16x16 bucket grid over
# (l_partkey, l_suppkey); cells are walked in curve order and the Manhattan
# jump between consecutive cells is summed.  Hilbert's defining property is
# max_jump == 1 (every consecutive pair of cells is a grid neighbour), so
# files cut from a Hilbert-sorted layout have tighter min/max boxes —
# Z-order pays long diagonal jumps at quadrant boundaries (max_jump 15+ on
# this grid).  BOTH engines evaluate the IDENTICAL generated expression
# string (maintenance.hilbert_index_sql / zorder_index_sql), so the oracle
# cannot drift from the plan.  The 256-row single-partition window is over
# CURVE CELLS (a constant of the layout config), never over data rows —
# scale-independent by construction.
def hilbert_locality_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from delta_go_spark.maintenance import hilbert_index_sql, zorder_index_sql

    li = load_table(spark, sf_dir, "lineitem")
    cells = li.select(
        F.pmod(F.col("l_partkey"), F.lit(16)).cast("long").alias("cx"),
        F.pmod(F.col("l_suppkey"), F.lit(16)).cast("long").alias("cy"),
    ).distinct()
    out = []
    for method, sql in (
        ("hilbert", hilbert_index_sql("cx", "cy", bits=4)),
        ("zorder", zorder_index_sql("cx", "cy", bits=4)),
    ):
        idx = cells.select("cx", "cy", F.expr(sql).alias("idx"))
        w = Window.orderBy("idx")
        jumps = idx.select(
            "idx", "cx", "cy",
            (
                F.abs(F.col("cx") - F.lag("cx").over(w))
                + F.abs(F.col("cy") - F.lag("cy").over(w))
            ).alias("jump"),
        )
        out.append(
            jumps.agg(
                F.lit(method).alias("method"),
                F.count(F.lit(1)).alias("n_cells"),
                F.sum("jump").cast("long").alias("total_jump"),
                F.max("jump").cast("long").alias("max_jump"),
                F.sum(F.col("idx") * (F.col("cx") * 16 + F.col("cy")))
                .cast("long")
                .alias("map_checksum"),
            )
        )
    return out[0].unionByName(out[1]).orderBy("method")


def _locality_oracle_sql() -> str:
    from delta_go_spark.maintenance import hilbert_index_sql, zorder_index_sql

    def arm(method: str, sql: str) -> str:
        return f"""
SELECT '{method}' AS method,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(jump) AS BIGINT) AS total_jump,
       CAST(max(jump) AS BIGINT) AS max_jump,
       CAST(sum(idx * (cx * 16 + cy)) AS BIGINT) AS map_checksum
FROM (
  SELECT idx, cx, cy,
         abs(cx - lag(cx) OVER (ORDER BY idx))
         + abs(cy - lag(cy) OVER (ORDER BY idx)) AS jump
  FROM (
    SELECT cx, cy, {sql} AS idx
    FROM (
      SELECT DISTINCT l_partkey % 16 AS cx, l_suppkey % 16 AS cy
      FROM lineitem
    )
  )
)"""

    return (
        arm("hilbert", hilbert_index_sql("cx", "cy", bits=4))
        + " UNION ALL "
        + arm("zorder", zorder_index_sql("cx", "cy", bits=4))
        + " ORDER BY method"
    )


HILBERT_LOCALITY_SQL = _locality_oracle_sql()


QUERIES["hilbert_locality_lineitem"] = (
    hilbert_locality_lineitem,
    HILBERT_LOCALITY_SQL,
)
