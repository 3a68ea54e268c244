"""Round-10 second-batch operator tests: containment near-dup, the table
stats profiler, the salted-two-phase inverted index, and the streaming SCD1
upsert sink's merge mechanics (the end-to-end composition is pinned by the
DuckDB oracle via check_parity / the driver window)."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# containment_pairs — the asymmetric metric Jaccard cannot express


def test_containment_flags_subset_doc_jaccard_misses(spark):
    """Doc A quoted wholesale inside a much longer doc B: containment of A
    is 1000 milli while Jaccard is far below the 0.6 dedup threshold —
    the exact case this operator exists for."""
    from delta_go_spark.functions.dedup import containment_pairs

    quote = "alpha beta gamma delta epsilon"  # 3 shingles (5 tokens, k=3)
    filler = " ".join(f"w{i}" for i in range(40))  # 38 disjoint shingles
    docs = spark.createDataFrame(
        [(1, quote), (2, quote + " " + filler)],
        "doc_id long, text string",
    )
    rows = containment_pairs(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_id_a"], r["doc_id_b"]) == (1, 2)
    assert r["cont_a_milli"] == 1000  # every shingle of A appears in B
    # Jaccard = 3 / (3 + 41 - 3) < 0.08 — a resemblance threshold misses it
    assert r["cont_b_milli"] < 100


def test_containment_milli_rounds_half_up_in_integers(spark):
    """(2000*c + n) div (2n) == round_half_up(1000*c/n) — pure BIGINT on
    both engines.  1/3 -> 333, 2/3 -> 667 (the .5-boundary class)."""
    from delta_go_spark.functions.dedup import containment_pairs

    # doc 1: 3 shingles, exactly 2 shared with doc 2 (which has many)
    a = "s1 s2 s3 s4 zz"  # shingles: (s1 s2 s3)(s2 s3 s4)(s3 s4 zz)
    b = "s1 s2 s3 s4 " + " ".join(f"q{i}" for i in range(30))
    docs = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    rows = containment_pairs(docs, threshold_milli=1).collect()
    assert len(rows) == 1
    # shared shingles: (s1 s2 s3) and (s2 s3 s4) = 2 of A's 3 -> 667
    assert rows[0]["cont_a_milli"] == 667


def test_containment_below_threshold_emits_nothing(spark):
    from delta_go_spark.functions.dedup import containment_pairs

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x y z w v u")],
        "doc_id long, text string",
    )
    assert containment_pairs(docs).count() == 0


# ---------------------------------------------------------------------------
# profile_table — ANALYZE-style stats


def test_profile_table_exact_stats(spark):
    from delta_go_spark.operators.coverage import profile_table

    df = spark.createDataFrame(
        [(1, "x", 10.5), (2, "x", None), (3, None, 2.0), (3, "y", 2.0)],
        "id long, s string, v double",
    )
    got = {r["column_name"]: r for r in profile_table(df).collect()}
    assert set(got) == {"id", "s", "v"}
    assert all(r["n_rows"] == 4 for r in got.values())
    assert got["id"]["n_nulls"] == 0 and got["id"]["n_distinct"] == 3
    assert got["id"]["min_val"] == "1" and got["id"]["max_val"] == "3"
    assert got["s"]["n_nulls"] == 1 and got["s"]["n_distinct"] == 2
    assert got["s"]["min_val"] == "x" and got["s"]["max_val"] == "y"
    assert got["v"]["n_nulls"] == 1 and got["v"]["n_distinct"] == 2
    # numeric min/max, rendered as string AFTER aggregation (not
    # lexicographic: "10.5" < "2.0" as strings)
    assert got["v"]["min_val"] == "2.0" and got["v"]["max_val"] == "10.5"


def test_profile_table_approx_path(spark):
    """exact=False swaps countDistinct for approx_count_distinct (HLL, no
    Expand) — the 100 TB path; shape identical, NDV within HLL tolerance."""
    from delta_go_spark.operators.coverage import profile_table

    df = spark.range(1000).selectExpr("id", "CAST(id % 10 AS STRING) AS b")
    got = {r["column_name"]: r for r in profile_table(df, exact=False).collect()}
    assert got["b"]["n_distinct"] == pytest.approx(10, abs=2)
    assert got["id"]["n_distinct"] == pytest.approx(1000, rel=0.05)


# ---------------------------------------------------------------------------
# inverted_index — salted two-phase exact top-k


def test_inverted_index_topk_and_thresholds(spark):
    from delta_go_spark.functions.textops import inverted_index

    rows = [
        # "hot" appears in 7 docs with tf = doc_id (so top-5 = 7,6,5,4,3);
        # "base" appears once in every doc -> df=7, all tf tie at 1
        *[(i, " ".join(["hot"] * i) + f" base unique{i}") for i in range(1, 8)],
        # "rare" appears in only 2 docs -> filtered by min_df=3
        (20, "rare one"),
        (21, "rare two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["token"]: r for r in inverted_index(df, min_df=3).collect()}
    assert "rare" not in got  # df=2 < 3
    hot = got["hot"]
    assert hot["df"] == 7
    assert hot["cf"] == sum(range(1, 8))
    assert hot["top_docs"] == "7,6,5,4,3"  # tf desc, exact top-5
    # all-tied tf: top-5 broken by doc asc
    assert got["base"]["top_docs"] == "1,2,3,4,5"


def test_inverted_index_exact_under_any_salting(spark):
    """Salting is a physical-plan lever, never a semantics lever: results
    must be bit-identical for 1, 2, and 8 salt buckets (1 bucket == the
    naive single-window plan)."""
    from delta_go_spark.functions.textops import inverted_index
    from delta_go_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(80)
    frames = [
        sorted(
            map(
                tuple,
                inverted_index(docs, salt_buckets=s, min_df=2)
                .select("token", "df", "cf", "top_docs")
                .collect(),
            )
        )
        for s in (1, 2, 8)
    ]
    assert frames[0] == frames[1] == frames[2]
    assert len(frames[0]) > 0  # non-vacuous


# ---------------------------------------------------------------------------
# streaming upsert — fixture end-to-end (oracle parity is the hash gate;
# this pins non-vacuity and the out-of-order property the split guarantees)


def test_streaming_upsert_fixture_nonvacuous_and_out_of_order(spark):
    from delta_go_spark.session import load_table
    from delta_go_spark.streaming.windows import streaming_upsert_events
    from pyspark.sql import functions as F

    got = streaming_upsert_events(spark, SF_DIR).collect()
    ev = load_table(spark, SF_DIR, "events")
    n_users = ev.select("user_id").distinct().count()
    assert len(got) == n_users
    # the event_id%4 split interleaves time: some batch!=3 file must hold a
    # user's newest event, i.e. at least one winner has event_id % 4 != 3 —
    # proving the conditional merge actually guarded against late batches
    assert any(r["last_event_id"] % 4 != 3 for r in got)
    # counts conserve
    assert sum(r["n_events"] for r in got) == ev.count()


# ---------------------------------------------------------------------------
# inverted_index_incremental — maintenance semantics the additive deltas
# cannot express


def test_inverted_index_incremental_displaces_and_crosses_threshold(spark):
    """Two things only a real re-rank can get right: (a) a new doc with a
    higher tf must DISPLACE a stored top-k winner; (b) a token below min_df
    in v0 must appear once the ingest pushes it across the threshold."""
    from delta_go_spark.functions.textops import (
        index_from_postings,
        inverted_index,
        inverted_index_incremental,
        token_postings,
    )

    v0 = spark.createDataFrame(
        [
            # "hot": tf 5,4,3,2,1 across docs 1..5 (top-5 full)
            *[(i, " ".join(["hot"] * (6 - i))) for i in range(1, 6)],
            # "edge": in 2 docs -> below min_df=3 in v0
            (6, "edge a"),
            (7, "edge b"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (100, " ".join(["hot"] * 50)),  # displaces doc 5 from top-5
            (101, "edge c"),  # edge crosses min_df=3
        ],
        "doc_id long, text string",
    )
    postings0 = token_postings(v0)
    index0 = index_from_postings(postings0, min_df=1)
    got = {
        r["token"]: r
        for r in inverted_index_incremental(index0, postings0, new).collect()
    }
    assert got["hot"]["top_docs"] == "100,1,2,3,4"  # doc 5 displaced
    assert got["hot"]["df"] == 6 and got["hot"]["cf"] == 15 + 50
    assert got["edge"]["df"] == 3  # crossed the threshold via the ingest
    # and the maintained view equals a batch rebuild over the union corpus
    batch = {
        r["token"]: r for r in inverted_index(v0.unionByName(new)).collect()
    }
    assert set(got) == set(batch)
    for t in got:
        assert (got[t]["df"], got[t]["cf"], got[t]["top_docs"]) == (
            batch[t]["df"], batch[t]["cf"], batch[t]["top_docs"]
        )


# ---------------------------------------------------------------------------
# Hilbert clustering — index correctness, the locality property, and the
# OPTIMIZE CLUSTER BY rewrite


def _xy2d_ref(order: int, x: int, y: int) -> int:
    """Reference xy2d walk (Hilbert curve, standard formulation)."""
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_index_matches_reference_everywhere(spark):
    """All 256 cells at bits=4, plus a bits=8 diagonal sample — the Spark
    Column walk and the shared-engine SQL string must BOTH reproduce the
    reference transform exactly (the oracle evaluates the same string)."""
    from pyspark.sql import functions as F

    from delta_go_spark.maintenance import hilbert_index_expr, hilbert_index_sql

    grid = spark.range(16).selectExpr("id AS x").crossJoin(
        spark.range(16).selectExpr("id AS y")
    )
    rows = grid.select(
        "x", "y",
        hilbert_index_expr(F.col("x"), F.col("y"), bits=4).alias("d1"),
        F.expr(hilbert_index_sql("x", "y", bits=4)).alias("d2"),
    ).collect()
    for r in rows:
        want = _xy2d_ref(16, r["x"], r["y"])
        assert r["d1"] == want and r["d2"] == want, (r["x"], r["y"])
    # bits=8 along a non-trivial diagonal, via the staged-column form (the
    # one the cluster rewrite uses; the inlined expr is exponential there)
    from delta_go_spark.maintenance import with_hilbert_index

    big = spark.range(256).select(
        F.col("id").alias("x"), (F.lit(255) - F.col("id")).alias("y")
    )
    for r in with_hilbert_index(big, "x", "y", out="d", bits=8).collect():
        assert r["d"] == _xy2d_ref(256, r["x"], r["y"])


def test_hilbert_every_step_is_a_grid_neighbour(spark):
    """The property Z-order lacks: walking a FULL grid in Hilbert order,
    every consecutive pair is at Manhattan distance exactly 1 (on a SPARSE
    cell set — sf0.001 — gaps make jumps >1, so the full-grid property is
    pinned synthetically and the fixture slice comparatively)."""
    from pyspark.sql import functions as F

    from delta_go_spark.maintenance import hilbert_index_expr
    from delta_go_spark.queries import queries

    grid = spark.range(16).selectExpr("id AS x").crossJoin(
        spark.range(16).selectExpr("id AS y")
    )
    walk = sorted(
        (r["d"], r["x"], r["y"])
        for r in grid.select(
            "x", "y", hilbert_index_expr(F.col("x"), F.col("y"), bits=4).alias("d")
        ).collect()
    )
    steps = [
        abs(a[1] - b[1]) + abs(a[2] - b[2]) for a, b in zip(walk, walk[1:])
    ]
    assert max(steps) == 1 and sum(steps) == 255
    # fixture slice: hilbert locality strictly beats zorder whatever cells
    # the sf carries
    got = {r["method"]: r for r in queries()["hilbert_locality_lineitem"](
        spark, SF_DIR
    ).collect()}
    assert got["hilbert"]["n_cells"] == got["zorder"]["n_cells"]
    assert got["zorder"]["total_jump"] > got["hilbert"]["total_jump"]


def test_hilbert_cluster_tightens_both_dimensions(spark, tmp_path):
    """OPTIMIZE CLUSTER BY hilbert(x, y): same contract as the Z-order
    rewrite (dataChange=False, per-file min/max boxes narrow in BOTH
    dimensions), and the history records the HILBERT operation."""
    import json

    from pyspark.sql import functions as F

    from delta_go_spark.maintenance import hilbert_cluster
    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "th")
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    DeltaTable.create(spark, path, df)
    t = DeltaTable.for_path(spark, path)
    v = hilbert_cluster(spark, path, ["x", "y"], n_files=4)
    assert v is not None
    snap = t.log.update()
    stats = [json.loads(a.stats) for a in snap.all_files() if a.stats]
    assert len(stats) >= 3
    assert sum(s["numRecords"] for s in stats) == 4096
    for s in stats:
        dx = s["maxValues"]["x"] - s["minValues"]["x"]
        dy = s["maxValues"]["y"] - s["minValues"]["y"]
        assert dx < 63 or dy < 63
    narrow_x = sum(1 for s in stats if s["maxValues"]["x"] - s["minValues"]["x"] <= 32)
    narrow_y = sum(1 for s in stats if s["maxValues"]["y"] - s["minValues"]["y"] <= 32)
    assert narrow_x >= 1 and narrow_y >= 1
    assert t.to_df().count() == 4096
    assert (
        t.log.commit_info_at(snap.version).operation_parameters["operation"]
        == "HILBERT"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hilbert_cluster(spark, path, ["x"])  # exactly-2-columns contract


# ---------------------------------------------------------------------------
# waterfill_allocation — max-min-fair budget capping


def test_waterfill_caps_at_exact_water_level(spark):
    """counts (10, 20, 100), budget 60: keep 10 and 20 fully, cap the big
    source at T = (60-30)//1 = 30."""
    from delta_go_spark.functions.sampling import waterfill_allocation

    per = spark.createDataFrame(
        [("a", 10), ("b", 20), ("c", 100)], "source string, c long"
    )
    got = {r["source"]: r for r in waterfill_allocation(per, 60).collect()}
    assert (got["a"]["tokens_alloc"], got["a"]["capped"]) == (10, 0)
    assert (got["b"]["tokens_alloc"], got["b"]["capped"]) == (20, 0)
    assert (got["c"]["tokens_alloc"], got["c"]["capped"]) == (30, 1)


def test_waterfill_whole_corpus_fits(spark):
    """budget >= total: nothing capped, T falls back to max(c)."""
    from delta_go_spark.functions.sampling import waterfill_allocation

    per = spark.createDataFrame([("a", 5), ("b", 7)], "source string, c long")
    got = {r["source"]: r for r in waterfill_allocation(per, 12).collect()}
    assert all(r["capped"] == 0 for r in got.values())
    assert sum(r["tokens_alloc"] for r in got.values()) == 12


def test_waterfill_level_splits_between_equal_sources(spark):
    """Equal oversized sources share the remaining budget equally (the
    max-min-fair property): counts (4, 50, 50), budget 24 -> T = 10."""
    from delta_go_spark.functions.sampling import waterfill_allocation

    per = spark.createDataFrame(
        [("a", 4), ("b", 50), ("c", 50)], "source string, c long"
    )
    got = {r["source"]: r for r in waterfill_allocation(per, 24).collect()}
    assert got["a"]["tokens_alloc"] == 4
    assert got["b"]["tokens_alloc"] == got["c"]["tokens_alloc"] == 10
    # allocations never exceed the budget, and fill it up to integer slack
    assert sum(r["tokens_alloc"] for r in got.values()) == 24


def test_waterfill_fixture_exercises_both_branches(spark):
    """At sf0.01 the lang-stratified allocation must carry BOTH kept and
    capped rows (en is ~3x any other lang) — at sf0.001 sizes even out and
    everything caps, which is why the registry query runs on lang, not
    source."""
    from delta_go_spark.functions.sampling import waterfill_budget_docs

    rows = waterfill_budget_docs(spark, "/root/testdata/sf0.01").collect()
    capped = [r for r in rows if r["capped"] == 1]
    kept = [r for r in rows if r["capped"] == 0]
    assert capped and kept
    # every capped row sits exactly at the shared water level
    assert len({r["tokens_alloc"] for r in capped}) == 1


# ---------------------------------------------------------------------------
# equidepth_histogram — optimizer-stats buckets via the two-pass global rank


def test_equidepth_buckets_are_equal_depth_and_ordered(spark):
    """1000 rows / 8 buckets -> exactly 125 rows per bucket, and bucket
    value ranges must tile the domain in order (max of bucket b <= min of
    bucket b+1 under the total order)."""
    from pyspark.sql import functions as F

    from delta_go_spark.operators.coverage import equidepth_histogram

    df = spark.range(1000).select(
        (F.col("id") * 7919 % 1000).alias("v"), F.col("id").alias("k")
    )
    rows = equidepth_histogram(df, "v", "k", buckets=8).collect()
    assert [r["bucket"] for r in rows] == list(range(8))
    assert all(r["n_rows"] == 125 for r in rows)
    for a, b in zip(rows, rows[1:]):
        assert a["max_val"] <= b["min_val"]
    assert sum(r["id_checksum"] for r in rows) == sum(range(1000))


def test_equidepth_plan_never_single_task_window(spark):
    """The global rank must run through the range-partitioned two-pass,
    not an un-partitioned window (the 100 TB order-statistic rule)."""
    import re

    from delta_go_spark.queries import queries

    plan = (
        queries()["equidepth_histogram_docs"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" in plan.lower()
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        first = spec.split(",")[0]
        assert " ASC" not in first and " DESC" not in first, spec


# ---------------------------------------------------------------------------
# orc_roundtrip — third-format fidelity


def test_orc_roundtrip_rebuilds_on_reaped_cache(spark, tmp_path, monkeypatch):
    """The census marker must force a rebuild when the export files are
    reaped behind the marker's back (the /tmp-cleaner hazard the JSONL/CSV
    round-trip already guards)."""
    import os
    import shutil

    from delta_go_spark.operators.coverage import _orc_copy, orc_roundtrip_docs

    root = _orc_copy(spark, SF_DIR)
    before = orc_roundtrip_docs(spark, SF_DIR).collect()
    # reap one data file, keep the marker
    orc_dir = os.path.join(root, "orc")
    victim = next(
        f for f in os.listdir(orc_dir) if f.endswith(".orc") or f.startswith("part-")
    )
    os.remove(os.path.join(orc_dir, victim))
    root2 = _orc_copy(spark, SF_DIR)  # must detect + rebuild
    after = orc_roundtrip_docs(spark, SF_DIR).collect()
    assert root2 == root
    assert sorted(map(tuple, before)) == sorted(map(tuple, after))


def test_hilbert_cluster_improves_2d_stats_skipping(spark, tmp_path):
    """The Hilbert layout's 100 TB payoff, pinned with the scan's own skip
    counter: after CLUSTER BY hilbert(x, y), a BOX predicate on the two
    clustered columns skips files the hash-spread layout could not — and
    the skipped+hit row content is unchanged."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from delta_go_spark.expressions import (
        And,
        Column,
        GreaterThanOrEq,
        LessThan,
        Literal,
    )
    from delta_go_spark.log import DeltaLog
    from delta_go_spark.maintenance import hilbert_cluster
    from delta_go_spark.session import load_table
    from delta_go_spark.writer import write_dataframe

    path = str(tmp_path / "orders_h")
    orders = load_table(spark, "/root/testdata/sf0.01", "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_dataframe(orders.repartition(8, "o_orderkey"), path)

    pred = And(
        And(
            GreaterThanOrEq(Column("o_custkey", LongType()), Literal(100)),
            LessThan(Column("o_custkey", LongType()), Literal(400)),
        ),
        And(
            GreaterThanOrEq(
                Column("o_totalprice", LongType()), Literal(50000)
            ),
            LessThan(Column("o_totalprice", LongType()), Literal(150000)),
        ),
    )

    def skipped():
        scan = DeltaLog.for_table(path).snapshot().scan(pred)
        n = sum(1 for _ in scan.files())
        return scan.files_skipped_by_stats, n

    before_skipped, before_hit = skipped()
    assert before_skipped == 0  # hash layout: every file spans the box

    assert hilbert_cluster(
        spark, path, ["o_custkey", "o_totalprice"], n_files=8
    ) == 1
    after_skipped, after_hit = skipped()
    assert after_skipped > 0
    assert after_hit < before_hit
    got = (
        DeltaLog.for_table(path)
        .snapshot()
        .scan(pred)
        .to_df(spark)
        .filter(
            (F.col("o_custkey") >= 100) & (F.col("o_custkey") < 400)
            & (F.col("o_totalprice") >= 50000) & (F.col("o_totalprice") < 150000)
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("cks"))
        .first()
    )
    want = (
        orders.filter(
            (F.col("o_custkey") >= 100) & (F.col("o_custkey") < 400)
            & (F.col("o_totalprice") >= 50000) & (F.col("o_totalprice") < 150000)
        )
        .agg(F.count(F.lit(1)), F.sum("o_orderkey"))
        .first()
    )
    assert (got["n"], got["cks"]) == tuple(want)


# ---------------------------------------------------------------------------
# metadata_only_min_max — log-stats aggregation edge cases


def test_metadata_minmax_allnull_file_and_string_refusal(spark, tmp_path):
    from pyspark.sql import functions as F

    from delta_go_spark.log import DeltaLog
    from delta_go_spark.scan import metadata_only_min_max
    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "tmm")
    DeltaTable.create(
        spark,
        path,
        spark.createDataFrame([(1, 10, "a"), (2, 20, "b")], "k long, v long, s string"),
    )
    t = DeltaTable.for_path(spark, path)
    # a file where v is entirely NULL must contribute nothing to (min, max)
    t.append(
        spark.createDataFrame(
            [(3, None, "c")], "k long, v long, s string"
        )
    )
    snap = DeltaLog.for_table(path).update()
    mm = metadata_only_min_max(snap, ["k", "v"])
    assert mm["k"] == (1, 3)
    assert mm["v"] == (10, 20)  # the all-NULL file did not poison the range
    import pytest as _p

    with _p.raises(ValueError, match="truncat"):
        metadata_only_min_max(snap, ["s"])  # strings refused (truncation)
    with _p.raises(ValueError, match="unknown"):
        metadata_only_min_max(snap, ["zzz"])


def test_metadata_agg_matches_scan(spark):
    """The registry row's substance: log-stats answers == data-scan answers
    on the fixture Delta copy."""
    from pyspark.sql import functions as F

    from delta_go_spark.operators.delta_queries import delta_metadata_agg
    from delta_go_spark.session import load_table

    got = delta_metadata_agg(spark, SF_DIR).first()
    want = (
        load_table(spark, SF_DIR, "documents")
        .agg(
            F.count(F.lit(1)),
            F.min("doc_id"), F.max("doc_id"),
            F.min("n_chars"), F.max("n_chars"),
        )
        .first()
    )
    assert tuple(got) == tuple(want)


def test_hilbert_cluster_incremental_touches_only_new_files(spark, tmp_path):
    """Liquid-clustering maintenance: after a full HILBERT rewrite, an
    append + incremental cluster must rewrite ONLY the appended files —
    every file of the prior clustered layout survives byte-identical —
    and the table's rows are unchanged."""
    from pyspark.sql import functions as F

    from delta_go_spark.log import DeltaLog
    from delta_go_spark.maintenance import hilbert_cluster
    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "thinc")
    base = spark.range(0, 2048).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    DeltaTable.create(spark, path, base)
    t = DeltaTable.for_path(spark, path)
    assert hilbert_cluster(spark, path, ["x", "y"], n_files=4) is not None
    clustered = {a.path for a in DeltaLog.for_table(path).update().all_files()}

    fresh = spark.range(2048, 3072).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    t.append(fresh.repartition(3))
    before = DeltaLog.for_table(path).update().all_files()
    appended = {a.path for a in before} - clustered

    v = hilbert_cluster(spark, path, ["x", "y"], n_files=2, incremental=True)
    assert v is not None
    after = {a.path for a in DeltaLog.for_table(path).update().all_files()}
    assert clustered <= after  # prior layout untouched
    assert not (appended & after)  # every appended file was rewritten
    assert t.to_df().count() == 3072
    # a second incremental pass with nothing new is a no-op
    assert hilbert_cluster(spark, path, ["x", "y"], incremental=True) is None
