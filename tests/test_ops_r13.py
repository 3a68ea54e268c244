"""Round-13 operator tests.

Pins for this round's changes:
  * FrequencyStateMaintainer — the stats axis gets the IndexMaintainer
    committer shape: frequency + ndv state in the engine's OWN Delta
    tables, one MERGE per batch under SetTransaction tokens.  Pinned:
    batch-rebuild convergence through deletes, replay no-op, restart
    resume, the MERGE-ORDER crash-recovery invariant (stats first,
    frequency last), and the change-proportional file-set I/O shape
    (the tests/test_ops_r11.py:688 pattern on a value-hashed layout);
  * broadcast_if_small — the change-volume broadcasts in the
    maintainers degrade to shuffle joins past the session threshold
    instead of OOMing on a backfill (the dedup.py r5 lesson, now
    shared);
  * compact_state_tables — long-running maintenance bounds its state
    file count without corrupting state;
  * range_split_points — maintained-histogram-derived write boundaries
    are balanced up to tie mass.
"""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

DOC_SCHEMA = "doc_id long, lang string, n_chars long"


def _seed_maintainer(spark, root, rows, cols, **kw):
    """A CDF-enabled docs table at v0 plus a maintainer seeded from its
    v0 frequency/ndv artifacts — the production starting point."""
    from delta_go_spark.operators.coverage import value_frequencies
    from delta_go_spark.streaming.windows import FrequencyStateMaintainer
    from delta_go_spark.table import DeltaTable

    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    tbl = root + "/docs"
    t = DeltaTable.create(
        spark, tbl, docs,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    freq_p, ndv_p = root + "/freq0", root + "/ndv0"
    value_frequencies(docs, cols).write.parquet(freq_p)
    spark.read.parquet(freq_p).groupBy("column_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct")
    ).write.parquet(ndv_p)
    kw.setdefault("compact_every", 0)
    m = FrequencyStateMaintainer(
        spark, root + "/state", cols, freq_p, ndv_p, **kw
    )
    return t, m


def _batch(spark, tbl, start_version, end_version=None):
    from delta_go_spark import cdf

    return cdf.table_changes(
        spark, tbl, start_version=start_version, end_version=end_version
    ).select("doc_id", "lang", "n_chars", "_change_type", "_commit_version")


def _want_ndv(t, cols):
    live = t.to_df()
    return {
        c: live.filter(F.col(c).isNotNull()).select(c).distinct().count()
        for c in cols
    }


V0 = [(i, f"l{i % 3}", 10 + i % 4) for i in range(1, 13)]


def test_freq_maintainer_matches_batch_rebuild(spark, tmp_path):
    """Maintained state == from-scratch rebuild through an append that
    ENTERS new values and a delete that removes values' LAST rows
    (both crossing directions), across two separate micro-batches."""
    cols = ["lang", "n_chars"]
    t, m = _seed_maintainer(spark, str(tmp_path), V0, cols)
    # batch 1: new lang l9 enters; n_chars 50 enters
    t.append(spark.createDataFrame([(20, "l9", 50), (21, "l0", 10)], DOC_SCHEMA))
    m.apply(_batch(spark, t.log.table_path, 1, 1), 1)
    # batch 2: delete the ONLY l9 doc (l9 leaves) and one l0 doc (l0 stays)
    t.delete_where("doc_id in (20, 21)")
    m.apply(_batch(spark, t.log.table_path, 2, 2), 2)
    got = {r["column_name"]: r["n_distinct"] for r in m.current_ndv().collect()}
    assert got == _want_ndv(t, cols)
    # the frequency state itself equals a from-scratch count
    from delta_go_spark.operators.coverage import value_frequencies

    got_f = sorted(
        map(tuple, m.current_frequencies("n_chars").collect())
    )
    want_f = sorted(
        (str(r["val"]), r["cnt"])
        for r in value_frequencies(t.to_df(), ["n_chars"]).collect()
    )
    assert got_f == want_f
    # and the served histogram equals ranking the corpus
    from delta_go_spark.operators.coverage import equidepth_histogram

    got_h = [tuple(r) for r in m.current_histogram("n_chars", 4).collect()]
    want_h = [
        (r["bucket"], r["n_rows"], r["min_val"], r["max_val"])
        for r in equidepth_histogram(t.to_df(), "n_chars", "doc_id", buckets=4)
        .drop("id_checksum")
        .collect()
    ]
    assert got_h == want_h


def test_freq_maintainer_replayed_batch_is_noop(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering an already-applied
    batch_id must not double-apply (SetTransaction tokens + the
    last_applied fast path)."""
    cols = ["lang"]
    t, m = _seed_maintainer(spark, str(tmp_path), V0, cols)
    t.append(spark.createDataFrame([(20, "l9", 50)], DOC_SCHEMA))
    b = _batch(spark, t.log.table_path, 1, 1)
    m.apply(b, 1)
    after = sorted(map(tuple, m.current_ndv().collect()))
    m.apply(b, 1)  # replay: must be a no-op
    assert sorted(map(tuple, m.current_ndv().collect())) == after
    assert dict(after)["lang"] == 4  # l0-l2 + l9, counted exactly once


def test_freq_maintainer_restart_resume(spark, tmp_path):
    """A RESTARTED maintenance job (new instance, same state dir) picks
    up from the tables' txn versions and keeps folding correctly."""
    from delta_go_spark.streaming.windows import FrequencyStateMaintainer

    cols = ["lang"]
    root = str(tmp_path)
    t, m = _seed_maintainer(spark, root, V0, cols)
    t.append(spark.createDataFrame([(20, "l9", 50)], DOC_SCHEMA))
    m.apply(_batch(spark, t.log.table_path, 1, 1), 1)
    assert m.last_applied() == 1
    # new instance over the SAME state tables — seeding must be skipped
    # (the tables exist) and the token survives the restart
    m2 = FrequencyStateMaintainer(
        spark, root + "/state", cols, root + "/freq0", root + "/ndv0"
    )
    assert m2.last_applied() == 1
    t.delete_where("doc_id = 20")
    m2.apply(_batch(spark, t.log.table_path, 2, 2), 2)
    got = {r["column_name"]: r["n_distinct"] for r in m2.current_ndv().collect()}
    assert got == _want_ndv(t, cols)


def test_freq_maintainer_crash_between_merges_converges(spark, tmp_path):
    """THE merge-order invariant: stats folds FIRST, frequency LAST,
    because the stats delta is computed against the pre-batch frequency
    image.  Simulate a crash between the two merges (the second MERGE
    raises), re-deliver the batch, and require exact convergence — the
    stats merge no-ops via its token, the frequency fold recomputes
    from the still-unchanged frequency state.  Were the order reversed,
    the replay would read post-merge frequencies and double-count the
    crossing this test pins (l9 enters: +1 exactly once)."""
    from delta_go_spark.dml import DeltaDml

    cols = ["lang"]
    t, m = _seed_maintainer(spark, str(tmp_path), V0, cols)
    t.append(spark.createDataFrame([(20, "l9", 50), (22, "l9", 51)], DOC_SCHEMA))
    b = _batch(spark, t.log.table_path, 1, 1)

    orig = DeltaDml.merge
    calls = {"n": 0}

    def crash_on_second(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected crash between the state merges")
        return orig(self, *a, **kw)

    DeltaDml.merge = crash_on_second
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            m.apply(b, 1)
    finally:
        DeltaDml.merge = orig
    assert m.last_applied() == -1  # the batch is NOT fully applied
    m.apply(b, 1)  # re-delivery
    got = {r["column_name"]: r["n_distinct"] for r in m.current_ndv().collect()}
    assert got == {"lang": 4}  # l0-l2 + l9: the crossing counted ONCE
    assert m.last_applied() == 1


def test_freq_maintainer_state_io_is_change_proportional(spark, tmp_path):
    """The IndexMaintainer I/O pin applied to the stats axis: the
    frequency state spans ~8 pk-hashed files; a batch touching ONE value
    (one delete that zeroes it, one never-seen insert) may copy-on-write
    only the file holding the matched pk and append the new value — the
    rest must survive byte-identical."""
    from delta_go_spark.log import DeltaLog

    cols = ["lang"]
    rows = [(i, f"v{i}", 10) for i in range(60)]  # 60 distinct lang values
    t, m = _seed_maintainer(spark, str(tmp_path), rows, cols)

    def live(tbl):
        return {a.path for a in DeltaLog.for_table(tbl).update().all_files()}

    f0 = live(m.freq_tbl)
    assert len(f0) >= 6  # pk-hashed layout really spans files
    t.append(spark.createDataFrame([(100, "fresh", 10)], DOC_SCHEMA))
    t.delete_where("doc_id = 3")  # v3's only row: the value leaves
    m.apply(_batch(spark, t.log.table_path, 1, 2), 1)
    f1 = live(m.freq_tbl)
    rewritten = f0 - f1
    assert len(rewritten) <= 1, rewritten  # only v3's file rewrote
    assert len(f0 & f1) >= len(f0) - 1  # the rest survive byte-identical
    got = {r["column_name"]: r["n_distinct"] for r in m.current_ndv().collect()}
    assert got == {"lang": 60}  # -v3 +fresh


def test_compaction_bounds_state_file_count(spark, tmp_path):
    """compact_state_tables: with compact_every=2 the per-batch MERGE
    appends stop accumulating — after 6 batches the compacted run holds
    strictly fewer active files than the uncompacted twin, and the state
    is still exactly correct."""
    from delta_go_spark.log import DeltaLog

    cols = ["lang"]

    def run(root, every):
        t, m = _seed_maintainer(
            spark, root, V0, cols, compact_every=every
        )
        for i in range(1, 7):
            t.append(
                spark.createDataFrame([(100 + i, f"b{i}", 10)], DOC_SCHEMA)
            )
            m.apply(_batch(spark, t.log.table_path, i, i), i)
        n_files = len(DeltaLog.for_table(m.freq_tbl).update().all_files())
        got = {
            r["column_name"]: r["n_distinct"]
            for r in m.current_ndv().collect()
        }
        return n_files, got, _want_ndv(t, cols)

    n_plain, got_plain, want_plain = run(str(tmp_path / "plain"), 0)
    n_comp, got_comp, want_comp = run(str(tmp_path / "comp"), 2)
    assert got_plain == want_plain and got_comp == want_comp
    assert n_comp < n_plain  # the file count is genuinely bounded


def test_vacuum_bounds_state_disk_footprint(spark, tmp_path):
    """Auto-vacuum on the compaction cadence: every merge/compaction
    tombstones the files it rewrote, so WITHOUT vacuum the on-disk byte
    footprint grows with total churn even while the active set stays
    bounded.  With vacuum_retention_ms=0 the on-disk parquet set shrinks
    to exactly the active set, and the state is still exactly correct."""
    import os

    from delta_go_spark.log import DeltaLog
    from delta_go_spark.snapshot import canonicalize_path

    cols = ["lang"]

    def disk_parquets(tbl):
        out = set()
        for dirpath, dirnames, filenames in os.walk(tbl):
            if "_delta_log" in dirpath:
                continue
            for f in filenames:
                if f.endswith(".parquet"):
                    out.add(os.path.join(dirpath, f))
        return out

    def active_parquets(tbl):
        snap = DeltaLog.for_table(tbl).update()
        return {
            canonicalize_path(a.path, os.path.abspath(tbl)).replace(
                "file://", ""
            )
            for a in snap.all_files()
        }

    def run(root, retention):
        t, m = _seed_maintainer(
            spark, root, V0, cols,
            compact_every=2, vacuum_retention_ms=retention,
        )
        for i in range(1, 7):
            t.append(
                spark.createDataFrame([(100 + i, f"b{i}", 10)], DOC_SCHEMA)
            )
            m.apply(_batch(spark, t.log.table_path, i, i), i)
        got = {
            r["column_name"]: r["n_distinct"]
            for r in m.current_ndv().collect()
        }
        assert got == _want_ndv(t, cols)
        return disk_parquets(m.freq_tbl), active_parquets(m.freq_tbl)

    disk_manual, active_manual = run(str(tmp_path / "manual"), None)
    disk_auto, active_auto = run(str(tmp_path / "auto"), 0)
    # without vacuum, churn leaves superseded bytes behind the active set
    assert active_manual < disk_manual
    # with retention-0 auto-vacuum, disk == the live snapshot exactly
    assert disk_auto == active_auto


# ---------------------------------------------------------------------------
# broadcast_if_small — the shared change-volume broadcast guard


def test_broadcast_if_small_honors_threshold(spark):
    from delta_go_spark.hints import broadcast_if_small

    df = spark.range(4)
    hinted = broadcast_if_small(df, 1024)  # tiny: hint applied
    assert hinted is not df
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "0")
        assert broadcast_if_small(df, 1024) is df  # degrade: no hint
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        assert broadcast_if_small(df, 1) is df  # disabled: never hint
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_checkpointed_storage_bytes_fast_path(spark):
    """The zero-job measurement: an EAGERLY localCheckpointed frame
    reports its real stored size straight off the block manager; a lazy
    (unmaterialized) checkpoint, or any projection on top, returns None
    so callers fall back to the one-job aggregate — and the size is real
    enough that the broadcast guard still rejects an oversized frame."""
    from delta_go_spark.hints import (
        broadcast_measured,
        checkpointed_storage_bytes,
        measured_df_bytes,
    )

    eager = spark.range(1000).selectExpr(
        "id as doc_id", "repeat('x', 40) as text"
    ).localCheckpoint()
    stored = checkpointed_storage_bytes(eager)
    assert stored is not None and stored > 1000 * 40  # real payload bytes
    assert measured_df_bytes(eager) == stored

    lazy = spark.range(10).localCheckpoint(eager=False)
    assert checkpointed_storage_bytes(lazy) is None
    projected = eager.withColumnRenamed("doc_id", "doc")
    assert checkpointed_storage_bytes(projected) is None
    # the fallback aggregate still measures both
    assert measured_df_bytes(lazy) > 0

    # guard discipline holds on the fast path: an over-threshold stored
    # frame must NOT be hinted
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1kb")
        assert broadcast_measured(eager) is eager
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_ndv_fold_degraded_path_results_identical(spark):
    """Threshold forced to 0: fold_value_deltas must fall back to a
    shuffle join and produce byte-identical results (the backfill path
    a guard exists for)."""
    from delta_go_spark.operators.coverage import ndv_incremental

    freq0 = spark.createDataFrame(
        [("lang", "a", 2), ("lang", "b", 1)], "column_name string, val string, cnt long"
    )
    ndv0 = spark.createDataFrame(
        [("lang", 2)], "column_name string, n_distinct long"
    )
    new = spark.createDataFrame([(1, "c"), (2, "b")], "doc_id long, lang string")
    dead = spark.createDataFrame([(3, "b"), (4, "b")], "doc_id long, lang string")

    def compute():
        return {
            r["column_name"]: r["n_distinct"]
            for r in ndv_incremental(
                spark, freq0, ndv0, new, dead, ["lang"]
            ).collect()
        }

    fast = compute()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "0")
        slow = compute()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # b: 1 + 1 - 2 = 0 (leaves), c enters -> lang stays at 2 + 1 - 1 = 2
    assert fast == slow == {"lang": 2}


def test_index_maintainer_degraded_broadcast_results_identical(spark, tmp_path):
    """The affected-token broadcast in the index refresh degrades to a
    shuffle join under threshold 0 with identical state."""
    from delta_go_spark.functions.textops import (
        index_from_postings,
        token_postings,
    )
    from delta_go_spark.streaming.windows import IndexMaintainer

    v0 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    root = str(tmp_path)
    p0, i0 = root + "/p0", root + "/i0"
    token_postings(v0).write.parquet(p0)
    index_from_postings(spark.read.parquet(p0), min_df=1).write.parquet(i0)
    batch = spark.createDataFrame(
        [(3, "beta delta", "insert", 1)],
        "doc_id long, text string, _change_type string, _commit_version long",
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "0")
        m = IndexMaintainer(spark, root + "/state", p0, i0)
        m.apply(batch, 0)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    got = {r["token"]: r["df"] for r in m.current_index().collect()}
    assert got == {"alpha": 1, "beta": 3, "gamma": 1, "delta": 1}


# ---------------------------------------------------------------------------
# range_split_points — maintained-histogram-derived write boundaries


def test_range_split_points_balanced_when_values_distinct(spark):
    """With all-distinct values the boundaries split rows exactly
    ceil/floor-evenly — the balance invariant a range-bucketed write
    relies on."""
    from delta_go_spark.operators.coverage import range_split_points

    freq = spark.createDataFrame(
        [(v, 1) for v in range(100)], "val long, cnt long"
    )
    pts = range_split_points(freq, buckets=8)
    assert len(pts) == 7 and pts == sorted(pts)
    df = spark.range(100).select(F.col("id").alias("v"))
    arr = F.array(*[F.lit(int(p)) for p in pts])
    counts = (
        df.select(F.size(F.filter(arr, lambda p: p < F.col("v"))).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    sizes = {r["b"]: r["count"] for r in counts}
    assert set(sizes) == set(range(8))
    assert all(12 <= n <= 13 for n in sizes.values())  # ceil/floor of 100/8


def test_heavy_hitters_bounded_and_exact(spark):
    """heavy_hitters returns exactly the values over the mass fraction,
    and its size is bounded by 1/hot_frac by construction."""
    from delta_go_spark.operators.scalejoins import heavy_hitters

    freq = spark.createDataFrame(
        [(1, 70), (2, 10), (3, 10), (4, 10)], "val long, cnt long"
    )
    hot = heavy_hitters(freq, hot_frac=0.25)
    assert hot == [1]
    assert len(heavy_hitters(freq, hot_frac=0.05)) <= 20
    empty = spark.createDataFrame([], "val long, cnt long")
    assert heavy_hitters(empty) == []


def test_hotkey_salted_join_matches_plain_join(spark):
    """Partial salting is a pure physical rewrite: hot-only salting (and
    the empty-hot degenerate) produce row sets identical to the plain
    join, including fact keys with NO dim match (dropped) and dim rows
    matching many fact rows."""
    from delta_go_spark.operators.scalejoins import hotkey_salted_join

    fact_rows = [(1, i, i * 10) for i in range(90)] + [
        (k, 1000 + k, k) for k in range(2, 12)
    ]
    fact = spark.createDataFrame(fact_rows, "k long, eid long, v long")
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(1, 8)], "k long, name string"
    )
    want = sorted(
        tuple(r) for r in fact.join(dim, "k").select("k", "eid", "v", "name").collect()
    )
    for hot in ([1], []):
        got = sorted(
            tuple(r)
            for r in hotkey_salted_join(
                fact, dim, "k", hot, salt_expr=F.col("eid"), salt_n=4
            )
            .select("k", "eid", "v", "name")
            .collect()
        )
        assert got == want


def test_range_split_points_ties_never_straddle(spark):
    """A heavy tied value lands WHOLLY in one bucket (assignment is a
    pure function of the value) — imbalance is bounded by the tie mass,
    never a split of equal keys across files."""
    from delta_go_spark.operators.coverage import range_split_points

    freq = spark.createDataFrame(
        [(1, 10), (2, 80), (3, 10)], "val long, cnt long"
    )
    pts = range_split_points(freq, buckets=4)
    rows = [(i, v) for i, v in enumerate([1] * 10 + [2] * 80 + [3] * 10)]
    df = spark.createDataFrame(rows, "i long, v long")
    arr = F.array(*[F.lit(int(p)) for p in pts])
    by_bucket = (
        df.select(
            "v", F.size(F.filter(arr, lambda p: p < F.col("v"))).alias("b")
        )
        .groupBy("v")
        .agg(F.countDistinct("b").alias("nb"))
        .collect()
    )
    assert all(r["nb"] == 1 for r in by_bucket)  # each value -> ONE bucket


# ---------------------------------------------------------------------------
# Guarded MERGE broadcasts — the backfill axis of the DML path


def test_estimated_df_bytes_measures_payload(spark):
    """The estimate MEASURES string/binary/complex payload instead of
    assuming a flat per-row constant — a 5KB-text row must dominate its
    fixed-width neighbours (the wide-payload backfill case a flat
    constant under-counts ~40x)."""
    from delta_go_spark.hints import estimated_df_bytes

    small = spark.createDataFrame([(1, "ab")] * 10, "k long, s string")
    wide = spark.createDataFrame([(1, "x" * 5000)] * 10, "k long, s string")
    b_small = estimated_df_bytes(small)
    b_wide = estimated_df_bytes(wide)
    assert b_wide > 10 * 5000 * 2  # measured chars, UTF-16 width
    assert b_wide > 50 * b_small  # payload dominates, not row count
    arr = spark.createDataFrame(
        [(1, list(range(100)))], "k long, a array<int>"
    )
    assert estimated_df_bytes(arr) > 200  # complex types measured too
    empty = spark.createDataFrame([], "k long, s string")
    assert estimated_df_bytes(empty) == 0


def test_merge_degraded_broadcast_results_identical(spark, tmp_path):
    """MERGE under autoBroadcastJoinThreshold=0 (every broadcast site
    degrades to a shuffle join) produces state identical to the hinted
    path, and the duplicate-source-key guard still fires."""
    from delta_go_spark.snapshot import DeltaError
    from delta_go_spark.table import DeltaTable

    def run(sub):
        path = str(tmp_path / sub)
        t = DeltaTable.create(
            spark,
            path,
            spark.createDataFrame(
                [(i, i * 10) for i in range(20)], "k long, v long"
            ),
        )
        src = spark.createDataFrame(
            [(5, 555), (19, 999), (100, 1)], "k long, v long"
        )
        t.merge(src, on="k", update_set={"v": F.col("_s_v")})
        return {r["k"]: r["v"] for r in t.to_df().collect()}, path

    fast, _ = run("fast")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "0")
        slow, slow_path = run("slow")
        assert fast == slow
        assert fast[5] == 555 and fast[100] == 1 and len(fast) == 21
        # dup-key guard unaffected by the degraded join form
        t = DeltaTable.for_path(spark, slow_path)
        dup = spark.createDataFrame([(5, 1), (5, 2)], "k long, v long")
        with pytest.raises(DeltaError, match="multiple source rows"):
            t.merge(dup, on="k", update_set={"v": F.col("_s_v")})
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_maintainers_pass_vacuum_retention_to_housekeeping(
    spark, tmp_path, monkeypatch
):
    """Both maintainers must hand their vacuum_retention_ms through to
    compact_state_tables — a silently-dropped kwarg would mean the
    auto-vacuum is configured but never runs (the documented-not-built
    class this round exists to close)."""
    from delta_go_spark.functions.textops import (
        index_from_postings,
        token_postings,
    )
    from delta_go_spark.streaming import windows as W

    seen = []

    def capture(spark_, tables, batch_id, every, vacuum_retention_ms=None):
        seen.append((sorted(tables.values()), every, vacuum_retention_ms))

    monkeypatch.setattr(W, "compact_state_tables", capture)

    root = str(tmp_path)
    v0 = spark.createDataFrame(
        [(1, "alpha beta")], "doc_id long, text string"
    )
    p0, i0 = root + "/p0", root + "/i0"
    token_postings(v0).write.parquet(p0)
    index_from_postings(spark.read.parquet(p0), min_df=1).write.parquet(i0)
    im = W.IndexMaintainer(
        spark, root + "/istate", p0, i0, vacuum_retention_ms=12345
    )
    im.apply(
        spark.createDataFrame(
            [(2, "beta gamma", "insert", 1)],
            "doc_id long, text string, _change_type string, "
            "_commit_version long",
        ),
        0,
    )
    cols = ["lang"]
    _, fm = _seed_maintainer(
        spark, root, V0, cols, vacuum_retention_ms=777, compact_every=3
    )
    t = spark.createDataFrame([(50, "l8", 9)], DOC_SCHEMA)
    from delta_go_spark.table import DeltaTable

    dt = DeltaTable.for_path(spark, root + "/docs")
    dt.append(t)
    fm.apply(_batch(spark, root + "/docs", 1, 1), 1)
    assert (["token", "token"], 8, 12345) in seen
    assert (["column_name", "pk"], 3, 777) in seen
