"""Round-12 operator tests.

Pins for this round's changes:
  * minhash_incremental_update — the LAST insert-only maintainer goes
    delete-aware: a stored pair whose endpoint is deleted must drop,
    and a deleted doc's stored signature must not band-join with a new
    doc (no phantom pairs);
  * corpus_stats_signsum — the BM25 1-row (N, Σdl) stats table advanced
    by sign-sum must equal the from-scratch reduce over the post-change
    doc lengths, and the stats-served BM25 path must equal the
    reduce-served path bit-for-bit (zero corpus work at query time);
  * snapshot_diff duplicate-key guard — non-unique key_cols must raise
    DeltaError naming the key instead of silently fanning out the
    full-outer diff join.
(The IndexMaintainer Delta-state pins live in test_ops_r11.py next to
the maintainer's other tests.)
"""

import pytest
from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string"

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# minhash_incremental_update — deletes


def test_minhash_update_drops_deleted_endpoint_pairs(spark):
    """Doc 2 is a stored near-dup of doc 1 (the pair is in the persisted
    pair set) and would ALSO near-dup the incoming doc 4.  Deleting doc 2
    must (a) drop the stored (1,2) pair and (b) keep the phantom (2,4)
    pair from ever forming — only (1,4) survives."""
    from delta_go_spark.functions.dedup import (
        minhash_incremental_update,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    t1 = "a b c d e f g h i j"
    t2 = "a b c d e f g h i k"  # 7/9 shingles shared with t1 (0.78)
    t3 = "z y x w v u t s r q"
    v0 = spark.createDataFrame([(1, t1), (2, t2), (3, t3)], DOC_SCHEMA)
    sig_base = minhash_signatures(v0, num_perm=16).localCheckpoint()
    pairs0 = minhash_lsh_pairs(v0).localCheckpoint()
    assert [(r["doc_id_a"], r["doc_id_b"]) for r in pairs0.collect()] == [
        (1, 2)
    ]  # the stored pair whose endpoint is about to die

    new_docs = spark.createDataFrame(
        [(4, "a b c d e f g h i l")], DOC_SCHEMA  # near-dups BOTH 1 and 2
    )
    deleted_ids = spark.createDataFrame([(2,)], "doc_id long")
    got = sorted(
        (r["doc_id_a"], r["doc_id_b"])
        for r in minhash_incremental_update(
            sig_base, pairs0, new_docs, deleted_ids
        ).collect()
    )
    assert got == [(1, 4)]  # (1,2) dropped, (2,4) never formed


def test_minhash_update_pure_insert_unchanged(spark):
    """With an empty delete set the update degrades to exactly the old
    insert-only behavior: stored pairs pass through untouched."""
    from delta_go_spark.functions.dedup import (
        minhash_incremental_update,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    t1 = "a b c d e f g h i j"
    t2 = "a b c d e f g h i k"
    v0 = spark.createDataFrame([(1, t1), (2, t2)], DOC_SCHEMA)
    got = sorted(
        (r["doc_id_a"], r["doc_id_b"])
        for r in minhash_incremental_update(
            minhash_signatures(v0, num_perm=16),
            minhash_lsh_pairs(v0),
            spark.createDataFrame([], DOC_SCHEMA),
            spark.createDataFrame([], "doc_id long"),
        ).collect()
    )
    assert got == [(1, 2)]


def test_minhash_incremental_docs_registry_excludes_deleted(spark):
    """Fixture-level non-vacuity of the delete path: no surviving pair
    may touch a deleted (doc_id % 7 == 0) endpoint, and the v2 delete
    really removed at least one pair the insert-only r11 form would
    have kept (the stored pair set over v0 contains mod-7 endpoints)."""
    from delta_go_spark.functions.dedup import (
        minhash_incremental_docs,
        minhash_lsh_pairs,
    )
    from delta_go_spark.session import load_table

    got = minhash_incremental_docs(spark, SF_DIR).collect()
    assert all(
        r["doc_id_a"] % 7 != 0 and r["doc_id_b"] % 7 != 0 for r in got
    )
    v0 = load_table(spark, SF_DIR, "documents").filter(
        F.col("doc_id") % 5 != 0
    )
    stale = minhash_lsh_pairs(v0).filter(
        (F.col("doc_id_a") % 7 == 0) | (F.col("doc_id_b") % 7 == 0)
    )
    assert stale.count() > 0  # the delete actually exercises the drop


# ---------------------------------------------------------------------------
# corpus_stats_signsum — the BM25 1-row stats table


def test_corpus_stats_signsum_matches_reduce(spark):
    """Sign-summed stats through insert + delete + update (both sides)
    must equal the from-scratch (count, sum dl) reduce over the
    post-change corpus."""
    from delta_go_spark.functions.textops import (
        corpus_stats_signsum,
        doc_lengths,
    )

    v0 = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, "f g h i")], DOC_SCHEMA
    )
    stats0 = doc_lengths(v0).agg(
        F.count(F.lit(1)).alias("_n"), F.sum("dl").alias("_sumdl")
    )
    # doc 2 deleted; doc 3 UPDATED (pre-image on the delete side, new
    # text on the insert side); doc 4 inserted
    new_docs = spark.createDataFrame(
        [(3, "f g"), (4, "j k l m n")], DOC_SCHEMA
    )
    deleted_docs = spark.createDataFrame(
        [(2, "d e"), (3, "f g h i")], DOC_SCHEMA
    )
    got = corpus_stats_signsum(stats0, new_docs, deleted_docs).first()
    live = spark.createDataFrame(
        [(1, "a b c"), (3, "f g"), (4, "j k l m n")], DOC_SCHEMA
    )
    want = doc_lengths(live).agg(
        F.count(F.lit(1)).alias("_n"), F.sum("dl").alias("_sumdl")
    ).first()
    assert (got["_n"], got["_sumdl"]) == (want["_n"], want["_sumdl"])
    assert (got["_n"], got["_sumdl"]) == (3, 3 + 2 + 5)


def test_corpus_stats_signsum_empty_batch_is_identity(spark):
    from delta_go_spark.functions.textops import (
        corpus_stats_signsum,
        doc_lengths,
    )

    v0 = spark.createDataFrame([(1, "a b c")], DOC_SCHEMA)
    stats0 = doc_lengths(v0).agg(
        F.count(F.lit(1)).alias("_n"), F.sum("dl").alias("_sumdl")
    )
    empty = spark.createDataFrame([], DOC_SCHEMA)
    got = corpus_stats_signsum(stats0, empty, empty).first()
    assert (got["_n"], got["_sumdl"]) == (1, 3)


def test_bm25_stats_path_equals_reduce_path(spark):
    """Serving avgdl from the maintained 1-row stats table must be
    bit-for-bit the reduce over doclens — the zero-corpus-work query
    path returns the same ranking it replaced."""
    from delta_go_spark.functions.textops import (
        bm25_rank_from_state,
        doc_lengths,
        index_from_postings,
        token_postings,
    )
    from delta_go_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(200)
    postings = token_postings(docs).localCheckpoint()
    doclens = doc_lengths(docs).localCheckpoint()
    index = index_from_postings(postings, min_df=1)
    stats = doclens.agg(
        F.count(F.lit(1)).alias("_n"), F.sum("dl").alias("_sumdl")
    )
    terms = ["dup", "vector", "key"]
    via_stats = bm25_rank_from_state(
        postings, doclens, index, terms, k=20, stats=stats
    ).collect()
    via_reduce = bm25_rank_from_state(
        postings, doclens, index, terms, k=20
    ).collect()
    assert [tuple(r) for r in via_stats] == [tuple(r) for r in via_reduce]
    assert len(via_stats) == 20


# ---------------------------------------------------------------------------
# ndv_incremental — exact delete-capable distinct counts


def test_ndv_incremental_crossings_both_directions(spark):
    """The two cases no sketch can serve: deleting a value's LAST row
    must decrement n_distinct (leaving), inserting a never-seen value
    must increment it (entering); an update that keeps the value set
    changes nothing; a surviving duplicate keeps its value counted."""
    from delta_go_spark.operators.coverage import (
        ndv_incremental,
        value_frequencies,
    )

    schema = "doc_id long, lang string, src string"
    v0 = spark.createDataFrame(
        [(1, "en", "web"), (2, "en", "web"), (3, "fr", "web"), (4, "de", "pdf")],
        schema,
    )
    cols = ["lang", "src"]
    freq0 = value_frequencies(v0, cols).localCheckpoint()
    ndv0 = freq0.groupBy("column_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct")
    ).localCheckpoint()
    # delete doc 3 (fr's LAST row -> lang leaves) and doc 4 (de's last,
    # pdf's last -> both leave); insert doc 5 with a NEW lang and doc 6
    # duplicating en (no entering)
    new_rows = spark.createDataFrame(
        [(5, "ja", "web"), (6, "en", "web")], schema
    )
    deleted_rows = spark.createDataFrame(
        [(3, "fr", "web"), (4, "de", "pdf")], schema
    )
    got = {
        r["column_name"]: r["n_distinct"]
        for r in ndv_incremental(
            spark, freq0, ndv0, new_rows, deleted_rows, cols
        ).collect()
    }
    # lang: {en, fr, de} -> {en, ja} = 2; src: {web, pdf} -> {web} = 1
    assert got == {"lang": 2, "src": 1}


def test_ndv_incremental_empty_batch_and_null_values(spark):
    """Empty batch = identity; NULLs never count (the count(DISTINCT)
    contract), so inserting a NULL changes nothing."""
    from delta_go_spark.operators.coverage import (
        ndv_incremental,
        value_frequencies,
    )

    schema = "doc_id long, lang string, src string"
    v0 = spark.createDataFrame([(1, "en", "web"), (2, None, "web")], schema)
    cols = ["lang", "src"]
    freq0 = value_frequencies(v0, cols).localCheckpoint()
    ndv0 = freq0.groupBy("column_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct")
    ).localCheckpoint()
    empty = spark.createDataFrame([], schema)
    got = {
        r["column_name"]: r["n_distinct"]
        for r in ndv_incremental(
            spark, freq0, ndv0, empty, empty, cols
        ).collect()
    }
    assert got == {"lang": 1, "src": 1}
    nullins = spark.createDataFrame([(9, None, "web")], schema)
    got2 = {
        r["column_name"]: r["n_distinct"]
        for r in ndv_incremental(
            spark, freq0, ndv0, nullins, empty, cols
        ).collect()
    }
    assert got2 == {"lang": 1, "src": 1}  # NULL lang never enters


def test_ndv_incremental_all_null_column_emits_zero(spark):
    """A requested column with zero non-null values anywhere (no state
    row, no batch row) must still emit n_distinct = 0 — the oracle
    pattern produces one SELECT per column, so a missing row would be
    a row-count mismatch, not just a wrong number."""
    from delta_go_spark.operators.coverage import (
        ndv_incremental,
        value_frequencies,
    )

    schema = "doc_id long, lang string, src string"
    v0 = spark.createDataFrame([(1, "en", None), (2, "fr", None)], schema)
    cols = ["lang", "src"]
    freq0 = value_frequencies(v0, cols).localCheckpoint()
    ndv0 = freq0.groupBy("column_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct")
    ).localCheckpoint()
    empty = spark.createDataFrame([], schema)
    got = {
        r["column_name"]: r["n_distinct"]
        for r in ndv_incremental(
            spark, freq0, ndv0, empty, empty, cols
        ).collect()
    }
    assert got == {"lang": 2, "src": 0}  # src row present, zero


def test_ndv_incremental_registry_nonvacuous(spark):
    """Fixture-level non-vacuity: the v1 append must introduce at least
    one ENTERING n_chars value and the v2 delete at least one LEAVING
    one, so the registry row actually exercises both crossings."""
    from delta_go_spark.operators.coverage import (
        _PROFILE_COLS,
        ndv_incremental_docs,
        value_frequencies,
    )
    from delta_go_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    max_id = docs.agg(F.max("doc_id")).first()[0]
    v0 = docs.filter(F.col("doc_id") % 5 != 0)
    live = docs.filter(
        (F.col("doc_id") % 7 != 0) & (F.col("doc_id") != max_id)
    )
    f0 = value_frequencies(v0, ["n_chars"]).select("val")
    flive = value_frequencies(live, ["n_chars"]).select("val")
    assert flive.join(f0, "val", "left_anti").count() > 0  # entering
    assert f0.join(flive, "val", "left_anti").count() > 0  # leaving
    got = {
        r["column_name"]: r["n_distinct"]
        for r in ndv_incremental_docs(spark, SF_DIR).collect()
    }
    want = {
        c: live.filter(F.col(c).isNotNull()).select(c).distinct().count()
        for c in _PROFILE_COLS
    }
    assert got == want


# ---------------------------------------------------------------------------
# equidepth_from_frequencies — the histogram served from frequency state


def test_equidepth_from_frequencies_equals_corpus_ranking(spark):
    """Bucket counts and value bounds derived from (value, frequency)
    interval overlaps must equal ranking the expanded corpus — including
    a heavy value whose rank block SPANS multiple buckets and buckets
    whose boundary falls inside a value block."""
    from delta_go_spark.operators.coverage import (
        equidepth_from_frequencies,
        equidepth_histogram,
    )

    rows = [(i, v) for i, v in enumerate([1] * 7 + [2] * 1 + [3] * 5 + [9] * 3)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    freq = df.groupBy(F.col("n_chars").alias("val")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    got = [
        (r["bucket"], r["n_rows"], r["min_val"], r["max_val"])
        for r in equidepth_from_frequencies(freq, buckets=4).collect()
    ]
    want = [
        (r["bucket"], r["n_rows"], r["min_val"], r["max_val"])
        for r in equidepth_histogram(df, "n_chars", "doc_id", buckets=4)
        .drop("id_checksum")
        .collect()
    ]
    assert got == want
    assert sum(r[1] for r in got) == 16  # every row landed exactly once


def test_equidepth_from_frequencies_empty_state(spark):
    from delta_go_spark.operators.coverage import equidepth_from_frequencies

    freq = spark.createDataFrame([], "val long, cnt long")
    assert equidepth_from_frequencies(freq).collect() == []


def test_equidepth_from_frequencies_value_spanning_all_buckets(spark):
    """One value holding most of the mass spans every bucket — the
    degenerate skew case a histogram must survive (each bucket reports
    the same value as both bounds)."""
    from delta_go_spark.operators.coverage import equidepth_from_frequencies

    freq = spark.createDataFrame(
        [(5, 100), (7, 1)], "val long, cnt long"
    )
    got = {
        r["bucket"]: (r["n_rows"], r["min_val"], r["max_val"])
        for r in equidepth_from_frequencies(freq, buckets=4).collect()
    }
    assert sum(v[0] for v in got.values()) == 101
    assert got[0][1] == 5 and got[0][2] == 5  # low buckets pure 5
    assert got[3][2] == 7  # the tail value lands in the last bucket


# ---------------------------------------------------------------------------
# snapshot_diff — duplicate-key guard


def test_snapshot_diff_duplicate_key_raises(spark, tmp_path):
    """Non-unique key_cols fan out the full-outer diff join and silently
    misclassify rows as 'updated' — the guard must refuse loudly,
    naming the offending key (MERGE NULL-key guard house style)."""
    from delta_go_spark.cdf import snapshot_diff
    from delta_go_spark.snapshot import DeltaError
    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "dup")
    t = DeltaTable.create(
        spark,
        path,
        # one file: the duplicate key must land in a CHANGED file for the
        # guard to see it (the guard deliberately probes only changed
        # rows — an untouched-file dup is invisible to the diff too)
        spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "c")], "k long, v string"
        ).coalesce(1),
    )
    t.update_where("k = 2", {"v": F.lit("c2")})
    with pytest.raises(DeltaError, match=r"k=1.*duplicated|duplicated"):
        snapshot_diff(spark, path, 0, 1, ["k"]).collect()


# ---------------------------------------------------------------------------
# MERGE candidate pruning — the source key range skips non-overlapping files


def _range_table(spark, path):
    # 8 range files: at or above _MERGE_PRUNE_MIN_FILES, so the pruning
    # path (not the small-target bypass) is what these tests exercise
    from delta_go_spark.table import DeltaTable

    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    DeltaTable.create(spark, path, df.repartitionByRange(8, "k"))


def test_merge_candidate_pruning_skips_nonoverlapping_files(spark, tmp_path):
    """A keyed MERGE must read only files whose key range can intersect
    the source's [min, max] — on a range-clustered 100 TB target a small
    upsert batch reads the overlapping files, never the table."""
    from delta_go_spark.dml import DeltaDml
    from delta_go_spark.log import DeltaLog
    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "mp")
    _range_table(spark, path)
    snap = DeltaLog.for_table(path).update()
    assert len(snap.all_files()) == 8
    src = spark.createDataFrame([(90, 1), (95, 2)], "k long, v long")
    dml = DeltaDml(spark, path)
    pruned = dml._merge_candidates(snap, src, "k")
    assert 1 <= len(pruned) <= 2, [a.path for a in pruned]
    # and the merge stays correct through the pruned read
    dml.merge(src, on="k", update_set={"v": F.col("_s_v")})
    got = {
        r["k"]: r["v"]
        for r in DeltaTable.for_path(spark, path).to_df().collect()
    }
    assert got[90] == 1 and got[95] == 2
    assert got[0] == 0 and len(got) == 100  # untouched rows intact


def test_merge_pruning_insert_outside_every_file_range(spark, tmp_path):
    """Source keys beyond every file's range prune ALL candidates — no
    key can match, so nothing is read and the rows simply insert."""
    from delta_go_spark.dml import DeltaDml
    from delta_go_spark.log import DeltaLog
    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "mpi")
    _range_table(spark, path)
    snap = DeltaLog.for_table(path).update()
    src = spark.createDataFrame([(200, 7), (201, 8)], "k long, v long")
    dml = DeltaDml(spark, path)
    assert dml._merge_candidates(snap, src, "k") == []
    dml.merge(src, on="k", update_set={"v": F.col("_s_v")})
    got = {
        r["k"]: r["v"]
        for r in DeltaTable.for_path(spark, path).to_df().collect()
    }
    assert got[200] == 7 and got[201] == 8 and len(got) == 102


def test_merge_pruning_mixed_update_and_insert(spark, tmp_path):
    """A source spanning one file's range plus fresh keys updates the
    matched row and inserts the rest, reading only the overlapping
    file(s)."""
    from delta_go_spark.dml import DeltaDml
    from delta_go_spark.log import DeltaLog
    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "mpm")
    _range_table(spark, path)
    snap = DeltaLog.for_table(path).update()
    src = spark.createDataFrame([(99, 1), (150, 2)], "k long, v long")
    dml = DeltaDml(spark, path)
    pruned = dml._merge_candidates(snap, src, "k")
    assert 1 <= len(pruned) <= 2  # the top range file; 100..150 matches none
    dml.merge(src, on="k", update_set={"v": F.col("_s_v")})
    got = {
        r["k"]: r["v"]
        for r in DeltaTable.for_path(spark, path).to_df().collect()
    }
    assert got[99] == 1 and got[150] == 2 and got[50] == 100
    assert len(got) == 101


def test_merge_pruning_empty_source_reads_nothing(spark, tmp_path):
    from delta_go_spark.dml import DeltaDml
    from delta_go_spark.log import DeltaLog

    path = str(tmp_path / "mpe")
    _range_table(spark, path)
    snap = DeltaLog.for_table(path).update()
    src = spark.createDataFrame([], "k long, v long")
    assert DeltaDml(spark, path)._merge_candidates(snap, src, "k") == []


def test_merge_pruning_inlist_beats_range_for_scattered_keys(spark, tmp_path):
    """Keys {5, 95} span almost the whole [min, max] range — range
    pruning would keep every file between them; the In-list keeps only
    the two files that can actually HOLD a source key."""
    from delta_go_spark.dml import DeltaDml
    from delta_go_spark.log import DeltaLog
    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "mpil")
    _range_table(spark, path)
    snap = DeltaLog.for_table(path).update()
    src = spark.createDataFrame([(5, 1), (95, 2)], "k long, v long")
    dml = DeltaDml(spark, path)
    pruned = dml._merge_candidates(snap, src, "k")
    assert len(pruned) == 2, [a.path for a in pruned]  # not ~8
    dml.merge(src, on="k", update_set={"v": F.col("_s_v")})
    got = {
        r["k"]: r["v"]
        for r in DeltaTable.for_path(spark, path).to_df().collect()
    }
    assert got[5] == 1 and got[95] == 2 and got[50] == 100
    assert len(got) == 100


def test_merge_pruning_inlist_null_keys_filtered_before_limit(spark, tmp_path):
    """NULL keys must filter BEFORE the overflow-detection limit (a NULL
    occupying the slot could let a real key drop from the In-list — the
    lost-update class), and a NULL-key source row must still insert
    under allow_null_keys while the real keys prune and match."""
    from delta_go_spark.dml import DeltaDml
    from delta_go_spark.log import DeltaLog
    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "mpnull")
    _range_table(spark, path)
    snap = DeltaLog.for_table(path).update()
    src = spark.createDataFrame(
        [(5, 1), (95, 2), (None, 3)], "k long, v long"
    )
    dml = DeltaDml(spark, path)
    pruned = dml._merge_candidates(snap, src, "k")
    assert len(pruned) == 2  # the NULL never widens or narrows the list
    dml.merge(
        src, on="k", update_set={"v": F.col("_s_v")}, allow_null_keys=True
    )
    rows = DeltaTable.for_path(spark, path).to_df().collect()
    got = {r["k"]: r["v"] for r in rows if r["k"] is not None}
    assert got[5] == 1 and got[95] == 2 and got[50] == 100
    assert sum(1 for r in rows if r["k"] is None) == 1  # NULL row inserted


def test_merge_pruning_gated_off_for_small_targets(spark, tmp_path):
    """The bounds probe re-evaluates the SOURCE plan (one extra job) —
    below _MERGE_PRUNE_MIN_FILES active files there is nothing worth
    skipping, so the source must never be touched (the fixture-scale
    streaming committers pay zero for the feature)."""
    from delta_go_spark.dml import DeltaDml
    from delta_go_spark.log import DeltaLog
    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "mpg")
    DeltaTable.create(
        spark,
        path,
        spark.range(10).select(F.col("id").alias("k")).coalesce(2),
    )
    snap = DeltaLog.for_table(path).update()
    assert len(snap.all_files()) == 2

    class _Boom:
        def agg(self, *a, **k):
            raise AssertionError("source evaluated despite small target")

    got = DeltaDml(spark, path)._merge_candidates(snap, _Boom(), "k")
    assert len(got) == 2  # all candidates, no source job


def test_merge_pruning_nan_key_bails_to_unpruned(spark, tmp_path):
    """A float-key source containing NaN must NOT prune: Spark orders
    NaN greatest, so max(on) = NaN and every `mn <= NaN` stats check is
    provably-false — range pruning would drop ALL candidates, lose the
    matched update, and re-insert its key as a duplicate.  The NaN bail
    falls back to the full candidate set and the merge stays correct."""
    import math

    from delta_go_spark.dml import DeltaDml
    from delta_go_spark.log import DeltaLog
    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "mpnan")
    df = spark.range(100).select(
        F.col("id").cast("double").alias("k"), (F.col("id") * 2).alias("v")
    )
    DeltaTable.create(spark, path, df.repartitionByRange(8, "k"))
    snap = DeltaLog.for_table(path).update()
    src = spark.createDataFrame(
        [(5.0, 111), (float("nan"), 222)], "k double, v long"
    )
    dml = DeltaDml(spark, path)
    assert len(dml._merge_candidates(snap, src, "k")) == 8  # bail, not []
    dml.merge(src, on="k", update_set={"v": F.col("_s_v")})
    rows = DeltaTable.for_path(spark, path).to_df().collect()
    fives = [r for r in rows if r["k"] == 5.0]
    assert len(fives) == 1 and fives[0]["v"] == 111  # updated, no dup
    assert sum(1 for r in rows if math.isnan(r["k"])) == 1  # NaN inserted


def test_snapshot_diff_guard_survives_side_named_key(spark, tmp_path):
    """A table legitimately keyed `_side` / `_n` must not break or bias
    the duplicate-key probe (helper names lengthen until collision-free,
    the MERGE staging-prefix rule)."""
    from delta_go_spark.cdf import snapshot_diff
    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "sdcol")
    t = DeltaTable.create(
        spark,
        path,
        spark.createDataFrame(
            [(1, 10, "a"), (2, 20, "b")], "_side long, _n long, v string"
        ),
    )
    t.delete_where("_side = 2")
    got = snapshot_diff(spark, path, 0, 1, ["_side", "_n"]).collect()
    assert [(r["_side"], r["change"]) for r in got] == [(2, "deleted")]


def test_snapshot_diff_unique_keys_still_pass_guard(spark, tmp_path):
    from delta_go_spark.cdf import snapshot_diff
    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "uniq")
    t = DeltaTable.create(
        spark,
        path,
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
    )
    t.delete_where("k = 2")
    got = snapshot_diff(spark, path, 0, 1, ["k"]).collect()
    assert [(r["k"], r["change"]) for r in got] == [(2, "deleted")]
