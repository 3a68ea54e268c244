"""Copy-on-write DML: DELETE / UPDATE / MERGE / TRUNCATE semantics +
file-level efficiency (untouched files must survive, not be rewritten)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from delta_go_spark import ops
from delta_go_spark.expressions import Column, EqualTo, GreaterThanOrEq, Literal
from delta_go_spark.log import DeltaLog
from delta_go_spark.table import DeltaTable


def _make_table(spark, tmp_path, name="t"):
    """Four appended files with disjoint k-ranges [0,100) ... [3000,3100)."""
    path = str(tmp_path / name)
    for lo in (0, 1000, 2000, 3000):
        df = spark.range(lo, lo + 100).select(
            F.col("id").alias("k"), (F.col("id") % 5).cast("long").alias("v")
        )
        t = DeltaTable.for_path(spark, path)
        if lo == 0:
            DeltaTable.create(spark, path, df)
        else:
            t.append(df)
    return DeltaTable.for_path(spark, path)


def test_delete_rewrites_only_touched_files(spark, tmp_path):
    t = _make_table(spark, tmp_path, "tdel")
    before = {a.path for a in t.log.update().all_files()}
    t.delete(
        GreaterThanOrEq(Column("k", LongType()), Literal(3000))
    )
    snap = t.log.update()
    after = {a.path for a in snap.all_files()}
    # files covering k<3000 survive byte-identical (same path, no rewrite)
    untouched = {p for p in before if p in after}
    assert len(untouched) >= 3
    rows = sorted(r["k"] for r in t.to_df().collect())
    assert rows == [*range(0, 100), *range(1000, 1100), *range(2000, 2100)]
    assert t.log.commit_info_at(snap.version).operation == ops.DELETE


def test_delete_point_predicate(spark, tmp_path):
    t = _make_table(spark, tmp_path, "tdel2")
    t.delete(EqualTo(Column("k", LongType()), Literal(1050)))
    rows = {r["k"] for r in t.to_df().collect()}
    assert 1050 not in rows
    assert len(rows) == 399


def test_delete_no_matches_is_noop_commit(spark, tmp_path):
    t = _make_table(spark, tmp_path, "tdel3")
    n_before = t.log.update().num_of_files()
    t.delete(EqualTo(Column("k", LongType()), Literal(999_999)))
    assert t.log.update().num_of_files() == n_before
    assert t.to_df().count() == 400


def test_update_assignments(spark, tmp_path):
    t = _make_table(spark, tmp_path, "tupd")
    t.update(
        EqualTo(Column("k", LongType()), Literal(2001)),
        {"v": F.lit(777).cast("long")},
    )
    got = {r["k"]: r["v"] for r in t.to_df().collect()}
    assert got[2001] == 777
    assert got[2002] == 2002 % 5  # same file, untouched row keeps its value
    assert got[0] == 0  # untouched file
    assert len(got) == 400
    snap = t.log.update()
    assert t.log.commit_info_at(snap.version).operation == ops.UPDATE


def test_merge_upsert(spark, tmp_path):
    t = _make_table(spark, tmp_path, "tmrg")
    source = spark.createDataFrame(
        [(50, 111), (1050, 222), (9999, 333)], "k long, v long"
    )
    t.merge(source, on="k", update_set={"v": F.col("_s_v")})
    got = {r["k"]: r["v"] for r in t.to_df().collect()}
    assert got[50] == 111 and got[1050] == 222  # matched -> updated
    assert got[9999] == 333  # not matched -> inserted
    assert len(got) == 401
    snap = t.log.update()
    assert t.log.commit_info_at(snap.version).operation == ops.MERGE


def test_merge_update_set_reads_preimage(spark, tmp_path):
    """ANSI MERGE: every SET expression sees the PRE-update row.  A swap
    (v := w, w := v) only works under pre-image semantics — sequential
    assignment would yield v == w.  This guards the staged-temp-column
    evaluation in DeltaDml.merge (a conditional last-wins upsert whose
    condition compares _s_ts > ts broke exactly here: ts updated first,
    every later column judged against the NEW ts)."""
    path = str(tmp_path / "tswap")
    df = spark.createDataFrame([(1, 10, 20), (2, 30, 40)], "k long, v long, w long")
    t = DeltaTable.create(spark, path, df)
    source = spark.createDataFrame([(1,)], "k long")
    t.merge(
        source,
        on="k",
        update_set={"v": F.col("w"), "w": F.col("v")},
        insert_not_matched=False,
    )
    got = {r["k"]: (r["v"], r["w"]) for r in t.to_df().collect()}
    assert got[1] == (20, 10)  # swapped, not clobbered
    assert got[2] == (30, 40)  # unmatched row untouched


def test_merge_conditional_last_wins(spark, tmp_path):
    """The CDC-apply guard: a source row older than the target row must NOT
    overwrite it; a newer one must.  Both merges run through the same
    condition referencing the target's pre-update timestamp."""
    path = str(tmp_path / "tlww")
    df = spark.createDataFrame([(1, 100, 7)], "k long, ts long, payload long")
    t = DeltaTable.create(spark, path, df)

    def apply(ts, payload):
        src = spark.createDataFrame([(1, ts, payload)], "k long, ts long, payload long")
        newer = F.col("_s_ts") > F.col("ts")
        t.merge(
            src,
            on="k",
            update_set={
                "ts": F.when(newer, F.col("_s_ts")).otherwise(F.col("ts")),
                "payload": F.when(newer, F.col("_s_payload")).otherwise(
                    F.col("payload")
                ),
            },
            insert_not_matched=False,
        )

    apply(50, 999)  # older: no-op
    got = t.to_df().collect()[0]
    assert (got["ts"], got["payload"]) == (100, 7)
    apply(200, 111)  # newer: wins
    got = t.to_df().collect()[0]
    assert (got["ts"], got["payload"]) == (200, 111)


def test_merge_delete_matched(spark, tmp_path):
    t = _make_table(spark, tmp_path, "tmrg2")
    source = spark.createDataFrame([(0,), (2050,)], "k long")
    t.merge(source, on="k", delete_matched=True, insert_not_matched=False)
    rows = {r["k"] for r in t.to_df().collect()}
    assert 0 not in rows and 2050 not in rows
    assert len(rows) == 398


def test_truncate_keeps_schema(spark, tmp_path):
    t = _make_table(spark, tmp_path, "ttrunc")
    t.truncate()
    snap = t.log.update()
    assert snap.num_of_files() == 0
    assert t.to_df().count() == 0
    assert [f.name for f in snap.metadata().schema().fields] == ["k", "v"]
    assert t.log.commit_info_at(snap.version).operation == ops.TRUNCATE
    # table still writable after truncate
    t.append(spark.range(5).select(F.col("id").alias("k"), F.col("id").alias("v")))
    assert t.to_df().count() == 5


def test_dml_on_partitioned_table(spark, tmp_path):
    path = str(tmp_path / "tpart")
    df = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("long").alias("p")
    )
    DeltaTable.create(spark, path, df, partition_by=["p"])
    t = DeltaTable.for_path(spark, path)
    t.delete(EqualTo(Column("p", LongType()), Literal(3)))
    out = t.to_df()
    assert out.count() == 150
    assert {r["p"] for r in out.select("p").distinct().collect()} == {0, 1, 2}
    # partition layout survived the rewrite commit
    assert DeltaLog.for_table(path).update().metadata().partition_columns == ["p"]


def test_vacuum_removes_rewritten_files(spark, tmp_path):
    from delta_go_spark.vacuum import vacuum

    t = _make_table(spark, tmp_path, "tvac")
    before_disk = set()
    for root, _d, files in __import__("os").walk(t.log.table_path):
        if "_delta_log" in root:
            continue
        before_disk.update(f for f in files if f.endswith(".parquet"))
    t.delete(GreaterThanOrEq(Column("k", LongType()), Literal(3000)))
    # retention 0 => freshly-tombstoned files are deletable immediately
    would = vacuum(t.log.table_path, retention_millis=0, dry_run=True)
    assert would, "dry run should find the rewritten file(s)"
    deleted = vacuum(t.log.table_path, retention_millis=0)
    assert sorted(deleted) == sorted(would)
    # table still reads correctly after physical deletion
    assert t.to_df().count() == 300
    # default retention (1 week) protects fresh tombstones
    t2 = _make_table(spark, tmp_path, "tvac2")
    t2.delete(EqualTo(Column("k", LongType()), Literal(0)))
    assert vacuum(t2.log.table_path, dry_run=True) == []


def test_vacuum_spares_freshly_staged_uncommitted_files(spark, tmp_path):
    """A data file staged by an in-flight (not yet committed) transaction is
    unreferenced by any snapshot but must survive VACUUM: deleting it would
    corrupt the commit that lands a moment later (Delta's mtime retention)."""
    import os
    import time

    from delta_go_spark.vacuum import vacuum

    t = _make_table(spark, tmp_path, "tstage")
    staged = os.path.join(t.log.table_path, "part-staged-uncommitted.parquet")
    # simulate stage_files: bytes land in the table dir before the commit
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"k": [1], "v": [2]}), staged)
    # default retention: fresh unreferenced file is spared
    assert vacuum(t.log.table_path, dry_run=True) == []
    deleted = vacuum(t.log.table_path)
    assert staged not in deleted and os.path.exists(staged)
    # an OLD unreferenced file (mtime past the horizon) is still collected
    old = time.time() - 10 * 24 * 3600
    os.utime(staged, (old, old))
    assert vacuum(t.log.table_path) == [staged]
    assert not os.path.exists(staged)


def test_merge_rejects_duplicate_source_keys(spark, tmp_path):
    """Delta raises only when multiple source rows match one TARGET row; a
    silent run would multiply matched rows.  Duplicate source keys that hit
    no target row, or any duplicates in an insert-only merge, are legal."""
    import pytest

    from delta_go_spark.snapshot import DeltaError

    t = _make_table(spark, tmp_path, "tmrgdup")
    v_before = t.log.update().version
    dup_source = spark.createDataFrame(
        [(50, 111), (50, 222), (9999, 333)], "k long, v long"
    )
    with pytest.raises(DeltaError, match="multiple source rows"):
        t.merge(dup_source, on="k", update_set={"v": F.col("_s_v")})
    # nothing committed, table unchanged
    assert t.log.update().version == v_before
    assert t.to_df().count() == 400

    # duplicates that match NO target row don't trip the matched-clause guard
    miss_dup = spark.createDataFrame(
        [(8888, 1), (8888, 2), (50, 555)], "k long, v long"
    )
    t.merge(miss_dup, on="k", update_set={"v": F.col("_s_v")}, insert_not_matched=False)
    assert t.to_df().filter(F.col("k") == 50).first()["v"] == 555

    # insert-only merge: Delta inserts every not-matched source row, dups included
    t.merge(miss_dup, on="k", update_set=None, insert_not_matched=True)
    assert t.to_df().filter(F.col("k") == 8888).count() == 2


def test_concurrent_disjoint_updates_both_commit(spark, tmp_path):
    """Two UPDATEs racing on DISJOINT partitions: copy-on-write touches
    disjoint file sets, the conflict checker finds no overlap, and the
    loser of the version race retries and lands — both commits succeed
    and both effects are visible (the multi-writer story DML inherits
    from doCommitRetryIteratively)."""
    import threading

    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "tdmlrace")
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b", 0) for i in range(40)],
        "k long, p string, v long",
    )
    DeltaTable.create(spark, path, df, partition_by=["p"])
    v0 = DeltaTable.for_path(spark, path).log.update().version

    errors: list = []

    def run(part: str, val: int) -> None:
        try:
            t = DeltaTable.for_path(spark, path)
            t.update(
                EqualTo(Column("p", StringType()), Literal(part)),
                {"v": F.lit(val).cast("long")},
            )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    from pyspark.sql.types import StringType

    th1 = threading.Thread(target=run, args=("a", 1))
    th2 = threading.Thread(target=run, args=("b", 2))
    th1.start(); th2.start(); th1.join(); th2.join()
    assert not errors, errors

    t = DeltaTable.for_path(spark, path)
    assert t.log.update().version == v0 + 2
    rows = {(r["p"], r["v"]) for r in t.to_df().collect()}
    assert rows == {("a", 1), ("b", 2)}


def test_scd2_merge_exactly_one_current_row_per_key(spark):
    """The SCD2 single-MERGE pattern (delta_queries.delta_scd2_agg): after
    the change batch lands, EVERY key has exactly one current row, changed
    keys carry exactly one closed generation, and the closed generation
    holds the pre-change balance."""
    from delta_go_spark.operators.delta_queries import delta_scd2_agg, _CACHE_ROOT
    import os

    sf_dir = "/root/testdata/sf0.001"
    delta_scd2_agg(spark, sf_dir)  # builds (or reuses) the dimension
    key = sf_dir.strip("/").replace("/", "_")
    path = os.path.join(_CACHE_ROOT, key, "customer_scd2")
    dim = DeltaTable.for_path(spark, path).to_df()

    bad_current = (
        dim.filter(F.col("is_current"))
        .groupBy("c_custkey")
        .count()
        .filter(F.col("count") != 1)
        .count()
    )
    assert bad_current == 0
    closed = dim.filter(~F.col("is_current"))
    assert closed.filter(F.col("c_custkey") % 5 != 0).count() == 0
    assert closed.filter(F.col("valid_to").isNull()).count() == 0
    # the closed generation holds the OLD balance: new - old == 100
    delta_bal = (
        dim.filter(F.col("c_custkey") % 5 == 0)
        .groupBy("c_custkey")
        .agg(
            (F.max(F.when(F.col("is_current"), F.col("c_acctbal")))
             - F.max(F.when(~F.col("is_current"), F.col("c_acctbal"))))
            .alias("d")
        )
        .filter(F.round(F.col("d"), 2) != 100.0)
        .count()
    )
    assert delta_bal == 0


def test_scd2_merge_batch_repeatable_across_batches(spark, tmp_path):
    """The reusable SCD2 recipe (scd2_merge_batch) must be STATELESS
    repeatable: batch 2 with the identical recipe closes batch 1's current
    generations (not the already-closed ones), a key changed twice carries
    two closed generations with the right epochs, a brand-new key inserts
    exactly one current row, and the mk invariant (current mk = natural
    key, closed mk = NULL) holds after every batch."""
    from delta_go_spark.operators.delta_queries import scd2_merge_batch

    path = str(tmp_path / "scd2")
    dim0 = spark.range(0, 10).select(
        F.col("id").alias("mk"),
        F.col("id").alias("k"),
        (F.col("id") * 10.0).alias("bal"),
        F.lit(0).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    DeltaTable.create(spark, path, dim0)
    t = DeltaTable.for_path(spark, path)

    # batch 1: +100 on keys % 5 == 0 (keys 0, 5)
    b1 = spark.range(0, 10).filter(F.col("id") % 5 == 0).select(
        F.col("id").alias("k"), (F.col("id") * 10.0 + 100.0).alias("bal")
    )
    scd2_merge_batch(t, b1, "k", epoch=1)
    # batch 2, identical recipe: +50 on keys % 2 == 0 (0,2,4,6,8 — key 0
    # changes a SECOND time) plus brand-new key 100
    b2 = (
        spark.range(0, 10)
        .filter(F.col("id") % 2 == 0)
        .select(F.col("id").alias("k"), (F.col("id") * 10.0 + 50.0).alias("bal"))
        .unionByName(
            spark.range(100, 101).select(
                F.col("id").alias("k"), F.lit(999.0).alias("bal")
            )
        )
    )
    scd2_merge_batch(DeltaTable.for_path(spark, path), b2, "k", epoch=2)

    dim = DeltaTable.for_path(spark, path).to_df()
    cur = dim.filter(F.col("is_current"))
    # exactly one current row per key, including the new key 100
    assert cur.count() == 11
    assert cur.groupBy("k").count().filter(F.col("count") != 1).count() == 0
    # mk invariant: current mk = natural key, closed mk = NULL
    assert cur.filter(F.col("mk") != F.col("k")).count() == 0
    closed = dim.filter(~F.col("is_current"))
    assert closed.filter(F.col("mk").isNotNull()).count() == 0
    # key 0 changed twice: generations closed at epochs 1 and 2
    k0 = {r["valid_to"] for r in closed.filter(F.col("k") == 0).collect()}
    assert k0 == {1, 2}
    # current balances: batch 2 wins where it applies, batch 1 where not
    bal = {r["k"]: r["bal"] for r in cur.collect()}
    assert bal[0] == 50.0 and bal[2] == 70.0 and bal[5] == 150.0
    assert bal[1] == 10.0 and bal[100] == 999.0
    # closed-generation count: key 0 twice, 2/4/6/8 and 5 once, others zero
    n_closed = {r["k"]: r["count"] for r in closed.groupBy("k").count().collect()}
    assert n_closed == {0: 2, 2: 1, 4: 1, 5: 1, 6: 1, 8: 1}


def test_merge_insert_set_validation(spark, tmp_path):
    """insert_set rejects unknown and generated target columns, and
    requires the insert clause to be enabled."""
    import pytest

    path = str(tmp_path / "ins")
    df = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") * 2).cast("long").alias("v")
    )
    DeltaTable.create(spark, path, df, generated={"g": "k + v"})
    t = DeltaTable.for_path(spark, path)
    src = spark.range(100, 103).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("v")
    )
    with pytest.raises(ValueError, match="unknown columns"):
        t.merge(src, on="k", insert_set={"nope": F.lit(1)})
    with pytest.raises(ValueError, match="generated columns"):
        t.merge(src, on="k", insert_set={"g": F.lit(1)})
    with pytest.raises(ValueError, match="insert_not_matched"):
        t.merge(
            src, on="k", insert_not_matched=False, insert_set={"v": F.lit(1)}
        )
    # the happy path: inserted rows take the override, generated col follows
    t.merge(src, on="k", insert_set={"v": F.col("k") * 10})
    got = {
        r["k"]: (r["v"], r["g"])
        for r in t.to_df().filter(F.col("k") >= 100).collect()
    }
    assert got == {100: (1000, 1100), 101: (1010, 1111), 102: (1020, 1122)}


def test_scd2_merge_batch_rejects_negative_or_null_keys(spark, tmp_path):
    """-key-1 is only a guaranteed merge miss for keys >= 0: a negative
    natural key's surrogate collides with an unrelated key's mk and the
    MERGE would silently close the wrong row — the recipe must refuse
    loudly instead."""
    from delta_go_spark.operators.delta_queries import scd2_merge_batch

    path = str(tmp_path / "scd2neg")
    dim0 = spark.range(0, 4).select(
        F.col("id").alias("mk"),
        F.col("id").alias("k"),
        (F.col("id") * 10.0).alias("bal"),
        F.lit(0).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    DeltaTable.create(spark, path, dim0)
    t = DeltaTable.for_path(spark, path)

    bad = spark.createDataFrame([(-3, 1.0)], "k long, bal double")
    with pytest.raises(ValueError, match="non-negative"):
        scd2_merge_batch(t, bad, "k", epoch=1)
    null_key = spark.createDataFrame([(None, 1.0)], "k long, bal double")
    with pytest.raises(ValueError, match="non-negative"):
        scd2_merge_batch(t, null_key, "k", epoch=1)
    # dimension untouched by the refused batches
    assert DeltaTable.for_path(spark, path).to_df().count() == 4


def test_merge_refuses_null_source_keys(spark, tmp_path):
    """NULL keys never equi-match: matched clauses would silently skip and
    the insert anti-join would re-insert the row on EVERY replay (the
    streaming-upsert duplicate trap) — the merge must refuse loudly."""
    from delta_go_spark.snapshot import DeltaError

    path = str(tmp_path / "tnull")
    t = DeltaTable.create(
        spark, path, spark.createDataFrame([(1, 10)], "k long, v long")
    )
    bad = spark.createDataFrame([(None, 99), (2, 20)], "k long, v long")
    with pytest.raises(DeltaError, match="NULL"):
        t.merge(bad, on="k", update_set={"v": F.col("_s_v")})
    # table unchanged — the refusal happened before any commit
    assert [(r["k"], r["v"]) for r in t.to_df().collect()] == [(1, 10)]


def test_merge_staging_prefix_avoids_real_u_columns(spark, tmp_path):
    """The ANSI pre-image staging writes `_u_<col>` temp columns; a table
    that legitimately carries an `_u_v` column must survive a merge
    updating `v` with both columns intact (the prefix lengthens until
    collision-free)."""
    path = str(tmp_path / "tuprefix")
    t = DeltaTable.create(
        spark,
        path,
        spark.createDataFrame([(1, 10, 99), (2, 20, 88)], "k long, v long, _u_v long"),
    )
    src = spark.createDataFrame([(1, 11)], "k long, v long")
    t.merge(src, on="k", update_set={"v": F.col("_s_v")}, insert_not_matched=False)
    rows = sorted(tuple(r) for r in t.to_df().collect())
    assert rows == [(1, 11, 99), (2, 20, 88)]


def test_merge_null_keys_allowed_where_no_duplicate_trap(spark, tmp_path):
    """The refusal is scoped to the actual trap (insert path on replay):
    insert_not_matched=False merges skip NULL rows silently (ANSI), and
    allow_null_keys=True restores upstream insert-them-anyway behavior
    for single-shot merges."""
    path = str(tmp_path / "tnull_ok")
    t = DeltaTable.create(
        spark, path, spark.createDataFrame([(1, 10)], "k long, v long")
    )
    bad = spark.createDataFrame([(None, 99), (1, 11)], "k long, v long")
    # update-only merge: NULL row is simply not-matched-and-not-inserted
    t.merge(
        bad, on="k", update_set={"v": F.col("_s_v")}, insert_not_matched=False
    )
    assert [(r["k"], r["v"]) for r in t.to_df().collect()] == [(1, 11)]
    # explicit opt-in: the NULL-key row inserts (upstream ANSI behavior)
    t.merge(bad, on="k", update_set={"v": F.col("_s_v")}, allow_null_keys=True)
    rows = sorted(
        t.to_df().collect(), key=lambda r: (r["k"] is None, r["k"])
    )
    assert [(r["k"], r["v"]) for r in rows] == [(1, 11), (None, 99)]
