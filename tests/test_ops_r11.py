"""Round-11 operator tests: delete handling in the CDF-incremental
maintainers (inverted index, soft-dedup cluster weights) and the CDF
netting helper.

The r10 maintainers consumed insert-only feeds; a deleted doc left stale
postings / cluster weights.  These tests pin the delete semantics the
oracles enforce end-to-end at fixture level:
  * a deleted doc that was a STORED TOP-K WINNER must vanish from the
    re-ranked postings list (displacement-in-reverse);
  * df/cf decrement, min_df re-crossings in BOTH directions;
  * a deleted BRIDGE doc must SPLIT its cluster (only a re-CC over the
    surviving pairs can find the split);
  * insert-then-delete inside one CDF range nets to nothing.
"""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

DOC_SCHEMA = "doc_id long, text string"


# ---------------------------------------------------------------------------
# inverted_index_incremental — deletes


def _build_state(spark, rows):
    from delta_go_spark.functions.textops import (
        index_from_postings,
        token_postings,
    )

    v0 = spark.createDataFrame(rows, DOC_SCHEMA)
    postings0 = token_postings(v0).localCheckpoint()
    index0 = index_from_postings(postings0, min_df=1).localCheckpoint()
    return v0, postings0, index0


def test_inverted_index_delete_removes_stored_topk_winner(spark):
    """The hard case no additive delta can express: doc 1 is the highest-tf
    stored winner for 'hot'; its delete must re-rank the survivors."""
    from delta_go_spark.functions.textops import inverted_index_incremental

    rows = [(i, " ".join(["hot"] * (7 - i))) for i in range(1, 7)]  # tf 6..1
    v0, postings0, index0 = _build_state(spark, rows)
    empty = spark.createDataFrame([], DOC_SCHEMA)
    deleted = spark.createDataFrame([rows[0]], DOC_SCHEMA)  # doc 1, tf=6
    got = {
        r["token"]: r
        for r in inverted_index_incremental(
            index0, postings0, empty, deleted
        ).collect()
    }
    hot = got["hot"]
    assert hot["top_docs"] == "2,3,4,5,6"  # winner gone, survivors re-ranked
    assert hot["df"] == 5
    assert hot["cf"] == sum(range(1, 6))


def test_inverted_index_delete_crosses_min_df_and_drops_tokens(spark):
    from delta_go_spark.functions.textops import inverted_index_incremental

    rows = [
        (1, "fade solo"),
        (2, "fade keep"),
        (3, "fade keep"),
        (4, "keep"),
    ]
    v0, postings0, index0 = _build_state(spark, rows)
    empty = spark.createDataFrame([], DOC_SCHEMA)
    deleted = spark.createDataFrame([rows[0]], DOC_SCHEMA)
    got = {
        r["token"]: r
        for r in inverted_index_incremental(
            index0, postings0, empty, deleted, min_df=3
        ).collect()
    }
    assert "fade" not in got  # df 3 -> 2, fell below min_df
    assert "solo" not in got  # every posting deleted -> token gone
    assert got["keep"]["df"] == 3  # untouched by the delete


def test_inverted_index_insert_plus_delete_equals_batch_rebuild(spark):
    """Mixed batch (inserts AND deletes) must equal a from-scratch build
    over the post-change corpus — the oracle contract, pinned here on a
    hand corpus where the delete and insert touch the SAME token."""
    from delta_go_spark.functions.textops import (
        inverted_index,
        inverted_index_incremental,
    )

    rows = [(i, " ".join(["hot"] * (7 - i)) + " base") for i in range(1, 7)]
    v0, postings0, index0 = _build_state(spark, rows)
    new = spark.createDataFrame([(100, " ".join(["hot"] * 50))], DOC_SCHEMA)
    deleted = spark.createDataFrame([rows[1]], DOC_SCHEMA)  # doc 2
    got = sorted(
        map(
            tuple,
            inverted_index_incremental(
                index0, postings0, new, deleted, min_df=2
            ).collect(),
        )
    )
    survivors = v0.filter(F.col("doc_id") != 2).unionByName(new)
    want = sorted(map(tuple, inverted_index(survivors, min_df=2).collect()))
    assert got == want
    assert len(got) > 0


# ---------------------------------------------------------------------------
# cdf_net_changes — first/last netting semantics


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, _change_type string, _commit_version long"
    )


def test_cdf_net_changes_insert_then_delete_nets_to_nothing(spark):
    from delta_go_spark.functions.textops import cdf_net_changes

    ins, dels = cdf_net_changes(
        _changes(
            spark,
            [
                (1, "new doc", "insert", 1),
                (1, "new doc", "delete", 2),
                (2, "stays", "insert", 1),
                (3, "old doc", "delete", 2),
            ],
        )
    )
    assert {r["doc_id"] for r in ins.collect()} == {2}
    # doc 1's delete side no-ops too: it never entered stored state, and
    # first-change=insert keeps it OFF the delete side
    assert {r["doc_id"] for r in dels.collect()} == {3}


def test_cdf_net_changes_update_appears_on_both_sides(spark):
    """An update stages preimage+postimage in ONE commit: the old text
    must leave stored state, the new text must insert."""
    from delta_go_spark.functions.textops import cdf_net_changes

    ins, dels = cdf_net_changes(
        _changes(
            spark,
            [
                (1, "old text", "update_preimage", 1),
                (1, "new text", "update_postimage", 1),
            ],
        )
    )
    assert [(r["doc_id"], r["text"]) for r in ins.collect()] == [(1, "new text")]
    assert [(r["doc_id"], r["text"]) for r in dels.collect()] == [(1, "old text")]


def test_cdf_net_changes_delete_then_reinsert_hits_both_sides(spark):
    from delta_go_spark.functions.textops import cdf_net_changes

    ins, dels = cdf_net_changes(
        _changes(
            spark,
            [
                (1, "stale", "delete", 1),
                (1, "fresh", "insert", 2),
            ],
        )
    )
    # stale stored rows out, fresh rows in
    assert [(r["doc_id"], r["text"]) for r in ins.collect()] == [(1, "fresh")]
    assert [(r["doc_id"], r["text"]) for r in dels.collect()] == [(1, "stale")]


# ---------------------------------------------------------------------------
# cdf_net_changes — property: for ANY legal per-doc change sequence, the
# netted (inserted, deleted) frames turn the pre-range corpus into the
# post-range corpus under "delete stored rows, then add inserted rows"


def test_cdf_net_changes_property_random_histories(spark):
    """Reference model: replay each doc's chronological change list; the
    doc is deleted iff its first change removes pre-existing state, and
    inserted (with its final text) iff its last change leaves it live.
    8 docs x random histories x 30 seeds, one Spark job per seed-batch
    (histories are concatenated into a single changes frame)."""
    import random

    from delta_go_spark.functions.textops import cdf_net_changes

    INS, DEL, UPD = "insert", "delete", "update"

    def legal_histories(rng, doc, pre_exists):
        """A random legal change sequence for one doc across versions."""
        hist = []
        live = pre_exists
        for v in range(1, rng.randint(1, 5)):
            ops = []
            if live:
                ops = [DEL, UPD, None]
            else:
                ops = [INS, None]
            op = rng.choice(ops)
            if op is None:
                continue
            if op == INS:
                hist.append((doc, f"t{doc}v{v}", "insert", v))
                live = True
            elif op == DEL:
                hist.append((doc, f"t{doc}v{v-1}pre", "delete", v))
                live = False
            else:
                hist.append((doc, f"t{doc}v{v-1}pre", "update_preimage", v))
                hist.append((doc, f"t{doc}v{v}", "update_postimage", v))
        return hist, live

    rng = random.Random(11)
    rows, want_ins, want_del = [], {}, set()
    for doc in range(200):
        pre = doc % 2 == 0
        hist, live_after = legal_histories(rng, doc, pre)
        if not hist:
            continue
        rows.extend(hist)
        first, last = hist[0], hist[-1]
        if pre and first[2] in ("delete", "update_preimage"):
            want_del.add(doc)
        if live_after and last[2] in ("insert", "update_postimage"):
            want_ins[doc] = last[1]
    changes = spark.createDataFrame(
        rows, "doc_id long, text string, _change_type string, _commit_version long"
    )
    ins, dels = cdf_net_changes(changes)
    got_ins = {r["doc_id"]: r["text"] for r in ins.collect()}
    got_del = {r["doc_id"] for r in dels.collect()}
    assert got_ins == want_ins
    assert got_del == want_del


# ---------------------------------------------------------------------------
# softdedup_incremental_update — deletes


def _softdedup_state(spark, pairs):
    from delta_go_spark.functions.dedup import (
        _cluster_sizes,
        connected_components,
    )

    pairs0 = spark.createDataFrame(
        pairs, "doc_id_a long, doc_id_b long"
    ).localCheckpoint()
    labels0 = connected_components(pairs0).localCheckpoint()
    csize0 = _cluster_sizes(labels0).localCheckpoint()
    return pairs0, labels0, csize0


def test_softdedup_delete_of_bridge_doc_splits_cluster(spark):
    """v0 cluster {1,2,3} held together only by bridge doc 2 (pairs 1-2,
    2-3).  Deleting 2 must SPLIT the cluster: 1 and 3 become singletons.
    No size decrement can express this — only the sub-CC re-run can."""
    from delta_go_spark.functions.dedup import softdedup_incremental_update

    pairs0, labels0, csize0 = _softdedup_state(spark, [(1, 2), (2, 3), (8, 9)])
    all_ids = spark.createDataFrame(
        [(1,), (3,), (8,), (9,)], "doc_id long"
    )  # post-delete corpus: doc 2 gone
    empty_pairs = spark.createDataFrame([], "doc_id_a long, doc_id_b long")
    deleted = spark.createDataFrame([(2,)], "doc_id long")
    got = {
        r["doc_id"]: (r["cluster_size"], r["weight_micro"])
        for r in softdedup_incremental_update(
            all_ids, empty_pairs, pairs0, labels0, csize0, deleted_ids=deleted
        ).collect()
    }
    assert got[1] == (1, 1000000)  # split: singleton again
    assert got[3] == (1, 1000000)
    assert got[8] == (2, 500000)  # untouched cluster served from state
    assert got[9] == (2, 500000)
    assert 2 not in got


def test_softdedup_delete_shrinks_cluster_without_split(spark):
    from delta_go_spark.functions.dedup import softdedup_incremental_update

    # triangle {1,2,3}: deleting 3 leaves 1-2 still paired (size 3 -> 2)
    pairs0, labels0, csize0 = _softdedup_state(spark, [(1, 2), (2, 3), (1, 3)])
    all_ids = spark.createDataFrame([(1,), (2,)], "doc_id long")
    empty_pairs = spark.createDataFrame([], "doc_id_a long, doc_id_b long")
    deleted = spark.createDataFrame([(3,)], "doc_id long")
    got = {
        r["doc_id"]: r["cluster_size"]
        for r in softdedup_incremental_update(
            all_ids, empty_pairs, pairs0, labels0, csize0, deleted_ids=deleted
        ).collect()
    }
    assert got == {1: 2, 2: 2}


def test_softdedup_simultaneous_merge_and_delete(spark):
    """One batch both merges (new doc 10 bridges clusters {1,2} and {3,4})
    and deletes (doc 6 leaves {5,6}): the sub-CC must see the merged
    5-cluster while the shrunken {5} falls back to singleton."""
    from delta_go_spark.functions.dedup import softdedup_incremental_update

    pairs0, labels0, csize0 = _softdedup_state(spark, [(1, 2), (3, 4), (5, 6)])
    all_ids = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 5, 10)], "doc_id long"
    )
    inc_pairs = spark.createDataFrame(
        [(1, 10), (3, 10)], "doc_id_a long, doc_id_b long"
    )
    deleted = spark.createDataFrame([(6,)], "doc_id long")
    got = {
        r["doc_id"]: r["cluster_size"]
        for r in softdedup_incremental_update(
            all_ids, inc_pairs, pairs0, labels0, csize0, deleted_ids=deleted
        ).collect()
    }
    assert got == {1: 5, 2: 5, 3: 5, 4: 5, 10: 5, 5: 1}


def test_softdedup_phantom_pair_to_deleted_doc_is_ignored(spark):
    """A band collision between a NEW doc and a doc deleted in the same
    batch must not resurrect the deleted doc's cluster: the update
    anti-joins deleted endpoints out of inc_pairs itself."""
    from delta_go_spark.functions.dedup import softdedup_incremental_update

    pairs0, labels0, csize0 = _softdedup_state(spark, [(1, 2)])
    all_ids = spark.createDataFrame([(2,), (10,)], "doc_id long")
    inc_pairs = spark.createDataFrame(
        [(1, 10)], "doc_id_a long, doc_id_b long"  # phantom: 1 is deleted
    )
    deleted = spark.createDataFrame([(1,)], "doc_id long")
    got = {
        r["doc_id"]: r["cluster_size"]
        for r in softdedup_incremental_update(
            all_ids, inc_pairs, pairs0, labels0, csize0, deleted_ids=deleted
        ).collect()
    }
    assert got == {2: 1, 10: 1}


# ---------------------------------------------------------------------------
# end-to-end: a REAL engine UPDATE flows through the change feed into the
# index maintainer (the hand-built-frame tests above pin cdf_net_changes'
# update semantics; this pins the whole path — dml UPDATE staging pre/post
# images, table_changes surfacing them, the maintainer applying both sides)


def test_update_through_cdf_maintains_index(spark, tmp_path):
    from delta_go_spark import cdf
    from delta_go_spark.functions.textops import (
        cdf_net_changes,
        index_from_postings,
        inverted_index,
        inverted_index_incremental,
        token_postings,
    )
    from delta_go_spark.table import DeltaTable

    rows = [
        (1, "alpha beta gamma"),
        (2, "alpha beta delta"),
        (3, "old old old"),
    ]
    v0 = spark.createDataFrame(rows, DOC_SCHEMA)
    postings0 = token_postings(v0).localCheckpoint()
    index0 = index_from_postings(postings0, min_df=1).localCheckpoint()
    path = str(tmp_path / "tupd")
    t = DeltaTable.create(
        spark, path, v0,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    t.update_where("doc_id = 3", {"text": "alpha new new"})
    new_docs, deleted_docs = cdf_net_changes(
        cdf.table_changes(spark, path, start_version=1)
    )
    got = sorted(
        map(
            tuple,
            inverted_index_incremental(
                index0, postings0, new_docs, deleted_docs, min_df=1
            ).collect(),
        )
    )
    want = sorted(map(tuple, inverted_index(t.to_df(), min_df=1).collect()))
    assert got == want
    gotd = {r[0]: r for r in got}
    assert "old" not in gotd  # pre-image tokens fully retired
    assert gotd["alpha"][1] == 3  # df grew: the post-image joined


# ---------------------------------------------------------------------------
# profile_incremental — CDF-maintained ANALYZE stats with honest deletes


def _profile_state(spark, rows):
    from delta_go_spark.operators.coverage import profile_lite

    df = spark.createDataFrame(rows, "k long, v string")
    return df, profile_lite(df, ["k", "v"]).localCheckpoint()


def test_profile_incremental_sign_sums_and_merges_inserts(spark):
    from delta_go_spark.operators.coverage import profile_incremental

    base, stats0 = _profile_state(
        spark, [(1, "a"), (5, None), (9, "z")]
    )
    new = spark.createDataFrame([(12, "b"), (0, None)], "k long, v string")
    empty = spark.createDataFrame([], "k long, v string")
    live = base.unionByName(new)
    got = {
        r["column_name"]: r
        for r in profile_incremental(
            spark, stats0, new, empty, live, ["k", "v"]
        ).collect()
    }
    assert (got["k"]["n_rows"], got["k"]["n_nulls"]) == (5, 0)
    assert (got["k"]["min_val"], got["k"]["max_val"]) == ("0", "12")
    assert got["v"]["n_nulls"] == 2  # stored 1 + inserted 1
    assert (got["v"]["min_val"], got["v"]["max_val"]) == ("a", "z")


def test_profile_incremental_boundary_delete_rescans(spark):
    """Deleting the row that CARRIES the stored max must trigger the
    column-pruned rescan and find the new max; a non-boundary delete must
    not (min/max served from stored state)."""
    from delta_go_spark.operators.coverage import profile_incremental

    base, stats0 = _profile_state(spark, [(1, "a"), (5, "m"), (9, "z")])
    empty = spark.createDataFrame([], "k long, v string")
    # boundary: k=9 carries max(k) AND 'z' carries max(v)
    dele = spark.createDataFrame([(9, "z")], "k long, v string")
    live = base.filter(F.col("k") != 9)
    got = {
        r["column_name"]: r
        for r in profile_incremental(
            spark, stats0, empty, dele, live, ["k", "v"]
        ).collect()
    }
    assert (got["k"]["n_rows"], got["k"]["max_val"]) == (2, "5")
    assert got["v"]["max_val"] == "m"
    # non-boundary: the middle row leaves extremes intact, no rescan path
    dele2 = spark.createDataFrame([(5, "m")], "k long, v string")
    live2 = base.filter(F.col("k") != 5)
    got2 = {
        r["column_name"]: r
        for r in profile_incremental(
            spark, stats0, empty, dele2, live2, ["k", "v"]
        ).collect()
    }
    assert (got2["k"]["min_val"], got2["k"]["max_val"]) == ("1", "9")
    assert (got2["v"]["min_val"], got2["v"]["max_val"]) == ("a", "z")
    assert got2["k"]["n_rows"] == 2


def test_profile_incremental_matches_batch_rebuild(spark):
    """End-to-end on the real fixture: the maintained stats equal a
    from-scratch profile_lite over the surviving documents."""
    from delta_go_spark.operators.coverage import (
        _PROFILE_COLS,
        profile_incremental_docs,
        profile_lite,
    )
    from delta_go_spark.session import load_table

    got = sorted(map(tuple, profile_incremental_docs(spark, SF_DIR).collect()))
    docs = load_table(spark, SF_DIR, "documents")
    max_id = docs.agg(F.max("doc_id")).first()[0]
    live = docs.filter(
        (F.col("doc_id") % 7 != 0) & (F.col("doc_id") != max_id)
    )
    # r13: profile emits the exact maintained n_distinct as well — build
    # the expectation from profile_lite + a from-scratch distinct count
    ndv = {
        c: live.filter(F.col(c).isNotNull()).select(c).distinct().count()
        for c in _PROFILE_COLS
    }
    want = sorted(
        (r["column_name"], r["n_rows"], r["n_nulls"],
         ndv[r["column_name"]], r["min_val"], r["max_val"])
        for r in profile_lite(live, _PROFILE_COLS).collect()
    )
    assert got == want and len(got) == 5


# ---------------------------------------------------------------------------
# runtime bloom-filter join — the 4th scale-join layout next to
# bucketed/salted/DPP: Spark injects a bloom filter built from the
# selective side into the fact scan of a shuffle join.  It only arms
# past a 10 GB application-side scan, so at test scale the thresholds
# are lowered to prove the MECHANISM fires on this engine's loaders and
# changes nothing about the results.


def test_runtime_bloom_filter_join_fires_and_is_pure(spark):
    from delta_go_spark.session import load_table

    lo = "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    bc = "spark.sql.autoBroadcastJoinThreshold"
    old_lo, old_bc = spark.conf.get(lo), spark.conf.get(bc)
    try:
        spark.conf.set(lo, "0")
        # the injector skips joins it could broadcast (a broadcast join
        # needs no runtime filter) — at 100 TB the dim would be over the
        # threshold naturally; at test scale force the shuffle plan
        spark.conf.set(bc, "-1")
        li = load_table(spark, SF_DIR, "lineitem")
        od = (
            load_table(spark, SF_DIR, "orders")
            .filter(F.col("o_orderstatus") == "P")
            .select("o_orderkey")
        )
        j = li.join(od, li.l_orderkey == od.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan.lower(), plan[:2000]
        n_bloom = j.count()
    finally:
        spark.conf.set(lo, old_lo)
        spark.conf.set(bc, old_bc)
    # the filter is a pure pre-filter: row set identical without it
    li = load_table(spark, SF_DIR, "lineitem")
    od = (
        load_table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select("o_orderkey")
    )
    n_plain = li.join(od, li.l_orderkey == od.o_orderkey).count()
    assert n_bloom == n_plain and n_bloom > 0


# ---------------------------------------------------------------------------
# snapshot_diff — row-level version diff with file-set pruning


def test_snapshot_diff_reads_only_changed_files(spark, tmp_path):
    """The 100 TB property: files present in BOTH snapshots are immutable
    and must never be read.  Partitioned table, update touches only p=1:
    the diff plan's input files must all live under p=1."""
    from delta_go_spark.cdf import snapshot_diff
    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "tsd")
    df = spark.createDataFrame(
        [(i, i % 2, f"text {i}") for i in range(40)], "k long, p long, v string"
    )
    t = DeltaTable.create(spark, path, df, partition_by=["p"])
    t.update_where("p = 1 AND k = 1", {"v": "changed"})
    diff = snapshot_diff(spark, path, 0, 1, ["k"])
    rows = {(r["k"], r["change"], r["old_v"], r["new_v"]) for r in diff.collect()}
    assert rows == {(1, "updated", "text 1", "changed")}
    scanned = diff.inputFiles()
    assert scanned, "diff plan reads no files?"
    assert all("p=1" in f for f in scanned), scanned  # p=0 never read


def test_snapshot_diff_compaction_is_invisible(spark, tmp_path):
    """An OPTIMIZE rewrite (same rows, new files) must produce an EMPTY
    diff — the row-level reconcile drops rows that merely moved files,
    the refinement file-granular Changes cannot make."""
    from delta_go_spark.cdf import snapshot_diff
    from delta_go_spark.maintenance import optimize
    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "tsdc")
    t = DeltaTable.create(
        spark,
        path,
        spark.createDataFrame([(i, f"v{i}") for i in range(10)], "k long, v string"),
    )
    t.append(spark.createDataFrame([(100, "v100")], "k long, v string"))
    optimize(spark, path)
    v_new = t.log.update().version
    assert v_new >= 2
    assert snapshot_diff(spark, path, 1, v_new, ["k"]).count() == 0
    # and against v0 only the appended row surfaces, despite the rewrite
    d0 = snapshot_diff(spark, path, 0, v_new, ["k"]).collect()
    assert [(r["k"], r["change"]) for r in d0] == [(100, "inserted")]


def test_snapshot_diff_delete_and_multi_column_compare(spark, tmp_path):
    from delta_go_spark.cdf import snapshot_diff
    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "tsdd")
    t = DeltaTable.create(
        spark,
        path,
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, v string, w long"
        ),
    )
    t.delete_where("k = 2")
    t.update_where("k = 3", {"w": 31})
    got = {
        r["k"]: (r["change"], r["old_v"], r["new_v"], r["old_w"], r["new_w"])
        for r in snapshot_diff(spark, path, 0, 2, ["k"]).collect()
    }
    assert got == {
        2: ("deleted", "b", None, 20, None),
        3: ("updated", "c", "c", 30, 31),
    }


# ---------------------------------------------------------------------------
# IndexMaintainer — stream-maintained index state across RESTARTS and
# replayed micro-batches


def _maintainer_fixture(spark, tmp_path):
    from delta_go_spark.functions.textops import (
        index_from_postings,
        token_postings,
    )
    from delta_go_spark.streaming.windows import IndexMaintainer
    from delta_go_spark.table import DeltaTable

    v0 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma"), (3, "beta gamma")],
        DOC_SCHEMA,
    )
    root = str(tmp_path / "m")
    p0, i0 = root + "/p0", root + "/i0"
    token_postings(v0).write.parquet(p0)
    index_from_postings(spark.read.parquet(p0), min_df=1).write.parquet(i0)
    tbl = root + "/docs"
    t = DeltaTable.create(
        spark, tbl, v0, configuration={"delta.enableChangeDataFeed": "true"}
    )
    m = IndexMaintainer(spark, root + "/state", p0, i0)
    return t, m


def _run_maintenance(spark, t, m, ckpt):
    from delta_go_spark.datasource import register

    register(spark)
    q = (
        spark.readStream.format("delta_go")
        .option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .load(t.log.table_path)
        .writeStream.foreachBatch(m.apply)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_index_maintainer_across_stream_restarts(spark, tmp_path):
    """The scheduled-job deployment shape: table changes land, the
    maintenance stream runs availableNow, MORE changes land, the stream
    runs again with the SAME checkpoint + state — the second run must
    consume only the unseen versions and the final state must equal a
    batch rebuild over the live corpus."""
    from delta_go_spark.functions.textops import inverted_index

    t, m = _maintainer_fixture(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    t.append(
        spark.createDataFrame([(4, "alpha delta"), (5, "delta beta")], DOC_SCHEMA)
    )
    _run_maintenance(spark, t, m, ckpt)
    first = m.last_applied()
    assert first >= 0  # at least one batch folded in
    t.delete_where("doc_id = 1")
    t.append(spark.createDataFrame([(6, "gamma delta")], DOC_SCHEMA))
    _run_maintenance(spark, t, m, ckpt)
    assert m.last_applied() > first  # resumed, not reprocessed
    got = sorted(map(tuple, m.current_index().collect()))
    want = sorted(
        map(tuple, inverted_index(t.to_df(), min_df=1).collect())
    )
    assert got == want and len(got) > 0


def test_index_maintainer_replayed_batch_is_noop(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering an already-applied
    batch_id must not double-apply (SetTransaction token guard on both
    state-table merges)."""
    t, m = _maintainer_fixture(spark, tmp_path)
    batch = spark.createDataFrame(
        [(4, "alpha delta", "insert", 1)],
        "doc_id long, text string, _change_type string, _commit_version long",
    )
    m.apply(batch, 0)
    after_first = sorted(map(tuple, m.current_index().collect()))
    m.apply(batch, 0)  # replay: must be a no-op
    assert sorted(map(tuple, m.current_index().collect())) == after_first
    alpha = [r for r in after_first if r[0] == "alpha"][0]
    assert alpha[1] == 3  # df: docs 1, 2, 4 — applied exactly once


def test_index_maintainer_state_io_is_change_proportional(spark, tmp_path):
    """The r11 scale fix pinned at the Delta-log level: the postings
    state spans ~8 token-hashed files; a batch changing ONE doc (one
    insert + one delete) may copy-on-write only the files holding a
    MATCHED key and append the change's new rows — most state files
    must survive the batch byte-identical.  The r11 parquet-generation
    form rewrote every state file every batch (O(state) I/O)."""
    from delta_go_spark.functions.textops import (
        index_from_postings,
        token_postings,
    )
    from delta_go_spark.log import DeltaLog
    from delta_go_spark.streaming.windows import IndexMaintainer

    v0 = spark.createDataFrame(
        [(i, f"tok{i} tok{i + 1} common") for i in range(60)], DOC_SCHEMA
    )
    root = str(tmp_path / "cp")
    p0, i0 = root + "/p0", root + "/i0"
    token_postings(v0).write.parquet(p0)
    index_from_postings(spark.read.parquet(p0), min_df=1).write.parquet(i0)
    m = IndexMaintainer(spark, root + "/state", p0, i0)

    def live(tbl):
        return {a.path for a in DeltaLog.for_table(tbl).update().all_files()}

    pfiles0, ifiles0 = live(m.postings_tbl), live(m.index_tbl)
    assert len(pfiles0) >= 6  # token-hashed layout really spans files
    # one inserted doc + one deleted doc: matched pks touch at most the
    # 3 files holding (tok3, 3), (tok4, 3), (common, 3)
    batch = spark.createDataFrame(
        [
            (100, "tok5 fresh", "insert", 1),
            (3, "tok3 tok4 common", "delete", 1),
        ],
        "doc_id long, text string, _change_type string, _commit_version long",
    )
    m.apply(batch, 0)
    pfiles1, ifiles1 = live(m.postings_tbl), live(m.index_tbl)
    rewritten = pfiles0 - pfiles1
    assert 1 <= len(rewritten) <= 3, rewritten
    assert len(pfiles0 & pfiles1) >= len(pfiles0) - 3  # the rest survive
    # index merge likewise: only files holding an affected token rewrite
    assert len(ifiles0 & ifiles1) >= len(ifiles0) - 4
    # and the state is still CORRECT through the partial rewrite
    idx = {r["token"]: r["df"] for r in m.current_index().collect()}
    assert idx["common"] == 59  # docs 0-59 carried it; doc 3 deleted
    assert idx["fresh"] == 1  # the inserted doc's new token
    assert idx["tok3"] == 1  # doc 3 gone, doc 2 remains
    assert idx["tok5"] == 3  # docs 4, 5 + inserted doc 100


# ---------------------------------------------------------------------------
# bm25_rank_from_state — index-served BM25 must equal corpus-scan BM25


def test_bm25_from_state_equals_corpus_scan(spark):
    from delta_go_spark.functions.textops import (
        bm25_rank,
        bm25_rank_from_state,
        doc_lengths,
        index_from_postings,
        token_postings,
    )
    from delta_go_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(200)
    postings = token_postings(docs)
    index = index_from_postings(postings, min_df=1)
    terms = ["dup", "vector", "key"]
    served = bm25_rank_from_state(
        postings, doc_lengths(docs), index, terms, k=20
    ).collect()
    scanned = bm25_rank(docs, terms, k=20).collect()
    assert [tuple(r) for r in served] == [tuple(r) for r in scanned]
    assert len(served) == 20


def test_bm25_incremental_deletes_change_the_ranking(spark):
    """Non-vacuity of the delete path at fixture level: some doc ranked
    top-20 BEFORE the v2 delete must be gone (deleted docs carry
    doc_id % 7 == 0), proving the ranking is served from post-delete
    state, not stale artifacts."""
    from pyspark.sql import functions as F

    from delta_go_spark.functions.textops import bm25_incremental_docs, bm25_rank
    from delta_go_spark.session import load_table

    got = bm25_incremental_docs(spark, SF_DIR).collect()
    assert all(r["doc_id"] % 7 != 0 for r in got)
    # the pre-delete ranking DID contain a doc the delete removed (else
    # this fixture would not exercise delete-displacement in BM25)
    pre = bm25_rank(
        load_table(spark, SF_DIR, "documents"), ["dup", "vector", "key"], k=20
    ).collect()
    assert any(r["doc_id"] % 7 == 0 for r in pre)


# ---------------------------------------------------------------------------
# unique_gram_redact exact mode — collision-proof k-anonymity


def _ugr_rows(df):
    return {
        r["doc_id"]: (r["n_redacted"], r["redacted_md5"]) for r in df.collect()
    }


def test_unique_gram_redact_exact_survives_forced_collisions(spark):
    """With every gram forced into ONE hash bucket (total collision), the
    hash path must under-redact (documented escape) while exact=True must
    still produce the true exact-string answer."""
    from pyspark.sql import functions as F

    from delta_go_spark.functions.safety import unique_gram_redact

    docs = spark.createDataFrame(
        [
            (1, "secret token alpha one two"),  # all grams unique to doc 1
            (2, "one two three four"),
            (3, "one two three five"),  # shares 'one two three' with doc 2
        ],
        DOC_SCHEMA,
    )
    all_collide = lambda c: F.lit(0).cast("long")  # noqa: E731
    escaped = _ugr_rows(unique_gram_redact(docs, _gram_hash=all_collide))
    # hash 0 spans all docs -> min(doc) != max(doc) -> nothing masked
    assert all(n == 0 for n, _ in escaped.values())
    truth = _ugr_rows(unique_gram_redact(docs, exact=True))  # real hash
    rescued = _ugr_rows(
        unique_gram_redact(docs, exact=True, _gram_hash=all_collide)
    )
    assert rescued == truth  # exact mode is hash-function-independent
    assert truth[1][0] > 0  # doc 1's identifier grams did get masked
    # the shared gram 'one two three' must NOT be masked in docs 2/3: they
    # redact fewer positions than their token count
    assert truth[2][0] < 4 and truth[3][0] < 4


def test_unique_gram_redact_exact_matches_default_without_collisions(spark):
    """On a collision-free corpus (real xxhash64 at this size) exact=True
    must be a pure no-op relative to the default hash path."""
    from delta_go_spark.functions.safety import unique_gram_redact
    from delta_go_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(120)
    a = _ugr_rows(unique_gram_redact(docs))
    b = _ugr_rows(unique_gram_redact(docs, exact=True))
    assert a == b and len(a) == 120


def test_unique_gram_redact_exact_partial_collisions(spark):
    """A weak 2-bucket hash mixes unique and non-unique grams under shared
    hashes; exact=True must still equal the real-hash ground truth."""
    from pyspark.sql import functions as F

    from delta_go_spark.functions.safety import unique_gram_redact
    from delta_go_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents").limit(60)
    weak = lambda c: F.pmod(F.xxhash64(c), F.lit(2)).cast("long")  # noqa: E731
    truth = _ugr_rows(unique_gram_redact(docs, exact=True))
    got = _ugr_rows(unique_gram_redact(docs, exact=True, _gram_hash=weak))
    assert got == truth


# ---------------------------------------------------------------------------
# metadata_only_min_max — temporal stat normalization (ADVICE r10): date
# stats arrive as ISO-string JSON while the statless-file fallback scan
# returns datetime.date, so a table mixing the two used to raise
# TypeError in the fold and stats-served results came back as strings


def test_metadata_minmax_date_mixed_stats_and_statless(spark, tmp_path):
    import datetime
    import glob
    import json as _json

    from delta_go_spark.log import DeltaLog
    from delta_go_spark.scan import metadata_only_min_max
    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "tdate")
    DeltaTable.create(
        spark,
        path,
        spark.createDataFrame(
            [(1, datetime.date(2020, 1, 5)), (2, datetime.date(2020, 3, 1))],
            "k long, d date",
        ),
    )
    t = DeltaTable.for_path(spark, path)
    t.append(
        spark.createDataFrame([(3, datetime.date(2019, 12, 31))], "k long, d date")
    )
    # strip the appended commit's stats: its file must take the scan
    # fallback, whose datetime.date results fold against the parsed stats
    last = sorted(glob.glob(path + "/_delta_log/*.json"))[-1]
    lines = [_json.loads(line) for line in open(last)]
    for a in lines:
        if "add" in a:
            a["add"]["stats"] = None
    with open(last, "w") as f:
        f.write("\n".join(_json.dumps(a) for a in lines) + "\n")
    snap = DeltaLog.for_table(path).update()
    mm = metadata_only_min_max(snap, ["d"], spark=spark)
    assert mm["d"] == (datetime.date(2019, 12, 31), datetime.date(2020, 3, 1))
    assert all(isinstance(v, datetime.date) for v in mm["d"])
    # stats-only path (no statless file in v0) must return typed dates too,
    # never the raw ISO strings the log carries
    snap0 = DeltaLog.for_table(path).snapshot_for_version_as_of(0)
    mm0 = metadata_only_min_max(snap0, ["d"])
    assert mm0["d"] == (datetime.date(2020, 1, 5), datetime.date(2020, 3, 1))
    assert isinstance(mm0["d"][0], datetime.date)


# ---------------------------------------------------------------------------
# waterfill — single corpus scan (r10 verdict: the budget read and the
# allocation windows each re-derived the per-lang aggregate from lineage,
# i.e. two corpus scans where one suffices)


def test_waterfill_budget_single_corpus_scan(spark):
    from delta_go_spark.functions.sampling import waterfill_budget_docs

    df = waterfill_budget_docs(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the per-lang aggregate is localCheckpoint-ed (O(langs) rows), so the
    # returned plan must contain NO parquet scan of documents at all —
    # every consumer reads the materialized dimension rows
    assert "Scan parquet" not in plan
    # and the result is still the registry-parity one (non-vacuous)
    assert df.count() > 0


def test_waterfill_level_pick_is_priority_ordered(spark):
    """The water level must come from the BOUNDARY row whenever one
    exists — pinned via a case where the fallback (max c) would allocate
    over budget if it ever won the pick."""
    from delta_go_spark.functions.sampling import waterfill_allocation

    per = spark.createDataFrame(
        [("a", 100), ("b", 10)], "source string, c long"
    )
    got = {r["source"]: r for r in waterfill_allocation(per, 20).collect()}
    # boundary T = (20-10) div 1 = 10; fallback max(c)=100 would blow the
    # budget (allocating 110 > 20)
    assert got["a"]["tokens_alloc"] == 10 and got["a"]["capped"] == 1
    assert got["b"]["tokens_alloc"] == 10 and got["b"]["capped"] == 0


# ---------------------------------------------------------------------------
# fixture-level non-vacuity: the sf0.001 delete batch must actually
# exercise the hard paths (a deleted doc that carried stored postings,
# and a v1 insert netted away by the v2 delete)


def test_incremental_fixture_delete_batch_nonvacuous(spark):
    from delta_go_spark.functions.textops import cdf_net_changes
    from delta_go_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    v0_deleted = docs.filter(
        (F.col("doc_id") % 5 != 0) & (F.col("doc_id") % 7 == 0)
    ).count()
    netted = docs.filter(
        (F.col("doc_id") % 5 == 0) & (F.col("doc_id") % 7 == 0)
    ).count()
    assert v0_deleted > 0  # stored postings/clusters must shrink
    assert netted > 0  # some v1 inserts must net to nothing
