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
