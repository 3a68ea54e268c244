"""Round-10 operator tests: ExactSubstr cross-document span removal and
the CDF-incremental soft-dedup maintenance."""

import hashlib
import sys

import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

SF_DIR = "/root/testdata/sf0.001"


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------------------------------
# exactsubstr_dedup — hand-built corpus covering every branch of the rule


def test_exactsubstr_drops_cross_doc_span_all_copies(spark):
    """A 6-token span shared by two documents is dropped from BOTH (the
    published rule de-weights boilerplate entirely; no canonical copy)."""
    from delta_go_spark.functions.dedup import exactsubstr_dedup

    docs = spark.createDataFrame(
        [
            (1, "x1 a b c d e f y1"),
            (2, "x2 a b c d e f y2"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in exactsubstr_dedup(docs).collect()}
    # hit starts in doc 1: i=1 only ("a b c d e f"); covered j=1..6
    assert rows[1]["n_tokens"] == 8
    assert rows[1]["n_dropped"] == 6
    assert rows[1]["rebuilt_md5"] == _md5("x1 y1")
    assert rows[2]["n_dropped"] == 6
    assert rows[2]["rebuilt_md5"] == _md5("x2 y2")


def test_exactsubstr_ignores_in_doc_only_repeats(spark):
    """A span repeated twice WITHIN one document but in no other document
    is NOT dropped — that is span_scrub's axis, not ExactSubstr's
    cross-doc rule (min(doc) == max(doc) keeps it)."""
    from delta_go_spark.functions.dedup import exactsubstr_dedup

    docs = spark.createDataFrame(
        [
            (1, "p q r s t u v p q r s t u v"),
            (2, "completely different words here besides those six"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in exactsubstr_dedup(docs).collect()}
    assert rows[1]["n_dropped"] == 0
    assert rows[1]["rebuilt_md5"] == _md5("p q r s t u v p q r s t u v")
    assert rows[2]["n_dropped"] == 0


def test_exactsubstr_overlapping_hits_union_not_double_count(spark):
    """Two overlapping repeated grams drop the UNION of their windows —
    collect_set semantics, positions never double-counted."""
    from delta_go_spark.functions.dedup import exactsubstr_dedup

    # docs 1 and 2 share the 7-token run "a b c d e f g": hit starts at
    # i=1 and i=2 in doc 1 (two 6-grams), covered j=1..7 -> 7 dropped
    docs = spark.createDataFrame(
        [
            (1, "x1 a b c d e f g y1"),
            (2, "x2 a b c d e f g y2"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in exactsubstr_dedup(docs).collect()}
    assert rows[1]["n_tokens"] == 9
    assert rows[1]["n_dropped"] == 7
    assert rows[1]["rebuilt_md5"] == _md5("x1 y1")


def test_exactsubstr_short_and_null_docs(spark):
    """Docs shorter than the span threshold pass through untouched; NULL
    texts are excluded on both engines (the shared skeleton's contract)."""
    from delta_go_spark.functions.dedup import exactsubstr_dedup

    docs = spark.createDataFrame(
        [(1, "just five little tokens here"), (2, None)],
        "doc_id long, text string",
    )
    rows = exactsubstr_dedup(docs).collect()
    assert len(rows) == 1
    assert rows[0]["n_dropped"] == 0
    assert rows[0]["rebuilt_md5"] == _md5("just five little tokens here")


def test_exactsubstr_whole_doc_dropped_is_empty_md5(spark):
    """A document that IS a repeated span rebuilds to the empty string —
    md5('') on both engines, not NULL."""
    from delta_go_spark.functions.dedup import exactsubstr_dedup

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d e f"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in exactsubstr_dedup(docs).collect()}
    assert rows[1]["n_dropped"] == 6
    assert rows[1]["rebuilt_md5"] == _md5("")
    assert rows[2]["rebuilt_md5"] == _md5("")


def test_exactsubstr_plan_hits_bounded(spark):
    """Scale pin: the doc-frequency aggregate combines map-side
    (partial_min/partial_max — hot boilerplate grams never skew one
    reducer), nothing evaluates per-row Python, and no cartesian product
    appears (the drop set is hits-bounded, never corpus^2)."""
    from delta_go_spark.queries import queries

    plan = (
        queries()["exactsubstr_dedup_docs"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_min" in plan and "partial_max" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_exactsubstr_matches_oracle_on_fixture(spark):
    """Belt-and-braces single-query parity at sf0.001 (the window row is
    gated by the driver at sf0.01)."""
    from check_parity import compare_one, duckdb_for

    from delta_go_spark.queries import registry

    fn, sql = registry()["exactsubstr_dedup_docs"]
    problems = compare_one(spark, duckdb_for(SF_DIR), fn, sql, SF_DIR)
    assert not problems, problems


# ---------------------------------------------------------------------------
# softdedup_incremental — hand-built cluster-state merge scenarios


def _soft_state(spark):
    """Persisted pre-ingest state: clusters {1,2} and {3,4}; 5,6 in a third
    cluster; 9 unclustered (singleton by absence from labels)."""
    pairs0 = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6)], "doc_id_a long, doc_id_b long"
    )
    labels0 = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3), (5, 5), (6, 5)],
        "node long, cluster_rep long",
    )
    csize0 = spark.createDataFrame(
        [(1, 2), (3, 2), (5, 2)], "cluster_rep long, cluster_size long"
    )
    return pairs0, labels0, csize0


def test_softdedup_incremental_bridge_merges_two_old_clusters(spark):
    """THE hard case: a new doc pairing into BOTH old clusters must merge
    them into one cluster of 5 — requires the affected clusters' stored
    pairs to re-enter the sub-CC (dropping them would report the merged
    cluster as three fragments)."""
    from delta_go_spark.functions.dedup import softdedup_incremental_update

    pairs0, labels0, csize0 = _soft_state(spark)
    all_ids = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 5, 6, 7, 9)], "doc_id long"
    )
    inc = spark.createDataFrame(
        [(2, 7), (3, 7)], "doc_id_a long, doc_id_b long"
    )
    rows = {
        r["doc_id"]: (r["cluster_size"], r["weight_micro"])
        for r in softdedup_incremental_update(
            all_ids, inc, pairs0, labels0, csize0
        ).collect()
    }
    for d in (1, 2, 3, 4, 7):  # merged {1,2,3,4,7}
        assert rows[d] == (5, 200000), (d, rows[d])
    for d in (5, 6):  # untouched cluster served from stored state
        assert rows[d] == (2, 500000), (d, rows[d])
    assert rows[9] == (1, 1000000)  # never-clustered singleton


def test_softdedup_incremental_new_only_cluster_and_empty_batch(spark):
    """A batch whose pairs touch no old cluster forms a new cluster without
    disturbing stored state; an EMPTY incremental pair set keeps every
    stored size and makes each new doc a singleton."""
    from delta_go_spark.functions.dedup import softdedup_incremental_update

    pairs0, labels0, csize0 = _soft_state(spark)
    all_ids = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 5, 6, 7, 8)], "doc_id long"
    )
    inc = spark.createDataFrame([(7, 8)], "doc_id_a long, doc_id_b long")
    rows = {
        r["doc_id"]: (r["cluster_size"], r["weight_micro"])
        for r in softdedup_incremental_update(
            all_ids, inc, pairs0, labels0, csize0
        ).collect()
    }
    assert rows[7] == (2, 500000) and rows[8] == (2, 500000)
    for d in (1, 2, 3, 4, 5, 6):
        assert rows[d] == (2, 500000)

    empty = spark.createDataFrame([], "doc_id_a long, doc_id_b long")
    rows = {
        r["doc_id"]: (r["cluster_size"], r["weight_micro"])
        for r in softdedup_incremental_update(
            all_ids, empty, pairs0, labels0, csize0
        ).collect()
    }
    assert rows[7] == (1, 1000000) and rows[8] == (1, 1000000)
    assert rows[1] == (2, 500000)


def test_softdedup_incremental_fixture_exercises_both_paths(spark):
    """Non-vacuity on the registry fixture: the sf0.001 ingest batch must
    produce BOTH kept-from-state clusters and sub-CC-recomputed clusters,
    or the window row would be green without testing the merge path."""
    import os

    from delta_go_spark import cdf
    from delta_go_spark.functions.dedup import (
        minhash_incremental_pairs,
        softdedup_incremental_docs,
    )
    from delta_go_spark.operators.delta_queries import _CACHE_ROOT
    from pyspark.sql import functions as F

    softdedup_incremental_docs(spark, SF_DIR)  # ensure the fixture is built
    key = SF_DIR.strip("/").replace("/", "_")
    root = os.path.join(_CACHE_ROOT, key, "inc_softdedup")
    labels0 = spark.read.parquet(os.path.join(root, "labels_v0"))
    new_docs = (
        cdf.table_changes(spark, os.path.join(root, "docs"), start_version=1)
        .filter(F.col("_change_type") == "insert")
        .select("doc_id", "text")
    )
    inc = minhash_incremental_pairs(
        spark.read.parquet(os.path.join(root, "sig_v0")), new_docs
    )
    touched = (
        inc.select(F.col("doc_id_a").alias("node"))
        .unionByName(inc.select(F.col("doc_id_b").alias("node")))
        .distinct()
    )
    affected = labels0.join(touched, "node").select("cluster_rep").distinct()
    n_affected = affected.count()
    n_kept = labels0.join(affected, "cluster_rep", "left_anti").count()
    assert n_affected > 0, "ingest batch touches no stored cluster (vacuous)"
    assert n_kept > 0, "every stored cluster affected (kept path untested)"
