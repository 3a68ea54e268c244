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
    assert hot["top_docs"] == [7, 6, 5, 4, 3]  # tf desc, exact top-5
    # all-tied tf: top-5 broken by doc asc
    assert got["base"]["top_docs"] == [1, 2, 3, 4, 5]


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
    assert got["hot"]["top_docs"] == [100, 1, 2, 3, 4]  # doc 5 displaced
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
