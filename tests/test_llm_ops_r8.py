"""Round-8 operator tests: quality classifier, best-fit packing,
streaming sessionization."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_quality_classifier_discriminates(spark):
    """The fixture weights must actually separate the corpus — a gate
    that labels everything one way is worthless evidence."""
    from delta_go_spark.queries import queries

    out = queries()["quality_classifier_docs"](spark, SF_DIR)
    dist = {
        r["quality_label"]: r["n"]
        for r in out.groupBy("quality_label").agg(F.count("*").alias("n")).collect()
    }
    assert set(dist) == {0, 1}
    total = sum(dist.values())
    # neither class degenerate (>5% each side)
    assert min(dist.values()) > total * 0.05


def test_quality_classifier_order_free(spark):
    """Score is a pure per-row function: shuffling input order or
    repartitioning must not change a single (doc_id, w_total) pair."""
    from delta_go_spark.functions.curation import quality_classifier
    from delta_go_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    a = {
        r["doc_id"]: (r["n_tokens"], r["w_total"], r["quality_label"])
        for r in quality_classifier(docs).collect()
    }
    shuffled = docs.orderBy(F.reverse(F.col("text"))).repartition(7)
    b = {
        r["doc_id"]: (r["n_tokens"], r["w_total"], r["quality_label"])
        for r in quality_classifier(shuffled).collect()
    }
    assert a == b


def test_quality_classifier_known_value(spark):
    """Independent hand-check: a two-token doc scores w[bucket(tok)] summed
    over tokens, with bucket/weight recomputed here from the md5 contract
    (not by calling the implementation's scorer)."""
    import hashlib

    from delta_go_spark.functions.curation import quality_classifier

    df = spark.createDataFrame([(1, "alpha beta")], ["doc_id", "text"])
    row = quality_classifier(df).collect()[0]

    def w(tok: str) -> int:
        b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 256
        return int(hashlib.md5(f"w{b}".encode()).hexdigest()[:8], 16) % 2001 - 1000

    assert row["n_tokens"] == 2
    assert row["w_total"] == w("alpha") + w("beta")


def _ff_bins(tokens: list, budget: int) -> int:
    """Independent first-fit (arrival order, no splitting) reference."""
    rem = []
    for t in tokens:
        for i, r in enumerate(rem):
            if r >= t:
                rem[i] = r - t
                break
        else:
            rem.append(budget - t)
    return len(rem)


def test_pack_bestfit_capacity_and_efficiency(spark):
    """Invariants asserted independently of the implementation: every
    non-singleton bin within budget, every doc placed exactly once, and
    BFD uses no more bins than arrival-order first-fit on any stream."""
    from delta_go_spark.functions.textops import pack_bestfit
    from delta_go_spark.session import load_table

    budget = 256
    docs = load_table(spark, SF_DIR, "documents")
    rows = pack_bestfit(docs, budget_tokens=budget).collect()

    by_stream = {}
    for r in rows:
        by_stream.setdefault(r["source"], []).append(r)
    n_docs = docs.filter(F.col("text").isNotNull()).count()
    assert sum(len(v) for v in by_stream.values()) == n_docs

    for src, rs in by_stream.items():
        bins = {}
        for r in rs:
            bins.setdefault(r["bin_id"], []).append(r["n_tokens"])
        # contiguous bin ids from 0
        assert sorted(bins) == list(range(len(bins)))
        for members in bins.values():
            if len(members) > 1:
                assert sum(members) <= budget
        # BFD never worse than first-fit in arrival (doc_id) order
        arrival = [r["n_tokens"] for r in sorted(rs, key=lambda r: r["doc_id"])]
        assert len(bins) <= _ff_bins(arrival, budget)


def test_pack_bestfit_partitioning_invariant(spark):
    """The placement must depend only on (stream, sorted sizes), not on
    how the input frame happens to be partitioned."""
    from delta_go_spark.functions.textops import pack_bestfit
    from delta_go_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    a = {(r["source"], r["doc_id"]): r["bin_id"]
         for r in pack_bestfit(docs).collect()}
    b = {(r["source"], r["doc_id"]): r["bin_id"]
         for r in pack_bestfit(docs.repartition(13)).collect()}
    assert a == b


def test_streaming_sessionize_gap_invariant(spark):
    """Independent invariants on the emitted sessions: per user, sessions
    are disjoint and separated by at least the gap; every session respects
    the batch-provable cutoff; n_events >= 1 and start <= end."""
    from delta_go_spark.queries import queries

    gap_us = 1800 * 1_000_000
    rows = queries()["streaming_sessionize_events"](spark, SF_DIR).collect()
    assert rows
    by_user = {}
    for r in rows:
        assert r["n_events"] >= 1
        assert r["session_start_us"] <= r["session_end_us"]
        by_user.setdefault(r["user_id"], []).append(
            (r["session_start_us"], r["session_end_us"])
        )
    for sessions in by_user.values():
        sessions.sort()
        for (s1, e1), (s2, e2) in zip(sessions, sessions[1:]):
            assert s2 - e1 >= gap_us  # a smaller gap would have merged


def test_streaming_sessionize_matches_batch_twin(spark):
    """The streaming sessionizer must agree with the BATCH session_window
    operator (an independent engine path) on every closed session."""
    from delta_go_spark.queries import queries
    from delta_go_spark.session import load_table

    stream_rows = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in queries()["streaming_sessionize_events"](spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    epoch = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"
    batch = (
        ev.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("win"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "user_id",
            F.expr(f"timestampdiff(MICROSECOND, {epoch}, first_ts)").alias("s"),
            F.expr(f"timestampdiff(MICROSECOND, {epoch}, last_ts)").alias("e"),
            "n_events",
        )
    )
    max_us = ev.agg(
        F.expr(f"timestampdiff(MICROSECOND, {epoch}, max(ts))").alias("m")
    ).first()["m"]
    cutoff = (max_us // 1_000_000) * 1_000_000 - (1800 + 1800 + 1) * 1_000_000
    batch_rows = {
        (r["user_id"], r["s"], r["e"], r["n_events"])
        for r in batch.filter(F.col("e") <= cutoff).collect()
    }
    assert stream_rows == batch_rows


def test_doremi_weights_invariants(spark):
    """Independent invariants: weights are a permille distribution summing
    to exactly 1000; domains with equal excess differ by at most the
    largest-remainder +1; a strictly harder domain never gets less than
    an easier one minus that +1 quantum."""
    from delta_go_spark.queries import queries

    rows = queries()["doremi_weights_docs"](spark, SF_DIR).collect()
    assert sum(r["weight_permille"] for r in rows) == 1000
    assert all(r["weight_permille"] >= 0 for r in rows)
    by_excess = {}
    for r in rows:
        by_excess.setdefault(r["excess_milli"], []).append(r["weight_permille"])
    for ws in by_excess.values():
        assert max(ws) - min(ws) <= 1
    ordered = sorted(rows, key=lambda r: r["excess_milli"])
    for a, b in zip(ordered, ordered[1:]):
        # b has the >= excess: multiplicative updates are monotone up to
        # the +-1 remainder quantum
        assert b["weight_permille"] >= a["weight_permille"] - 1


def test_doremi_weights_deterministic(spark):
    from delta_go_spark.functions.curation import doremi_weights
    from delta_go_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    a = [tuple(r) for r in doremi_weights(spark, docs).collect()]
    b = [tuple(r) for r in doremi_weights(spark, docs.repartition(11)).collect()]
    assert a == b


def test_streaming_quota_gate_matches_batch_prefix(spark):
    """The gate's accepted set must be exactly the (ts, event_id)-ordered
    prefix of each key — checked against a batch window computation, an
    independent engine path."""
    from pyspark.sql import Window

    from delta_go_spark.queries import queries
    from delta_go_spark.session import load_table

    out = {r["event_type"]: r for r in
           queries()["streaming_quota_gate_events"](spark, SF_DIR).collect()}

    ev = load_table(spark, SF_DIR, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    batch = (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 500)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("event_id").alias("chk"),
        )
        .collect()
    )
    assert out
    for r in batch:
        o = out[r["event_type"]]
        assert o["n_accepted"] == r["n"]
        assert o["id_checksum"] == r["chk"]
        assert o["max_rank"] == o["n_accepted"]


def test_length_batching_invariants(spark):
    """Independent invariants: every batch respects the padded budget
    (n_docs * max_len <= budget) unless it is a singleton oversized doc;
    batch ids are contiguous per stream; sorted batching never wastes more
    than arrival-order batching."""
    from delta_go_spark.functions.textops import length_batching
    from delta_go_spark.session import load_table

    def arrival_waste(lens, budget):
        """Independent greedy reference: batch in given order, close when
        the padded size would exceed the budget."""
        waste = cur_n = cur_max = cur_sum = 0
        for t in lens:
            if cur_n and (cur_n + 1) * max(cur_max, t) > budget:
                waste += cur_n * cur_max - cur_sum
                cur_n = cur_max = cur_sum = 0
            cur_n += 1
            cur_max = max(cur_max, t)
            cur_sum += t
        if cur_n:
            waste += cur_n * cur_max - cur_sum
        return waste

    budget = 512
    docs = load_table(spark, SF_DIR, "documents")
    rows = length_batching(docs, budget_tokens=budget).collect()
    by_stream = {}
    for r in rows:
        by_stream.setdefault(r["source"], []).append(r)
    for src_rows in by_stream.values():
        batches = {}
        for r in src_rows:
            batches.setdefault(r["batch_id"], []).append(r["n_tokens"])
        assert sorted(batches) == list(range(len(batches)))
        waste_sorted = 0
        for members in batches.values():
            if len(members) > 1:
                assert len(members) * max(members) <= budget
            waste_sorted += len(members) * max(members) - sum(members)
        arrival = [r["n_tokens"]
                   for r in sorted(src_rows, key=lambda r: r["doc_id"])]
        # FIXTURE PIN, not a theorem: sorted batching beats arrival-order
        # on real length distributions but adversarial inputs exist
        # (e.g. budget 4, lengths [1,1,2] arrival-packs waste-free).  If a
        # regenerated fixture trips this, re-evaluate rather than assume
        # a code bug.
        assert waste_sorted <= arrival_waste(arrival, budget), (
            "sorted batching wasted more than arrival order on this "
            "fixture slice - distributional pin violated, see comment"
        )


def test_systematic_sample_pps_invariants(spark):
    """Independent invariants: total multiplicity equals the exact number
    of grid points in [0, W); every doc at least step tokens long is
    drawn (an interval of length >= step always contains a grid point);
    selection is independent of input partitioning."""
    from delta_go_spark.functions.sampling import systematic_weighted_sample
    from delta_go_spark.session import load_table

    k = 100
    docs = load_table(spark, SF_DIR, "documents")
    rows = systematic_weighted_sample(docs, k=k).collect()

    toks = docs.filter(F.col("text").isNotNull()).select(
        F.size(F.split("text", " ")).cast("long").alias("t")
    )
    W = toks.agg(F.sum("t")).first()[0]
    step = max(1, W // k)
    offset = step // 2
    n_points = (W - offset + step - 1) // step  # points offset+i*step < W
    assert sum(r["multiplicity"] for r in rows) == n_points

    drawn = {r["doc_id"] for r in rows}
    heavy = {
        r["doc_id"]
        for r in docs.filter(F.col("text").isNotNull())
        .select("doc_id", F.size(F.split("text", " ")).alias("t"))
        .filter(F.col("t") >= step)
        .collect()
    }
    assert heavy <= drawn

    again = {
        (r["doc_id"], r["multiplicity"])
        for r in systematic_weighted_sample(docs.repartition(9), k=k).collect()
    }
    assert again == {(r["doc_id"], r["multiplicity"]) for r in rows}


def test_block_dedup_accounting(spark):
    """Independent invariants: per source shared <= distinct <= total,
    dup_instances >= shared (every shared block has >= 1 instance here),
    and the corpus-wide totals reconcile with a direct block count."""
    from delta_go_spark.queries import queries
    from delta_go_spark.session import load_table

    rows = queries()["block_dedup_docs"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["shared_blocks"] <= r["distinct_blocks"] <= r["total_blocks"]
        assert r["dup_instances"] >= r["shared_blocks"]
    docs = load_table(spark, SF_DIR, "documents").filter(
        F.length("text") > 0
    )
    n_blocks = docs.select(
        F.ceil(F.length("text") / 32).cast("long").alias("b")
    ).agg(F.sum("b")).first()[0]
    assert sum(r["total_blocks"] for r in rows) == n_blocks


# ---------------------------------------------------------------------------
# Hypothesis properties over the extracted pure cores — independent
# invariants (capacity, the published approximation theorem, algebraic
# split-invariance), never a replay of the implementation.
from hypothesis import given, settings
from hypothesis import strategies as st


def _optimal_bins(tokens, budget):
    """Exact bin-packing optimum by branch and bound (tiny n only)."""
    tokens = sorted((t for t in tokens if t <= budget), reverse=True)
    if not tokens:
        return 0
    best = [len(tokens)]

    def rec(i, bins):
        if len(bins) >= best[0]:
            return
        if i == len(tokens):
            best[0] = len(bins)
            return
        t = tokens[i]
        seen = set()
        for b in range(len(bins)):
            if bins[b] >= t and bins[b] not in seen:
                seen.add(bins[b])
                bins[b] -= t
                rec(i + 1, bins)
                bins[b] += t
        bins.append(budget - t)
        rec(i + 1, bins)
        bins.pop()

    rec(0, [])
    return best[0]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=300), min_size=1, max_size=8),
    st.integers(min_value=50, max_value=300),
)
def test_bfd_assign_capacity_and_theorem(tokens, budget):
    from delta_go_spark.functions.textops import bfd_assign

    ordered = sorted(tokens, reverse=True)
    bins = bfd_assign(ordered, budget)
    # every doc placed, bin ids contiguous from 0
    assert len(bins) == len(ordered)
    used = sorted(set(bins))
    assert used == list(range(len(used)))
    # capacity: no multi-doc bin over budget
    fill = {}
    for t, b in zip(ordered, bins):
        fill.setdefault(b, []).append(t)
    for members in fill.values():
        if len(members) > 1:
            assert sum(members) <= budget
    # the BFD approximation theorem on the fitting items:
    # BFD(L) <= 11/9 OPT(L) + 6/9  (Dosa 2007 tight bound)
    oversized = sum(1 for t in ordered if t > budget)
    fitting_bins = len(used) - oversized
    opt = _optimal_bins(ordered, budget)
    assert opt <= fitting_bins <= (11 * opt + 6) // 9


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.integers(min_value=0, max_value=100),
        ),
        min_size=1,
        max_size=20,
    ),
    st.integers(min_value=1, max_value=2_000),
    st.data(),
)
def test_merge_fragments_split_invariant(events, gap, data):
    """Algebraic property the multi-batch determinism rests on: folding
    any 2-way split of the events through merge_fragments equals merging
    them all at once."""
    from delta_go_spark.streaming.stateful import merge_fragments

    frags = [[t, t, 1, c] for t, c in events]
    whole = merge_fragments([list(f) for f in frags], gap)

    mask = [data.draw(st.booleans()) for _ in frags]
    part_a = [list(f) for f, m in zip(frags, mask) if m]
    part_b = [list(f) for f, m in zip(frags, mask) if not m]
    staged = merge_fragments(
        merge_fragments(part_a, gap) + part_b, gap
    )
    assert staged == whole


def test_curation_pipeline_v2_budget_respected(spark):
    """Independent invariants: every source's kept tokens fit its DoReMi
    budget; budgets derive from the published weights (weight*total//3
    //1000); kept score_sum is positive (only gated docs enter)."""
    from delta_go_spark.queries import queries

    out = {r["source"]: r for r in
           queries()["curation_pipeline_v2_docs"](spark, SF_DIR).collect()}
    assert out
    weights = {r["source"]: r for r in
               queries()["doremi_weights_docs"](spark, SF_DIR).collect()}
    total_budget = sum(r["sum_tokens"] for r in weights.values()) // 3
    for src_name, r in out.items():
        assert r["tokens_kept"] <= r["budget_s"]
        expected = (weights[src_name]["weight_permille"] * total_budget) // 1000
        assert r["budget_s"] == expected
        # every gated doc satisfies w_total > 50*n_tokens, so the sums do too
        assert r["score_sum"] > 50 * r["tokens_kept"]
        assert r["n_kept"] >= 1


def test_label_centroid_drift_numpy_replay(spark):
    """Independent numpy check: drift values match an integer replay of
    the shifted milli-mean arithmetic over the same int8 codes."""
    import numpy as np

    from delta_go_spark.functions.similarity import (
        label_centroid_drift,
        quantize_int8,
    )
    from delta_go_spark.session import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    out = {r["label"]: (r["n_vecs"], r["drift_l2sq_milli2"])
           for r in label_centroid_drift(emb).collect()}
    codes = quantize_int8(emb).select("label", "q").collect()
    by_label = {}
    for r in codes:
        by_label.setdefault(r["label"], []).append(
            np.array(r["q"], dtype=np.int64) + 127
        )
    all_sum = sum(np.sum(v, axis=0) for v in by_label.values())
    all_n = sum(len(v) for v in by_label.values())
    cmean = (1000 * all_sum) // all_n
    for lbl, vecs in by_label.items():
        s = np.sum(vecs, axis=0)
        lmean = (1000 * s) // len(vecs)
        d = lmean - cmean
        assert out[lbl] == (len(vecs), int((d * d).sum()))
