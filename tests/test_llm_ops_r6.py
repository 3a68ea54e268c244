"""Functional contracts for the round-6 late-batch LLM-pipeline operators:
winnowing fingerprints, PMI collocations, temperature resampling, and
hard-negative mining.  (Their registry rows are hash-gated by the DuckDB
oracles; these tests pin the algorithmic guarantees the oracles can't
express — the winnowing match guarantee, the flattening property, the
label contract.)"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_winnowing_match_guarantee(spark):
    """Schleimer et al. theorem 1: any shared substring of length >=
    k + w - 1 (= 11 here) must contribute at least one SHARED fingerprint
    — detection via a fingerprint equi-join can never miss such overlap."""
    from delta_go_spark.functions.textops import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog near the bank"
    df = spark.createDataFrame(
        [
            (1, "AAAA " + shared + " BBBB unrelated tail text here"),
            (2, "completely different head material " + shared),
            (3, "no overlap with anything else at all in this document"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(df)
    a = fps.filter(F.col("doc_id") == 1).select("h")
    b = fps.filter(F.col("doc_id") == 2).select("h")
    assert a.intersect(b).count() >= 1
    c = fps.filter(F.col("doc_id") == 3).select("h")
    assert a.intersect(c).count() == 0


def test_winnowing_matches_bruteforce_replay(spark):
    """The UDF's deque sliding-min must equal the O(n*w) definition:
    rightmost-minimal gram hash of every length-w window."""
    import hashlib

    from delta_go_spark.functions.textops import (
        _WINNOW_K,
        _WINNOW_W,
        winnow_fingerprints,
    )

    text = "abracadabra " * 6  # periodic: exercises repeated gram hashes
    k, w = _WINNOW_K, _WINNOW_W
    packed = [
        (int(hashlib.md5(text[i : i + k].encode()).hexdigest()[:9], 16) << 24)
        | (0xFFFFFF - (i + 1))
        for i in range(len(text) - k + 1)
    ]
    want = sorted(
        {
            min(packed[s : s + w])
            for s in range(len(packed) - w + 1)
        }
    )
    want = sorted((0xFFFFFF - (p & 0xFFFFFF), p >> 24) for p in want)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = sorted(
        (r["pos"], r["h"])
        for r in winnow_fingerprints(df).collect()
    )
    assert got == want


def test_winnowing_short_and_null_docs_yield_nothing(spark):
    from delta_go_spark.functions.textops import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, None), (2, "tiny"), (3, "exactly10c")],  # < k + w - 1 grams
        "doc_id long, text string",
    )
    assert winnow_fingerprints(df).count() == 0


def test_pmi_bigrams_ranks_exclusive_pair_first(spark):
    """A pair that ONLY ever occurs together must out-lift pairs of
    frequent independent words, and the lift integer must match the
    by-hand formula."""
    from delta_go_spark.functions.textops import pmi_bigrams

    rows = [(i, "zyx wvu common filler") for i in range(5)]
    rows += [(100 + i, "common filler other words") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = pmi_bigrams(df, min_count=3, top_k=5).collect()
    top = got[0]
    assert (top["t1"], top["t2"]) == ("zyx", "wvu")
    n = 5 * 4 + 20 * 4
    assert top["lift_micro"] == n * 5 * 1_000_000 // (5 * 5)
    # exclusive pair beats the high-frequency background pair
    cf = {(r["t1"], r["t2"]): r["lift_micro"] for r in got}
    assert cf[("zyx", "wvu")] > cf[("common", "filler")]


def test_temperature_resample_flattens_and_caps(spark):
    """alpha=0.5 sampling: a 9:1 skewed corpus must come out flatter
    (tail share strictly up, head share strictly down), per-source
    target = budget * w_s div W exactly, and no source exceeds its own
    size."""
    from delta_go_spark.functions.sampling import temperature_resample

    rows = [(i, "head") for i in range(900)] + [
        (1000 + i, "tail") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    sel = temperature_resample(df, "source", F.expr("sum(n) div 2"), ["doc_id"])
    got = {
        r["source"]: r["n"]
        for r in sel.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    w_head = math.floor(math.sqrt(900.0) * 1e6)
    w_tail = math.floor(math.sqrt(100.0) * 1e6)
    budget = 1000 // 2
    assert got["head"] == min(900, math.floor(budget * (w_head / (w_head + w_tail))))
    assert got["tail"] == min(100, math.floor(budget * (w_tail / (w_head + w_tail))))
    total = got["head"] + got["tail"]
    assert got["tail"] / total > 0.1  # tail share strictly up from 10%
    assert got["head"] / total < 0.9


def test_temperature_resample_is_deterministic_membership(spark):
    from delta_go_spark.functions.sampling import temperature_resample

    rows = [(i, f"s{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = sorted(
        r["doc_id"]
        for r in temperature_resample(
            df, "source", F.expr("sum(n) div 2"), ["doc_id"], salt="x"
        ).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in temperature_resample(
            df.repartition(7), "source", F.expr("sum(n) div 2"), ["doc_id"], salt="x"
        ).collect()
    )
    assert a == b and len(a) > 0


def test_hard_negatives_label_contract_and_numpy_replay(spark):
    """No mined negative may share its probe's label, and the top-k must
    equal a numpy brute-force over the identical int8/integer-cosine
    arithmetic."""
    from delta_go_spark.functions.similarity import (
        hard_negative_mining,
        np_int8_codes,
    )
    from delta_go_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    got = hard_negative_mining(emb, n_queries=3, k=4).collect()
    assert all(r["q_label"] != r["neg_label"] for r in got)

    rows = emb.select("vec_id", "embedding", "label").collect()
    ids = np.array([r["vec_id"] for r in rows])
    labels = np.array([r["label"] for r in rows])
    m = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    qm = np_int8_codes(m)
    na2 = (qm * qm).sum(axis=1)
    for qid in range(3):
        qi = int(np.where(ids == qid)[0][0])
        if na2[qi] == 0:
            continue
        dots = qm @ qm[qi]
        cos = np.floor(
            dots / (np.sqrt(na2.astype(np.float64)) * math.sqrt(na2[qi])) * 1e6
            + 0.5
        )
        mask = (labels != labels[qi]) & (na2 > 0)
        order = sorted(
            ((int(-cos[i]), int(ids[i])) for i in np.where(mask)[0]),
        )[:4]
        want = [(ids_, -negcos) for negcos, ids_ in order]
        mine = [
            (r["cid"], r["cos_micro"])
            for r in sorted(
                (x for x in got if x["qid"] == qid), key=lambda r: r["rank"]
            )
        ]
        assert mine == want, (qid, mine, want)


def test_sessionize_boundaries_and_determinism(spark):
    """Events 31 minutes apart split sessions; 29-minute gaps do not; the
    tagging is independent of partitioning."""
    from delta_go_spark.operators.sessions import sessionize

    rows = []
    # user 1: events at t=0, +29min, +29+31min -> sessions [1,1,2]
    for i, mins in enumerate([0, 29, 60]):
        rows.append((i, 1, mins))
    # user 2: one event
    rows.append((10, 2, 5))
    df = spark.createDataFrame(rows, "event_id long, user_id long, m long").select(
        "event_id",
        "user_id",
        F.expr(
            "timestampadd(MINUTE, m, TIMESTAMP_NTZ '2024-01-01 00:00:00')"
        ).alias("ts"),
    )
    got = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in sessionize(df).collect()
    }
    assert got == {(1, 0): 1, (1, 1): 1, (1, 2): 2, (2, 10): 1}
    got2 = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in sessionize(df.repartition(5)).collect()
    }
    assert got2 == got


def test_retention_cohorts_matrix(spark):
    """Two users first seen in week 0, one returning in week 1, one user
    first seen in week 1 — the classic cohort triangle."""
    from delta_go_spark.operators.sessions import retention_cohorts_events
    import duckdb

    # exercise the registry query end-to-end at the smallest SF instead of
    # synthesizing a second fixture: cross-check a marginal against DuckDB
    sf = "/root/testdata/sf0.001"
    got = retention_cohorts_events(spark, sf).collect()
    # cohort sizes at offset 0 must equal distinct first-week users
    per_cohort0 = {
        str(r["cohort_week"]): r["n_users"] for r in got if r["week_offset"] == 0
    }
    want = duckdb.connect().execute(
        f"""
        WITH f AS (
          SELECT user_id,
                 min(CAST(date_trunc('week', ts) AS DATE)) AS w
          FROM '{sf}/events.parquet' GROUP BY user_id
        ) SELECT CAST(w AS VARCHAR), count(*) FROM f GROUP BY w
        """
    ).fetchall()
    assert per_cohort0 == {w: n for w, n in want}
    # offsets are non-negative and n_users never exceeds the cohort size
    for r in got:
        assert r["week_offset"] >= 0
        assert r["n_users"] <= per_cohort0[str(r["cohort_week"])]


def test_cluster_representatives_pick_and_pluggable_pairs(spark):
    """The representative is the (n_words, n_chars, -id) argmax of each
    component; the pair source is pluggable."""
    from delta_go_spark.functions.dedup import cluster_representatives

    docs = spark.createDataFrame(
        [
            (1, "a b c"),
            (2, "a b c d e"),          # same cluster as 1, more words -> rep
            (3, "a b c d x"),          # same words as 2, tie -> same chars? no: 2 and 3 tie on words and chars -> min id wins
            (9, "zzz"),                # singleton, never in pairs
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_id_a long, doc_id_b long"
    )
    got = {r["cluster"]: r for r in cluster_representatives(docs, pairs).collect()}
    assert list(got) == [1]
    r = got[1]
    # docs 2 and 3 tie on (5 words, 9 chars); smaller id (2) wins
    assert r["rep_id"] == 2 and r["n_members"] == 3 and r["member_id_sum"] == 6


def test_fim_transform_invertible_and_deterministic(spark):
    """PSM re-assembly (prefix + middle + suffix) must reproduce the
    original text exactly for every FIM-ed doc, the apply rate is ~half,
    and the transform is independent of partitioning."""
    from delta_go_spark.functions.textops import (
        _FIM_MID,
        _FIM_PRE,
        _FIM_SUF,
        fim_transform,
    )

    docs = spark.createDataFrame(
        [(i, f"document number {i} with some text body {'x' * (i % 7)}")
         for i in range(200)] + [(999, None)],
        "doc_id long, text string",
    )
    out = fim_transform(docs).collect()
    applied = [r for r in out if r["fim_applied"]]
    assert 60 <= len(applied) <= 140  # ~half of 200
    for r in applied:
        t = r["fim_text"]
        assert t.startswith(_FIM_PRE)
        pre, rest = t[len(_FIM_PRE):].split(_FIM_SUF, 1)
        suf, mid = rest.split(_FIM_MID, 1)
        assert pre + mid + suf == r["text"], r["doc_id"]
    # non-applied (and NULL) docs pass through untouched
    for r in out:
        if not r["fim_applied"]:
            assert r["fim_text"] == r["text"]
    got2 = {
        r["doc_id"]: r["fim_text"]
        for r in fim_transform(docs.repartition(7)).collect()
    }
    assert got2 == {r["doc_id"]: r["fim_text"] for r in out}


def test_bpe_merge_pairs_counts_and_ties(spark):
    """Weighted pair frequencies over the distinct-word table: repeated
    pairs inside one word count per position, n_words counts distinct
    vocabulary words, ties break on the pair string."""
    from delta_go_spark.functions.textops import bpe_merge_pairs

    docs = spark.createDataFrame(
        [(1, "the cat"), (2, "the hat"), (3, "aaa"), (4, None)],
        "doc_id long, text string",
    )
    got = {r["pair"]: (r["freq"], r["n_words"]) for r in bpe_merge_pairs(docs).collect()}
    # "the" x2 -> th,he each freq 2; at appears in cat+hat; aaa -> aa twice
    assert got["th"] == (2, 1) and got["he"] == (2, 1)
    assert got["at"] == (2, 2)
    assert got["aa"] == (2, 1)
    assert got["ca"] == (1, 1) and got["ha"] == (1, 1)
    order = [r["pair"] for r in bpe_merge_pairs(docs).collect()]
    assert order[:4] == ["aa", "at", "he", "th"]  # freq desc, pair asc


def test_matryoshka_full_dim_truncation_is_identity(spark):
    """With trunc_dim == the full dimension the two rankings coincide:
    overlap == k and both id checksums agree, for every probe."""
    from delta_go_spark.functions.similarity import matryoshka_recall_audit

    rows = [
        (i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)])
        for i in range(30)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = matryoshka_recall_audit(emb, trunc_dim=8, n_queries=3, k=10).collect()
    assert len(out) == 3
    for r in out:
        assert r["n_overlap"] == 10
        assert r["full_id_sum"] == r["trunc_id_sum"]


def test_bpe_train_matches_naive_reference(spark):
    """Driver-side merge loop must equal an independently-written naive
    trainer on the classic Sennrich corpus, and the first merges are the
    hand-computed ones."""
    from delta_go_spark.functions.textops import bpe_train

    corpus = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame([(1, corpus)], "doc_id long, text string")
    merges = bpe_train(docs, n_merges=5)
    assert merges[:2] == [("e", "s"), ("es", "t")]

    # naive reference: recount pairs from scratch each round
    words = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    vocab = {w: list(w) for w in words}
    expect = []
    for _ in range(5):
        counts = {}
        for w, syms in vocab.items():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + words[w]
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        expect.append(best)
        for syms in vocab.values():
            i = 0
            while i < len(syms) - 1:
                if (syms[i], syms[i + 1]) == best:
                    syms[i : i + 2] = [syms[i] + syms[i + 1]]
                else:
                    i += 1
    assert merges == expect


def test_bpe_apply_greedy_rank_and_lossless(spark):
    """Greedy lowest-rank application reproduces the training-time
    segmentation, token concatenation rebuilds every word, and the result
    is independent of partitioning."""
    from delta_go_spark.functions.textops import bpe_apply, bpe_train

    corpus = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame(
        [(1, corpus), (2, "the newest low widest thing"), (3, None)],
        "doc_id long, text string",
    )
    merges = bpe_train(docs.filter("doc_id = 1"), n_merges=5)
    out = {r["doc_id"]: r["bpe_tokens"] for r in bpe_apply(docs, merges).collect()}
    assert out[3] is None
    # lossless: concatenating tokens rebuilds the lowercase word stream
    import re

    for did in (1, 2):
        text = {1: corpus, 2: "the newest low widest thing"}[did]
        assert "".join(out[did]) == "".join(re.findall(r"[a-z]+", text.lower()))
    # training-time segmentation: newest -> n, ew, est after 5 merges
    assert out[2][3:6] == ["n", "ew", "est"]
    got2 = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_apply(docs.repartition(5), merges).collect()
    }
    assert got2 == out


def test_kcenter_coreset_matches_numpy_fps(spark):
    """The distributed greedy walk must equal the brute-force
    farthest-point-sampling definition (max-min integer distance, min-id
    seed, id-ascending ties) on a corpus small enough to replay fully."""
    from delta_go_spark.functions.similarity import kcenter_coreset, np_int8_codes

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 8)).astype(np.float64)
    ids = np.arange(100, 140, dtype=np.int64)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, vecs)],
        "vec_id long, embedding array<double>",
    )
    k = 6
    got = [
        (r.rnk, r.vec_id, r.maxmin_d)
        for r in kcenter_coreset(df, k=k).orderBy("rnk").collect()
    ]

    q = np_int8_codes(vecs)
    chosen = [0]
    want = [(1, int(ids[0]), None)]
    for step in range(2, k + 1):
        d = ((q[:, None, :] - q[chosen][None, :, :]) ** 2).sum(axis=2).min(axis=1)
        d[chosen] = -1
        best = int(np.lexsort((ids, -d))[0])
        want.append((step, int(ids[best]), int(d[best])))
        chosen.append(best)
    assert got == want
    # radius curve is monotonically non-increasing (the k-center invariant)
    radii = [r[2] for r in want[1:]]
    assert radii == sorted(radii, reverse=True)


def test_kcenter_coreset_small_corpus_and_plan(spark):
    """k > n stops at n rows; each FPS round is shuffle-free (one Arrow
    projection + TakeOrdered) so nothing in the loop scales worse than a
    corpus scan."""
    from delta_go_spark.functions.similarity import _fps_scored, kcenter_coreset

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = kcenter_coreset(df, k=10).collect()
    assert [r.rnk for r in out] == [1, 2, 3]
    assert {r.vec_id for r in out} == {1, 2, 3}

    # non-identifier id column names survive DDL and column resolution
    odd = kcenter_coreset(
        df.withColumnRenamed("vec_id", "doc id"), k=2, id_col="doc id"
    )
    assert odd.columns == ["rnk", "doc id", "maxmin_d"] and odd.count() == 2

    from delta_go_spark.functions.similarity import quantize_int8

    coded = quantize_int8(df).select(F.col("vec_id").alias("vid"), "q")
    plan = (
        _fps_scored(coded, [[127, 0]], [1])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_dsir_affinity_discriminates_target_vocabulary(spark):
    """Documents sharing the target slice's vocabulary must outscore
    documents that don't — the property that makes DSIR selection work —
    and the integer posterior must be exact."""
    from delta_go_spark.functions.sampling import dsir_affinity

    rows = [
        (1, "alpha beta gamma alpha beta", "tgt"),
        (2, "alpha gamma beta beta alpha", "tgt"),
        (3, "alpha beta gamma", "raw"),      # pure target vocabulary
        (4, "zulu yankee xray whiskey", "raw"),  # disjoint vocabulary
        (5, "alpha zulu", "raw"),            # mixed
        (6, "", "raw"),                      # zero tokens -> excluded
        (7, None, "raw"),                    # NULL text -> excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r.doc_id: r
        for r in dsir_affinity(df, F.col("source") == "tgt").collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}
    assert (
        out[3].affinity_mean_micro
        > out[5].affinity_mean_micro
        > out[4].affinity_mean_micro
    )
    # exact integer contract: every target-vocab token scores
    # (1e6*(ct+1)) div (ct+cr+2); 'zulu' appears twice, both raw
    # -> s = 1000000 // 4 = 250000; doc 4 = 3 singletons + zulu
    assert out[4].n_toks == 4
    assert out[4].affinity_sum == 3 * (1000000 // 3) + 250000


def test_label_col_is_parameterized_everywhere(spark):
    """Round-7 review fix: ivf_sq8_exact, ann_signlsh and
    random_projection_int8 take label_col like hard_negative_mining does —
    an embedding table whose label column has another name must work."""
    from delta_go_spark.functions.similarity import (
        ann_signlsh,
        ivf_sq8_exact,
        random_projection_int8,
    )
    from delta_go_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    renamed = emb.withColumnRenamed("label", "category")
    for fn in (ivf_sq8_exact, ann_signlsh):
        out = fn(renamed, label_col="category")
        assert "label" in out.columns  # output contract unchanged
        assert out.count() > 0
    rp = random_projection_int8(renamed, label_col="category")
    assert rp.filter(F.col("label").isNotNull()).count() > 0
