"""Round-7 operator tests: exact-replay k-means, MMR selection, the
OPTIMIZE/ZORDER registry fixture, scale-join patterns, gopher rules,
the streaming Delta agg sink, and token-budget selection.

The DuckDB oracles (tests/test_oracle_parity.py SAMPLE + check_parity)
pin cross-engine equality; these tests pin the SEMANTIC invariants the
oracles alone can't see (greedy-walk properties, budget feasibility,
multi-batch execution)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _codes(spark):
    from delta_go_spark.functions.similarity import quantize_int8
    from delta_go_spark.session import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    rows = (
        quantize_int8(emb)
        .select(F.col("vec_id").alias("vid"), "q")
        .orderBy("vid")
        .collect()
    )
    return {int(r.vid): np.asarray(list(r.q), dtype=np.int64) for r in rows}


def test_kmeans_matches_numpy_replay(spark):
    """Full Lloyd's run replayed in numpy: same init, same argmin ties,
    same floor(sum/n) update, same empty-cluster inheritance — the Spark
    result's (n, inertia, checksum) must match exactly."""
    from delta_go_spark.functions.similarity import kmeans_int8
    from delta_go_spark.session import load_table

    k, iters = 4, 3
    by_id = _codes(spark)
    ids = sorted(by_id)
    X = np.stack([by_id[i] for i in ids])
    C = X[:k].copy()
    for _ in range(iters - 1):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        newC = C.copy()
        for j in range(k):
            pts = X[a == j]
            if len(pts):
                newC[j] = np.floor_divide(pts.sum(axis=0), len(pts))
        C = newC
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    a = d.argmin(axis=1)
    expected = {}
    w = np.arange(1, X.shape[1] + 1, dtype=np.int64)
    for j in range(k):
        m = a == j
        if m.any():
            expected[j] = (
                int(m.sum()),
                int(d[m, j].sum()),
                int((C[j] * w).sum()),
            )

    got = {
        int(r["cluster"]): (
            int(r["n_points"]),
            int(r["inertia"]),
            int(r["cent_cks"]),
        )
        for r in kmeans_int8(
            load_table(spark, SF_DIR, "embeddings"), k=k, iters=iters
        ).collect()
    }
    assert got == expected


def test_mmr_greedy_invariants(spark):
    """Seed = relevance argmax; every later pick maximizes
    rel_w*rel - div_w*maxsim over the remaining corpus (checked against a
    numpy replay); ids are distinct and exclude the query vector."""
    from delta_go_spark.functions.similarity import mmr_select
    from delta_go_spark.session import load_table

    by_id = _codes(spark)
    qv = by_id[0]
    cand = {i: v for i, v in by_id.items() if i != 0}
    rows = mmr_select(
        load_table(spark, SF_DIR, "embeddings"), k=5, query_vec_id=0
    ).collect()
    assert [r["rnk"] for r in rows] == [1, 2, 3, 4, 5]
    picked = [int(r["vec_id"]) for r in rows]
    assert len(set(picked)) == 5 and 0 not in picked

    rel = {i: int(v @ qv) for i, v in cand.items()}
    seed = min(cand, key=lambda i: (-rel[i], i))
    assert picked[0] == seed
    sel = [cand[seed]]
    for step, r in enumerate(rows[1:], start=2):
        remaining = {i: v for i, v in cand.items() if i not in picked[: step - 1]}
        scores = {
            i: 7 * rel[i] - 3 * max(int(v @ s) for s in sel)
            for i, v in remaining.items()
        }
        best = min(remaining, key=lambda i: (-scores[i], i))
        assert int(r["vec_id"]) == best
        assert int(r["mmr_score"]) == scores[best]
        sel.append(cand[best])


def test_mmr_k_exceeding_corpus_truncates(spark):
    from delta_go_spark.functions.similarity import mmr_select
    from delta_go_spark.session import load_table

    emb = load_table(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 4)
    out = mmr_select(emb, k=10, query_vec_id=0).collect()
    assert len(out) == 3  # corpus minus the query vector


def test_token_budget_boundary_is_tight(spark):
    """The selected set must fill the budget maximally under the greedy
    order: total within budget, and the first unselected doc would
    overflow it."""
    from delta_go_spark.functions.sampling import token_budget_select
    from delta_go_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    total = (
        token_budget_select(docs, 1)  # budget irrelevant for totals
        .agg(F.sum("n_tokens"))
        .first()[0]
    )
    budget = int(total) // 2
    out = token_budget_select(docs, budget).orderBy(
        F.desc("quality"), "doc_id"
    )
    rows = out.select("n_tokens", "cum_tokens", "selected").collect()
    sel = [r for r in rows if r["selected"]]
    assert sel and sel[-1]["cum_tokens"] <= budget
    first_out = next((r for r in rows if not r["selected"]), None)
    assert first_out is not None
    assert first_out["cum_tokens"] > budget


def test_gopher_rules_hand_fixture(spark):
    from delta_go_spark.functions.curation import gopher_rules

    good = " ".join(
        ["join hash rows batch scan filter merge sort"] * 4
    )  # 32 words, avg len ~4.6, marker-rich, high TTR fails (8 distinct/32)
    df = spark.createDataFrame(
        [
            (1, good),
            (2, "short text"),  # fails wordcount
            (3, None),  # dropped entirely
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_rules(df).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["r_wordcount"] and rows[1]["r_wordlen"]
    assert rows[1]["r_marker"] and rows[1]["r_symbol"]
    assert not rows[1]["r_ttr"]  # 8 distinct / 32 words < 0.75
    assert not rows[1]["pass_all"]
    assert not rows[2]["r_wordcount"]


def test_streaming_aggsink_runs_multiple_batches(spark):
    """maxFilesPerTrigger=1 over the 4-file source must produce 4 merge
    commits on top of the seed (versions 0..4) — the multi-batch shape is
    the point of the fixture."""
    from delta_go_spark.log import DeltaLog
    from delta_go_spark.streaming.windows import (
        streaming_delta_aggsink_events,
    )

    out = streaming_delta_aggsink_events(spark, SF_DIR)
    rows = out.collect()
    assert len(rows) >= 2  # several event types
    # find the freshly-built target from the result's lineage: cheapest is
    # to re-run the fold bookkeeping — the function returns the table df,
    # whose input files locate the table directory
    files = out.inputFiles()
    assert files
    import os

    table_dir = os.path.dirname(files[0].replace("file:", ""))
    log = DeltaLog.for_table(table_dir)
    assert log.update().version == 4  # seed + 4 micro-batch merges


def test_bucketed_table_reused_across_calls(spark):
    from delta_go_spark.operators.scalejoins import _bucketed_table

    a = _bucketed_table(spark, SF_DIR, "orders", "o_orderkey")
    b = _bucketed_table(spark, SF_DIR, "orders", "o_orderkey")
    assert a == b
    assert spark.catalog.tableExists(a)


def test_bucketed_table_invalidated_when_fixture_changes(spark, tmp_path):
    """A regenerated fixture under the SAME sf path must not be served the
    stale bucketed copy (r8: content-signature cache key)."""
    import shutil

    from delta_go_spark.operators.scalejoins import _bucketed_table

    sf = tmp_path / "sfX"
    sf.mkdir()
    shutil.copy(f"{SF_DIR}/orders.parquet", sf / "orders.parquet")
    a = _bucketed_table(spark, str(sf), "orders", "o_orderkey")
    n_a = spark.table(a).count()

    # regenerate the fixture in place: fewer rows, same path
    spark.read.parquet(f"{SF_DIR}/orders.parquet").limit(10).coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "small"))
    import glob
    import os

    part = glob.glob(str(tmp_path / "small" / "part-*.parquet"))[0]
    os.chmod(sf / "orders.parquet", 0o644)
    shutil.copy(part, sf / "orders.parquet")

    b = _bucketed_table(spark, str(sf), "orders", "o_orderkey")
    assert b != a  # new signature -> new catalog name, not the stale copy
    assert spark.table(b).count() == 10
    assert spark.table(a).count() == n_a  # old copy untouched, just unused


def test_pq_matches_numpy_replay(spark):
    """Per-block Lloyd training + encoding replayed in numpy must match
    the Spark (pq_code, recon_err) exactly for every vector."""
    from delta_go_spark.functions.similarity import pq_train_encode
    from delta_go_spark.session import load_table

    m, ksub, iters = 4, 4, 2
    by_id = _codes(spark)
    ids = sorted(by_id)
    X = np.stack([by_id[i] for i in ids])
    sub = X.shape[1] // m
    books = []
    for b in range(m):
        B = X[:, b * sub : (b + 1) * sub]
        C = B[:ksub].copy()
        for _ in range(iters - 1):
            d = ((B[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            a = d.argmin(axis=1)
            newC = C.copy()
            for j in range(ksub):
                pts = B[a == j]
                if len(pts):
                    newC[j] = np.floor_divide(pts.sum(axis=0), len(pts))
            C = newC
        books.append(C)
    expected = {}
    for row, i in enumerate(ids):
        code, err = 0, 0
        for b in range(m):
            blk = X[row, b * sub : (b + 1) * sub]
            d = ((blk[None, :] - books[b]) ** 2).sum(axis=1)
            a = int(d.argmin())
            code += a * ksub**b
            err += int(d[a])
        expected[i] = (code, err)

    got = {
        int(r["vec_id"]): (int(r["pq_code"]), int(r["recon_err"]))
        for r in pq_train_encode(
            load_table(spark, SF_DIR, "embeddings"), m=m, ksub=ksub, iters=iters
        ).collect()
    }
    assert got == expected


def test_pq_rejects_indivisible_dim(spark):
    from delta_go_spark.functions.similarity import pq_train_encode
    from delta_go_spark.session import load_table

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.slice("embedding", 1, 63).alias("embedding"), "label"
    )
    with pytest.raises(ValueError, match="not divisible"):
        pq_train_encode(emb, m=4).collect()


def test_rrf_fusion_contract(spark):
    """Every fused score must equal the sum of floor(1e12/(60+rank))
    contributions of the lists that contain the doc, and a doc present in
    both lists must outrank a same-rank doc present in one."""
    from delta_go_spark.queries import queries

    rows = queries()["rrf_hybrid_search_docs"](spark, SF_DIR).collect()
    assert rows
    big = 10**12
    for r in rows:
        want = 0
        if r["lex_rank"] is not None:
            want += big // (60 + int(r["lex_rank"]))
        if r["dense_rank"] is not None:
            want += big // (60 + int(r["dense_rank"]))
        assert int(r["rrf_score"]) == want
        assert r["lex_rank"] is not None or r["dense_rank"] is not None
    scores = [int(r["rrf_score"]) for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_curriculum_interleave_round_robin(spark):
    """Positions 1..S must be S distinct sources' rank-1 docs; within a
    source the positions must be strictly increasing in src_rank."""
    from delta_go_spark.functions.sampling import curriculum_interleave
    from delta_go_spark.session import load_table

    out = curriculum_interleave(load_table(spark, SF_DIR, "documents"))
    rows = out.select("source", "src_rank", "train_pos").collect()
    n_sources = len({r["source"] for r in rows})
    first_block = sorted(rows, key=lambda r: r["train_pos"])[:n_sources]
    assert {r["source"] for r in first_block} == {r["source"] for r in rows}
    assert all(r["src_rank"] == 1 for r in first_block)
    by_src = {}
    for r in sorted(rows, key=lambda r: r["train_pos"]):
        by_src.setdefault(r["source"], []).append(r["src_rank"])
    for ranks in by_src.values():
        assert ranks == sorted(ranks)


def test_vacuum_fixture_rebuilds_without_marker(spark):
    """VACUUM makes no commit, so the log version cannot prove the vacuum
    ran: a cache dir missing the post-vacuum marker (a run killed between
    the overwrite and the vacuum) must be rebuilt, not served."""
    import os
    import shutil

    from delta_go_spark.operators.delta_queries import (
        _CACHE_ROOT,
        delta_vacuum_agg,
    )

    delta_vacuum_agg(spark, SF_DIR)  # build (or reuse) the cache
    key = SF_DIR.strip("/").replace("/", "_")
    path = os.path.join(_CACHE_ROOT, key, "part_vacuumed")
    marker = os.path.join(path, "_dgs_vacuum_done")
    assert os.path.exists(marker)
    mtime = os.path.getmtime(os.path.join(path, "_delta_log"))
    os.remove(marker)  # simulate dying before the vacuum
    delta_vacuum_agg(spark, SF_DIR).collect()
    assert os.path.exists(marker)  # rebuilt through the vacuum step
    assert os.path.getmtime(os.path.join(path, "_delta_log")) >= mtime
    shutil.rmtree(path, ignore_errors=True)  # leave a clean cache behind


def test_proportional_quota_invariants(spark):
    """Quotas must sum to exactly n, stay within each stratum's size, and
    differ from the exact proportional share by less than one (the
    largest-remainder fairness guarantee)."""
    from delta_go_spark.functions.sampling import proportional_quota
    from delta_go_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    n = 97
    rows = proportional_quota(docs, n).collect()
    total = sum(r["n_total"] for r in rows)
    assert sum(r["quota"] for r in rows) == min(n, total)
    for r in rows:
        assert 0 <= r["quota"] <= r["n_total"]
        share = r["n_total"] * n / total
        assert abs(r["quota"] - share) < 1

    # n larger than the corpus: everything allocated, capped per stratum
    rows = proportional_quota(docs, 10**9).collect()
    assert all(r["quota"] == r["n_total"] for r in rows)


def test_proportional_quota_null_stratum_and_typed_key(spark):
    """A NULL stratum must allocate like any other group (real crawl data
    has NULL langs), and a non-string strata column must keep its type in
    the output schema."""
    from pyspark.sql.types import LongType

    from delta_go_spark.functions.sampling import proportional_quota

    df = spark.createDataFrame(
        [(i, None if i % 3 == 0 else f"s{i % 2}") for i in range(30)],
        "doc_id long, source string",
    )
    rows = {r["source"]: r["quota"] for r in proportional_quota(df, 9).collect()}
    assert None in rows and sum(rows.values()) == 9

    ints = spark.createDataFrame(
        [(i, i % 4) for i in range(40)], "doc_id long, bucket long"
    )
    out = proportional_quota(ints, 10, strata_col="bucket")
    assert isinstance(out.schema["bucket"].dataType, LongType)
    assert sum(r["quota"] for r in out.collect()) == 10
