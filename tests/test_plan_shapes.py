"""Physical-plan regression guards for the scale-critical properties.

Correctness is gated by the DuckDB oracles; these tests gate the PLANS —
a change that silently turns a broadcast join into a shuffle join, or
un-pushes a parquet filter, still passes the oracles but would fall over
at 100 TB.  Asserting on the executed plan keeps those properties pinned.
"""

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "qname", ["q3_shipping_priority", "q5_local_supplier_volume", "q10_returned_items"]
)
def test_star_joins_broadcast_dimensions(spark, qname):
    from delta_go_spark.queries import queries

    plan = _plan(queries()[qname](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    # The star shape must never shuffle the fact table for a dim join.
    assert "SortMergeJoin" not in plan


def test_q6_filters_reach_parquet_scan(spark):
    from delta_go_spark.queries import queries

    plan = _plan(queries()["q6_forecast_revenue"](spark, SF_DIR))
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_q1_partial_aggregates_jvm_side(spark):
    # (AQE's pre-execution plan string has no WholeStageCodegen spans, so
    # assert the substance: map-side combine and zero Python row eval.)
    from delta_go_spark.queries import queries

    plan = _plan(queries()["q1_pricing_summary"](spark, SF_DIR))
    assert "partial_sum" in plan  # map-side combine before the shuffle
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python UDFs


def test_exact_dedup_single_shuffle(spark):
    from delta_go_spark.queries import queries

    plan = _plan(queries()["exact_dedup_docs"](spark, SF_DIR))
    # groupBy-based dedup: one hash exchange (plus AQE reads), no joins.
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "Join" not in plan


def test_tfidf_broadcasts_lang_totals(spark):
    from delta_go_spark.queries import queries

    plan = _plan(queries()["tfidf_top_terms_docs"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_cosine_near_dup_has_no_nested_loop(spark):
    """Exact near-dup pairs come from the block-pair EQUI-join (B(B+1)/2
    block rows, one vectorized matmul each) — never a row-level
    BroadcastNestedLoop/cartesian self-join, which passes the oracle at
    sf0.01 but explodes the task graph at any real scale."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["cosine_near_dup_docs"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_curation_queries_join_shapes(spark):
    """Curation module: the per-lang bounds join must broadcast its 5-row
    side, and no curation query may degrade to a nested-loop product."""
    from delta_go_spark.queries import queries

    qs = queries()
    outlier_plan = _plan(qs["length_outlier_docs"](spark, SF_DIR))
    assert "BroadcastHashJoin" in outlier_plan
    for name in (
        "length_outlier_docs",
        "repetition_topword_docs",
        "source_rank_by_lang",
        "vocab_by_source",
        "word_entropy_docs",
        "bigram_repetition_docs",
        "char_trigram_profile",
    ):
        plan = _plan(qs[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_pack_sequences_window_is_stream_partitioned(spark):
    """The running sum must be a window PARTITIONED BY the stream key —
    a global (empty-partition) window serializes the corpus through one
    task at any scale."""
    from delta_go_spark.queries import queries

    import re

    plan = _plan(queries()["pack_sequences_docs"](spark, SF_DIR))
    assert "Window" in plan
    # The window spec's first argument must be the stream key (a global
    # window renders as windowspecdefinition(doc_id... with no source#).
    assert re.search(r"windowspecdefinition\(source#", plan), plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_clusters_joins_are_hash_joins(spark):
    """Connected components: every per-round join must be an equi hash
    join on node ids (8-byte keys), never a nested-loop product."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["dedup_clusters_docs"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_decontaminate_is_broadcast_semi_join(spark):
    """Decontamination: probe grams must BROADCAST to the corpus side
    (one shuffle-free corpus stage + the final hits aggregate) — a
    shuffled join here would move every corpus gram hash at 100 TB."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["decontaminate_docs"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_chunk_documents_is_shuffle_free(spark):
    """Chunking must stay a narrow per-row flatMap inside the scan stage —
    no Exchange anywhere (the registry query's orderBy is presentation)."""
    from delta_go_spark.functions.textops import chunk_documents
    from delta_go_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = (
        chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan


def test_chunk_documents_boundaries(spark):
    from delta_go_spark.functions.textops import chunk_documents

    df = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),   # n == chunk: 1 chunk
            (2, " ".join(f"w{i}" for i in range(11))),   # one over: 2 chunks
            (3, "w0"),                                   # tiny doc: 1 chunk
            (4, " ".join(f"w{i}" for i in range(25))),   # 3 chunks
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(df, chunk_tokens=10, overlap=2).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["n_tokens"]))
    for v in got.values():
        v.sort()
    assert got[1] == [(0, 10)]
    assert got[2] == [(0, 10), (1, 3)]     # tail starts at token 9 (overlap 2)
    assert got[3] == [(0, 1)]
    # stride 8: starts 1, 9, 17 -> lengths 10, 10, 9
    assert got[4] == [(0, 10), (1, 10), (2, 9)]


def test_funnel_has_no_nested_loop(spark):
    """The per-step joins must be hash joins on the user key — never a
    BroadcastNestedLoop/cartesian (the funnel's 100 TB property)."""
    from delta_go_spark.operators.funnel import funnel_conversion_events

    plan = _plan(funnel_conversion_events(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_curation_pipeline_two_data_shuffles(spark):
    """The end-to-end pipeline must stay at two DATA shuffles (dedup key,
    stream key) + the presentation sort — and never a nested loop."""
    import re

    from delta_go_spark.functions.curation import corpus_curation_pipeline

    plan = _plan(corpus_curation_pipeline(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    hash_exchanges = re.findall(r"Exchange hashpartitioning", plan)
    assert len(hash_exchanges) <= 2, plan


def test_chunk_documents_randomized_coverage(spark):
    """Randomized invariant check (one job, 80 docs): chunk k starts at
    token k*stride+1; chunks tile the doc with exactly `overlap` shared
    tokens between neighbors; the union of non-overlap spans reconstructs
    every token index exactly once; no chunk is empty or oversized."""
    import random

    from delta_go_spark.functions.textops import chunk_documents

    rng = random.Random(7)
    rows = [
        (i, " ".join(f"t{i}_{j}" for j in range(rng.randint(1, 300))))
        for i in range(80)
    ]
    n_tokens = {i: len(t.split(" ")) for i, t in rows}
    df = spark.createDataFrame(rows, "doc_id long, text string")
    chunk, overlap = 64, 16
    stride = chunk - overlap
    got = {}
    for r in chunk_documents(df, chunk, overlap).collect():
        got.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r["n_tokens"]
    for i, n in n_tokens.items():
        chunks = got[i]
        assert set(chunks) == set(range(len(chunks)))  # contiguous idxs
        assert all(1 <= c <= chunk for c in chunks.values())
        # start of chunk k is k*stride; last chunk reaches exactly n
        last = max(chunks)
        assert last * stride + chunks[last] == n
        # every non-final chunk is full (only the tail may be short)
        for k in range(last):
            assert chunks[k] == chunk or (k * stride + chunks[k]) == n
        # no spurious tail: a chunk fully inside its predecessor never emits
        if last > 0:
            assert last * stride < n - overlap or last == 0


def test_quantize_int8_randomized_bounds(spark):
    """Randomized invariant check: codes within [-127, 127], max|code| is
    127 for any nonzero vector, reconstruction error <= scale/2 + eps,
    negative and tiny values included."""
    import random

    from delta_go_spark.functions.similarity import quantize_int8

    rng = random.Random(13)
    rows = [
        (
            i,
            [
                rng.uniform(-10, 10) * (10 ** rng.randint(-6, 3))
                for _ in range(16)
            ],
        )
        for i in range(60)
    ]
    src = {i: v for i, v in rows}
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    for r in quantize_int8(df).collect():
        v32 = [float(x) for x in src[r["vec_id"]]]
        import struct

        v32 = [struct.unpack("f", struct.pack("f", x))[0] for x in v32]
        scale = r["scale"]
        assert all(-127 <= q <= 127 for q in r["q"])
        assert max(abs(q) for q in r["q"]) == 127
        for x, q in zip(v32, r["q"]):
            assert abs(x - q * scale) <= scale / 2 + 1e-12, (x, q, scale)


def test_mixture_sample_broadcasts_thresholds(spark):
    """Per-source thresholds must attach via a broadcast join — never a
    shuffle of the corpus on the source key."""
    from delta_go_spark.functions.sampling import mixture_sample_docs

    plan = _plan(mixture_sample_docs(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_shuffle_shard_single_exchange(spark):
    """The shard window's hash partitioning must be reused by the per-shard
    aggregate — one exchange total, never a global sort."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["shuffle_shard_docs"](spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan.split("Sort [shard")[0], plan


def test_segment_dedup_shuffles_hashes_not_text(spark):
    """First-occurrence selection must be a partial-aggregable groupBy-min
    (skew-safe under hot boilerplate segments), never a window rank; and
    the reassembly join carries token arrays only on the doc_id side."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["segment_dedup_docs"](spark, SF_DIR))
    assert "partial_min" in plan, plan      # map-side combine on seg hash
    assert "Window" not in plan, plan       # no skew-prone global rank


def test_minhash_incremental_broadcasts_batch_bands(spark):
    """The new-batch band table must broadcast so the corpus band table is
    scanned in place — a sort-merge join here would shuffle the whole
    corpus on every ingest."""
    from pyspark.sql import functions as F

    from delta_go_spark.functions.dedup import (
        minhash_incremental_pairs,
        minhash_signatures,
    )
    from delta_go_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    sig = minhash_signatures(docs.filter(F.col("doc_id") % 4 != 0), num_perm=16)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    plan = _plan(minhash_incremental_pairs(sig, batch))
    assert "BroadcastHashJoin" in plan, plan


def test_minhash_incremental_oversized_batch_falls_back_to_shuffle(spark):
    """A backfill-sized batch must NOT be force-broadcast (an unguarded
    hint would OOM executors on a multi-GB build side) — past the
    session's autoBroadcastJoinThreshold the band join degrades to a
    plain shuffle join, and the pair set is unchanged either way."""
    from pyspark.sql import functions as F

    from delta_go_spark.functions.dedup import (
        minhash_incremental_pairs,
        minhash_signatures,
    )
    from delta_go_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    sig = minhash_signatures(docs.filter(F.col("doc_id") % 4 != 0), num_perm=16)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        guarded = minhash_incremental_pairs(sig, batch)
        assert "BroadcastHashJoin" not in _plan(guarded), _plan(guarded)
        fallback_rows = {tuple(r) for r in guarded.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    hinted_rows = {
        tuple(r) for r in minhash_incremental_pairs(sig, batch).collect()
    }
    assert fallback_rows == hinted_rows


def test_mislabel_confusion_stays_jvm_side(spark):
    """Centroid scoring is literal-array expressions — no Python row eval,
    and only the centroid aggregate plus the confusion groupBy shuffle."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["mislabel_confusion_embeddings"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_source_similarity_broadcasts_norms(spark):
    """Per-source norms (tiny) must broadcast onto the dot-product pairs."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["source_similarity_docs"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan


def test_sample_k_single_group_shuffle(spark):
    """Exact-k-per-group is one window over the group key — a single hash
    exchange before the final presentation sort."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["sample_k_per_source_docs"](spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_split_leakage_assignment_is_shuffle_free(spark):
    """Split assignment is a pure content-hash projection — the tagging
    itself must add NO exchange; the registry query's only shuffles are
    the leakage-guard groupBy and the report aggregate (guard broadcast
    onto the report)."""
    from pyspark.sql import functions as F

    from delta_go_spark.functions.sampling import leakage_safe_split
    from delta_go_spark.queries import queries
    from delta_go_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    tag_plan = _plan(leakage_safe_split(docs, F.md5("text")))
    assert "Exchange" not in tag_plan, tag_plan
    # Registry query: report agg (1) + guard's count-distinct pair (2),
    # all keyed on 16-byte hashes; the guard's single row broadcasts onto
    # the report (a 1-row BroadcastNestedLoop cross is the intended
    # shape, not a scale hazard).
    qplan = _plan(queries()["split_leakage_docs"](spark, SF_DIR))
    assert qplan.count("Exchange hashpartitioning") <= 3, qplan
    assert "BroadcastExchange" in qplan, qplan


def test_cdc_chunks_no_shuffle_before_explode(spark):
    """Chunking is ONE Arrow-batched pass over the scan followed by the
    explode — no exchange before the registry query's per-source
    aggregate, vectorized Python only (never row-at-a-time)."""
    from delta_go_spark.functions.textops import cdc_chunks
    from delta_go_spark.queries import queries
    from delta_go_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(cdc_chunks(docs))
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan, plan     # vectorized, not per-row
    assert "BatchEvalPython" not in plan, plan
    qplan = _plan(queries()["cdc_chunk_docs"](spark, SF_DIR))
    assert "BatchEvalPython" not in qplan, qplan


def test_normalized_dedup_single_shuffle_no_window(spark):
    """Group stats AND the canonical pick ride one partial-aggregable
    groupBy on the 16-byte normalized key — no Window, one hash
    exchange (skew-safe under hot boilerplate)."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["normalized_dedup_docs"](spark, SF_DIR))
    assert "Window" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial_max" in plan or "partial" in plan, plan


def test_ann_signlsh_is_filter_plus_takeordered(spark):
    """Sign-LSH ANN: one Arrow-batched signature pass over the scan, then
    a JVM filter/score ending in TakeOrderedAndProject — no join, no
    global sort, no row-at-a-time Python (the one collect is the single
    query row)."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["ann_signlsh_docs"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Join" not in plan, plan
    assert "ArrowEvalPython" in plan, plan       # vectorized, not per-row
    assert "BatchEvalPython" not in plan, plan


def test_quantization_recall_audit_plan(spark):
    """The audit's cross join is a 5-row broadcast probe panel (benign by
    design); per-query top-k rides windows over the tiny qid key; no
    Python row eval anywhere."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["quantization_recall_embeddings"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_lang_confusion_single_aggregate(spark):
    """Declared-vs-predicted audit: pure codegen scoring + ONE hash
    exchange for the two-key groupBy."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["lang_confusion_docs"](spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "BatchEvalPython" not in plan, plan


def test_random_projection_is_single_arrow_pass_no_shuffle(spark):
    """SRP dim reduction: one Arrow-batched pandas pass over the scan
    (quantize + int64 matmul fused), a plain projection after it — no
    exchange except the registry query's presentation sort, never
    row-at-a-time Python."""
    from delta_go_spark.functions.similarity import random_projection_int8
    from delta_go_spark.session import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    plan = _plan(random_projection_int8(emb))
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_pagerank_rounds_shuffle_only_long_pairs(spark):
    """Integer PageRank: per round one node-key join + one integer-sum
    aggregate — every exchange moves (long, long) rows, no Window, no
    Python in the loop; the edge/degree tables are localCheckpoint-reused
    so round N never replays the shingle explode."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["pagerank_docs"](spark, SF_DIR))
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    # the iteration input is materialized, not re-derived: the shingle
    # explode of the pair generation must not appear in the final plan
    assert "posexplode" not in plan.lower(), plan


def test_source_drift_chisq_broadcasts_tiny_aggregates(spark):
    """Chi-square drift: the cells/totals/dist aggregates are tiny-key
    (#sources x #langs); their joins back onto cells must broadcast, and
    the whole query stays JVM-side."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["source_drift_chisq_docs"](spark, SF_DIR))
    assert "BroadcastExchange" in plan, plan
    assert "EvalPython" not in plan, plan


def test_span_decontaminate_window_only_over_hits(spark):
    """Span decontamination: probe grams broadcast onto the corpus scan
    (semi-join, no corpus-wide shuffle); the islands window + run
    aggregates shuffle HITS only — the plan carries the broadcast
    semi-join and stays JVM-side."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["span_decontaminate_docs"](spark, SF_DIR))
    assert "BroadcastExchange" in plan, plan
    assert "LeftSemi" in plan, plan
    assert "EvalPython" not in plan, plan
    # the corpus side reaches the semi-join without a prior hash exchange:
    # every hash exchange in the plan sits above the semi-join (window /
    # aggregates over hits), so at most 3 remain (window, runs, per-doc)
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_cross_source_matrix_joins_pair_graph_not_corpus(spark):
    """Contamination matrix: the (id, source) projections join the PAIR
    GRAPH, and the n_pairs/n_docs aggregates ride the tiny sources^2 key
    — no Python, no cartesian product."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["cross_source_matrix_docs"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_bm25_is_filtered_explode_plus_takeordered(spark):
    """BM25: term filter sits under the explode's aggregate (match-bounded
    shuffle), df/stats are broadcast back, and the top-k ends in
    TakeOrderedAndProject — no global sort, no Python."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["bm25_search_docs"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert "EvalPython" not in plan, plan
    assert "Sort [" not in plan.replace("TakeOrderedAndProject", ""), plan


def test_winnow_fingerprints_no_shuffle_before_explode(spark):
    """Winnowing is ONE Arrow-batched pass over the scan + an explode of
    the surviving ~2/(w+1) fingerprints — no exchange, vectorized Python
    only; the registry query's sole data shuffle is the per-doc
    aggregate over the already-reduced fingerprint stream."""
    from delta_go_spark.functions.textops import winnow_fingerprints
    from delta_go_spark.queries import queries
    from delta_go_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(winnow_fingerprints(docs))
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    qplan = _plan(queries()["winnow_fingerprint_docs"](spark, SF_DIR))
    assert "BatchEvalPython" not in qplan, qplan
    # the registry query opts into the small-scan fan-out: on a
    # sub-parallelism scan exactly one round-robin exchange precedes the
    # Arrow pass (a no-op at scale where the scan arrives pre-split);
    # the only HASH exchange remains the per-doc aggregate
    assert qplan.count("Exchange roundrobin") <= 1, qplan


def test_pmi_bigrams_takeordered_with_partial_aggs(spark):
    """Collocation mining must end in TakeOrderedAndProject (never a
    global sort) with map-side partial aggregation on both count
    shuffles, and the corpus-total N broadcast onto the scored pairs."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["pmi_bigrams_docs"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Sort " not in plan.replace("SortAggregate", ""), plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_temperature_resample_single_rank_window(spark):
    """Membership is ONE rank window on the source key; the per-source
    targets (a handful of rows) must broadcast onto the corpus, never
    shuffle it a second time."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["temperature_resample_docs"](spark, SF_DIR))
    assert plan.count("Window") == 1, plan
    assert "BroadcastExchange" in plan, plan


def test_hard_negatives_broadcast_probe_panel(spark):
    """The probe panel broadcasts into the corpus cross join (corpus x 5
    rows, never corpus^2); the top-k window partitions on the tiny qid
    key; signatures stay Arrow/codegen (no row-at-a-time Python)."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["hard_negatives_embeddings"](spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_sessionize_single_user_exchange(spark):
    """Both window passes (lag + running session count) and the
    per-session aggregate ride ONE hash exchange on the user key —
    hashpartitioning(user_id) satisfies the (user_id, session_id)
    clustering, so Spark must not add a second shuffle."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["sessionize_events"](spark, SF_DIR))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_retention_cohorts_reduces_before_joining(spark):
    """The cohort join runs over distinct (user, week) pairs, never raw
    events: the plan must show partial aggregation before the exchange
    and no cartesian product."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["retention_cohorts_events"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "partial" in plan, plan


def test_cluster_representatives_groupby_not_window(spark):
    """The quality argmax rides the members groupBy as a struct-max —
    partial-aggregable, skew-safe under a giant boilerplate cluster —
    never a per-cluster Window sort."""
    from delta_go_spark.functions.dedup import cluster_representatives
    from delta_go_spark.session import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents")
    pairs = spark.createDataFrame([(0, 1)], "doc_id_a long, doc_id_b long")
    plan = _plan(cluster_representatives(docs, pairs))
    assert "Window" not in plan, plan
    assert "partial_max" in plan or "partial" in plan, plan


def test_fim_transform_pure_codegen_zero_shuffle(spark):
    """The FIM rewrite is a pure projection (md5 + substr + concat) —
    NO exchange before the registry query's per-source aggregate and no
    Python evaluation of any kind."""
    from delta_go_spark.functions.textops import fim_transform
    from delta_go_spark.queries import queries
    from delta_go_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    plan = _plan(fim_transform(docs))
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
    qplan = _plan(queries()["fim_transform_docs"](spark, SF_DIR))
    assert qplan.count("Exchange hashpartitioning") == 1, qplan


def test_bpe_merge_pairs_vocab_bounded_plan(spark):
    """Pair explosion happens on the distinct-word table (vocab-bounded),
    the top-k is TakeOrdered (never a global sort), and nothing evaluates
    in Python."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["bpe_merge_pairs_docs"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, plan
    assert "Window" not in plan, plan
    assert "EvalPython" not in plan, plan
    # corpus -> word counts is the ONLY exchange fed by corpus-sized data;
    # the (w,pair) and pair aggregates ride vocab-sized exchanges
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_matryoshka_recall_broadcast_probe_plan(spark):
    """Like quantization_recall: a broadcast 5-row probe panel, windows
    on qid only, no CartesianProduct, no Python eval."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["matryoshka_recall_embeddings"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_fan_out_small_scan_leaves_non_file_frames_alone(spark):
    """A failed or empty inputFiles() probe means 'parallelism unknown'
    (DSv2 relation, in-memory frame) — the helper must NOT bolt a full
    round-robin shuffle onto it (regression: it used to treat 0 files as
    0 splits and always repartition)."""
    from pyspark.sql import functions as F

    from delta_go_spark.session import fan_out_small_scan

    mem = spark.range(0, 100).select(F.col("id"))
    assert mem.inputFiles() == []
    out = fan_out_small_scan(mem, 32)
    assert "RoundRobinPartitioning" not in _plan(out), _plan(out)
    # a genuine small file scan still fans out ...
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = len(docs.inputFiles())
    if n < 32:
        spread = fan_out_small_scan(docs, 32)
        assert "RoundRobinPartitioning" in _plan(spread)
    # ... and a scan already at/above the floor is untouched
    assert fan_out_small_scan(docs, 1) is docs


def test_dsir_affinity_broadcast_stats_partial_aggs(spark):
    """Bucket stats (n_buckets-bounded) broadcast back to the token
    stream; both aggregates partial (map-side combine); no window, no
    Python, only the two groupBy exchanges."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["dsir_affinity_docs"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "Window" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "partial_count" in plan or "partial_sum" in plan, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_bucketed_join_no_shuffle_either_side(spark):
    """The bucketed co-located join's whole point: the sort-merge join
    consumes bucket-local data, so NO ShuffleExchange may appear below the
    join (the post-join aggregation is allowed its own exchange)."""
    from delta_go_spark.queries import queries

    df = queries()["bucketed_join_lineitem"](spark, SF_DIR)
    plan = _plan(df)
    assert "SortMergeJoin" in plan
    join_part = plan[plan.index("SortMergeJoin"):]
    # everything BELOW the join (its inputs) must be exchange-free
    assert "Exchange" not in join_part, join_part[:2000]
    # bucket pruning metadata proves the scan is bucket-aware
    assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan


def test_salted_skew_join_spreads_hot_key(spark):
    """The salted join must (a) keep the fact side explode-free, (b)
    replicate the dimension via explode, and (c) shuffle on BOTH the key
    and the salt so the hot key's rows split across SALT_N partitions."""
    from delta_go_spark.queries import queries

    df = queries()["salted_skew_join_events"](spark, SF_DIR)
    plan = _plan(df)
    assert "Generate explode" in plan  # dimension replication
    assert plan.count("Generate explode") == 1  # ...and ONLY the dimension
    # the equi-join keys include the salt column
    import re

    m = re.search(r"(SortMergeJoin|ShuffledHashJoin) \[([^\]]*)\]", plan)
    assert m, plan[:1500]
    assert "salt" in m.group(2), m.group(0)


@pytest.mark.parametrize(
    "qname",
    [
        "token_budget_select_docs",
        "curriculum_interleave_docs",
        "systematic_weighted_sample_docs",
    ],
)
def test_global_prefix_never_single_task_window(spark, qname):
    """Exact global order statistics must use the two-pass range-
    partitioned prefix: the plan carries a RangePartitioning exchange and
    NO un-partitioned window (windowspecdefinition with an empty
    partition list = every row through one task)."""
    import re

    from delta_go_spark.queries import queries

    plan = _plan(queries()[qname](spark, SF_DIR))
    assert "rangepartitioning" in plan.lower()
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        # partition columns precede the order columns; an EMPTY partition
        # list means the spec's very first entry already carries an
        # ASC/DESC direction — that is the single-task shape we forbid
        first = spec.split(",")[0]
        assert " ASC" not in first and " DESC" not in first, spec


def test_quality_classifier_no_shuffle_before_score(spark):
    """The classifier is ONE Arrow projection pass: no hash exchange, no
    explode, no window anywhere — the only exchanges allowed are the
    small-scan fan-out (round robin) and the output sort (range)."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["quality_classifier_docs"](spark, SF_DIR))
    assert "ArrowEvalPython" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Generate" not in plan, plan
    assert "Window" not in plan, plan


@pytest.mark.parametrize("qname", ["pack_bestfit_docs", "length_batching_docs"])
def test_per_stream_packing_plans(spark, qname):
    """Per-stream packers: one Arrow group pass on the stream key, partial
    map-side aggregation, no window, no explode, and at most the stream
    shuffle + aggregate exchanges (plus the output sort's range exchange)."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()[qname](spark, SF_DIR))
    assert "FlatMapGroupsInPandas" in plan, plan
    assert "Window" not in plan, plan
    assert "Generate" not in plan, plan
    assert "partial_" in plan, plan  # map-side combine before any exchange
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_dpp_join_prunes_fact_partitions(spark):
    """Dynamic partition pruning must actually fire: the month-partitioned
    fact scan's PartitionFilters carry a dynamicpruningexpression fed by
    the filtered dimension — not a full scan with a post-join filter."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["dpp_join_orders"](spark, SF_DIR))
    assert "dynamicpruningexpression" in plan, plan[:2000]
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE's runtime skew-join split — the automatic counterpart of the
    explicit salted join — must engage on a pathologically skewed key
    when thresholds are tuned to the fixture scale: the executed join
    carries the isSkew marker after adaptive replanning."""
    from delta_go_spark.operators.scalejoins import skew_key
    from delta_go_spark.session import load_table

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        # the downstream groupBy makes the skew split introduce an extra
        # shuffle; AQE declines that trade unless forced — which is the
        # right call for this pathological-skew scenario
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        # BOTH broadcast thresholds: AQE has its own runtime one that
        # would otherwise convert the tiny fixture join to broadcast
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # skew splits are MAPPER-granular: a single-task scan offers AQE
        # nothing to split, so fan the input out first (a no-op at real
        # scale where the fact side always has many map tasks)
        ev = (
            load_table(spark, SF_DIR, "events")
            .select(skew_key().alias("ck"), "value")
            .repartition(16)
        )
        cust = load_table(spark, SF_DIR, "customer").select(
            "c_custkey", "c_mktsegment"
        )
        j = ev.join(cust, ev["ck"] == cust["c_custkey"]).groupBy(
            "c_mktsegment"
        ).count()
        j.collect()  # AQE marks skew only in the EXECUTED adaptive plan
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isSkew=true" in plan or "skew=true" in plan.lower(), plan[:3000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_inverted_index_salted_topk_windows(spark):
    """The exact top-k must run salted-two-phase: the FIRST window spec
    partitions by (token, _salt) — bounding every sort group by
    salt_buckets*k — and postings aggregation combines map-side."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["inverted_index_docs"](spark, SF_DIR))
    assert "partial_count" in plan  # postings groupBy combines map-side
    assert "_salt" in plan  # phase-1 window is salt-partitioned
    assert "BatchEvalPython" not in plan


def test_profile_table_single_scan(spark):
    """The profiler reads the table ONCE: one parquet scan feeding the
    wide aggregate (the per-column rows come from exploding a 1-row frame,
    not from per-column scans)."""
    from delta_go_spark.queries import queries

    plan = _plan(queries()["profile_table_docs"](spark, SF_DIR))
    assert plan.count("Scan parquet") == 1
    assert "Expand" in plan  # the exact multi-NDV plan (documented cost)


def test_containment_joins_on_hash_not_string(spark):
    """Pair candidates join on the 64-bit shingle hash (16-byte shuffle
    rows), never the shingle string.

    Since r13 the (doc, h, n) shingle-set frame is localCheckpointed so
    the self-join materializes it once; the final plan therefore joins
    two ExistingRDD scans whose columns are ALL bigint (`#NNL`) — no
    string shingle survives past the checkpoint — while the xxhash64
    build lives inside the checkpointed subtree (asserted via the
    builder's own pre-checkpoint plan below)."""
    import re

    from delta_go_spark.queries import queries

    plan = _plan(queries()["containment_near_dup_docs"](spark, SF_DIR))
    assert "BatchEvalPython" not in plan
    # the join inputs are the checkpointed shingle sets: every scanned
    # column is a 64-bit long (attribute refs end in L), so the 24-byte
    # (doc, h, n) row — not the shingle string — is what shuffles
    scans = re.findall(r"Scan ExistingRDD\[([^\]]*)\]", plan)
    assert scans, plan
    for cols in scans:
        for attr in re.findall(r"#\d+(\w?)", cols):
            assert attr == "L", plan
    # the hash build itself still runs through xxhash64 (visible before
    # the checkpoint truncates the lineage)
    from delta_go_spark.functions.dedup import with_shingle_hashes
    from delta_go_spark.session import load_table

    docs = load_table(spark, SF_DIR, "documents")
    build_plan = (
        with_shingle_hashes(docs)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "xxhash64" in build_plan
