"""Central query registry: name -> (spark_builder, duckdb_oracle_sql|None).

This is the single source of truth consumed by __spark_entry__.py, bench.py
and the parity tests.  Every operator claimed in SURVEY.md §2 Part B (plus
the LLM-pipeline extensions) has an entry here; entries with a SQL string
are hash-checked against DuckDB by the driver, entries with None get the
weaker rows-only check (approximate algorithms, verified in tests instead).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from delta_go_spark.functions import (
    curation,
    dedup,
    multimodal,
    safety,
    sampling,
    similarity,
    textops,
)
from delta_go_spark.streaming import stateful as streaming_stateful
from delta_go_spark.streaming import windows as streaming_windows
from delta_go_spark.operators import (
    asof,
    scalejoins,
    cdf_queries,
    coverage,
    delta_queries,
    funnel,
    rangejoin,
    relational,
    sessions,
    subqueries,
)

# ---------------------------------------------------------------------------
# Driver correctness window (round 7)
#
# The driver hash-checks only the FIRST 50 registry entries at sf0.01, so
# ordering is the evidence-rotation mechanism.  `_WINDOW` lists exactly the
# 50 in-window queries, top = highest priority; everything else enters the
# registry afterwards via the `_ALL_MODULES` sweep (order below the boundary
# is irrelevant — those rows are pinned locally by the pytest oracle SAMPLE
# and scripts/check_parity.py).
#
# Round-7 rotation (the entire r6 window went 50/50 hash-green, so all of it
# moves below the boundary):
#   (a) never driver-checked: kcenter_coreset_embeddings, dsir_affinity_docs
#       (landed late in r6, below the then-full window);
#   (b) queries whose code is NEW or CHANGED in round 7 (kmeans, MMR,
#       OPTIMIZE roundtrip, bucketed/salted joins, gopher rules, streaming
#       delta sink, token-budget select; label_col + SCD2-guard changes);
#   (c) as many of the 45 rows whose last driver evidence is ROUND 4 as
#       fit — 33 of them.  The 12 that wait for round 8 (simhash_docs,
#       simhash_near_dup_docs, like_regexp_docs, complex_types_docs,
#       pandas_udf_score_docs, media_pipeline_summary, sliding_avg_events,
#       streaming_dedup_events, session_windows_events,
#       stratified_sample_docs, mixture_sample_docs, delta_sql_time_travel)
#       each share a code path with an in-window relative and are
#       pytest-SAMPLE-pinned.
# New round-7 queries MUST be inserted at the TOP of _WINDOW (displacing a
# listed row explicitly — the size check refuses silent growth), keeping
# every query whose code changed this round inside the driver's evidence
# window.
# ---------------------------------------------------------------------------

_WINDOW: list = [
    # --- new-in-round-7 / never driver-checked ---
    (similarity, ["kcenter_coreset_embeddings"]),
    (sampling, ["dsir_affinity_docs"]),
    # --- code changed in round 7 (label_col parameterization; SCD2
    # negative-key guard) — changed code stays in the evidence window ---
    (similarity, [
        "ann_signlsh_docs",
        "ann_ivf_int8_docs",
        "random_projection_embeddings",
    ]),
    (delta_queries, ["delta_scd2_agg"]),
    # --- NEW round 7 ---
    (similarity, ["kmeans_embeddings", "mmr_diverse_embeddings"]),
    (delta_queries, ["delta_optimize_agg"]),
    (scalejoins, ["bucketed_join_lineitem", "salted_skew_join_events"]),
    (curation, ["gopher_rules_docs"]),
    (streaming_windows, ["streaming_delta_aggsink_events"]),
    (sampling, ["token_budget_select_docs"]),
    (similarity, ["rrf_hybrid_search_docs"]),
    (sampling, ["curriculum_interleave_docs"]),
    (similarity, ["pq_codebook_embeddings"]),
    # --- last driver evidence: round 4 ---
    (dedup, [
        "exact_dedup_docs",
        "minhash_near_dup_docs",
        "ngram_jaccard_pairs_docs",
        "dedup_keep_longest_docs",
        "dedup_clusters_docs",
    ]),
    (similarity, ["knn_cosine_docs", "embedding_norms"]),
    (textops, [
        "token_stats_docs",
        "text_quality_docs",
        "lang_id_docs",
        "fingerprint_docs",
        "tfidf_top_terms_docs",
        "quality_quartile_docs",
        "pack_sequences_docs",
        "chunk_documents_docs",
        "bpe_token_count_docs",
    ]),
    (curation, ["corpus_curation_pipeline"]),
    (sampling, ["hash_sample_docs"]),
    (multimodal, ["binary_stats_docs"]),
    (streaming_windows, ["streaming_hourly_rollup"]),
    (streaming_stateful, ["stateful_running_totals"]),
    (safety, [
        "decontaminate_docs",
        "redact_pii_docs",
        "duplicated_gram_fraction_docs",
    ]),
    (funnel, ["funnel_conversion_events"]),
    (subqueries, ["lateral_topk_suppliers"]),
    (delta_queries, [
        "delta_time_travel_count",
        "delta_roundtrip_agg",
        "delta_generated_agg",
        "delta_schema_evolution_agg",
        "delta_datasource_agg",
        "delta_incremental_agg",
    ]),
    (cdf_queries, ["delta_cdf_agg"]),
]
# Late-round-7 additions live BELOW the boundary (the window was already
# full of this round's new code + the stalest r4 rows): delta_vacuum_agg,
# delta_restore_agg, bigram_coverage_docs, proportional_quota_docs and
# gram_novelty_docs enter via the module sweep,
# are pinned in the pytest parity SAMPLE, and sit at the HEAD of the
# round-8 rotation together with the 12 waiting r4 rows (same precedent
# as kcenter/dsir in round 6).

# Every module with a QUERIES dict; the post-window sweep adds anything not
# already placed by _WINDOW, so nothing can silently fall out of the
# registry when a module grows.
_ALL_MODULES = [
    relational,
    scalejoins,
    coverage,
    subqueries,
    asof,
    rangejoin,
    funnel,
    sessions,
    dedup,
    similarity,
    textops,
    curation,
    sampling,
    safety,
    multimodal,
    streaming_windows,
    streaming_stateful,
    delta_queries,
    cdf_queries,
]

WINDOW_SIZE = 50


def registry() -> dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]]:
    out: dict = {}
    for mod, names in _WINDOW:
        for name in names:
            if name in out:
                raise ValueError(f"duplicate query name in _WINDOW: {name}")
            if name not in mod.QUERIES:
                raise ValueError(
                    f"_WINDOW names {name} but {mod.__name__} does not define it"
                )
            out[name] = mod.QUERIES[name]
    if len(out) != WINDOW_SIZE:
        raise ValueError(
            f"_WINDOW must hold exactly {WINDOW_SIZE} queries (the driver's "
            f"correctness window), got {len(out)} — displace or add rows "
            f"explicitly"
        )
    owners: dict[str, str] = {}
    for mod in _ALL_MODULES:
        for name, entry in mod.QUERIES.items():
            if name in owners:
                # a name defined in TWO modules would silently resolve to
                # whichever sweeps first — the driver would hash-check the
                # wrong implementation with no error anywhere
                raise ValueError(
                    f"query {name!r} defined in both {owners[name]} and "
                    f"{mod.__name__}"
                )
            owners[name] = mod.__name__
            out.setdefault(name, entry)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in registry().items() if sql is not None}
