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
# Driver correctness window (round 8)
#
# The driver hash-checks only the FIRST 50 registry entries at sf0.01, so
# ordering is the evidence-rotation mechanism.  `_WINDOW` lists exactly the
# 50 in-window queries, top = highest priority; everything else enters the
# registry afterwards via the `_ALL_MODULES` sweep (order below the boundary
# is irrelevant — those rows are pinned locally by the pytest oracle SAMPLE
# and scripts/check_parity.py).
#
# Round-8 rotation (the entire r7 window went 50/50 hash-green, so all of
# it moves below the boundary): (a) the ten NEW r8 operators + the one
# whose code changed (bucketed-join cache key); (b) the 17-row queue the
# r7 verdict fixed (5 late-r7 never-driver-checked + the 12 r4-stale
# rows); (c) 22 of the 33 non-TPC-H rows whose last driver evidence is round
# 5 (rows-only queries stay out of the window by policy).  After this
# round every non-TPC-H row's driver evidence is <= 3 rounds old; round 9
# rotates the r5 TPC-H block + the 11 remaining r5 rows (argmax_orders_per_status,
# doc_length_buckets, join_cross_regions, join_right_outer_parts,
# lang_source_matrix, pivot_lineitem_status, source_rank_by_lang,
# stats_agg_lineitem, vocab_by_source, window_lag_lead_orders,
# word_entropy_docs) + whatever r9 changes.
# New queries MUST be inserted at the TOP of _WINDOW (displacing a listed
# row explicitly — the size check refuses silent growth), keeping every
# query whose code changed this round inside the driver's evidence window.
# ---------------------------------------------------------------------------

_WINDOW: list = [
    # --- NEW in round 8 ---
    (curation, [
        "quality_classifier_docs",
        "doremi_weights_docs",
        "curation_pipeline_v2_docs",
    ]),
    (textops, ["pack_bestfit_docs", "length_batching_docs"]),
    (streaming_stateful, [
        "streaming_sessionize_events",
        "streaming_quota_gate_events",
    ]),
    (sampling, ["systematic_weighted_sample_docs"]),
    (multimodal, ["block_dedup_docs"]),
    # --- code changed in round 8 (bucketed-cache fixture signature) +
    # NEW third scale-join layout ---
    (scalejoins, ["bucketed_join_lineitem", "dpp_join_orders"]),
    # --- never driver-checked (landed late in r7, below the then-full
    # window; queued as the r8 rotation head by the r7 verdict) ---
    (delta_queries, ["delta_vacuum_agg", "delta_restore_agg"]),
    (textops, ["bigram_coverage_docs"]),
    (sampling, ["proportional_quota_docs"]),
    (safety, ["gram_novelty_docs"]),
    # --- last driver evidence: round 4 (the 12 that waited out round 7) ---
    (dedup, ["simhash_docs", "simhash_near_dup_docs"]),
    (textops, [
        "like_regexp_docs",
        "complex_types_docs",
        "pandas_udf_score_docs",
    ]),
    (multimodal, ["media_pipeline_summary"]),
    (streaming_windows, [
        "sliding_avg_events",
        "streaming_dedup_events",
        "session_windows_events",
    ]),
    (sampling, ["stratified_sample_docs", "mixture_sample_docs"]),
    (delta_queries, ["delta_sql_time_travel"]),
    # --- last driver evidence: round 5 (22 of the 33 non-TPC-H r5 rows;
    # the remaining 11 + the 21 TPC-H r5 rows rotate in round 9; the 3
    # rows-only queries — ann_lsh/ann_ivf/approx_distinct — stay OUT by
    # policy: no rows-only filler inside the hard-evidence window, their
    # gate is the recall/approx pytest suite) ---
    (coverage, [
        "agg_percentiles_lineitem",
        "grouping_sets_orders",
        "join_full_outer_nation",
    ]),
    (asof, ["asof_attribution_events"]),
    (curation, [
        "bigram_repetition_docs",
        "char_trigram_profile",
        "length_outlier_docs",
        "repetition_topword_docs",
        "source_similarity_docs",
        "word_rarity_docs",
    ]),
    (textops, ["cdc_chunk_docs", "hash_features_docs"]),
    (similarity, [
        "cosine_near_dup_docs",
        "mislabel_confusion_embeddings",
        "quantize_embeddings_int8",
    ]),
    (delta_queries, ["delta_dml_agg"]),
    (dedup, ["minhash_incremental_docs", "segment_dedup_docs"]),
    (rangejoin, ["range_join_purchase_errors"]),
    (sampling, ["sample_k_per_source_docs", "shuffle_shard_docs"]),
    (streaming_windows, ["streaming_interval_join_events"]),
]
# All former late-r7 below-boundary rows (delta_vacuum_agg,
# delta_restore_agg, bigram_coverage_docs, proportional_quota_docs,
# gram_novelty_docs) were rotated INTO _WINDOW above in round 8.
# Late-round-8 additions below the boundary (the window was full):
# label_centroid_drift_embeddings enters via the module sweep, is pinned
# in the pytest parity SAMPLE, and heads the round-9 rotation.

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
