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
# Driver correctness window (round 9)
#
# The driver hash-checks only the FIRST 50 registry entries at sf0.01, so
# ordering is the evidence-rotation mechanism.  `_WINDOW` lists exactly the
# 50 in-window queries, top = highest priority; everything else enters the
# registry afterwards via the `_ALL_MODULES` sweep (order below the boundary
# is irrelevant — those rows are pinned locally by the pytest oracle SAMPLE
# and scripts/check_parity.py).
#
# Round-9 rotation (the r8 window went 49/50; its one red row stays at the
# TOP): (a) doremi_weights_docs — the r8 driver hash mismatch, judge-
# unreproducible; its output order is now pinned and a per-column-diff
# pytest stands by (test_llm_ops_r9.py); (b) the three NEW r9 operators
# (span_scrub, doremi_incremental, streaming_late_data) plus
# streaming_sessionize (refactored into the shared replay body) and
# label_centroid_drift (late-r8, never driver-checked; dim guard moved
# in-pass); (c) the entire r5-stale block — 16 TPC-H shapes + 11
# non-TPC-H rows; (d) 17 of the 46 r6-stale rows (TPC-H headliners,
# delta convert/replace, streaming joins, sessions, scalar-function
# rows).  After this round no row's driver evidence predates round 6; the
# remaining 29 r6 rows head the round-10 rotation.  The 3 rows-only
# queries (ann_lsh/ann_ivf/approx_distinct) stay OUT by policy: no
# rows-only filler inside the hard-evidence window — their gate is the
# recall/approx pytest suite.
# New queries MUST be inserted at the TOP of _WINDOW (displacing a listed
# row explicitly — the size check refuses silent growth), keeping every
# query whose code changed this round inside the driver's evidence window.
# ---------------------------------------------------------------------------

_WINDOW: list = [
    # --- r9 head: the r8 red row, re-verified first (output order pinned) ---
    (curation, ["doremi_weights_docs"]),
    # --- NEW in round 9 ---
    (curation, ["span_scrub_docs", "doremi_incremental_docs"]),
    (safety, ["unique_gram_redact_docs"]),
    (similarity, ["semantic_decontaminate_embeddings"]),
    (textops, ["span_corrupt_docs"]),
    # softdedup NEW; dedup_clusters' code + oracle re-rendered through the
    # shared _cluster_sizes/_CSIZE_CTE in the same change -> both in-window
    (dedup, ["softdedup_weights_docs", "dedup_clusters_docs"]),
    (coverage, ["multiformat_ingest_docs"]),
    (streaming_stateful, [
        "streaming_late_data_events",
        # code changed in r9: replay body + oracle rendering shared with
        # the late-data query (rendered SQL byte-identical)
        "streaming_sessionize_events",
    ]),
    # --- never driver-checked (late r8) + r9 code change (in-pass dim guard) ---
    (similarity, ["label_centroid_drift_embeddings"]),
    # --- last driver evidence: round 5 — the TPC-H block ---
    (coverage, [
        "q2_min_cost_supplier",
        "q11_important_stock",
        "q12_priority_shipping",
        "q13_order_distribution",
        "q20_excess_quantity",
        "q21_waiting_suppliers",
    ]),
    (subqueries, [
        "q4_order_priority",
        "q7_volume_shipping",
        "q8_market_share",
        "q9_product_profit",
        "q14_promo_revenue",
        "q15_top_supplier",
        "q16_part_supplier",
        "q17_small_quantity",
        "q18_large_volume",
        "q19_discounted_revenue",
    ]),
    # --- last driver evidence: round 5 — the 11 remaining non-TPC-H rows ---
    (coverage, [
        "argmax_orders_per_status",
        "join_cross_regions",
        "join_right_outer_parts",
        "pivot_lineitem_status",
        "stats_agg_lineitem",
        "window_lag_lead_orders",
    ]),
    (curation, [
        "doc_length_buckets",
        "lang_source_matrix",
        "source_rank_by_lang",
        "vocab_by_source",
        "word_entropy_docs",
    ]),
    # --- last driver evidence: round 6 (17 of 46; the rest rotate in r10) ---
    (relational, [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q6_forecast_revenue",
        "q10_returned_items",
        # events_hourly_rollup displaced by dedup_clusters_docs -> r10;
        # agg_event_users displaced by softdedup_weights_docs -> r10;
        # date_functions_orders displaced by span_corrupt_docs -> r10
    ]),
    (subqueries, ["q22_global_sales"]),
    (delta_queries, ["delta_convert_agg", "delta_replace_agg"]),
    (streaming_windows, [
        "streaming_leftouter_join_events",
        "streaming_static_enrich_events",
    ]),
    # retention_cohorts_events displaced by multiformat_ingest_docs -> r10
    (sessions, ["sessionize_events"]),
    # null_semantics_orders and json_functions_events were displaced by
    # unique_gram_redact_docs and semantic_decontaminate_embeddings (new
    # queries enter at the top; both rejoin the r10 rotation with the
    # other r6 rows)
]
# The full r8 window went green (sole exception doremi, kept at the top);
# everything displaced above moved below the boundary where the pytest
# SAMPLE and scripts/check_parity.py remain its gate.
# Late-round-9 additions below the boundary (the window was full):
# contamination_report_docs and editdist_near_dup_docs enter via the
# module sweep, are pinned in the pytest parity SAMPLE, and head the
# round-10 rotation together with the six displaced r6 rows noted above.

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
