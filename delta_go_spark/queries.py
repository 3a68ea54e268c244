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
# Driver correctness window (round 14)
#
# The driver hash-checks only the FIRST 50 registry entries at sf0.01, so
# ordering is the evidence-rotation mechanism.  `_WINDOW` lists exactly the
# 50 in-window queries, top = highest priority; everything else enters the
# registry afterwards via the `_ALL_MODULES` sweep (order below the boundary
# is irrelevant — those rows are pinned locally by the pytest oracle SAMPLE
# and scripts/check_parity.py).
#
# Round-14 rotation (optimization round 2/2; the r13 window went 50/50):
#   (a) every row whose code changed this round — the optimization targets
#       (funnel's struct-explode unpivot, the fused Lloyd update shared by
#       kmeans + pq_codebook, cosine's single-computed block table,
#       exactsubstr's shared gram frame, softdedup's broadcast sub-CC
#       sizes + checkpoint shave, minhash_incremental's checkpoint shave,
#       split_cluster_safe's eagerly-measured CC labels, the
#       key-cardinality-sized enrich state store) and every MERGE consumer
#       riding the dml.py probe gating (the streaming committers, SCD2/DML,
#       and the five stats/index maintainer rows, which also cover the
#       change through their per-batch merges);
#   (b) the 25-row r13-deferred queue — the TPC-H block q1-q22 (one shared
#       plan family, rotating as a block as planned) plus vocab_by_source,
#       word_entropy_docs and span_corrupt_docs (pre-verified 25/25 at
#       sf0.01 during r13).
# Rotated OUT r13-green: everything else from the r13 window — all
# unchanged this round and below-window gated (full-registry parity was
# re-swept green at r14 start with the optimization diff in place).
# The 3 rows-only queries (ann_lsh/ann_ivf/approx_distinct) stay OUT by
# policy: no rows-only filler inside the hard-evidence window — their gate
# is the recall/approx pytest suite.
# New queries MUST be inserted at the TOP of _WINDOW (displacing a listed
# row explicitly — the size check refuses silent growth), keeping every
# query whose code changed this round inside the driver's evidence window.
# ---------------------------------------------------------------------------

_WINDOW: list = [
    # --- r14 head (queue item a): every row whose code changed this round ---
    (funnel, ["funnel_conversion_events"]),
    (similarity, [
        "kmeans_embeddings",
        "pq_codebook_embeddings",
        "cosine_near_dup_docs",
    ]),
    (dedup, [
        "exactsubstr_dedup_docs",
        "softdedup_incremental_docs",
        "minhash_incremental_docs",
        # the r13 optimization round changed these plans (shared shingle
        # checkpoint, pagerank degree fold) AFTER the r13 window was
        # composed, so the new plans never received driver evidence —
        # the three spare slots close that gap
        "ngram_jaccard_pairs_docs",
        "containment_near_dup_docs",
        "pagerank_docs",
    ]),
    (sampling, ["split_cluster_safe_docs"]),
    (streaming_windows, [
        "streaming_static_enrich_events",
        "streaming_delta_aggsink_events",
        "streaming_upsert_events",
        "streaming_stats_maintenance_docs",
        "streaming_index_maintenance_docs",
    ]),
    (coverage, [
        "ndv_incremental_docs",
        "equidepth_incremental_docs",
        "profile_incremental_docs",
        "range_split_points_docs",
    ]),
    (delta_queries, ["delta_scd2_agg", "delta_dml_agg"]),
    (textops, [
        "bm25_incremental_docs",
        "inverted_index_incremental_docs",
    ]),
    (curation, ["doremi_incremental_docs"]),
    # --- the 25-row queue deferred by the r13 rotation (queue item b) ---
    (relational, [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q6_forecast_revenue",
        "q10_returned_items",
    ]),
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
        "q22_global_sales",
    ]),
    (curation, ["vocab_by_source", "word_entropy_docs"]),
    (textops, ["span_corrupt_docs"]),
]
# Everything displaced moved below the boundary where the pytest SAMPLE
# and scripts/check_parity.py remain its gate; after this window lands,
# every row's driver evidence is r10 or fresher.

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
