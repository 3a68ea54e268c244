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
# Driver correctness window (round 11)
#
# The driver hash-checks only the FIRST 50 registry entries at sf0.01, so
# ordering is the evidence-rotation mechanism.  `_WINDOW` lists exactly the
# 50 in-window queries, top = highest priority; everything else enters the
# registry afterwards via the `_ALL_MODULES` sweep (order below the boundary
# is irrelevant — those rows are pinned locally by the pytest oracle SAMPLE
# and scripts/check_parity.py).
#
# Round-11 rotation (the r10 window went 48/50; the two ERR rows were the
# inverted_index pair — the driver's pandas canonicalizer cannot hash an
# array-typed output column, fixed this round by scalarizing top_docs to a
# CSV string on both engines; tests/test_dtype_parity.py now lints every
# oracle-backed row's schema and replays the driver's exact sort_values
# canonicalization):
#   (a) both inverted_index rows stay at the TOP until they produce a
#       green driver hash, followed by every row whose code changed this
#       round — softdedup_incremental + the inverted pair gained DELETE
#       handling (v2 delete_where in the fixtures, cdf_net_changes
#       netting), waterfill gained the single-scan budget, the merge
#       rows (streaming_upsert, streaming_delta_aggsink, delta_scd2_agg)
#       ride the NULL-key-probe move in dml.py, unique_gram_redact gained
#       the exact-confirmation flag, delta_metadata_agg rides the
#       temporal-stat normalization in scan.py;
#   (b) the 4 late-r10 rows never driver-checked (delta_hilbert_agg,
#       equidepth_histogram, orc_roundtrip, delta_metadata_agg);
#   (c) the 7 rows displaced by r10b, last green round 6
#       (cube/join_left_outer/setops_segment/string_functions/
#       events_hourly/window_topk/agg_event_users);
#   (d) 27 of the 40 r7-stale rows.  The 13 deferred to the r12 head
#       (ann_ivf_int8, ann_signlsh, binary_stats, bpe_token_count,
#       chunk_documents, duplicated_gram_fraction, embedding_norms,
#       hash_sample, knn_cosine, plus fingerprint,
#       streaming_hourly_rollup, token_stats and lateral_topk displaced
#       by the NEW bm25_incremental, streaming_index_maintenance,
#       delta_snapshot_diff and profile_incremental rows) each keep >= 3
#       in-window class siblings.
# Rotated OUT r10-green: doremi pair, containment_near_dup, profile_table,
# hilbert_locality, exactsubstr, editdist, contamination_report, the whole
# re-greened r6 block, the delta cache-site representatives
# (roundtrip/time_travel/incremental/datasource/cdf/salted_skew/
# minhash_incremental) — all unchanged this round and below-window gated.
# The 3 rows-only queries (ann_lsh/ann_ivf/approx_distinct) stay OUT by
# policy: no rows-only filler inside the hard-evidence window — their gate
# is the recall/approx pytest suite.
# New queries MUST be inserted at the TOP of _WINDOW (displacing a listed
# row explicitly — the size check refuses silent growth), keeping every
# query whose code changed this round inside the driver's evidence window.
# ---------------------------------------------------------------------------

_WINDOW: list = [
    # --- r11 head: the two r10 driver-ERR rows (scalarized top_docs:
    # concat_ws/array_to_string landed on both engines) + every row whose
    # code changed this round ---
    # NEW in round 11: BM25 served from the CDF-maintained index state
    # (zero corpus scan at query time; composes the delete-aware
    # maintainers).  Displaces fingerprint_docs to the r12 queue.
    (textops, [
        "inverted_index_docs",
        "inverted_index_incremental_docs",
        "bm25_incremental_docs",
    ]),
    # delete-aware CDF maintenance landed this round (v2 delete_where in
    # the fixture; cdf_net_changes netting; sub-CC over surviving pairs)
    (dedup, ["softdedup_incremental_docs"]),
    # single-scan budget derivation (localCheckpoint) + deterministic
    # boundary-over-fallback level pick landed this round
    (sampling, ["waterfill_budget_docs"]),
    # the merge path changed this round (NULL-key probe moved after the
    # SetTransaction replay short-circuit, gated on insert_not_matched,
    # allow_null_keys escape hatch): keep every merge-exercising row in
    (streaming_windows, [
        "streaming_upsert_events",
        "streaming_delta_aggsink_events",
        # NEW in round 11: index upkeep as a Structured Streaming job over
        # the table's own change feed (displaces streaming_hourly_rollup
        # to the r12 queue — the streaming class keeps 4 in-window rows)
        "streaming_index_maintenance_docs",
    ]),
    (delta_queries, ["delta_scd2_agg"]),
    # exact-confirmation flag landed in unique_gram_redact this round
    (safety, ["unique_gram_redact_docs"]),
    # --- late-r10 additions never driver-checked (r11 queue item b);
    # delta_metadata_agg also rides this round's scan.py temporal-stat
    # normalization ---
    (delta_queries, ["delta_hilbert_agg", "delta_metadata_agg"]),
    # NEW in round 11: version-to-version row diff with file-set pruning
    # (displaces token_stats_docs to the r12 queue)
    (cdf_queries, ["delta_snapshot_diff"]),
    # NEW in round 11: CDF-incremental ANALYZE stats (displaces
    # lateral_topk_suppliers to the r12 queue — top-k keeps
    # window_topk_orders in-window)
    (coverage, [
        "profile_incremental_docs",
        "equidepth_histogram_docs",
        "orc_roundtrip_docs",
    ]),
    # --- the 7 rows displaced by r10b, last green round 6 (queue item c) ---
    (relational, [
        "cube_lineitem_counts",
        "join_left_outer_orders",
        "setops_segment_intersect",
        "string_functions_part",
        "events_hourly_rollup",
        "window_topk_orders",
        "agg_event_users",
    ]),
    # --- the r7-stale block (queue item d): 27 of the 40 rows whose last
    # green driver hash is round 7 (the 13 deferred are listed in the
    # header comment; each keeps >= 3 in-window class siblings and stays
    # gated by the pytest SAMPLE + check_parity) ---
    (curation, ["corpus_curation_pipeline", "gopher_rules_docs"]),
    (sampling, [
        "curriculum_interleave_docs",
        "dsir_affinity_docs",
        "token_budget_select_docs",
    ]),
    (safety, ["decontaminate_docs", "redact_pii_docs"]),
    (dedup, [
        "dedup_keep_longest_docs",
        "exact_dedup_docs",
        "minhash_near_dup_docs",
        "ngram_jaccard_pairs_docs",
    ]),
    (delta_queries, [
        "delta_generated_agg",
        "delta_optimize_agg",
        "delta_schema_evolution_agg",
    ]),
    (textops, [
        "lang_id_docs",
        "pack_sequences_docs",
        "quality_quartile_docs",
        "text_quality_docs",
        "tfidf_top_terms_docs",
    ]),
    (funnel, ["funnel_conversion_events"]),
    (similarity, [
        "kcenter_coreset_embeddings",
        "kmeans_embeddings",
        "mmr_diverse_embeddings",
        "pq_codebook_embeddings",
        "random_projection_embeddings",
        "rrf_hybrid_search_docs",
    ]),
    (streaming_stateful, ["stateful_running_totals"]),
]
# Everything displaced moved below the boundary where the pytest SAMPLE
# and scripts/check_parity.py remain its gate; the 13 deferred rows
# (listed in the header comment) head the round-12 rotation.

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
