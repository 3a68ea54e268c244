"""Pytest gate over a sample of the registry's DuckDB oracles at sf0.001 —
the driver's correctness check in miniature, so `pytest tests/` catches an
oracle regression without the standalone scripts/check_parity.py run.

The sample: every curation query (newest surface), q12 (the one round-1
hash failure), and one representative per older module family.
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

SF_DIR = "/root/testdata/sf0.001"

SAMPLE = [
    # curation module (round 2)
    "repetition_topword_docs",
    "bigram_repetition_docs",
    "word_entropy_docs",
    "lang_source_matrix",
    "doc_length_buckets",
    "vocab_by_source",
    "char_trigram_profile",
    "length_outlier_docs",
    "source_rank_by_lang",
    # regression sentinels
    "q12_priority_shipping",
    "q1_pricing_summary",
    "exact_dedup_docs",
    "token_stats_docs",
    "asof_attribution_events",
    "delta_roundtrip_agg",
    # outside the driver's 50-query window this round — pytest is its gate
    "delta_cdf_agg",
]


@pytest.fixture(scope="module")
def duck():
    from check_parity import duckdb_for

    return duckdb_for(SF_DIR)


@pytest.mark.parametrize("name", SAMPLE)
def test_oracle_parity(spark, duck, name):
    from check_parity import compare_one

    from delta_go_spark.queries import registry

    fn, sql = registry()[name]
    assert sql is not None, f"{name} must carry an oracle"
    problems = compare_one(spark, duck, fn, sql, SF_DIR)
    assert not problems, f"{name}: {problems}"
