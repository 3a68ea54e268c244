"""Deterministic hash sampling (functions/sampling.py)."""

import pytest

from delta_go_spark.functions.sampling import (
    fraction_threshold,
    hash_sample,
    stratified_hash_sample,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from delta_go_spark.session import load_table

    return load_table(spark, SF_DIR, "documents").cache()


def test_threshold_mapping():
    assert fraction_threshold(0.0) == "00000000"
    assert fraction_threshold(1.0) == "ffffffff"
    assert fraction_threshold(0.5) == "80000000"


def test_sample_is_deterministic_and_near_fraction(docs):
    a = sorted(r["doc_id"] for r in hash_sample(docs, ["doc_id"], 0.3).collect())
    b = sorted(r["doc_id"] for r in hash_sample(docs, ["doc_id"], 0.3).collect())
    assert a == b
    n = docs.count()
    assert abs(len(a) / n - 0.3) < 0.08


def test_nested_fractions_nest(docs):
    # A 10% hash sample is a subset of the 30% sample (same key, same salt).
    small = {r["doc_id"] for r in hash_sample(docs, ["doc_id"], 0.1).collect()}
    large = {r["doc_id"] for r in hash_sample(docs, ["doc_id"], 0.3).collect()}
    assert small <= large


def test_salt_draws_independent_sample(docs):
    a = {r["doc_id"] for r in hash_sample(docs, ["doc_id"], 0.3, salt="x").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, ["doc_id"], 0.3, salt="y").collect()}
    assert a != b


def test_stratified_rates(docs):
    out = stratified_hash_sample(
        docs, "lang", {"en": 1.0}, ["doc_id"], default_fraction=0.0
    )
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    assert out.count() == docs.filter("lang = 'en'").count()
