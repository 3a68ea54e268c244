"""Deterministic hash-based sampling — uniform and stratified.

A training-data pipeline needs *reproducible* samples: the same rows
selected on every run, on any cluster layout, with no RNG state.  Spark's
``df.sample``/``sampleBy`` are seed-dependent on partition layout, so we
sample by content hash instead: a row is kept iff the first 8 hex chars of
``md5(key || salt)`` fall below a threshold derived from the fraction.
Lexicographic comparison of lowercase hex equals numeric comparison, and
md5 of the same UTF-8 string is identical everywhere — so the DuckDB
oracle reproduces the EXACT same sample, row for row.

Scale: a narrow per-row hash + filter — no shuffle, no driver state,
pushed behind the scan's column pruning.  Changing ``salt`` draws an
independent sample; fixed salt = stable across runs (the property MinHash
band-hashing also relies on).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_go_spark.session import load_table

_HEX_DIGITS = 8
_SPACE = 16 ** _HEX_DIGITS


def fraction_threshold(fraction: float) -> str:
    """Map a fraction in [0, 1] to the 8-hex-digit exclusive upper bound."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return format(min(int(fraction * _SPACE), _SPACE - 1), f"0{_HEX_DIGITS}x")


def _bucket(key_cols: list[str], salt: str) -> Column:
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    if salt:
        key = F.concat(key, F.lit(salt))
    return F.substring(F.md5(key.cast("binary")), 1, _HEX_DIGITS)


def hash_sample(
    df: DataFrame, key_cols: list[str], fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows, selected by content hash
    of ``key_cols``.  Same inputs → same rows, independent of partitioning,
    session, or engine."""
    return df.filter(_bucket(key_cols, salt) < fraction_threshold(fraction))


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_cols: list[str],
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: stratum value → fraction.
    Strata missing from ``fractions`` fall back to ``default_fraction``."""
    thr: Column = F.lit(fraction_threshold(default_fraction))
    for value, fraction in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == value, F.lit(fraction_threshold(fraction))
        ).otherwise(thr)
    return df.filter(_bucket(key_cols, salt) < thr)


def _sql_bucket(key_expr: str, salt: str) -> str:
    salted = f"{key_expr} || '{salt}'" if salt else key_expr
    return f"substr(md5({salted}), 1, {_HEX_DIGITS})"


# ---------------------------------------------------------------------------
# Registry queries.  The oracles re-derive the identical sample in DuckDB,
# then both sides aggregate — count, char volume, and a sum-of-ids checksum
# that would catch any single-row membership difference.
_UNIFORM_FRACTION = 0.2
_STRATA_FRACTIONS = {"src0": 0.5, "src1": 0.25, "src2": 0.1}
_SALT = "dgs-r1"


def hash_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        hash_sample(docs, ["doc_id"], _UNIFORM_FRACTION, _SALT)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("lang")
    )


HASH_SAMPLE_SQL = f"""
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM documents
WHERE {_sql_bucket("CAST(doc_id AS VARCHAR)", _SALT)}
      < '{fraction_threshold(_UNIFORM_FRACTION)}'
GROUP BY lang
ORDER BY lang
"""


def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        stratified_hash_sample(
            docs, "source", _STRATA_FRACTIONS, ["doc_id"], _SALT,
            default_fraction=0.05,
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("source")
    )


_STRATA_CASE = " ".join(
    f"WHEN '{value}' THEN '{fraction_threshold(fraction)}'"
    for value, fraction in sorted(_STRATA_FRACTIONS.items())
)

STRATIFIED_SAMPLE_SQL = f"""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM documents
WHERE {_sql_bucket("CAST(doc_id AS VARCHAR)", _SALT)}
      < CASE source {_STRATA_CASE}
        ELSE '{fraction_threshold(0.05)}' END
GROUP BY source
ORDER BY source
"""


QUERIES: dict = {
    "hash_sample_docs": (hash_sample_docs, HASH_SAMPLE_SQL),
    "stratified_sample_docs": (stratified_sample_docs, STRATIFIED_SAMPLE_SQL),
}
