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


# ---------------------------------------------------------------------------
# Corpus mixture sampling — the "data mixing" step of a training pipeline:
# given integer mixture weights per source and a token budget, sample each
# source down (deterministically) so the sampled corpus approximates the
# target mixture.  The fraction derivation is one tiny O(#sources)
# aggregate; the sampling itself is the same narrow hash filter as
# hash_sample, with per-source thresholds attached via a BROADCAST join —
# at thousands of sources this stays a map-side join, never a giant CASE
# expression and never a shuffle of the corpus.
def mixture_sample(
    df: DataFrame,
    source_col: str,
    weights: dict[str, int],
    budget_tokens: float,
    token_count: Column,
    key_cols: list[str],
    salt: str = "",
) -> DataFrame:
    """Deterministic mixture sampling.

    fraction_s = min(1, ((w_s / W) * budget_tokens) / tokens_s) — a source
    with fewer tokens than its target keeps everything (no upsampling).
    Weights are INTEGERS so the normalizer W is exact; the float formula
    is evaluated in one fixed parenthesization so an external engine (the
    DuckDB oracle) reproduces the identical IEEE doubles and therefore
    the identical per-source thresholds and row sets.  Sources absent
    from `weights` are dropped (weight 0).

    The per-source token totals are collected to the driver: one row per
    source, the same O(small) driver state as IVF centroids — never rows.
    """
    spark = df.sparkSession
    totals = {
        r["_s"]: r["_t"]
        for r in df.groupBy(F.col(source_col).alias("_s"))
        .agg(F.sum(token_count).alias("_t"))
        .collect()
        if r["_s"] in weights
    }
    W = sum(weights[s] for s in totals)
    rows = [
        (
            s,
            fraction_threshold(
                min(1.0, ((weights[s] / W) * budget_tokens) / totals[s])
            ),
        )
        for s in sorted(totals)
    ]
    thr = spark.createDataFrame(rows, f"{source_col} string, _thr string")
    return (
        df.join(F.broadcast(thr), source_col)
        .filter(_bucket(key_cols, salt) < F.col("_thr"))
        .drop("_thr")
    )


_MIX_SALT = "dgs-r4"


def mixture_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: re-mix the documents corpus to a 50%-of-total token
    budget where even-numbered sources get weight 2 and odd get weight 1.
    The oracle re-derives weights, totals, fractions, thresholds and the
    md5 sample membership entirely in SQL — hash-checking every sampled
    row's identity, not just the counts."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " "))
    per = docs.groupBy("source").agg(F.sum(toks).alias("t")).collect()
    weights = {
        r["source"]: 2 if int(r["source"][3:]) % 2 == 0 else 1 for r in per
    }
    budget = 0.5 * sum(r["t"] for r in per)
    sampled = mixture_sample(
        docs, "source", weights, budget, toks, ["doc_id"], _MIX_SALT
    )
    return (
        sampled.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).alias("sum_tokens"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("source")
    )


MIXTURE_SAMPLE_SQL = f"""
WITH tk AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS toks
  FROM documents
), tot AS (
  SELECT source, CAST(sum(toks) AS BIGINT) AS toks,
         CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
              THEN 2 ELSE 1 END AS w
  FROM tk GROUP BY source
), gl AS (
  SELECT CAST(sum(toks) AS BIGINT) AS t_all, CAST(sum(w) AS BIGINT) AS w_all
  FROM tot
), thr AS (
  SELECT source,
         lower(lpad(hex(CAST(least(floor(
           least(1.0, ((CAST(w AS DOUBLE) / w_all) * (0.5 * t_all)) / toks)
           * 4294967296), 4294967295) AS BIGINT)), 8, '0')) AS thr
  FROM tot, gl
)
SELECT tk.source,
       count(*) AS n_docs,
       CAST(sum(tk.toks) AS BIGINT) AS sum_tokens,
       CAST(sum(tk.doc_id) AS BIGINT) AS id_checksum
FROM tk JOIN thr ON tk.source = thr.source
WHERE substr(md5(CAST(tk.doc_id AS VARCHAR) || '{_MIX_SALT}'), 1, 8) < thr.thr
GROUP BY tk.source
ORDER BY tk.source
"""


QUERIES["mixture_sample_docs"] = (mixture_sample_docs, MIXTURE_SAMPLE_SQL)


# ---------------------------------------------------------------------------
# Shuffle-shard export — the FINAL step of a training-data pipeline: give
# every document a deterministic pseudorandom position in one of N shards
# so the training job reads a stable global permutation (no RNG state, no
# epoch-to-epoch drift, reproducible on any cluster layout).
#
# Plan shape (the part that matters at 100 TB): shard = content hash mod
# N, so ONE hash-partition exchange on the shard key distributes the
# corpus; the per-shard ordering is a sort WITHIN each shard (row_number
# window partitioned by shard) — there is never a global sort.  md5 is
# uniform, so shards are balanced by construction; pick n_shards so a
# shard ~= the target output file size (the shard is the unit one writer
# task must produce in order anyway).
def shuffle_shard(
    df: DataFrame,
    key_cols: list[str],
    n_shards: int,
    salt: str = "",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Assign each row a deterministic (shard, position) under a
    pseudorandom global permutation keyed by ``md5(key || salt)``.

    Position is dense 1..shard_size within each shard, ordered by the
    hash (ties broken by the key columns, so the permutation is total
    and reproducible even across hash collisions)."""
    from pyspark.sql.window import Window

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    hx = _bucket(key_cols, salt)
    out = df.withColumn("_hx", hx).withColumn(
        shard_col,
        F.pmod(F.conv(F.col("_hx"), 16, 10).cast("long"), F.lit(n_shards)).cast(
            "int"
        ),
    )
    w = Window.partitionBy(shard_col).orderBy(F.col("_hx"), *key_cols)
    return out.withColumn(pos_col, F.row_number().over(w)).drop("_hx")


def shuffle_shard_export(
    df: DataFrame,
    key_cols: list[str],
    n_shards: int,
    path: str,
    salt: str = "",
) -> None:
    """Write the shuffled corpus as ``path/shard=K/*.parquet``, each shard
    internally ordered by the permutation: one exchange on the shard key,
    then a (shard, pos) sort within each task.  Hash partitioning may
    co-locate several shards in one task, so the sort MUST lead with
    shard — sorting by pos alone would leave the dynamic-partition
    writer to re-sort on shard itself, and that implicit sort does not
    guarantee stability on pos once it spills at scale."""
    sharded = shuffle_shard(df, key_cols, n_shards, salt)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


_SHARD_SALT = "dgs-shard-r4"
_N_SHARDS = 16


def shuffle_shard_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: 16-shard permutation of the documents corpus,
    summarized per shard.  ``perm_checksum`` = sum(doc_id * pos) pins the
    ENTIRE permutation — swapping any two documents' positions changes it
    — so the hash match proves shard membership AND within-shard order,
    not just counts.  The shard-key agg reuses the window's partitioning
    (no second exchange; pinned in test_plan_shapes)."""
    docs = load_table(spark, sf_dir, "documents")
    sharded = shuffle_shard(docs, ["doc_id"], _N_SHARDS, _SHARD_SALT)
    return (
        sharded.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_checksum"),
            F.sum(F.col("doc_id") * F.col("pos")).alias("perm_checksum"),
        )
        .orderBy("shard")
    )


# 16 = 16^1 divides the 8-hex-digit hash space, so bucket mod 16 equals the
# value of the LAST hex digit — which DuckDB (no hex→int cast for strings)
# can compute portably via strpos on the digit alphabet.
SHUFFLE_SHARD_SQL = f"""
WITH h AS (
  SELECT doc_id,
         substr(md5(CAST(doc_id AS VARCHAR) || '{_SHARD_SALT}'), 1,
                {_HEX_DIGITS}) AS hx
  FROM documents
), s AS (
  SELECT doc_id, hx,
         CAST(strpos('0123456789abcdef',
                     substr(hx, {_HEX_DIGITS}, 1)) - 1 AS INT) AS shard
  FROM h
), p AS (
  SELECT doc_id, shard,
         row_number() OVER (PARTITION BY shard ORDER BY hx, doc_id) AS pos
  FROM s
)
SELECT shard,
       count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum,
       CAST(sum(doc_id * pos) AS BIGINT) AS perm_checksum
FROM p
GROUP BY shard
ORDER BY shard
"""


QUERIES["shuffle_shard_docs"] = (shuffle_shard_docs, SHUFFLE_SHARD_SQL)


# ---------------------------------------------------------------------------
# Exact-k-per-group sampling: "exactly k documents per stratum,
# reproducibly" — the fixed-budget complement to fraction-based
# stratified sampling (eval-set construction, per-source spot-check
# exports).  Rank rows inside each group by the same content hash the
# fraction samplers use and keep rank <= k: deterministic on any engine
# or layout, and nested (k=10 is a superset of k=5 for the same salt).
#
# Scale: one shuffle on the group key.  Rank is a window here (exact
# contract); if a group's rows outnumber executor memory, pre-filter
# with hash_sample at ~2k/|group| first so the window sees a small
# superset — the nesting property makes that pre-filter lossless.
def sample_k_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    key_cols: list[str],
    salt: str = "",
) -> DataFrame:
    """Keep the k rows with the smallest sample hash per group (ties
    broken by the key columns, so exactly k unless the group is
    smaller)."""
    from pyspark.sql.window import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = Window.partitionBy(group_col).orderBy(
        _bucket(key_cols, salt), *[F.col(c) for c in key_cols]
    )
    # collision-proof temp name: a caller's own _rk column must survive
    # (Spark resolution is case-INsensitive by default, so compare lowered)
    lowered = {c.lower() for c in df.columns}
    rk = "_rk"
    while rk in lowered:
        rk += "_"
    return (
        df.withColumn(rk, F.row_number().over(w))
        .filter(F.col(rk) <= k)
        .drop(rk)
    )


_K_PER_SOURCE = 5


def sample_k_per_source_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        sample_k_per_group(docs, "source", _K_PER_SOURCE, ["doc_id"], _SALT)
        .select("source", "doc_id", "n_chars")
        .orderBy("source", "doc_id")
    )


SAMPLE_K_PER_SOURCE_SQL = f"""
SELECT source, doc_id, n_chars
FROM (
  SELECT source, doc_id, n_chars,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {_sql_bucket("CAST(doc_id AS VARCHAR)", _SALT)}, doc_id
         ) AS rk
  FROM documents
)
WHERE rk <= {_K_PER_SOURCE}
ORDER BY source, doc_id
"""


QUERIES["sample_k_per_source_docs"] = (
    sample_k_per_source_docs,
    SAMPLE_K_PER_SOURCE_SQL,
)


# ---------------------------------------------------------------------------
# Leakage-safe train/val/test split: the assignment is a pure function of
# document CONTENT (hash of the content key), never of doc_id or position,
# so exact duplicates land in the same split by construction — the standard
# guard against train->eval contamination when a corpus carries duplicates.
# Generalizes to any grouping: pass a near-dup cluster representative as
# `key_col` and whole clusters stay within one split.
def leakage_safe_split(
    df: DataFrame,
    key_col: Column,
    train_pct: int = 90,
    val_pct: int = 5,
    salt: str = "split-v1",
) -> DataFrame:
    """Adds `split` ('train'|'val'|'test') derived from
    md5(key || salt) mod 100 — deterministic, reshuffle-free, and stable
    under corpus growth (adding documents never moves existing ones).

    Scale shape: one narrow projection over the scan, zero shuffle —
    split assignment at 100 TB is embarrassingly parallel.
    """
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.concat(key_col, F.lit(salt))), 1, 8), 16, 10
               ).cast("long"),
        F.lit(100),
    )
    return df.withColumn(
        "split",
        F.when(bucket < train_pct, "train")
        .when(bucket < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def split_leakage_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: split the documents table on the content key and
    report per (split, source) counts + id checksums, carrying the
    leakage invariant as a column — the number of content groups that
    straddle more than one split, computed from the tagged data itself
    (an implementation that keyed the split on anything but content
    would show non-zero and fail the value hash)."""
    docs = load_table(spark, sf_dir, "documents")
    tagged = leakage_safe_split(
        docs.withColumn("ck", F.md5("text")), F.col("ck")
    )
    leaked = (
        tagged.groupBy("ck")
        .agg(F.count_distinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).alias("leaked_groups"))
    )
    return (
        tagged.groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
        )
        .crossJoin(F.broadcast(leaked))
        .orderBy("split", "source")
    )


SPLIT_LEAKAGE_SQL = """
WITH keyed AS (
  SELECT doc_id, source, md5(text) AS ck,
         CAST(concat('0x', substr(md5(concat(md5(text), 'split-v1')), 1, 8))
              AS BIGINT) % 100 AS bucket
  FROM documents
), tagged AS (
  SELECT doc_id, source, ck,
         CASE WHEN bucket < 90 THEN 'train'
              WHEN bucket < 95 THEN 'val'
              ELSE 'test' END AS split
  FROM keyed
), guard AS (
  SELECT count(*) AS straddlers FROM (
    SELECT ck FROM tagged GROUP BY ck HAVING count(DISTINCT split) > 1)
)
SELECT split, source, count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       (SELECT straddlers FROM guard) AS leaked_groups
FROM tagged GROUP BY split, source ORDER BY split, source
"""


QUERIES["split_leakage_docs"] = (split_leakage_docs, SPLIT_LEAKAGE_SQL)


def cluster_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_id_a",
    b_col: str = "doc_id_b",
    train_pct: int = 90,
    val_pct: int = 5,
    salt: str = "cluster-split-v1",
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Near-dup-AWARE train/val/test split: tag `df` so that connected
    components of the `pairs` graph travel together — the split an eval
    pipeline actually needs, since a paraphrase of a training doc in the
    test set is leakage even though no byte matches.

    `pairs` is ANY near-duplicate pair source with (a_col, b_col) id
    columns.  The exact >=threshold Jaccard graph
    (``dedup.ngram_jaccard_pairs``) is the exact-contract baseline used
    by the oracle-backed registry row; at 100 TB feed the banded
    candidates instead — ``dedup.minhash_lsh_pairs`` or
    ``dedup.simhash_near_dup_pairs`` — whose output plugs in unchanged (the
    scale path pinned by tests/test_plan_shapes.py).

    Composition of two existing scale paths: min-label connected
    components over (long,long) pairs (pass `checkpoint_dir` for
    reliable lineage truncation on long cluster jobs), then the
    zero-shuffle content-hash split keyed on the component
    representative (a row's own id when unclustered).  Returns `df`
    plus `rep` and `split` columns; clusters straddling splits is
    provably 0 because the key is constant within a component.
    """
    from delta_go_spark.functions.dedup import connected_components

    from delta_go_spark.hints import broadcast_if_small, measured_df_bytes

    # the label table is O(clustered docs) — a measured, size-guarded
    # broadcast keeps the corpus side unshuffled (it sort-merge joined
    # before).  connected_components returns a PROJECTION over its last
    # lazy checkpoint, so measuring it (or any rename on top — the r13
    # ADVICE finding) always paid an aggregate job; one EAGER checkpoint
    # of the final label frame makes that materialization double as the
    # size measurement (checkpointed_storage_bytes' zero-job block-manager
    # read) and lets the broadcast build read the cached rows.
    labels = connected_components(
        pairs, a_col=a_col, b_col=b_col, checkpoint_dir=checkpoint_dir
    ).localCheckpoint()
    cc = broadcast_if_small(
        labels.withColumnRenamed("node", id_col), measured_df_bytes(labels)
    )
    rep = df.join(cc, id_col, "left").withColumn(
        "rep", F.coalesce("cluster_rep", F.col(id_col))
    ).drop("cluster_rep")
    return leakage_safe_split(
        rep,
        F.col("rep").cast("string"),
        train_pct=train_pct,
        val_pct=val_pct,
        salt=salt,
    )


def split_cluster_safe_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: :func:`cluster_safe_split` over the EXACT
    >=0.6-Jaccard pair graph (the exactness is what the DuckDB oracle
    needs — a recursive-CTE transitive closure replays the same
    components; production swaps in minhash pairs, see
    cluster_safe_split), reporting per (split, source) counts +
    id checksums with the self-computed leaked-clusters invariant."""
    from delta_go_spark.functions.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    # two consumers below (the leaked-clusters gate and the per-split
    # aggregate) otherwise re-run the corpus-sized docs ⟕ labels join +
    # split tagging end to end (two identical subtrees in
    # plans/r13/split_cluster_safe_docs_before.txt); project to the four
    # columns both need and materialize once
    tagged = (
        cluster_safe_split(docs, ngram_jaccard_pairs(docs))
        .select("doc_id", "source", "rep", "split")
        .localCheckpoint(eager=False)
    )
    leaked = (
        tagged.groupBy("rep")
        .agg(F.count_distinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).alias("leaked_clusters"))
    )
    return (
        tagged.groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
        )
        .crossJoin(F.broadcast(leaked))
        .orderBy("split", "source")
    )


def _split_cluster_safe_sql() -> str:
    from delta_go_spark.functions.dedup import _CLOSURE_CTES, _JACCARD_PAIRS_CTES

    return f"""
WITH RECURSIVE {_JACCARD_PAIRS_CTES}, {_CLOSURE_CTES}, rep AS (
  SELECT d.doc_id, d.source, coalesce(l.cluster_rep, d.doc_id) AS rep,
         CAST(concat('0x', substr(md5(concat(CAST(coalesce(l.cluster_rep,
                d.doc_id) AS VARCHAR), 'cluster-split-v1')), 1, 8))
              AS BIGINT) % 100 AS bucket
  FROM documents d LEFT JOIN labels l USING (doc_id)
), tagged AS (
  SELECT doc_id, source, rep,
         CASE WHEN bucket < 90 THEN 'train'
              WHEN bucket < 95 THEN 'val'
              ELSE 'test' END AS split
  FROM rep
), guard AS (
  SELECT count(*) AS straddlers FROM (
    SELECT rep FROM tagged GROUP BY rep HAVING count(DISTINCT split) > 1)
)
SELECT split, source, count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum,
       (SELECT straddlers FROM guard) AS leaked_clusters
FROM tagged GROUP BY split, source ORDER BY split, source
"""


QUERIES["split_cluster_safe_docs"] = (
    split_cluster_safe_docs,
    _split_cluster_safe_sql(),
)


# ---------------------------------------------------------------------------
# Temperature-scaled mixture resampling (the multilingual-pretraining
# alpha-sampling rule, alpha = 0.5: target share of source s ∝ n_s^alpha) —
# flattens the source distribution so head sources stop drowning the tail
# without hand-written weights.  All arithmetic is exactly replayable:
# sqrt(n_s) is ONE correctly-rounded IEEE op, floor(sqrt * 1e6) makes the
# weight an integer, the normalizer is an integer sum, and the per-source
# target is an integer division — no float accumulation anywhere (contrast
# mixture_sample's float budget formula, which pins ONE parenthesization
# instead; here the weights must be summed, and float sums are
# order-dependent).
def temperature_resample(
    df: DataFrame,
    source_col: str,
    budget: Column,
    key_cols: list[str],
    salt: str = "",
) -> DataFrame:
    """Keep, per source, the `floor(budget * (w_s / W))` rows with the
    smallest content hash (capped at the source's own size — this is a
    sampler, not an upsampler), where w_s = floor(sqrt(n_s) * 1e6).
    `budget` is an aggregate-expression over the counts frame (e.g.
    `F.expr("sum(n) div 2")` for half the corpus).

    The result carries two documented extra columns per row — `_n_source`
    (the source's original row count) and `_target` (its computed quota)
    — so callers can report coverage without a second counts pass; input
    columns named `_n_source`/`_target`/`_rk` would collide with the
    internals, so they are rejected loudly.

    The target is evaluated as floor(double(budget) * (w_s / W)): one
    exactly-rounded IEEE divide (w_s/W <= 1) and one multiply, identical
    on any engine, with NO int64 overflow ceiling — the integer form
    `budget * w_s div W` would overflow at ~1e9 rows per source (w_s ~
    3e10 times a 5e8 budget exceeds 2^63; ANSI mode would raise, non-ANSI
    would wrap negative and silently drop the source).  Exact-integer
    inputs up to 2^53 (corpus rows through ~1e15) round-trip the double
    path losslessly.

    Scale shape: per-source counts reduce to a handful of rows; targets
    broadcast back; membership is one rank window on the source key —
    the one shuffle (sample_k_per_group's giant-group hash_sample
    pre-filter applies unchanged if a source outgrows a partition)."""
    from pyspark.sql.window import Window

    clash = sorted(
        {"_n_source", "_target", "_rk"} & {c.lower() for c in df.columns}
    )
    if clash:
        raise ValueError(
            f"temperature_resample: input columns {clash} collide with "
            "the operator's internal/output columns"
        )
    counts = df.groupBy(F.col(source_col).alias("_s")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w_micro = F.floor(F.sqrt(F.col("n").cast("double")) * 1e6).cast("long")
    tot = counts.agg(
        F.sum(w_micro).alias("_w_all"), budget.cast("long").alias("_budget")
    )
    # target: least(n_s, floor(budget * (w_s / W))) — overflow-free, see
    # docstring
    targets = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("_s").alias(source_col),
            F.col("n").alias("_n_source"),
            F.least(
                F.col("n"),
                F.floor(
                    F.col("_budget").cast("double")
                    * (w_micro.cast("double") / F.col("_w_all").cast("double"))
                ).cast("long"),
            ).alias("_target"),
        )
    )
    rk = Window.partitionBy(source_col).orderBy(
        _bucket(key_cols, salt), *[F.col(c) for c in key_cols]
    )
    return (
        df.join(F.broadcast(targets), source_col)
        .withColumn("_rk", F.row_number().over(rk))
        .filter(F.col("_rk") <= F.col("_target"))
        .drop("_rk")
    )


_TEMP_SALT = "dgs-r6t"


def temperature_resample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: resample documents to a half-corpus budget at
    temperature 0.5; per-source counts, targets and a membership
    checksum pin every selected row."""
    docs = load_table(spark, sf_dir, "documents")
    sel = temperature_resample(
        docs, "source", F.expr("sum(n) div 2"), ["doc_id"], _TEMP_SALT
    )
    return (
        sel.groupBy("source")
        .agg(
            F.max("_n_source").alias("n_source"),
            F.max("_target").alias("target_n"),
            F.count(F.lit(1)).alias("n_selected"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("source")
    )


TEMPERATURE_RESAMPLE_SQL = f"""
WITH counts AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n,
         CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1e6) AS BIGINT) AS w
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(w) AS BIGINT) AS w_all,
         CAST(sum(n) AS BIGINT) // 2 AS budget
  FROM counts
), targets AS (
  SELECT source, n,
         least(n, CAST(floor(CAST(budget AS DOUBLE)
                             * (CAST(w AS DOUBLE) / CAST(w_all AS DOUBLE)))
                       AS BIGINT)) AS target
  FROM counts, tot
), ranked AS (
  SELECT d.doc_id, d.source, t.n, t.target,
         row_number() OVER (
           PARTITION BY d.source
           ORDER BY {_sql_bucket("CAST(d.doc_id AS VARCHAR)", _TEMP_SALT)},
                    d.doc_id
         ) AS rk
  FROM documents d JOIN targets t USING (source)
)
SELECT source,
       max(n) AS n_source,
       max(target) AS target_n,
       count(*) AS n_selected,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM ranked
WHERE rk <= target
GROUP BY source
ORDER BY source
"""


QUERIES["temperature_resample_docs"] = (
    temperature_resample_docs,
    TEMPERATURE_RESAMPLE_SQL,
)


# ---------------------------------------------------------------------------
# DSIR-style importance-weighted data selection (Xie et al. 2023,
# arXiv:2302.03169 "Data Selection for Language Models via Importance
# Resampling"): score raw-corpus documents by how target-like their
# hashed-unigram profile is, then keep the top of the ranking.  DSIR's
# weight is the log-likelihood ratio of two hashed bag-of-ngrams models;
# log cannot be value-hashed across engines (libm last-ulp divergence —
# the bm25/pmi finding), so the score here is the exact integer posterior
# surrogate per bucket:
#
#     s[b] = (1e6 * (ct[b]+1)) div (ct[b]+cr[b]+2)
#
# — add-one-smoothed P(target | token in bucket b) in micro-units, the
# same monotone-in-the-ratio surrogate family (it orders buckets exactly
# by ct/cr).  A document's affinity is the plain integer sum of its
# tokens' bucket scores (order-free, overflow-safe: 1e6 * tokens), and
# the mean normalizes away length.  Everything is exactly replayable:
# the md5 bucket is hash_features' proven formula, counts are integers,
# div is floor division on positives in both engines.
#
# Scale shape: two passes over the corpus scan, each ending in a
# partial-aggregable groupBy — (bucket, is_target) stats (n_buckets-
# bounded output, broadcast back) and the per-doc sum.  No window, no
# corpus-sized join side, nothing quadratic; the bucket-stats broadcast
# is n_buckets rows regardless of corpus size.


# Bucket modulus shared by dsir_affinity's Python default AND its oracle
# SQL (the hash_features `_FEATURE_DIM` convention) — one value, no way
# for the two sides to desynchronize.
_DSIR_BUCKETS = 256


def dsir_affinity(
    df: DataFrame,
    target: Column,
    n_buckets: int = _DSIR_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document target-affinity scores: (id, n_toks, affinity_sum,
    affinity_mean_micro).  `target` is a boolean Column marking the
    target-domain rows INSIDE df (DSIR scores raw docs against a target
    sample; keeping both in one frame lets the bucket stats come from a
    single aggregate).  Zero-token docs are excluded (no profile to
    score).  Selection is the caller's `orderBy(desc).limit(budget)`."""
    from delta_go_spark.functions.textops import az_tokens

    toks = az_tokens(text_col)
    bkt = F.pmod(
        F.conv(F.substring(F.md5(F.col("_t")), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )
    exploded = (
        df.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("_id"),
            target.alias("_tgt"),
            F.explode(toks).alias("_t"),
        )
        .select("_id", "_tgt", bkt.alias("_b"))
    )
    stats = (
        exploded.groupBy("_b")
        .agg(
            F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).cast("long").alias("ct"),
            F.sum(F.when(F.col("_tgt"), 0).otherwise(1)).cast("long").alias("cr"),
        )
        .select(
            "_b",
            F.expr("(1000000 * (ct + 1)) div (ct + cr + 2)").alias("s"),
        )
    )
    return (
        exploded.join(F.broadcast(stats), "_b")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_toks"),
            F.sum("s").cast("long").alias("affinity_sum"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_toks",
            "affinity_sum",
            F.expr("affinity_sum div n_toks").alias("affinity_mean_micro"),
        )
    )


def dsir_affinity_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: DSIR affinity of every document against the
    src0/src1 target slice (the 10% 'high-quality domain'), every score
    value-hashed.  The scan fans out first: the token explosion is the
    CPU-heavy stage, and a single-row-group test file would serialize it
    on one core (no-op on a pre-split production scan)."""
    from delta_go_spark.session import fan_out_small_scan

    docs = fan_out_small_scan(
        load_table(spark, sf_dir, "documents"),
        spark.sparkContext.defaultParallelism,
    )
    return dsir_affinity(
        docs, F.col("source").isin("src0", "src1")
    ).orderBy("doc_id")


DSIR_AFFINITY_SQL = f"""
WITH ex AS (
  SELECT doc_id,
         source IN ('src0', 'src1') AS tgt,
         CAST(CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % {_DSIR_BUCKETS} AS BIGINT) AS b
  FROM (
    SELECT doc_id, source,
           unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              x -> x <> '')) AS tok
    FROM documents WHERE text IS NOT NULL
  )
), stats AS (
  SELECT b,
         (1000000 * (CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) + 1))
           // (count(*) + 2) AS s
  FROM ex GROUP BY b
)
SELECT e.doc_id,
       count(*) AS n_toks,
       CAST(sum(st.s) AS BIGINT) AS affinity_sum,
       CAST(sum(st.s) AS BIGINT) // count(*) AS affinity_mean_micro
FROM ex e JOIN stats st ON e.b = st.b
GROUP BY e.doc_id
ORDER BY e.doc_id
"""


QUERIES["dsir_affinity_docs"] = (dsir_affinity_docs, DSIR_AFFINITY_SQL)


# ---------------------------------------------------------------------------
# Token-budget greedy selection: fill a fixed training-token budget with the
# highest-quality documents first — the final packing decision of every
# curation pipeline ("we can afford N tokens; which docs make the cut?").
def with_token_quality(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(original cols) + n_tokens + quality (distinct-token count), the
    shared az_tokens contract — the ONE tokenize pass token_budget_select
    and its callers reuse."""
    from delta_go_spark.functions.textops import az_tokens

    return (
        df.filter(F.col(text_col).isNotNull())
        .withColumn("_toks", az_tokens(text_col))
        .withColumn("n_tokens", F.size("_toks").cast("long"))
        .withColumn(
            "quality", F.size(F.array_distinct("_toks")).cast("long")
        )
        .drop("_toks")
    )


def token_budget_select(
    df: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    precomputed: bool = False,
) -> DataFrame:
    """Adds (n_tokens, quality, cum_tokens, selected): documents ranked by
    quality = distinct-token count (ties on id), selected while the
    INCLUSIVE running token total stays within the budget.

    Scale note: the running total is computed with the two-pass
    range-partitioned prefix (_global_prefix) — per-range local sums in
    parallel, O(partitions) subtotals to the driver, offsets broadcast
    back — never an un-partitioned single-task window.  The tokenizer is
    the shared az_tokens contract.  precomputed=True declares the frame
    already carries with_token_quality's n_tokens/quality columns (the
    caller tokenized once for its own budget total) — an EXPLICIT opt-in,
    because silently trusting any columns that happen to share those
    names would compute the fill from foreign numbers."""
    if precomputed:
        missing = {"n_tokens", "quality"} - set(df.columns)
        if missing:
            raise ValueError(f"precomputed frame lacks {sorted(missing)}")
        t = df
    else:
        t = with_token_quality(df, text_col)
    out = _global_prefix(
        t,
        [F.desc("quality"), F.asc(id_col)],
        sum_col="n_tokens",
        cum_col="cum_tokens",
    ).drop("_grn")
    return out.withColumn(
        "selected", F.col("cum_tokens") <= F.lit(int(budget_tokens))
    )


def token_budget_select_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: budget = half the corpus's tokens; per-source
    accounting of who made the cut (the mixture a pure quality-rank
    selection actually buys)."""
    docs = load_table(spark, sf_dir, "documents")
    # tokenize ONCE: the budget total and the selection share this frame
    tq = with_token_quality(docs).localCheckpoint(eager=False)
    total = tq.select(F.sum("n_tokens").alias("t")).first()["t"]
    budget = int(total) // 2  # exact integer halving on both engines
    sel = token_budget_select(tq, budget, precomputed=True)
    return (
        sel.filter(F.col("selected"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_selected"),
            F.sum("n_tokens").alias("tokens_selected"),
            F.sum("quality").alias("quality_sum"),
        )
        .orderBy("source")
    )


TOKEN_BUDGET_SELECT_SQL = """
WITH t AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(list_filter(
              string_split_regex(lower(text), '[^a-z]+'),
              x -> x <> ''))) AS BIGINT) AS quality
  FROM documents
  WHERE text IS NOT NULL
), o AS (
  SELECT *,
         sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM t
)
SELECT source,
       count(*) AS n_selected,
       CAST(sum(n_tokens) AS BIGINT) AS tokens_selected,
       CAST(sum(quality) AS BIGINT) AS quality_sum
FROM o
WHERE cum_tokens <= (SELECT CAST(sum(n_tokens) AS BIGINT) // 2 FROM t)
GROUP BY source
ORDER BY source
"""


QUERIES["token_budget_select_docs"] = (
    token_budget_select_docs,
    TOKEN_BUDGET_SELECT_SQL,
)


# ---------------------------------------------------------------------------
# Curriculum interleave: build the TRAINING ORDER — rank documents within
# each source by a quality score, then round-robin across sources so every
# training-prefix sees the best of each source in balanced proportion (the
# standard anti-"source block" shuffle for curriculum schedules).
def curriculum_interleave(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Adds (quality, src_rank, train_pos): quality = distinct-token count
    (shared az_tokens contract), src_rank = rank within the source by
    (quality desc, id), train_pos = global round-robin position ordered by
    (src_rank, source) — position 1..S are every source's best doc,
    positions S+1..2S their second-best, and so on.

    Scale note: the per-source rank is an ordinary partitioned window;
    the global position comes from the two-pass range-partitioned prefix
    (_global_prefix) — per-range local ranks in parallel, O(partitions)
    counts to the driver, offsets broadcast back — never a single-task
    global window."""
    from pyspark.sql import Window

    t = with_token_quality(df, text_col).drop("n_tokens")
    ws = Window.partitionBy(source_col).orderBy(
        F.desc("quality"), F.asc(id_col)
    )
    ranked = t.withColumn("src_rank", F.row_number().over(ws).cast("long"))
    return _global_prefix(
        ranked,
        [F.asc("src_rank"), F.asc(source_col), F.asc(id_col)],
        rn_col="train_pos",
    )


def curriculum_interleave_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: the first 120 training positions' per-source
    accounting — counts, quality mass and a position checksum pin the
    whole interleaved prefix."""
    out = curriculum_interleave(load_table(spark, sf_dir, "documents"))
    return (
        out.filter(F.col("train_pos") <= 120)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_in_prefix"),
            F.sum("quality").alias("quality_sum"),
            F.sum("train_pos").alias("pos_checksum"),
        )
        .orderBy("source")
    )


CURRICULUM_INTERLEAVE_SQL = """
WITH t AS (
  SELECT doc_id, source,
         CAST(len(list_distinct(list_filter(
              string_split_regex(lower(text), '[^a-z]+'),
              x -> x <> ''))) AS BIGINT) AS quality
  FROM documents
  WHERE text IS NOT NULL
), r AS (
  SELECT *,
         CAST(row_number() OVER (PARTITION BY source
                                 ORDER BY quality DESC, doc_id) AS BIGINT)
           AS src_rank
  FROM t
), o AS (
  SELECT *,
         CAST(row_number() OVER (ORDER BY src_rank, source, doc_id)
              AS BIGINT) AS train_pos
  FROM r
)
SELECT source,
       count(*) AS n_in_prefix,
       CAST(sum(quality) AS BIGINT) AS quality_sum,
       CAST(sum(train_pos) AS BIGINT) AS pos_checksum
FROM o
WHERE train_pos <= 120
GROUP BY source
ORDER BY source
"""


QUERIES["curriculum_interleave_docs"] = (
    curriculum_interleave_docs,
    CURRICULUM_INTERLEAVE_SQL,
)


def _global_prefix(
    df: DataFrame,
    order_cols: list,
    sum_col: str | None = None,
    rn_col: str = "_grn",
    cum_col: str = "_gcum",
    num_partitions: int = 32,
    return_totals: bool = False,
) -> "DataFrame | tuple[DataFrame, int, int]":
    """Exact global row_number (and optional running sum) over a TOTAL
    order, computed WITHOUT an un-partitioned window.

    The naive `Window.orderBy(...)` funnels every row through ONE task —
    the classic 100 TB scale-killer for order statistics.  This is the
    standard two-pass form instead: range-repartition on the order (range
    k of the sort order lands in partition k), compute per-partition local
    ranks/prefix-sums in parallel, collect only the O(partitions)
    subtotals to the driver, and broadcast the per-partition offsets back.
    The order columns must form a total order (include a unique id);
    results are then independent of the sampled range boundaries.

    With return_totals=True the return shape changes to
    (df, total_rows, total_sum) — the grand totals fall out of the
    offsets pass for free, so callers needing them (the systematic
    sampler's step) must not re-scan the frame."""
    from pyspark.sql import Window

    spark = df.sparkSession
    part = df.repartitionByRange(num_partitions, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    wloc = Window.partitionBy("_pid").orderBy(*order_cols)
    local = part.withColumn(rn_col, F.row_number().over(wloc).cast("long"))
    aggs = [F.count(F.lit(1)).alias("_n")]
    if sum_col is not None:
        local = local.withColumn(
            cum_col,
            F.sum(sum_col).over(
                wloc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        aggs.append(F.sum(sum_col).alias("_s"))
    # PIN the partitioning: repartitionByRange samples its boundaries with
    # an RDD-id-derived seed, so re-executing the plan for the totals job
    # and again for the consuming join could land rows in DIFFERENT ranges
    # — local ranks from one partitioning plus offsets from another are
    # silently wrong.  localCheckpoint materializes one partitioning that
    # both jobs reuse.
    local = local.localCheckpoint(eager=False)
    totals = sorted(
        local.groupBy("_pid").agg(*aggs).collect(), key=lambda r: r["_pid"]
    )  # O(partitions) driver rows — the whole point
    offsets, run_n, run_s = [], 0, 0
    for r in totals:
        offsets.append((int(r["_pid"]), run_n, run_s))
        run_n += int(r["_n"])
        if sum_col is not None:
            run_s += int(r["_s"])
    off_df = spark.createDataFrame(
        offsets, "_pid int, _off_n long, _off_s long"
    )
    out = (
        local.join(F.broadcast(off_df), "_pid")
        .withColumn(rn_col, F.col(rn_col) + F.col("_off_n"))
    )
    if sum_col is not None:
        out = out.withColumn(cum_col, F.col(cum_col) + F.col("_off_s"))
    out = out.drop("_pid", "_off_n", "_off_s")
    if return_totals:
        # the grand totals fell out of the offsets pass for free — callers
        # needing W (e.g. the systematic sampler's step) must not re-scan
        return out, run_n, run_s
    return out


# ---------------------------------------------------------------------------
# Proportional quota allocation (largest-remainder / Hamilton method): build
# an exactly-n-row eval set whose per-source counts are the fair integer
# rounding of the sources' corpus shares — the standard way to freeze an
# eval mixture (hash/stratified sampling gives FRACTIONS; an eval set wants
# exact counts that sum to n).
def proportional_quota(
    df: DataFrame,
    n: int,
    strata_col: str = "source",
) -> DataFrame:
    """(strata, n_total, quota): integer quotas summing to exactly
    min(n, corpus) — floor(n * share) per stratum plus one extra for the
    largest fractional remainders (ties broken on the stratum key; a
    stratum never receives more than it has).

    Scale shape: ONE corpus aggregate reduces to #strata rows; the
    Hamilton arithmetic then runs on the DRIVER in arbitrary-precision
    Python integers (n_total * n overflows int64 at real corpus sizes —
    doubles round the floor, int64 would raise under ANSI) — O(#strata)
    driver state, the same tiny-aggregate class as the mixture/label
    collects.  Every rounding decision is exact, so the DuckDB oracle
    (HUGEINT `//`) replays it bit-for-bit."""
    if int(n) <= 0:
        raise ValueError(f"proportional_quota needs n > 0, got {n}")
    from pyspark.sql.types import LongType, StructField, StructType

    spark = df.sparkSession
    counts = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_total")
    )
    # preserve the strata column's TYPE (an integer bucket key must stay
    # integer downstream) and tolerate a NULL stratum (real crawl data)
    strata_field = counts.schema[strata_col]
    schema = StructType(
        [
            StructField(strata_field.name, strata_field.dataType, True),
            StructField("n_total", LongType(), False),
            StructField("quota", LongType(), False),
        ]
    )
    rows = counts.collect()  # #strata rows — the whole point
    if not rows:
        return spark.createDataFrame([], schema)
    per = {r[strata_col]: int(r["n_total"]) for r in rows}
    total = sum(per.values())
    eff = min(int(n), total)
    base = {s: min((c * eff) // total, c) for s, c in per.items()}
    rem = {s: (c * eff) % total for s, c in per.items()}
    quota = dict(base)
    short = eff - sum(base.values())

    def _key(st):  # None sorts LAST among equals, never compares to str
        return (st is None, st)

    for st in sorted(per, key=lambda s: (-rem[s],) + _key(s)):
        if short <= 0:
            break
        # Capped-stratum guard.  The oracle spells this `base < n_total`;
        # the two are provably the same branch because base == n_total is
        # unreachable when eff < total (base = c*eff//total < c) and when
        # eff == total every remainder is 0, so short == 0 and the loop
        # never reaches a full stratum.  Do not "fix" one side alone.
        if quota[st] < per[st]:
            quota[st] += 1
            short -= 1
    out = [(s, per[s], quota[s]) for s in sorted(per, key=_key)]
    return spark.createDataFrame(out, schema)


def proportional_quota_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: a 97-row eval-set allocation across LANGUAGES —
    the lang counts are uneven, so the remainders genuinely discriminate
    and the +1 ordering (not just the tie-break) is hash-pinned."""
    return proportional_quota(
        load_table(spark, sf_dir, "documents"), 97, strata_col="lang"
    )


PROPORTIONAL_QUOTA_SQL = """
WITH counts AS (
  SELECT lang, count(*) AS n_total
  FROM documents
  GROUP BY lang
), tot AS (
  SELECT CAST(sum(n_total) AS HUGEINT) AS t FROM counts
), based AS (
  SELECT lang, n_total,
         least((CAST(n_total AS HUGEINT) * 97) // t, n_total) AS base,
         (CAST(n_total AS HUGEINT) * 97) % t AS rem
  FROM counts CROSS JOIN tot
), ranked AS (
  SELECT *,
         row_number() OVER (ORDER BY rem DESC, lang) AS rk,
         (SELECT 97 - sum(base) FROM based) AS short
  FROM based
)
SELECT lang,
       CAST(n_total AS BIGINT) AS n_total,
       CAST(CASE WHEN rk <= short AND base < n_total
                 THEN base + 1 ELSE base END AS BIGINT) AS quota
FROM ranked
ORDER BY lang
"""


QUERIES["proportional_quota_docs"] = (
    proportional_quota_docs,
    PROPORTIONAL_QUOTA_SQL,
)


# ---------------------------------------------------------------------------
# Systematic weighted sampling: draw ~k documents with probability
# proportional to size (token count) by walking equally-spaced sample
# points through the weighted cumulative order — the deterministic,
# exactly-replayable alternative to weighted reservoir sampling (whose
# u^(1/w) keys cannot be value-hashed across engines), and the standard
# way to draw a token-proportional inspection/eval slice.  A document
# containing m sample points is drawn with multiplicity m, the correct
# PPS behaviour for documents heavier than the step.
#
# Scale: the cumulative weights come from _global_prefix (two-pass
# range-partitioned prefix — never a single-task window); the walk order
# is the md5 pseudorandom permutation (shuffle_shard's proven trick), so
# selection is independent of ingestion order; everything downstream is a
# pure per-row integer formula.  The +step shift keeps every division
# non-negative — Spark `div` truncates while DuckDB `//` floors, and they
# only agree above zero.
_SYSTEMATIC_K = 100


def systematic_weighted_sample(
    df: DataFrame,
    k: int = _SYSTEMATIC_K,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, cum_before, multiplicity) for drawn docs only:
    sample points sit at offset + i*step (step = floor(W/k), offset =
    step//2) along the md5-ordered cumulative token axis."""
    t = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
        F.md5(F.col(id_col).cast("string")).alias("_ord"),
    )
    prefixed, _n, total = _global_prefix(
        t, ["_ord", id_col], sum_col="n_tokens", cum_col="_gcum",
        return_totals=True,
    )
    step = max(1, total // k)
    offset = step // 2
    cum_before = F.col("_gcum") - F.col("n_tokens")
    # multiplicity = #points in [cum_before, _gcum): both terms shifted by
    # step-1-offset >= 0 so the integer division never sees a negative
    lo = F.expr(f"((_gcum - n_tokens) + {step - 1 - offset}) div {step}")
    hi = F.expr(f"(_gcum + {step - 1 - offset}) div {step}")
    return (
        prefixed.withColumn("multiplicity", (hi - lo).cast("long"))
        .filter(F.col("multiplicity") > 0)
        .select(
            id_col,
            "n_tokens",
            cum_before.cast("long").alias("cum_before"),
            "multiplicity",
        )
    )


def systematic_weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return systematic_weighted_sample(docs).orderBy("doc_id")


SYSTEMATIC_SAMPLE_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         md5(CAST(doc_id AS VARCHAR)) AS ord
  FROM documents WHERE text IS NOT NULL
), c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY ord, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
), p AS (
  SELECT greatest(sum(n_tokens) // {_SYSTEMATIC_K}, 1) AS step FROM t
), m AS (
  SELECT doc_id, n_tokens, cum - n_tokens AS cum_before,
         (cum + (SELECT step - 1 - step // 2 FROM p))
           // (SELECT step FROM p)
         - ((cum - n_tokens) + (SELECT step - 1 - step // 2 FROM p))
           // (SELECT step FROM p) AS multiplicity
  FROM c
)
SELECT doc_id, n_tokens, CAST(cum_before AS BIGINT) AS cum_before,
       CAST(multiplicity AS BIGINT) AS multiplicity
FROM m WHERE multiplicity > 0
ORDER BY doc_id
"""


QUERIES["systematic_weighted_sample_docs"] = (
    systematic_weighted_sample_docs,
    SYSTEMATIC_SAMPLE_SQL,
)


# ---------------------------------------------------------------------------
# Water-filling token-budget allocation — the mixture PLANNER that sits in
# front of per-source sampling: given per-source token counts and a global
# training budget, cap every source at the water level T = the largest
# integer with sum(min(c_i, T)) <= budget.  Small sources keep everything,
# oversized sources are clipped to T — the max-min-fair allocation (the
# same rule as network water-filling), and the standard way to stop one
# giant crawl source from drowning the mixture.  All arithmetic is BIGINT
# (the cap is an integer floor division), so both engines agree bit-for-bit.
#
# Scale shape: ONE partial-aggregable corpus pass to the per-source counts,
# then every window/join below runs on O(sources) rows (a dimension table),
# never on documents.
def waterfill_allocation(
    per_source: DataFrame,
    budget: int,
    key_col: str = "source",
    count_col: str = "c",
) -> DataFrame:
    """per_source(key, c) + integer budget -> (key, tokens_have,
    tokens_alloc, capped).  T derivation over the ASCENDING count order:
    the first position j (1-based) where cum_{j-1} + (n-j+1)*c_j > budget
    marks the segment holding the water level; T = (budget - cum_{j-1})
    DIV (n-j+1).  No such position means the whole corpus fits: T = max c.
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.col(count_col).asc(), F.col(key_col).asc())
    ranked = per_source.select(
        F.col(key_col).alias("k"),
        F.col(count_col).cast("long").alias("c"),
        F.row_number().over(w).alias("j"),
        F.coalesce(
            F.sum(count_col).over(
                Window.orderBy(F.col(count_col).asc(), F.col(key_col).asc())
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long").alias("cum_before"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    # the boundary row (O(sources) rows: the single-partition windows are a
    # dimension-table cost, not a data cost)
    boundary = (
        ranked.filter(
            F.col("cum_before") + (F.col("n") - F.col("j") + 1) * F.col("c")
            > F.lit(budget)
        )
        .orderBy("j")
        .limit(1)
        .select(
            # pure BIGINT floor division (never a double on the way)
            F.expr(f"({budget} - cum_before) div (n - j + 1)")
            .cast("long")
            .alias("t")
        )
    )
    fallback = ranked.agg(F.max("c").alias("t"))
    # deterministic pick: boundary (when it exists) must beat the
    # fallback — an explicit priority sort, never union+limit partition
    # order (limit without orderBy has no ordering contract in Spark)
    t_row = (
        boundary.select("t", F.lit(0).alias("_pri"))
        .unionByName(fallback.select("t", F.lit(1).alias("_pri")))
        .orderBy("_pri")
        .limit(1)
        .select("t")
    )
    return (
        ranked.crossJoin(F.broadcast(t_row))
        .select(
            F.col("k").alias(key_col),
            F.col("c").alias("tokens_have"),
            F.least(F.col("c"), F.col("t")).alias("tokens_alloc"),
            (F.col("c") > F.col("t")).cast("int").alias("capped"),
        )
        .orderBy(key_col)
    )


def waterfill_budget_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: allocate a 70%-of-corpus token budget across
    LANGUAGES (the fixture's lang counts are skewed — en is ~3x any other
    — so both rule branches genuinely fire: small langs keep everything,
    the head lang(s) clip to the water level; by-source would cap all 20
    near-uniform sources identically and leave the kept-branch untested)."""
    docs = load_table(spark, sf_dir, "documents")
    # localCheckpoint pins the O(langs) aggregate: the budget read below
    # and every window/join inside waterfill_allocation then reuse the
    # SAME materialized rows — without it the corpus aggregation would
    # re-run from lineage per consumer (two 100 TB scans where one
    # suffices)
    per = docs.groupBy("lang").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("c")
    ).localCheckpoint()
    total = per.agg(F.sum("c")).first()[0]
    budget = (7 * int(total)) // 10  # exact 70% in integers on both engines
    return waterfill_allocation(per, budget, key_col="lang")


def waterfill_sql(per_cte: str, budget_expr: str, key: str) -> str:
    """Render the water-filling oracle over any (key, c) CTE — THE single
    definition of the SQL-side rule, shared by the registry oracle and the
    hypothesis property tests (so the invariant suite and the driver gate
    can never drift apart).  `per_cte` must yield columns ({key}, c);
    `budget_expr` is evaluated over `per`."""
    return f"""
WITH per AS (
  {per_cte}
), tot AS (
  SELECT {budget_expr} AS budget FROM per
), ranked AS (
  SELECT {key}, c,
         row_number() OVER (ORDER BY c ASC, {key} ASC) AS j,
         CAST(coalesce(sum(c) OVER (ORDER BY c ASC, {key} ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before,
         count(*) OVER () AS n
  FROM per
), boundary AS (
  SELECT (SELECT budget FROM tot) - cum_before AS num, n - j + 1 AS den
  FROM ranked, tot
  WHERE cum_before + (n - j + 1) * c > tot.budget
  ORDER BY j LIMIT 1
), level AS (
  SELECT coalesce((SELECT num // den FROM boundary),
                  (SELECT max(c) FROM ranked)) AS t
)
SELECT r.{key},
       r.c AS tokens_have,
       CAST(least(r.c, l.t) AS BIGINT) AS tokens_alloc,
       CAST(r.c > l.t AS INT) AS capped
FROM ranked r, level l
ORDER BY r.{key}
"""


WATERFILL_BUDGET_SQL = waterfill_sql(
    "SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS c"
    " FROM documents GROUP BY lang",
    "(7 * sum(c)) // 10",
    "lang",
)


QUERIES["waterfill_budget_docs"] = (waterfill_budget_docs, WATERFILL_BUDGET_SQL)
