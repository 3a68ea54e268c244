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

    df = load_table(spark, SF_DIR, "documents").cache()
    yield df
    # unpersist at module teardown: the cached plan otherwise shadows
    # every later spark.read.parquet(documents) in the session through
    # the CacheManager, turning file scans into InMemoryTableScans (an
    # order-dependent trap for the plan-shape tests)
    df.unpersist()


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


def test_mixture_sample_budget_and_weights(spark):
    from pyspark.sql import functions as F

    from delta_go_spark.functions.sampling import mixture_sample

    rows = []
    # big: 4000 tokens, small: 40 tokens, dropped: not in weights
    for i in range(400):
        rows.append((i, "big", "w " * 9 + "w"))
    for i in range(400, 404):
        rows.append((i, "small", "w " * 9 + "w"))
    for i in range(404, 410):
        rows.append((i, "dropped", "w " * 9 + "w"))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    toks = F.size(F.split(F.col("text"), " "))
    out = mixture_sample(
        df, "source", {"big": 1, "small": 1}, 800.0, toks, ["doc_id"], "s"
    )
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert "dropped" not in got                 # weight 0 -> excluded
    assert got["small"] == 4                    # under target: keep all
    # big's target is 400 tokens of 4000 -> ~10% of 400 docs
    assert 20 <= got["big"] <= 60
    # determinism: identical second draw
    again = {
        r["source"]: r["n"]
        for r in mixture_sample(
            df, "source", {"big": 1, "small": 1}, 800.0, toks, ["doc_id"], "s"
        ).groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert again == got


def test_shuffle_shard_permutation_properties(docs):
    from delta_go_spark.functions.sampling import shuffle_shard

    n = docs.count()
    out = shuffle_shard(docs, ["doc_id"], 4, salt="sh").cache()
    try:
        rows = out.select("doc_id", "shard", "pos").collect()
        assert len(rows) == n                       # a permutation: no loss
        assert {r["shard"] for r in rows} <= set(range(4))
        # positions are dense 1..size within each shard
        by_shard: dict = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        for shard, ps in by_shard.items():
            assert sorted(ps) == list(range(1, len(ps) + 1)), shard
        # md5 balance: no shard more than 2x the fair share at 4 shards
        assert max(len(p) for p in by_shard.values()) < 2 * n / 4 + 8
        # deterministic: identical second assignment
        again = sorted(
            (r["doc_id"], r["shard"], r["pos"])
            for r in shuffle_shard(docs, ["doc_id"], 4, salt="sh").collect()
        )
        assert again == sorted((r["doc_id"], r["shard"], r["pos"]) for r in rows)
    finally:
        out.unpersist()


def test_shuffle_shard_export_roundtrip(docs, tmp_path):
    from delta_go_spark.functions.sampling import shuffle_shard_export

    path = str(tmp_path / "shards")
    shuffle_shard_export(docs, ["doc_id"], 4, path, salt="sh")
    spark = docs.sparkSession
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    # each shard directory holds exactly that shard, readable in pos order
    one = spark.read.parquet(f"{path}/shard=2").orderBy("pos").collect()
    assert [r["pos"] for r in one] == list(range(1, len(one) + 1))


def test_sample_k_per_group_exact_and_nested(docs):
    from delta_go_spark.functions.sampling import sample_k_per_group

    k5 = sample_k_per_group(docs, "source", 5, ["doc_id"], "s").collect()
    sizes: dict = {}
    for r in k5:
        sizes[r["source"]] = sizes.get(r["source"], 0) + 1
    per_source = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    for src, n in sizes.items():
        assert n == min(5, per_source[src]), src
    # nesting: k=2 selection is a subset of k=5 (same salt)
    k2 = {
        (r["source"], r["doc_id"])
        for r in sample_k_per_group(docs, "source", 2, ["doc_id"], "s").collect()
    }
    assert k2 <= {(r["source"], r["doc_id"]) for r in k5}


def test_sample_k_preserves_caller_rk_column_any_case(spark):
    from pyspark.sql import functions as F

    from delta_go_spark.functions.sampling import sample_k_per_group

    df = spark.createDataFrame(
        [(i, "g", i * 10) for i in range(6)], "doc_id long, grp string, _RK long"
    )
    out = sample_k_per_group(df, "grp", 3, ["doc_id"])
    assert "_RK" in out.columns
    assert {r["_RK"] for r in out.collect()} <= {i * 10 for i in range(6)}


def test_cluster_safe_split_minhash_pair_source(docs):
    """The 100 TB path: cluster_safe_split accepts ANY pair source — feed
    the banded MinHash candidates instead of the exact Jaccard graph and
    the cluster-stays-together invariant still holds by construction."""
    from pyspark.sql import functions as F

    from delta_go_spark.functions.dedup import minhash_lsh_pairs
    from delta_go_spark.functions.sampling import cluster_safe_split

    pairs = minhash_lsh_pairs(docs).select("doc_id_a", "doc_id_b")
    tagged = cluster_safe_split(docs, pairs).cache()
    try:
        straddlers = (
            tagged.groupBy("rep")
            .agg(F.count_distinct("split").alias("ns"))
            .filter(F.col("ns") > 1)
            .count()
        )
        assert straddlers == 0
        # every input row is tagged exactly once with a valid split
        assert tagged.count() == docs.count()
        splits = {r["split"] for r in tagged.select("split").distinct().collect()}
        assert splits <= {"train", "val", "test"}
        # a known near-dup pair really does share rep + split
        pair = pairs.first()
        if pair is not None:
            a, b = pair["doc_id_a"], pair["doc_id_b"]
            got = {
                r["doc_id"]: (r["rep"], r["split"])
                for r in tagged.filter(F.col("doc_id").isin([a, b])).collect()
            }
            assert got[a] == got[b]
    finally:
        tagged.unpersist()


def test_semdedup_int8_rejects_non_multiple_of_4_dim(spark):
    import pytest as _pytest

    from delta_go_spark.functions.similarity import semdedup_int8

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [2.0, 1.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(Exception, match="divisible by 4"):
        semdedup_int8(df).collect()
