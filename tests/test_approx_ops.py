"""Accuracy guarantees for approximate operators (which have no SQL
oracle): MinHash-LSH recall vs exact Jaccard, ANN-LSH recall vs brute
force, HLL approx-distinct relative error."""

from delta_go_spark.functions.dedup import (
    minhash_near_dup_docs,
    ngram_jaccard_pairs_docs,
    simhash_near_dup_docs,
)
from delta_go_spark.functions.similarity import ann_lsh_docs, knn_cosine_docs
from delta_go_spark.operators.relational import approx_distinct_events

SF = "/root/testdata/sf0.001"


def test_minhash_recall_and_precision(spark):
    exact = {(r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
             for r in ngram_jaccard_pairs_docs(spark, SF).collect()}
    mh = {(r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
          for r in minhash_near_dup_docs(spark, SF).collect()}
    assert exact, "fixture should contain near-dup pairs"
    recall = len(set(mh) & set(exact)) / len(exact)
    assert recall >= 0.9
    # verified candidates can't be false positives (exact jaccard filter)
    assert set(mh) <= set(exact)
    for k in mh:
        assert abs(mh[k] - exact[k]) < 1e-9


def test_simhash_finds_near_dups(spark):
    from delta_go_spark.functions.dedup import simhash_near_dup_pairs
    from delta_go_spark.session import load_table

    exact = {(r["doc_id_a"], r["doc_id_b"]) for r in ngram_jaccard_pairs_docs(spark, SF).collect()}
    docs = load_table(spark, SF, "documents")
    # the wide-radius library call (the registry query uses max_hamming=3,
    # the largest radius where 4-chunk banding recall is PROVABLY 1.0)
    sh = {(r["doc_id_a"], r["doc_id_b"])
          for r in simhash_near_dup_pairs(docs, max_hamming=8).collect()}
    # simhash is token-set based while jaccard is shingle based; require
    # meaningful overlap, not equality
    assert len(sh & exact) / len(exact) >= 0.5


def test_ann_lsh_recall(spark):
    exact = [r["vec_id"] for r in knn_cosine_docs(spark, SF).collect()]
    approx = [r["vec_id"] for r in ann_lsh_docs(spark, SF).collect()]
    assert approx, "query bucket must not be empty"
    # top-1 true neighbors should mostly share the query's bucket
    assert len(set(approx) & set(exact)) >= 3


def test_approx_distinct_error(spark):
    rows = approx_distinct_events(spark, SF).collect()
    for r in rows:
        rel_err = abs(r["approx_users"] - r["exact_users"]) / max(r["exact_users"], 1)
        assert rel_err < 0.05, (r["event_type"], rel_err)


def test_ivf_recall_vs_bruteforce(spark):
    """IVF with nprobe=4/16 lists must recover most of the exact top-10;
    nprobe=n_lists is exact by construction."""
    from pyspark.sql import functions as F

    from delta_go_spark.functions.similarity import (
        ivf_index,
        ivf_search,
        knn_bruteforce,
    )
    from delta_go_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    corpus = emb.filter(F.col("vec_id") != 0)
    exact = {r["vec_id"] for r in knn_bruteforce(corpus, q).collect()}

    qvec = [float(x) for x in q.first()["embedding"]]
    assigned, centers = ivf_index(corpus)
    approx = {r["vec_id"] for r in ivf_search(assigned, centers, qvec, nprobe=8).collect()}
    assert len(approx & exact) >= 6  # >=60% recall probing half the lists

    full = {r["vec_id"] for r in ivf_search(assigned, centers, qvec, nprobe=16).collect()}
    assert full == exact  # probing every list is exact


def test_cosine_lsh_vs_exact_block(spark):
    """The LSH+verify variant (high-threshold scale path) must emit a
    subset of the exact block-matmul pairs with high recall at the default
    threshold; the exact path is recall 1.0 by construction."""
    from delta_go_spark.functions.similarity import (
        cosine_all_pairs_exact,
        cosine_near_dup_pairs,
    )
    from delta_go_spark.session import load_table

    emb = load_table(spark, SF, "embeddings")
    exact = {(r["vec_id_a"], r["vec_id_b"]): r["cos_sim"]
             for r in cosine_all_pairs_exact(emb).collect()}
    lsh = {(r["vec_id_a"], r["vec_id_b"]): r["cos_sim"]
           for r in cosine_near_dup_pairs(emb).collect()}
    assert exact, "fixture should contain near-dup pairs"
    assert set(lsh) <= set(exact)  # verify step forbids false positives
    assert len(set(lsh) & set(exact)) / len(exact) >= 0.95
    for k in lsh:
        assert abs(lsh[k] - exact[k]) < 1e-3


def test_connected_components_transitivity(spark):
    """a~b, b~c (a,c never paired) must land in ONE cluster with rep=min;
    disjoint clusters stay separate; chain depth exercises >1 iteration."""
    from delta_go_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (5, 4)],
        "doc_id_a long, doc_id_b long",
    )
    got = {r["node"]: r["cluster_rep"] for r in connected_components(pairs).collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,   # 5-node chain collapses to min=1
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_simhash_pair_banding_same_pairs_smaller_buckets(spark):
    """The billion-doc banding (n_chunks=7, pair keys, C(7,2)=21 tables)
    must emit EXACTLY the pair set of the 4-chunk default at the
    guaranteed radius (hamming<=3: both modes are provably recall-1.0
    there — 4-chunk by 1-clean-chunk pigeonhole, 7-chunk pairs by
    2-clean-chunks), while bounding per-bucket occupancy far below the
    single-chunk tables'."""
    from pyspark.sql import functions as F

    from delta_go_spark.functions.dedup import (
        _simhash_chunk_bounds,
        simhash_near_dup_pairs,
    )
    from delta_go_spark.session import load_table

    docs = load_table(spark, SF, "documents")
    base = {(r["doc_id_a"], r["doc_id_b"], r["hamming"])
            for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()}
    scaled = {(r["doc_id_a"], r["doc_id_b"], r["hamming"])
              for r in simhash_near_dup_pairs(
                  docs, max_hamming=3, n_chunks=7, pair_bands=True
              ).collect()}
    assert base, "fixture should contain <=3-hamming pairs"
    assert scaled == base

    # the 7-chunk bounds tile the 60 bits exactly
    bounds = _simhash_chunk_bounds(7)
    assert sum(w for _, w in bounds) == 60
    assert [w for _, w in bounds] == [9, 9, 9, 9, 8, 8, 8]

    # occupancy: the scale win is about RANDOM collisions (2^17 vs 2^15
    # key space), which tiny true-near-dup corpora cannot show (a cluster
    # of k genuine dups shares a bucket under ANY banding).  Measure on
    # synthetic uniform signatures: per-table max occupancy must drop by
    # roughly the key-space ratio.
    n = 200_000
    sig = spark.range(n).select(
        F.xxhash64("id").bitwiseAND(F.lit((1 << 60) - 1)).alias("simhash")
    )

    def max_bucket(n_chunks, pair):
        b = _simhash_chunk_bounds(n_chunks)

        def chunk(c):
            off, width = b[c]
            return (
                F.shiftright(F.col("simhash"), off)
                .bitwiseAND(F.lit((1 << width) - 1))
                .cast("long")
            )

        if pair:
            combos = [
                (i, j) for i in range(n_chunks) for j in range(i + 1, n_chunks)
            ]
            bands = [
                F.struct(
                    F.lit(k).alias("band_id"),
                    F.shiftleft(chunk(i), b[j][1])
                    .bitwiseOR(chunk(j))
                    .alias("band_val"),
                )
                for k, (i, j) in enumerate(combos)
            ]
        else:
            bands = [
                F.struct(F.lit(c).alias("band_id"), chunk(c).alias("band_val"))
                for c in range(n_chunks)
            ]
        row = (
            sig.select(F.explode(F.array(*bands)).alias("ch"))
            .groupBy("ch.band_id", "ch.band_val")
            .count()
            .agg(F.max("count").alias("mx"), F.avg("count").alias("avg"))
            .collect()[0]
        )
        return row["mx"], row["avg"]

    single_max, single_avg = max_bucket(4, False)  # mean ~n/2^15 = ~6.1
    paired_max, paired_avg = max_bucket(7, True)   # mean ~n/2^17 = ~1.5
    # mean occupancy (the quadratic-pairing driver) drops by roughly the
    # 4x key-space ratio; the max also drops, though extreme-value tails
    # compress the ratio at this n
    assert paired_avg < single_avg / 2.5, (paired_avg, single_avg)
    assert paired_max < single_max, (paired_max, single_max)


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """checkpoint_dir switches the per-round lineage truncation to
    reliable df.checkpoint() storage (recomputable after executor loss);
    clusters must be identical to the localCheckpoint default, and the
    checkpoint dir must actually receive RDD data."""
    import os

    from delta_go_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "doc_id_a long, doc_id_b long",
    )
    want = {(r["node"], r["cluster_rep"])
            for r in connected_components(pairs).collect()}
    assert want == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20), (23, 20),
    }
    ckpt = str(tmp_path / "cc_ckpt")
    got = {(r["node"], r["cluster_rep"])
           for r in connected_components(pairs, checkpoint_dir=ckpt).collect()}
    assert got == want
    # reliable checkpoints materialized on the shared dir
    found = [
        os.path.join(d, f)
        for d, _dirs, fs in os.walk(ckpt)
        for f in fs
    ]
    assert found, "df.checkpoint() must write into checkpoint_dir"


def test_quantize_int8_codes_and_error_bound(spark):
    from delta_go_spark.functions.similarity import quantize_int8

    df = spark.createDataFrame(
        [
            (1, [1.0, -0.5, 0.25, 0.0]),
            (2, [-2.0, 2.0, 0.001, -0.001]),
            (3, [0.0, 0.0, 0.0, 0.0]),  # zero vector: scale guard
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    # max|v| always maps to +/-127; everything stays in [-127, 127]
    assert rows[1]["q"][0] == 127 and rows[2]["q"][0] == -127
    assert all(-127 <= q <= 127 for r in rows.values() for q in r["q"])
    # zero vector quantizes to zeros with scale 0, no divide error
    assert rows[3]["scale"] == 0.0 and rows[3]["q"] == [0, 0, 0, 0]
    # reconstruction error bounded by scale/2 (the rounding half-step)
    for r in (rows[1], rows[2]):
        recon = [q * r["scale"] for q in r["q"]]
        orig = [1.0, -0.5, 0.25, 0.0] if r["vec_id"] == 1 else [-2.0, 2.0, 0.001, -0.001]
        assert all(
            abs(o - rc) <= r["scale"] / 2 + 1e-12 for o, rc in zip(orig, recon)
        )


def test_quantize_int8_is_shuffle_free(spark):
    from delta_go_spark.functions.similarity import quantize_int8

    df = spark.range(100).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 8), i -> CAST(rand(7) AS FLOAT)) AS embedding",
    )
    plan = quantize_int8(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_semdedup_matches_bruteforce_leader_pass(spark):
    import numpy as np

    from delta_go_spark.functions.similarity import semdedup
    from delta_go_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    got = semdedup(emb, eps=0.4, n_clusters=4).collect()
    rows = {r["vec_id"]: r for r in got}
    src = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in emb.collect()}
    assert set(rows) == set(src)

    # replay the leader pass per cluster with plain numpy
    clusters: dict = {}
    for vid, r in rows.items():
        clusters.setdefault(r["cluster"], []).append(vid)
    for members in clusters.values():
        members.sort()
        mat = np.vstack([src[v] / np.linalg.norm(src[v]) for v in members])
        sims = mat @ mat.T
        kept: list[int] = []
        for j, vid in enumerate(members):
            hit = next(
                (members[i] for i in range(j)
                 if members[i] in kept and sims[i, j] >= 0.4),
                None,
            )
            if hit is None:
                kept.append(vid)
                assert rows[vid]["kept"] and rows[vid]["leader"] is None, vid
            else:
                assert not rows[vid]["kept"] and rows[vid]["leader"] == hit, vid


def test_semdedup_drops_planted_duplicate(spark):
    from delta_go_spark.functions.similarity import semdedup

    base = [float(i) for i in range(8)]
    near = [x * 1.001 + 0.0001 for x in base]          # cosine ~1 with base
    far = [(-1.0) ** i * float(i + 1) for i in range(8)]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)],
        "vec_id long, embedding array<float>",
    )
    out = {r["vec_id"]: r for r in semdedup(df, eps=0.9, n_clusters=2).collect()}
    assert out[1]["kept"]
    assert not out[2]["kept"] and out[2]["leader"] == 1
    assert out[3]["kept"]


def test_ann_ivf_int8_recall_vs_float(spark):
    """Quantized IVF search must track the float paths: high overlap with
    the exact brute-force top-10 (int8 reconstruction error is ~scale/2
    per dim — far below the inter-neighbor cosine gaps here)."""
    from pyspark.sql import functions as F

    from delta_go_spark.functions.similarity import ann_ivf_int8, knn_bruteforce
    from delta_go_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    corpus = emb.filter(F.col("vec_id") != 0)
    exact = {r["vec_id"] for r in knn_bruteforce(corpus, q).collect()}
    qvec = [float(x) for x in q.first()["embedding"]]
    got = {r["vec_id"] for r in ann_ivf_int8(corpus, qvec, nprobe=8).collect()}
    assert len(got & exact) >= 6
    full = {r["vec_id"] for r in ann_ivf_int8(corpus, qvec, nprobe=16).collect()}
    # probing every list: misses only where quantization noise reorders
    assert len(full & exact) >= 8


def test_segment_dedup_keeps_first_occurrence(spark):
    """A segment shared by two docs survives only in the lower doc_id; a
    segment repeated WITHIN one doc survives only at its first position."""
    import hashlib

    from pyspark.sql import functions as F

    from delta_go_spark.functions.dedup import segment_dedup

    # k=2 segments: doc 1 = [a b][c d], doc 2 = [a b][x y],
    # doc 3 = [p q][p q] (intra-doc repeat)
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x y"), (3, "p q p q")],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r
        for r in segment_dedup(df, seg_tokens=2).collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    assert out[1]["n_segments"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["rebuilt_md5"] == md5("a b c d")
    # doc 2 loses "a b" to doc 1 and keeps only "x y"
    assert out[2]["n_kept"] == 1
    assert out[2]["rebuilt_md5"] == md5("x y")
    # doc 3 keeps the first "p q" only
    assert out[3]["n_kept"] == 1
    assert out[3]["rebuilt_md5"] == md5("p q")


def test_segment_dedup_total_loss_yields_empty_text(spark):
    """A doc whose every segment already appeared rebuilds to ''."""
    import hashlib

    from delta_go_spark.functions.dedup import segment_dedup

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "c d a b")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in segment_dedup(df, seg_tokens=2).collect()}
    assert out[2]["n_kept"] == 0
    assert out[2]["rebuilt_md5"] == hashlib.md5(b"").hexdigest()


def test_label_confusion_flags_planted_mislabel(spark):
    """Two tight clusters; one vector carries the wrong label and must
    land in the off-diagonal cell of the confusion matrix."""
    from delta_go_spark.functions.similarity import label_centroid_confusion

    a = [1.0, 0.0, 0.0, 0.0]
    b = [0.0, 1.0, 0.0, 0.0]
    jig = lambda v, e: [x + e for x in v]
    rows = (
        [(i, jig(a, i * 0.001), 0) for i in range(1, 5)]
        + [(10 + i, jig(b, i * 0.001), 1) for i in range(1, 5)]
        + [(99, jig(a, 0.002), 1)]  # planted: near cluster A, labeled 1
    )
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {
        (r["label"], r["nearest"]): (r["n_vecs"], r["id_checksum"])
        for r in label_centroid_confusion(df).collect()
    }
    assert out[(0, 0)][0] == 4          # cluster A all consistent
    assert out[(1, 0)] == (1, 99)       # the plant is the only off-diagonal
    assert out[(1, 1)][0] == 4


def test_minhash_incremental_matches_full_recompute(spark):
    """Splitting a corpus into base + batch and maintaining pairs
    incrementally must produce exactly the full-recompute pair set."""
    from pyspark.sql import functions as F

    from delta_go_spark.functions.dedup import (
        minhash_incremental_pairs,
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from delta_go_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    base = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    sig_base = minhash_signatures(base, num_perm=16)
    inc = minhash_incremental_pairs(sig_base, batch)
    combined = sorted(
        (r["doc_id_a"], r["doc_id_b"], r["jaccard"])
        for r in minhash_lsh_pairs(base).unionByName(inc).collect()
    )
    full = sorted(
        (r["doc_id_a"], r["doc_id_b"], r["jaccard"])
        for r in minhash_lsh_pairs(docs).collect()
    )
    assert combined == full and len(full) > 0


def test_minhash_incremental_rejects_mismatched_signature_table(spark):
    import pytest as _pytest

    from delta_go_spark.functions.dedup import (
        minhash_incremental_pairs,
        minhash_signatures,
    )
    from delta_go_spark.session import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    sig32 = minhash_signatures(docs, num_perm=32)
    with _pytest.raises(ValueError, match="permutations"):
        minhash_incremental_pairs(sig32, docs, num_perm=16)


def test_source_similarity_identical_and_disjoint(spark):
    from delta_go_spark.functions import curation

    df = spark.createDataFrame(
        [
            (1, "a b c", "s1"),
            (2, "a b c", "s2"),   # s2 identical to s1 -> cos 1.0
            (3, "x y z", "s3"),   # s3 disjoint -> no pair row vs s1/s2
        ],
        "doc_id long, text string, source string",
    )
    orig = curation.load_table
    try:
        curation.load_table = lambda s, d, t: df
        out = {(r["source_a"], r["source_b"]): r["cos_e4"]
               for r in curation.source_similarity_docs(spark, "unused").collect()}
    finally:
        curation.load_table = orig
    assert out[("s1", "s2")] == 10000       # identical vectors
    assert ("s1", "s3") not in out          # disjoint: no shared term row
    assert ("s2", "s3") not in out


def test_hash_features_dense_and_consistent(spark):
    from delta_go_spark.functions.textops import hash_features

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["features"] for r in hash_features(df, dim=8).collect()}
    assert len(out[1]) == 8 and len(out[2]) == 8
    assert sum(out[1]) == 3          # token occurrences preserved
    assert sum(out[2]) == 1
    assert max(out[1]) == 2          # 'a' twice, same bucket
    # determinism across calls
    again = {r["doc_id"]: r["features"] for r in hash_features(df, dim=8).collect()}
    assert again == out


def test_ann_signlsh_recall_vs_bruteforce(spark):
    """Probing the query's bucket + Hamming-1 neighbors must recover most
    of the true float top-10 (cosine concentrates mass in nearby sign
    buckets); scores are exact integers per the oracle contract."""
    from delta_go_spark.functions.similarity import ann_signlsh, knn_bruteforce
    from delta_go_spark.session import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    approx = {r["vec_id"] for r in ann_signlsh(emb, k=10).collect()}
    query = emb.filter(F.col("vec_id") == 0)
    corpus = emb.filter(F.col("vec_id") != 0)
    exact = {r["vec_id"] for r in knn_bruteforce(corpus, query, k=10).collect()}
    assert len(approx & exact) >= 5, (approx, exact)
