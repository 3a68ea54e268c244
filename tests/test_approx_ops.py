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
