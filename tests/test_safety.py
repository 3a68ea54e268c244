"""Pipeline-safety operators (functions/safety.py): decontamination and
PII redaction library semantics beyond what the oracle queries cover."""

from pyspark.sql import functions as F

from delta_go_spark.functions.safety import decontaminate, redact_pii


def test_decontaminate_flags_exact_gram_overlap(spark):
    probes = spark.createDataFrame(
        [(100, "a b c d e f g h unique benchmark tail")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "x y a b c d e f g h z"),      # contains probe 8-gram
            (2, "totally different words with no overlap at all here"),
            (3, "a b c d e f g SPLIT h"),      # 7-gram prefix only: no hit
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_hits"] for r in decontaminate(corpus, probes).collect()}
    assert 1 in got and got[1] >= 1
    assert 2 not in got
    assert 3 not in got


def test_decontaminate_counts_distinct_shared_grams(spark):
    text = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"  # 3 distinct 8-grams
    probes = spark.createDataFrame([(9, text)], "doc_id long, text string")
    corpus = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = decontaminate(corpus, probes).collect()
    assert got[0]["n_hits"] == 3

    # a doc REPEATING a probe gram still counts it once (distinct grams)
    rep = "a b c d e f g h a b c d e f g h"
    probes2 = spark.createDataFrame([(9, "a b c d e f g h")], "doc_id long, text string")
    corpus2 = spark.createDataFrame([(1, rep)], "doc_id long, text string")
    got2 = decontaminate(corpus2, probes2).collect()
    assert got2[0]["n_hits"] == 1


def test_redact_pii_counts_and_replacements(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@site.org or admin@a.co thanks"),
            (2, "server 192.168.1.7 and card 12345678901"),
            (3, "clean text only"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert rows[1]["n_email"] == 2 and rows[1]["n_ipv4"] == 0
    assert "<EMAIL>" in rows[1]["text_redacted"]
    assert "@" not in rows[1]["text_redacted"]
    assert rows[2]["n_ipv4"] == 1 and rows[2]["n_long_digits"] == 1
    assert "<IPV4>" in rows[2]["text_redacted"]
    assert "<LONG_DIGITS>" in rows[2]["text_redacted"]
    assert "192.168" not in rows[2]["text_redacted"]
    assert rows[3]["text_redacted"] == "clean text only"
    assert rows[3]["n_email"] == rows[3]["n_ipv4"] == rows[3]["n_long_digits"] == 0


def test_redact_pii_plan_is_shuffle_free(spark):
    """The redactor must stay a single projection over the scan."""
    df = spark.createDataFrame([(1, "a@b.co")], "doc_id long, text string")
    plan = redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_duplicated_gram_fraction_semantics(spark):
    from delta_go_spark.functions.safety import duplicated_gram_fraction

    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    docs = spark.createDataFrame(
        [
            (1, shared + " a1 a2 a3 a4 a5 a6 a7 a8"),  # 9 grams, 1 shared
            (2, shared),                                # 1 gram, shared
            (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),          # 2 grams, unique
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in duplicated_gram_fraction(docs).collect()}
    assert rows[2]["n_grams"] == 1 and rows[2]["n_dup"] == 1
    assert rows[2]["dup_frac"] == 1.0
    assert rows[3]["n_dup"] == 0 and rows[3]["dup_frac"] == 0.0
    assert rows[1]["n_grams"] == 9 and rows[1]["n_dup"] == 1


def test_span_decontaminate_measures_verbatim_runs(spark):
    from delta_go_spark.functions.safety import span_decontaminate

    probe_text = " ".join(f"p{i}" for i in range(12))  # 12 probe tokens
    probes = spark.createDataFrame(
        [(100, probe_text)], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            # 10 verbatim probe tokens embedded: 3 consecutive 8-gram hits
            # -> span 3 + 7 = 10 tokens
            (1, "x y " + " ".join(f"p{i}" for i in range(10)) + " z w"),
            # the whole doc IS the probe: span clamps to doc length
            (2, probe_text),
            # two separate verbatim runs: max wins, total counts both
            (3, " ".join(f"p{i}" for i in range(8)) + " QQ RR SS TT UU VV WW XX "
                + " ".join(f"p{i}" for i in range(9))),
            (4, "nothing shared here at all beyond stray p1 p2 tokens"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["max_span_tokens"], r["n_contam_grams"])
        for r in span_decontaminate(corpus, probes).collect()
    }
    assert got[1] == (10, 3)
    assert got[2] == (12, 5)  # 5 gram positions, span clamped to 12 tokens
    assert got[3] == (9, 3)   # runs of 1 and 2 grams; 2+7=9-token max span
    assert 4 not in got


def test_cross_source_matrix_accepts_any_pair_source(spark):
    """The pair graph is a parameter: a hand-built pair set (standing in
    for minhash_lsh_pairs at scale) aggregates identically."""
    from delta_go_spark.functions.dedup import cross_source_matrix

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 5)], "doc_id_a long, doc_id_b long"
    )
    meta = spark.createDataFrame(
        [(1, "web"), (2, "books"), (3, "web"), (4, "books"), (5, "books")],
        "doc_id long, source string",
    )
    got = {
        (r["source_lo"], r["source_hi"]): (r["n_pairs"], r["n_docs"])
        for r in cross_source_matrix(pairs, meta).collect()
    }
    assert got[("books", "web")] == (1, 2)   # pair (1,2)
    assert got[("web", "web")] == (1, 2)     # pair (1,3)
    assert got[("books", "books")] == (1, 2) # pair (4,5)


def test_bm25_rank_orders_rare_terms_above_common(spark):
    from delta_go_spark.functions.textops import bm25_rank

    corpus = spark.createDataFrame(
        [
            (1, "rare common filler filler filler"),
            (2, "common filler filler filler filler"),
            (3, "common common filler filler filler"),
            (4, "filler filler filler filler filler"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_rank(corpus, ["rare", "common"], k=3).collect()
    assert len(rows) == 3  # k respected; doc 4 matches nothing
    assert rows[0]["doc_id"] == 1  # the only doc holding the rare term
    assert rows[0]["n_terms"] == 2


def test_gram_novelty_null_source_keeps_its_count(spark):
    """A NULL source's introduced grams must be attributed to the NULL
    group (null-safe join), not silently zeroed."""
    from pyspark.sql import functions as F

    from delta_go_spark.functions.safety import gram_novelty

    text = " ".join(f"w{i}" for i in range(12))
    df = spark.createDataFrame(
        [(1, None, text), (2, "a", text)],
        "doc_id long, source string, text string",
    )
    rows = {r["source"]: r for r in gram_novelty(df).collect()}
    assert rows[None]["n_introduced"] == rows[None]["n_grams_distinct"] > 0
    assert rows[None]["novelty_micro"] == 1000000
    assert rows["a"]["n_introduced"] == 0  # doc 2 only copies
