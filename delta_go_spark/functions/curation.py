"""Training-data curation signals beyond the basic text stats: repetition
(the Gopher-style quality gates), vocabulary/entropy profiles, length
histograms, and per-language character-trigram profiles.

All queries are pure built-in-expression pipelines (zero Python in the hot
path) over the `documents` table, each with an exact DuckDB oracle.  Scale
notes per query; the common shape is one scan -> narrow per-row arrays ->
at most two shuffles (explode+groupBy), with counts cast to BIGINT and
float ratios rounded identically on both engines so the driver's
value-hash compare is deterministic.
"""

from __future__ import annotations

# module-level: pandas_udf resolves string annotations (pd.Series) against
# THIS module's globals under `from __future__ import annotations`
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_go_spark.session import load_table


def _words(col: str = "text"):
    return F.split(F.col(col), " ")


# ---------------------------------------------------------------------------
# 1. Top-word repetition: most frequent word's share of the document — the
#    classic repetition gate (a doc dominated by one token is boilerplate).
#    One explode + groupBy(doc, word), then an argmax window per doc.
def repetition_topword_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("doc_id", F.explode(_words()).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.max("c").alias("top_count"), F.sum("c").alias("n_words")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("w"))
    top_word = (
        counts.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", F.col("w").alias("top_word"))
    )
    return (
        per_doc.join(top_word, "doc_id")
        .select(
            "doc_id",
            "top_word",
            F.col("top_count").cast("long").alias("top_count"),
            F.round(F.col("top_count") / F.col("n_words"), 4).alias("top_frac"),
        )
        .orderBy("doc_id")
    )


REPETITION_TOPWORD_SQL = """
WITH c AS (
  SELECT doc_id, w, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY doc_id, w
), agg AS (
  SELECT doc_id, max(c) AS top_count, sum(c) AS n_words FROM c GROUP BY doc_id
), top AS (
  SELECT doc_id, w AS top_word
  FROM (SELECT doc_id, w, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, w) AS rn FROM c)
  WHERE rn = 1
)
SELECT agg.doc_id, top_word,
       CAST(top_count AS BIGINT) AS top_count,
       round(top_count / n_words, 4) AS top_frac
FROM agg JOIN top ON agg.doc_id = top.doc_id
ORDER BY agg.doc_id
"""


# ---------------------------------------------------------------------------
# 2. Duplicate-bigram fraction: 1 - distinct/total word bigrams — boilerplate
#    and looped generation score.  Pure array expressions, NO shuffle beyond
#    the scan.
def bigram_repetition_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = _words()
    n = F.size(w)
    bigrams = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
    )
    return (
        docs.filter(n >= 2)
        .select(
            "doc_id",
            (n - 1).cast("long").alias("n_bigrams"),
            F.size(F.array_distinct(bigrams)).cast("long").alias("distinct_bigrams"),
        )
        .withColumn(
            "dup_frac",
            F.round(1.0 - F.col("distinct_bigrams") / F.col("n_bigrams"), 4),
        )
        .orderBy("doc_id")
    )


BIGRAM_REPETITION_SQL = """
WITH b AS (
  SELECT doc_id,
         len(w) - 1 AS n_bigrams,
         list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1]) AS bg
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  WHERE len(w) >= 2
)
SELECT doc_id,
       CAST(n_bigrams AS BIGINT) AS n_bigrams,
       CAST(len(list_distinct(bg)) AS BIGINT) AS distinct_bigrams,
       round(1.0 - len(list_distinct(bg)) / n_bigrams, 4) AS dup_frac
FROM b
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# 3. Word-entropy per document: Shannon entropy over the word distribution.
#    Low entropy = repetitive/templated text.  The -p*log2(p) terms are
#    summed per doc; round(3) sits far above double merge noise (~1e-12).
def word_entropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("doc_id", F.explode(_words()).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = counts.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    return (
        counts.join(totals, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.round(-F.sum(p * F.log2(p)), 3).alias("entropy_bits"),
            F.count(F.lit(1)).cast("long").alias("vocab"),
        )
        .orderBy("doc_id")
    )


WORD_ENTROPY_SQL = """
WITH c AS (
  SELECT doc_id, w, count(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY doc_id, w
), t AS (
  SELECT doc_id, sum(c) AS n FROM c GROUP BY doc_id
)
SELECT c.doc_id,
       round(-sum((c / n) * log2(c / n)), 3) AS entropy_bits,
       CAST(count(*) AS BIGINT) AS vocab
FROM c JOIN t ON c.doc_id = t.doc_id
GROUP BY c.doc_id
ORDER BY c.doc_id
"""


# ---------------------------------------------------------------------------
# 4. Corpus composition matrix: docs + avg length per (lang, source) — the
#    first dashboard of any curation run.  Single partial-agg shuffle.
def lang_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(
                F.sum(F.col("n_chars").cast("decimal(28,6)"))
                / F.count(F.lit(1)),
                2,
            ).cast("double").alias("avg_chars"),
        )
        .orderBy("lang", "source")
    )


LANG_SOURCE_MATRIX_SQL = """
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(round(sum(CAST(n_chars AS DECIMAL(28,6))) / count(*), 2) AS DOUBLE)
         AS avg_chars
FROM documents
GROUP BY lang, source
ORDER BY lang, source
"""


# ---------------------------------------------------------------------------
# 5. Power-of-two length histogram: floor(log2(n_chars)) buckets — the
#    standard truncation/outlier scan before tokenizer budgeting.
def doc_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("n_chars") > 0)
        .select(F.floor(F.log2("n_chars")).cast("long").alias("log2_bucket"))
        .groupBy("log2_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("log2_bucket")
    )


DOC_LENGTH_BUCKETS_SQL = """
SELECT CAST(floor(log2(n_chars)) AS BIGINT) AS log2_bucket,
       CAST(count(*) AS BIGINT) AS n_docs
FROM documents
WHERE n_chars > 0
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# 6. Type-token ratio per source: vocabulary breadth — template-generated
#    sources sit far below organic ones.  Two-level aggregation: the
#    distinct count shuffles on (source, word), never materializing corpus
#    vocab on one node.
def vocab_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("source", F.explode(_words()).alias("w"))
    return (
        words.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_words"),
            F.countDistinct("w").cast("long").alias("distinct_words"),
        )
        .withColumn(
            "type_token_ratio",
            F.round(F.col("distinct_words") / F.col("total_words"), 4),
        )
        .orderBy("source")
    )


VOCAB_BY_SOURCE_SQL = """
SELECT source,
       CAST(count(*) AS BIGINT) AS total_words,
       CAST(count(DISTINCT w) AS BIGINT) AS distinct_words,
       round(count(DISTINCT w) / count(*), 4) AS type_token_ratio
FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
GROUP BY source
ORDER BY source
"""


# ---------------------------------------------------------------------------
# 7. Character-trigram profile per language: the top-5 trigrams by count —
#    exactly the features an n-gram language-ID model trains on.  Explode
#    is bounded (3-char shingles of the raw text); ties break on the
#    trigram string so both engines order identically.
def char_trigram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    n = F.length("text")
    tris = F.transform(
        F.sequence(F.lit(1), n - 2), lambda i: F.col("text").substr(i, F.lit(3))
    )
    counts = (
        docs.filter(n >= 3)
        .select("lang", F.explode(tris).alias("tri"))
        .groupBy("lang", "tri")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("tri"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("lang", F.col("rank").cast("long").alias("rank"), "tri", F.col("c").cast("long").alias("n_occurrences"))
        .orderBy("lang", "rank")
    )


CHAR_TRIGRAM_SQL = """
WITH c AS (
  SELECT lang, tri, count(*) AS c
  FROM (
    SELECT lang,
           unnest(list_transform(range(1, length(text) - 1),
                                 i -> text[i:i+2])) AS tri
    FROM documents
    WHERE length(text) >= 3
  )
  GROUP BY lang, tri
)
SELECT lang, rank, tri, CAST(c AS BIGINT) AS n_occurrences
FROM (
  SELECT lang, tri, c,
         row_number() OVER (PARTITION BY lang ORDER BY c DESC, tri) AS rank
  FROM c
)
WHERE rank <= 5
ORDER BY lang, rank
"""


# ---------------------------------------------------------------------------
# 8. Per-language length outliers: docs outside [p05, p95] of n_chars for
#    their language — the trim step before dedup/training.  The percentile
#    is a per-lang aggregate joined back (decorrelated subquery shape).
def length_outlier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.groupBy(F.col("lang").alias("b_lang")).agg(
        F.percentile("n_chars", F.lit(0.05)).alias("p05"),
        F.percentile("n_chars", F.lit(0.95)).alias("p95"),
    )
    return (
        docs.join(bounds, docs.lang == F.col("b_lang"))
        .filter((F.col("n_chars") < F.col("p05")) | (F.col("n_chars") > F.col("p95")))
        .select(
            "doc_id",
            "lang",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.when(F.col("n_chars") < F.col("p05"), F.lit("short"))
            .otherwise(F.lit("long"))
            .alias("outlier_kind"),
        )
        .orderBy("doc_id")
    )


LENGTH_OUTLIER_SQL = """
WITH b AS (
  SELECT lang AS b_lang,
         quantile_cont(n_chars, 0.05) AS p05,
         quantile_cont(n_chars, 0.95) AS p95
  FROM documents GROUP BY lang
)
SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
       CASE WHEN n_chars < p05 THEN 'short' ELSE 'long' END AS outlier_kind
FROM documents JOIN b ON lang = b_lang
WHERE n_chars < p05 OR n_chars > p95
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# 9. Source ranking by mean document richness (words/doc) within each lang,
#    top-3 per lang — the keep/drop shortlist for source-level curation.
#    Decimal sum before the divide keeps the mean merge-order independent.
def source_rank_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    per = (
        docs.select("lang", "source", F.size(_words()).alias("nw"))
        .groupBy("lang", "source")
        .agg(
            F.round(
                F.sum(F.col("nw").cast("decimal(28,6)")) / F.count(F.lit(1)), 4
            )
            .cast("double")
            .alias("mean_words"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.desc("mean_words"), F.asc("source"))
    return (
        per.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("lang", F.col("rank").cast("long").alias("rank"), "source", "mean_words", "n_docs")
        .orderBy("lang", "rank")
    )


SOURCE_RANK_SQL = """
WITH per AS (
  SELECT lang, source,
         CAST(round(sum(CAST(len(string_split(text, ' ')) AS DECIMAL(28,6)))
                    / count(*), 4) AS DOUBLE) AS mean_words,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM documents
  GROUP BY lang, source
)
SELECT lang, rank, source, mean_words, n_docs
FROM (
  SELECT lang, source, mean_words, n_docs,
         row_number() OVER (PARTITION BY lang ORDER BY mean_words DESC, source) AS rank
  FROM per
)
WHERE rank <= 3
ORDER BY lang, rank
"""


QUERIES: dict = {
    "repetition_topword_docs": (repetition_topword_docs, REPETITION_TOPWORD_SQL),
    "bigram_repetition_docs": (bigram_repetition_docs, BIGRAM_REPETITION_SQL),
    "word_entropy_docs": (word_entropy_docs, WORD_ENTROPY_SQL),
    "lang_source_matrix": (lang_source_matrix, LANG_SOURCE_MATRIX_SQL),
    "doc_length_buckets": (doc_length_buckets, DOC_LENGTH_BUCKETS_SQL),
    "vocab_by_source": (vocab_by_source, VOCAB_BY_SOURCE_SQL),
    "char_trigram_profile": (char_trigram_profile, CHAR_TRIGRAM_SQL),
    "length_outlier_docs": (length_outlier_docs, LENGTH_OUTLIER_SQL),
    "source_rank_by_lang": (source_rank_by_lang, SOURCE_RANK_SQL),
}


# ---------------------------------------------------------------------------
# End-to-end curation pipeline (round 4): the corpus-to-training-run DAG
# as ONE declarative plan — normalize+dedup, quality-gate, pack into
# context windows — the composition a real data pipeline runs nightly,
# here hash-checked stage-for-stage against DuckDB.
#
# Plan shape at 100 TB: stage 1 shuffles 16-byte md5 keys (never the
# corpus), stage 2 is a codegen filter inside the same stage, stage 3 is
# a per-source window (embarrassingly parallel across streams).  Catalyst
# fuses the gate into the dedup-join's project, so the whole pipeline is
# two shuffles end-to-end (dedup key, stream key).
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_windows, sum_tokens, id_checksum) after:
    1. bag-of-words dedup — key = md5 of the SORTED DISTINCT token set
       (catches shuffled-word near-dups exact hashing misses), keep the
       min-doc_id representative;
    2. quality gate — 30 <= n_tokens <= 120 (integer bounds: exact on
       both engines);
    3. 512-token contiguous packing per source in doc_id order.
    """
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = docs.select(
        "doc_id",
        "source",
        F.md5(
            F.concat_ws(
                " ", F.array_sort(F.array_distinct(toks))
            ).cast("binary")
        ).alias("_k"),
        F.size(toks).alias("n_tokens"),
    )
    keep = base.groupBy("_k").agg(F.min("doc_id").alias("doc_id"))
    deduped = base.join(keep, ["_k", "doc_id"])
    gated = deduped.filter(
        (F.col("n_tokens") >= 30) & (F.col("n_tokens") <= 120)
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = gated.withColumn("_end", F.sum("n_tokens").over(w)).withColumn(
        "bin_id",
        F.floor((F.col("_end") - F.col("n_tokens")) / F.lit(512)),
    )
    return (
        packed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("bin_id").alias("n_windows"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
        )
        .orderBy("source")
    )


CURATION_PIPELINE_SQL = """
WITH base AS (
  SELECT doc_id, source,
         md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS k,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
), keep AS (
  SELECT k, min(doc_id) AS doc_id FROM base GROUP BY k
), gated AS (
  SELECT b.doc_id, b.source, b.n_tokens
  FROM base b JOIN keep USING (k, doc_id)
  WHERE b.n_tokens BETWEEN 30 AND 120
), packed AS (
  SELECT source, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS e
  FROM gated
)
SELECT source,
       count(*) AS n_docs,
       count(DISTINCT CAST(floor((e - n_tokens) / 512) AS BIGINT)) AS n_windows,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM packed
GROUP BY source
ORDER BY source
"""


QUERIES["corpus_curation_pipeline"] = (
    corpus_curation_pipeline,
    CURATION_PIPELINE_SQL,
)


# ---------------------------------------------------------------------------
# Source similarity matrix — the signal behind mixture design: cosine
# similarity between per-source term-count vectors tells you which
# sources are near-redundant (down-weight one) and which add diversity.
#
# Determinism: counts, dot products and squared norms are INTEGER sums
# (order-free in any engine); only the final cosine divides — both
# engines divide the same integers through the same IEEE ops, and the
# result is emitted as floor(cos*1e4 + 0.5) so even representation is
# integral.  Bound: dot <= vocab * max_count^2 — safe in int64 while a
# source's per-term counts stay under ~3e9 (pre-scale counts for larger
# corpora).
#
# Scale: one (source, term) count aggregate (map-side combined), then an
# equi-join on the term key whose output is <= vocab * n_sources^2 rows
# — never a corpus-sized product; the final matrix is n_sources^2.
def source_similarity_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # tc feeds four plan branches (self-join a/b + both norm builds);
    # localCheckpoint materializes the corpus explode+aggregate once so
    # the branches read the result instead of re-scanning the corpus
    # (same pattern and rationale as minhash_lsh_pairs' signature table).
    tc = (
        docs.select("source", F.explode(_words()).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    norms = tc.groupBy("source").agg(
        F.sum(F.col("c") * F.col("c")).alias("n2")
    )
    a, b = tc.alias("a"), tc.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.sum(F.col("a.c") * F.col("b.c")).alias("dot"))
    )
    na = norms.select(
        F.col("source").alias("source_a"), F.col("n2").alias("na2")
    )
    nb = norms.select(
        F.col("source").alias("source_b"), F.col("n2").alias("nb2")
    )
    cos = F.col("dot") / (F.sqrt("na2") * F.sqrt("nb2"))
    return (
        dots.join(F.broadcast(na), "source_a")
        .join(F.broadcast(nb), "source_b")
        .select(
            "source_a",
            "source_b",
            "dot",
            F.floor(cos * 10000 + F.lit(0.5)).cast("long").alias("cos_e4"),
        )
        .orderBy("source_a", "source_b")
    )


SOURCE_SIMILARITY_SQL = """
WITH tc AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY source, w
), norms AS (
  SELECT source, CAST(sum(c * c) AS BIGINT) AS n2 FROM tc GROUP BY source
), dots AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(sum(a.c * b.c) AS BIGINT) AS dot
  FROM tc a JOIN tc b ON a.w = b.w AND a.source < b.source
  GROUP BY 1, 2
)
SELECT d.source_a, d.source_b, d.dot,
       CAST(floor(CAST(d.dot AS DOUBLE)
            / (sqrt(na.n2) * sqrt(nb.n2)) * 10000 + 0.5) AS BIGINT) AS cos_e4
FROM dots d
JOIN norms na ON d.source_a = na.source
JOIN norms nb ON d.source_b = nb.source
ORDER BY d.source_a, d.source_b
"""


QUERIES["source_similarity_docs"] = (
    source_similarity_docs,
    SOURCE_SIMILARITY_SQL,
)


# ---------------------------------------------------------------------------
# Word rarity — the integer-exact stand-in for LM-perplexity filtering:
# a document whose tokens are mostly corpus-rare is disproportionately
# likely to be gibberish/noise (the same intuition KenLM gates encode).
# Scoring by SUM of integer corpus counts (not log-probs) keeps the
# signal bit-reproducible across engines — no libm, no float row-sums.
#
# Scale: one (word, count) corpus aggregate, one equi-join of exploded
# tokens against it on the word key (map-side combined on both sides),
# one per-doc integer sum.  Vocab tables are small relative to any
# corpus; Spark's AQE will broadcast the count side when it fits.
def word_rarity_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # pre-aggregate to (doc, word) counts BEFORE any join: the join probe
    # then carries distinct pairs, not raw token occurrences, so a
    # stopword's billions of occurrences partial-aggregate map-side
    # instead of hot-keying one shuffle partition; vocab reuses the same
    # aggregate (one scan + explode total)
    counts = (
        docs.select("doc_id", F.explode(_words()).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = counts.groupBy("w").agg(F.sum("c").alias("cf"))
    per_doc = (
        counts.join(vocab, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(F.col("c") * F.col("cf")).alias("sum_cf"),
            F.min("cf").alias("rarest_cf"),
        )
    )
    # mean corpus frequency in milli-units: cast to double BEFORE the
    # 1000x so the Spark side is the IDENTICAL IEEE formula as the
    # oracle's `1000 * CAST(sum_cf AS DOUBLE) / n` — long arithmetic
    # here would ANSI-overflow at sum_cf > 2^63/1000 where the oracle
    # succeeds, and round once more in the 2^53 boundary band
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "sum_cf",
        "rarest_cf",
        F.floor(
            F.lit(1000) * F.col("sum_cf").cast("double") / F.col("n_tokens")
        )
        .cast("long")
        .alias("mean_cf_milli"),
    ).orderBy("doc_id")


WORD_RARITY_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), vocab AS (
  SELECT w, CAST(count(*) AS BIGINT) AS cf FROM tok GROUP BY w
), per_doc AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(cf) AS BIGINT) AS sum_cf,
         CAST(min(cf) AS BIGINT) AS rarest_cf
  FROM tok JOIN vocab USING (w)
  GROUP BY doc_id
)
SELECT doc_id, n_tokens, sum_cf, rarest_cf,
       CAST(floor(1000 * CAST(sum_cf AS DOUBLE) / n_tokens) AS BIGINT)
         AS mean_cf_milli
FROM per_doc
ORDER BY doc_id
"""


QUERIES["word_rarity_docs"] = (word_rarity_docs, WORD_RARITY_SQL)


# ---------------------------------------------------------------------------
# Chi-square source drift: how far each source's language mix deviates
# from the corpus-wide distribution — the mixture-monitoring statistic a
# pipeline alarms on when one crawl source suddenly shifts composition
# (scraper broke, new domain mix, injected spam).  Pearson's chi-square
# over the (source, lang) contingency table; per-cell terms are emitted
# as floor-scaled integers (every op on the way — counts, one multiply,
# two divisions, one square — is an exactly-defined IEEE step, and the
# final per-source SUM is over integers, so reduction order cannot
# perturb the hash the way a float sum would).
def source_drift_chisq(
    df: DataFrame, group_col: str = "source", dist_col: str = "lang"
) -> DataFrame:
    """(source, n_cells, chisq_micro): sum over the source's observed
    dist_col cells of floor((o - e)^2 / e * 1e6 + 0.5), with
    e = (source_total * corpus_cell_count) / grand_total.

    Scale shape: three tiny-key aggregates over one scan (cells,
    per-source totals, per-value totals — #sources x #langs rows, never
    data-sized), a broadcast-size join between them, one integer sum."""
    cells = df.groupBy(group_col, dist_col).agg(
        F.count(F.lit(1)).alias("o")
    )
    totals = cells.groupBy(group_col).agg(F.sum("o").alias("ts"))
    dist = cells.groupBy(dist_col).agg(F.sum("o").alias("cl"))
    grand = cells.agg(F.sum("o").alias("tt"))
    e = (
        F.col("ts").cast("double") * F.col("cl") / F.col("tt")
    )
    term = F.floor(
        (F.col("o") - e) * (F.col("o") - e) / e * 1e6 + 0.5
    ).cast("long")
    return (
        cells.join(F.broadcast(totals), group_col)
        .join(F.broadcast(dist), dist_col)
        .crossJoin(F.broadcast(grand))
        .select(group_col, term.alias("t"))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("t").alias("chisq_micro"),
        )
        .orderBy(group_col)
    )


def source_drift_chisq_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return source_drift_chisq(load_table(spark, sf_dir, "documents"))


SOURCE_DRIFT_CHISQ_SQL = """
WITH cells AS (
  SELECT source, lang, count(*) AS o FROM documents GROUP BY source, lang
), totals AS (
  SELECT source, CAST(sum(o) AS BIGINT) AS ts FROM cells GROUP BY source
), dist AS (
  SELECT lang, CAST(sum(o) AS BIGINT) AS cl FROM cells GROUP BY lang
), grand AS (
  SELECT CAST(sum(o) AS BIGINT) AS tt FROM cells
), terms AS (
  SELECT c.source,
         CAST(floor(
           (c.o - (CAST(t.ts AS DOUBLE) * d.cl / g.tt))
           * (c.o - (CAST(t.ts AS DOUBLE) * d.cl / g.tt))
           / (CAST(t.ts AS DOUBLE) * d.cl / g.tt) * 1e6 + 0.5
         ) AS BIGINT) AS t
  FROM cells c
  JOIN totals t USING (source)
  JOIN dist d USING (lang)
  CROSS JOIN grand g
)
SELECT source,
       count(*) AS n_cells,
       CAST(sum(t) AS BIGINT) AS chisq_micro
FROM terms GROUP BY source ORDER BY source
"""


QUERIES["source_drift_chisq_docs"] = (
    source_drift_chisq_docs,
    SOURCE_DRIFT_CHISQ_SQL,
)


# ---------------------------------------------------------------------------
# Gopher-style quality-rule cascade (Rae et al. 2021, "Scaling Language
# Models" C4/Gopher filters): a conjunction of cheap per-document heuristics
# with PER-RULE rejection accounting, so a pipeline owner sees which rule is
# doing the filtering before committing to a corpus-wide drop.  Every rule is
# an INTEGER comparison (ratios are cross-multiplied, never divided) so the
# DuckDB oracle replays each decision bit-exactly.
_GOPHER_MARKERS = ["join", "hash", "row", "batch", "scan", "filter"]


def gopher_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds the five rule booleans + pass_all.  Rules (all pure codegen —
    split/filter/length/array ops, no UDF, zero shuffle):

      r_wordcount   25 <= n_words <= 80
      r_wordlen     4 * n_words <= n_letter_chars <= 6 * n_words
                    (avg word length in [4, 6], cross-multiplied)
      r_marker      document mentions >= 2 distinct corpus-marker words
                    (the Gopher stop-word rule, re-targeted at this
                    corpus's vocabulary)
      r_symbol      20 * n_symbol_chars <= n_chars (<= 5 % symbols)
      r_ttr         4 * n_distinct >= 3 * n_words (type-token ratio >= .75)

    Tokenization is the shared az_tokens contract (textops.py)."""
    from delta_go_spark.functions.textops import az_tokens

    toks = az_tokens(text_col)
    t = F.col(text_col)
    out = (
        df.filter(t.isNotNull())
        .withColumn("_toks", toks)
        .withColumn("_nw", F.size("_toks"))
        .withColumn("_nc", F.length(F.array_join("_toks", "")))
        .withColumn("_nd", F.size(F.array_distinct("_toks")))
        .withColumn(
            "_nmk",
            sum(
                F.array_contains("_toks", w).cast("int")
                for w in _GOPHER_MARKERS
            ),
        )
        .withColumn(
            "_nsym",
            F.length(F.regexp_replace(F.lower(t), "[a-z ]", "")),
        )
    )
    return (
        out.withColumn(
            "r_wordcount", (F.col("_nw") >= 25) & (F.col("_nw") <= 80)
        )
        .withColumn(
            "r_wordlen",
            (4 * F.col("_nw") <= F.col("_nc"))
            & (F.col("_nc") <= 6 * F.col("_nw")),
        )
        .withColumn("r_marker", F.col("_nmk") >= 2)
        .withColumn("r_symbol", 20 * F.col("_nsym") <= F.length(t))
        .withColumn("r_ttr", 4 * F.col("_nd") >= 3 * F.col("_nw"))
        .withColumn(
            "pass_all",
            F.col("r_wordcount")
            & F.col("r_wordlen")
            & F.col("r_marker")
            & F.col("r_symbol")
            & F.col("r_ttr"),
        )
        .drop("_toks", "_nw", "_nc", "_nd", "_nmk", "_nsym")
    )


def gopher_rules_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: per-source rule-failure accounting — ONE partial-
    aggregable groupBy over a tiny source key; the rule evaluation itself
    never shuffles."""
    scored = gopher_rules(load_table(spark, sf_dir, "documents"))

    def fails(rule: str):
        return F.sum((~F.col(rule)).cast("long"))

    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            fails("r_wordcount").alias("fail_wordcount"),
            fails("r_wordlen").alias("fail_wordlen"),
            fails("r_marker").alias("fail_marker"),
            fails("r_symbol").alias("fail_symbol"),
            fails("r_ttr").alias("fail_ttr"),
            F.sum(F.col("pass_all").cast("long")).alias("n_pass"),
        )
        .orderBy("source")
    )


_GOPHER_MARKER_SQL = " + ".join(
    f"list_contains(toks, '{w}')::INT" for w in _GOPHER_MARKERS
)

GOPHER_RULES_SQL = f"""
WITH t AS (
  SELECT source, text,
         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     x -> x <> '') AS toks
  FROM documents
  WHERE text IS NOT NULL
), f AS (
  SELECT source,
         len(toks) AS nw,
         length(coalesce(array_to_string(toks, ''), '')) AS nc,
         len(list_distinct(toks)) AS nd,
         ({_GOPHER_MARKER_SQL}) AS nmk,
         length(regexp_replace(lower(text), '[a-z ]', '', 'g')) AS nsym,
         length(text) AS lt
  FROM t
), r AS (
  SELECT source,
         (nw BETWEEN 25 AND 80) AS r_wordcount,
         (4 * nw <= nc AND nc <= 6 * nw) AS r_wordlen,
         (nmk >= 2) AS r_marker,
         (20 * nsym <= lt) AS r_symbol,
         (4 * nd >= 3 * nw) AS r_ttr
  FROM f
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum((NOT r_wordcount)::INT) AS BIGINT) AS fail_wordcount,
       CAST(sum((NOT r_wordlen)::INT) AS BIGINT)   AS fail_wordlen,
       CAST(sum((NOT r_marker)::INT) AS BIGINT)    AS fail_marker,
       CAST(sum((NOT r_symbol)::INT) AS BIGINT)    AS fail_symbol,
       CAST(sum((NOT r_ttr)::INT) AS BIGINT)       AS fail_ttr,
       CAST(sum((r_wordcount AND r_wordlen AND r_marker AND r_symbol
                 AND r_ttr)::INT) AS BIGINT)        AS n_pass
FROM r
GROUP BY source
ORDER BY source
"""


QUERIES["gopher_rules_docs"] = (gopher_rules_docs, GOPHER_RULES_SQL)


# ---------------------------------------------------------------------------
# Linear quality classifier (fastText-style): score each document with a
# fixed integer weight vector over hashed token buckets — the standard
# learned-filter gate of LLM curation pipelines (a linear model over
# hashing-trick features; CCNet/fastText quality filters are exactly this
# shape at inference time).  gopher_rules covers the heuristic gate and
# bigram_coverage the LM proxy; this is the classifier gate.
#
# The weight vector here is a deterministic fixture (w[b] derived from
# md5(b), integers in [-1000, 1000]) so the oracle is exact; swapping in
# trained weights changes nothing structural.  Scale: the weights are a
# tiny constant closed over by the UDF (Spark pickles it to every task —
# the broadcast of a 256-int vector), scoring is ONE Arrow projection pass
# with ZERO shuffle before the score — per-doc work only, no explode, no
# groupBy.  Python-side md5 is memoized per distinct token within a batch,
# so the per-token cost is a dict hit for the heavy tail of repeated words.
_QC_DIM = 256
_QC_THRESHOLD = 50  # label = mean token weight > threshold (milliweight)


def _qc_weights(dim: int = _QC_DIM) -> list[int]:
    """Deterministic integer weights, reproducible on any engine:
    w[b] = md5('w' || b) first-8-hex-digits % 2001 - 1000."""
    import hashlib

    return [
        int(hashlib.md5(f"w{b}".encode()).hexdigest()[:8], 16) % 2001 - 1000
        for b in range(dim)
    ]


def quality_classifier(
    df: DataFrame,
    dim: int = _QC_DIM,
    threshold: int = _QC_THRESHOLD,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_cols: tuple = (),
) -> DataFrame:
    """(id, n_tokens, w_total, quality_label): integer dot product of the
    doc's hashed-token counts with the weight vector; label via the
    cross-multiplied mean test (w_total > threshold * n_tokens — no
    division, exact on both engines).  Token/bucket contract is
    hash_features' (space split, md5 first 8 hex % dim)."""
    from pyspark.sql.functions import pandas_udf

    weights = _qc_weights(dim)

    @pandas_udf("struct<n_tokens: long, w_total: long>")
    def _score(texts: pd.Series) -> pd.DataFrame:
        import hashlib

        wcache: dict[str, int] = {}

        def tok_weight(t: str) -> int:
            w = wcache.get(t)
            if w is None:
                b = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % dim
                w = weights[b]
                wcache[t] = w
            return w

        ns, totals = [], []
        for text in texts:
            toks = text.split(" ")
            ns.append(len(toks))
            totals.append(sum(tok_weight(t) for t in toks))
        return pd.DataFrame({"n_tokens": ns, "w_total": totals})

    keep = [F.col(c) for c in keep_cols]
    scored = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), *keep, _score(F.col(text_col)).alias("_s"))
        .select(
            id_col,
            *keep_cols,
            F.col("_s.n_tokens").alias("n_tokens"),
            F.col("_s.w_total").alias("w_total"),
        )
    )
    return scored.withColumn(
        "quality_label",
        (F.col("w_total") > threshold * F.col("n_tokens")).cast("int"),
    )


def quality_classifier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: every document's classifier score + label, value-
    hashed.  fan_out first: the single-row-group test file would otherwise
    serialize the Arrow scoring pass on one core."""
    from delta_go_spark.session import fan_out_small_scan

    docs = fan_out_small_scan(
        load_table(spark, sf_dir, "documents"),
        spark.sparkContext.defaultParallelism,
    )
    return quality_classifier(docs).orderBy("doc_id")


# Shared oracle prefix: hashed-token buckets joined to the deterministic
# weight vector — single-sourced so the classifier and DoReMi oracles can
# never drift apart on the feature/weight contract.  The rendering is a
# function so corpus-subset consumers (the CDF-incremental query scores a
# MUTATED corpus) inject their row filter into the same contract.
def _qc_bucket_cte(extra_where: str = "", source_expr: str | None = None) -> str:
    # source_expr overrides the domain column (the CDF-incremental oracle
    # replays an UPDATE as a CASE override); None renders the default
    # byte-identically to the shared rendering the sibling oracles hash
    src = "source" if source_expr is None else f"{source_expr} AS source"
    return f"""tok AS (
  SELECT doc_id, {src}, unnest(string_split(text, ' ')) AS t
  FROM documents WHERE text IS NOT NULL{extra_where}
), b AS (
  SELECT doc_id, source,
         CAST(CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT)
              % {_QC_DIM} AS INT) AS bkt
  FROM tok
), w AS (
  SELECT range AS bkt,
         CAST(CAST(concat('0x', substr(md5(concat('w', CAST(range AS VARCHAR))),
                                       1, 8)) AS BIGINT)
              % 2001 AS BIGINT) - 1000 AS wt
  FROM range({_QC_DIM})
)"""


_QC_BUCKET_CTE = _qc_bucket_cte()


# per-doc scores over the bucket/weight join — ONE rendering shared by
# the classifier oracle and the v2 pipeline oracle (anti-drift)
_QC_SCORED_CTE = """scored AS (
  SELECT b.doc_id, b.source,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(w.wt) AS BIGINT) AS w_total
  FROM b JOIN w ON b.bkt = w.bkt
  GROUP BY b.doc_id, b.source
)"""

QUALITY_CLASSIFIER_SQL = f"""
WITH {_QC_BUCKET_CTE}, {_QC_SCORED_CTE}
SELECT doc_id, n_tokens, w_total,
       CASE WHEN w_total > {_QC_THRESHOLD} * n_tokens THEN 1 ELSE 0 END
         AS quality_label
FROM scored
ORDER BY doc_id
"""


QUERIES["quality_classifier_docs"] = (
    quality_classifier_docs,
    QUALITY_CLASSIFIER_SQL,
)


# ---------------------------------------------------------------------------
# DoReMi-style domain reweighting (Xie et al. 2023, arXiv:2305.10429): the
# mixture-weight OPTIMIZER that sits on top of the quality signal — domains
# whose quality falls below the corpus mean ("excess loss" in DoReMi terms,
# here the integer classifier-score deficit) get multiplicatively
# upweighted, so the training mixture spends more budget where the model
# is weakest.  The full method trains proxy models for the loss signal;
# the engine-side contract is identical with any per-domain loss — this
# query plugs in the linear classifier's integer score as the exact,
# replayable stand-in (trained losses drop in unchanged).
#
# Exactness: the T multiplicative-weight rounds collapse to factor =
# (SCALE + excess)^T because per-round normalization is a scalar that
# cancels in the final normalization; the final weights are integer
# permille via largest-remainder (proportional_quota's proven scheme).
# Scale: ONE corpus scoring pass (the classifier's zero-shuffle Arrow
# projection) + one partial-aggregable groupBy(domain); the driver-side
# arithmetic touches O(domains) rows in arbitrary-precision Python ints.
_DOREMI_SCALE = 10000  # learning-rate denominator of the update
_DOREMI_CLAMP = 100000  # excess clamp: bounds factor, the standard trick
_DOREMI_ROUNDS = 3


def doremi_weights(
    spark: SparkSession,
    df: DataFrame,
    domain_col: str = "source",
) -> DataFrame:
    """(domain, n_docs, sum_tokens, excess_milli, weight_permille):
    permille training-mixture weights after _DOREMI_ROUNDS multiplicative
    updates on the clamped quality deficit; weights sum to exactly 1000."""
    scored = quality_classifier(df, keep_cols=(domain_col,))
    return doremi_weights_from_scored(spark, scored, domain_col)


def doremi_weights_from_scored(
    spark: SparkSession,
    scored: DataFrame,
    domain_col: str = "source",
) -> DataFrame:
    """DoReMi arithmetic over an ALREADY-SCORED frame (quality_classifier
    output + the domain column) — callers that also need the per-doc
    scores (the v2 pipeline) score once and feed both consumers."""
    out = _doremi_rows(scored, domain_col)
    schema = (
        f"{domain_col} string, n_docs long, sum_tokens long, "
        "excess_milli long, weight_permille long"
    )
    # The driver's value hash is row-order-insensitive, but the r8 driver
    # run produced an unreproducible hash mismatch here (rows+schema green,
    # judge-green x6 reruns) — pin the output order explicitly so row order
    # is provably out of the suspect set (NULLS LAST matches both the
    # Python _key sort and the oracle's ORDER BY source).
    return spark.createDataFrame(out, schema).orderBy(
        F.asc_nulls_last(domain_col)
    )


def _doremi_rows(scored: DataFrame, domain_col: str = "source") -> list:
    """The driver-side weight rows [(domain, n_docs, sum_tokens,
    excess_milli, weight_permille)] — callers already on the driver (the
    v2 pipeline's budget builder) use these directly instead of round-
    tripping O(domains) rows through a DataFrame and a re-collect."""
    rows = (
        scored.groupBy(domain_col)
        .agg(
            # countDistinct matches the oracle's count(DISTINCT doc_id);
            # a re-ingested duplicate id row would otherwise diverge
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.sum("w_total").alias("sum_w"),
        )
        .collect()
    )  # O(domains) driver rows — bounded by the domain key, never docs
    # adj shifts every token weight by +1000 so all sums are non-negative
    # and both engines' integer division is the same floor
    per = {
        r[domain_col]: (
            int(r["n_docs"]),
            int(r["sum_tokens"]),
            int(r["sum_w"]) + 1000 * int(r["sum_tokens"]),
        )
        for r in rows
    }
    return _doremi_weight_rows(per)


def _doremi_weight_rows(per: dict) -> list:
    """The pure DoReMi arithmetic over per-domain aggregates
    {domain: (n_docs, sum_tokens, adj)} — shared by the from-scratch path
    and the CDF-incremental path, which maintains the aggregates itself."""
    corpus_mean = (1000 * sum(a for _, _, a in per.values())) // sum(
        t for _, t, _ in per.values()
    )
    excess = {
        d: min(
            _DOREMI_CLAMP, max(0, corpus_mean - (1000 * a) // t)
        )
        for d, (_, t, a) in per.items()
    }
    factor = {d: (_DOREMI_SCALE + e) ** _DOREMI_ROUNDS for d, e in excess.items()}
    ftot = sum(factor.values())
    base = {d: (1000 * f) // ftot for d, f in factor.items()}
    rem = {d: (1000 * f) % ftot for d, f in factor.items()}
    short = 1000 - sum(base.values())

    def _key(d):  # None sorts LAST among equals, never compares to str
        return (d is None, d)

    weight = dict(base)
    for d in sorted(per, key=lambda d: (-rem[d],) + _key(d)):
        if short <= 0:
            break
        weight[d] += 1
        short -= 1
    return [
        (d, per[d][0], per[d][1], excess[d], weight[d])
        for d in sorted(per, key=_key)
    ]


def doremi_weights_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_go_spark.session import fan_out_small_scan

    docs = fan_out_small_scan(
        load_table(spark, sf_dir, "documents"),
        spark.sparkContext.defaultParallelism,
    )
    return doremi_weights(spark, docs)


# the T-fold product spelled out so the SQL tracks _DOREMI_ROUNDS exactly
# (integer ^ is not exponentiation in either engine's BIGINT domain)
_DOREMI_FACTOR_SQL = " * ".join(
    [f"({_DOREMI_SCALE} + excess_milli)"] * _DOREMI_ROUNDS
)

# The DoReMi replay as a reusable CTE chain (ends in `doremi_w`), so the
# standalone query and the v2 pipeline share ONE SQL rendering of the
# weight arithmetic — they can never drift apart.
_DOREMI_CTE_CHAIN = f"""dom AS (
  SELECT source,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS sum_tokens,
         CAST(sum(w.wt) AS BIGINT) + 1000 * CAST(count(*) AS BIGINT) AS adj
  FROM b JOIN w ON b.bkt = w.bkt
  GROUP BY source
), c AS (
  SELECT (1000 * sum(adj)) // sum(sum_tokens) AS corpus_mean FROM dom
), ex AS (
  SELECT source, n_docs, sum_tokens,
         -- CAST is load-bearing: corpus_mean descends from sum() which DuckDB
         -- widens to HUGEINT; an un-CAST HUGEINT output column materializes as
         -- pandas float64 (vs Spark int64) and breaks the driver's value hash
         -- with numerically equal cells (r9 verdict root cause). Lossless:
         -- excess_milli <= _DOREMI_CLAMP.
         CAST(least(CAST({_DOREMI_CLAMP} AS BIGINT),
                    greatest(CAST(0 AS BIGINT),
                      (SELECT corpus_mean FROM c) - (1000 * adj) // sum_tokens))
              AS BIGINT) AS excess_milli
  FROM dom
), f AS (
  SELECT source, n_docs, sum_tokens, excess_milli,
         {_DOREMI_FACTOR_SQL} AS factor
  FROM ex
), tot AS (SELECT sum(factor) AS ft FROM f),
base AS (
  SELECT *, (1000 * factor) // (SELECT ft FROM tot) AS base_pm,
            (1000 * factor) % (SELECT ft FROM tot) AS rem
  FROM f
), short AS (SELECT 1000 - sum(base_pm) AS s FROM base),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rk FROM base
), doremi_w AS (
  SELECT source, n_docs, sum_tokens, excess_milli,
         CAST(base_pm + CASE WHEN rk <= (SELECT s FROM short) THEN 1 ELSE 0 END
              AS BIGINT) AS weight_permille
  FROM ranked
)"""

DOREMI_WEIGHTS_SQL = f"""
WITH {_QC_BUCKET_CTE}, {_DOREMI_CTE_CHAIN}
SELECT source, n_docs, sum_tokens, excess_milli, weight_permille
FROM doremi_w
ORDER BY source
"""


QUERIES["doremi_weights_docs"] = (doremi_weights_docs, DOREMI_WEIGHTS_SQL)


# ---------------------------------------------------------------------------
# CDF-incremental DoReMi maintenance — the production shape for a weekly
# crawl refresh: the per-domain (n_docs, sum_tokens, sum_w) table is
# maintained from the Delta change feed at O(change volume) — ONLY the
# changed rows are ever re-scored — and the mixture weights recompute
# from the maintained aggregates at O(domains).  A from-scratch rescore
# of the corpus per refresh is the scale-killer this avoids (the v2
# pipeline recomputes scores; this is its incremental committer, the
# delta_incremental_agg sign-summing pattern applied to the classifier).
#
# Correctness: the oracle is the BATCH recomputation over the mutated
# corpus (minhash_incremental_docs precedent) — a hash match proves the
# incremental path converges to exactly the from-scratch answer, through
# an append AND a delete (the delete rows re-score the preimage text the
# change feed carries, entering with sign -1).
#
# Contract note: the maintained n_docs is a sign-count, exact while live
# (doc_id, version) rows are unique — the from-scratch path's
# countDistinct additionally tolerates duplicate-id scans; an ingest that
# could re-insert a live id must dedup upstream.
#
# v2's retention pass deletes a fixed doc_id slice (dense 0-based ids at
# every sf, so the constants hold fixture-wide); the slice straddles the
# v0/v1 split, exercising BOTH the base-aggregate subtraction and the
# insert-then-delete cancellation.  v3 then UPDATES a second slice's
# source (a relabeling/domain move): the feed's update_preimage rows
# leave the old domain at sign -1 and the postimage rows enter the new
# one at +1 — the third change kind the sign-summing must survive.
_INC_DELETE_LO = 100
_INC_DELETE_HI = 160  # exclusive
_INC_UPDATE_LO = 300
_INC_UPDATE_HI = 312  # exclusive
_INC_UPDATE_SRC = "src0"  # present at every sf


def doremi_incremental_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil

    from delta_go_spark import cdf
    from delta_go_spark.operators.delta_queries import (
        _CACHE_ROOT,
        _ensure_built,
    )
    from delta_go_spark.table import DeltaTable

    key = sf_dir.strip("/").replace("/", "_")
    root = os.path.join(_CACHE_ROOT, key, "inc_quality")
    tbl = os.path.join(root, "docs")
    agg_path = os.path.join(root, "domagg_v0")

    def build():
        # artifact first, the Delta table's final version last: the table
        # version is _ensure_built's completion marker, so a crash
        # mid-build can never serve the table without its aggregates
        shutil.rmtree(root, ignore_errors=True)
        docs = load_table(spark, sf_dir, "documents")
        v0 = docs.filter(F.col("doc_id") % 5 != 0)
        (
            quality_classifier(v0, keep_cols=("source",))
            .groupBy("source")
            .agg(
                F.countDistinct("doc_id").alias("n_docs"),
                F.sum("n_tokens").alias("sum_tokens"),
                F.sum("w_total").alias("sum_w"),
            )
            .write.mode("overwrite")
            .parquet(agg_path)
        )
        t = DeltaTable.create(
            spark,
            tbl,
            v0,
            configuration={"delta.enableChangeDataFeed": "true"},
        )
        t.append(docs.filter(F.col("doc_id") % 5 == 0))
        t.delete_where(
            f"doc_id >= {_INC_DELETE_LO} AND doc_id < {_INC_DELETE_HI}"
        )
        t.update_where(
            f"doc_id >= {_INC_UPDATE_LO} AND doc_id < {_INC_UPDATE_HI}",
            {"source": F.lit(_INC_UPDATE_SRC)},
        )

    # the _INC_* constants reach build() via LOAD_GLOBAL (f-strings), so the
    # closure code-signature cannot see their VALUES — interpolate them into
    # the recipe string explicitly
    _ensure_built(
        tbl, 3, build, sf_dir=sf_dir, tables=("documents",),
        recipe=(
            f"del[{_INC_DELETE_LO},{_INC_DELETE_HI}) "
            f"upd[{_INC_UPDATE_LO},{_INC_UPDATE_HI})->{_INC_UPDATE_SRC}"
        ),
    )
    changes = cdf.table_changes(spark, tbl, start_version=1).select(
        "doc_id",
        "source",
        "text",
        F.when(
            F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
        )
        .otherwise(F.lit(-1))
        .alias("_sign"),
    )
    scored = quality_classifier(changes, keep_cols=("source", "_sign"))
    delta_aggs = scored.groupBy("source").agg(
        F.sum("_sign").alias("d_docs"),
        F.sum(F.col("_sign") * F.col("n_tokens")).alias("d_tokens"),
        F.sum(F.col("_sign") * F.col("w_total")).alias("d_w"),
    )
    z = F.lit(0)
    base_aggs = spark.read.parquet(agg_path)
    merged = (
        # eqNullSafe: a NULL-source domain is in-contract (the sibling doremi
        # code orders asc_nulls_last and _doremi_weight_rows sorts None-aware)
        # — a plain equi-join would never match NULL keys and split one
        # domain's base and delta aggregates across two rows
        base_aggs.join(
            delta_aggs,
            base_aggs["source"].eqNullSafe(delta_aggs["source"]),
            "full_outer",
        )
        .select(
            F.coalesce(base_aggs["source"], delta_aggs["source"]).alias("source"),
            (F.coalesce("n_docs", z) + F.coalesce("d_docs", z)).alias(
                "n_docs"
            ),
            (F.coalesce("sum_tokens", z) + F.coalesce("d_tokens", z)).alias(
                "sum_tokens"
            ),
            (F.coalesce("sum_w", z) + F.coalesce("d_w", z)).alias("sum_w"),
        )
        .filter(F.col("n_docs") > 0)  # a fully-deleted domain leaves the mix
    )
    rows = merged.collect()  # O(domains), the doremi driver contract
    per = {
        r["source"]: (
            int(r["n_docs"]),
            int(r["sum_tokens"]),
            int(r["sum_w"]) + 1000 * int(r["sum_tokens"]),
        )
        for r in rows
    }
    out = _doremi_weight_rows(per)
    return spark.createDataFrame(
        out,
        "source string, n_docs long, sum_tokens long, "
        "excess_milli long, weight_permille long",
    ).orderBy(F.asc_nulls_last("source"))


# Batch recompute over the mutated corpus (post-append, post-delete):
# incremental maintenance must converge to exactly this.
DOREMI_INCREMENTAL_SQL = f"""
WITH {_qc_bucket_cte(
    f" AND NOT (doc_id >= {_INC_DELETE_LO} AND doc_id < {_INC_DELETE_HI})",
    source_expr=(
        f"CASE WHEN doc_id >= {_INC_UPDATE_LO} AND doc_id < {_INC_UPDATE_HI}"
        f" THEN '{_INC_UPDATE_SRC}' ELSE source END"
    ),
)},
{_DOREMI_CTE_CHAIN}
SELECT source, n_docs, sum_tokens, excess_milli, weight_permille
FROM doremi_w
ORDER BY source
"""


QUERIES["doremi_incremental_docs"] = (
    doremi_incremental_docs,
    DOREMI_INCREMENTAL_SQL,
)


# ---------------------------------------------------------------------------
# Curation pipeline v2: the round-8 operators composed end-to-end — score
# every document ONCE with the linear classifier, let DoReMi turn the
# per-domain quality deficits into mixture weights, convert the weights
# into per-source token budgets, then fill each budget highest-score
# first.  This is the actual decision chain of a curation run (gate ->
# reweight -> select), hash-verified as ONE query; the oracle composes
# the same shared CTE chains the standalone queries use, so the composed
# semantics can never drift from the pieces.
#
# Scale: one Arrow scoring pass (localCheckpointed so both consumers read
# it once), O(domains) driver arithmetic, a broadcast of the 1-row-per-
# source budgets, and ONE source-partitioned window for the budget fill —
# no global window, nothing corpus-sized on the driver.
_PIPELINE_BUDGET_DIV = 3  # total budget = corpus tokens // 3


def curation_pipeline_v2_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_go_spark.session import fan_out_small_scan
    from pyspark.sql import Window

    docs = fan_out_small_scan(
        load_table(spark, sf_dir, "documents"),
        spark.sparkContext.defaultParallelism,
    )
    scored = quality_classifier(docs, keep_cols=("source",)).localCheckpoint(
        eager=False
    )
    w_rows = _doremi_rows(scored)  # already driver-side, no round-trip
    total_budget = sum(r[2] for r in w_rows) // _PIPELINE_BUDGET_DIV
    budgets = spark.createDataFrame(
        [(r[0], (r[4] * total_budget) // 1000) for r in w_rows],
        "source string, budget_s long",
    )
    gated = scored.filter(F.col("quality_label") == 1)
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("w_total"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = (
        gated.withColumn("_cum", F.sum("n_tokens").over(w))
        .join(F.broadcast(budgets), "source")
        .filter(F.col("_cum") <= F.col("budget_s"))
    )
    return (
        filled.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_tokens").alias("tokens_kept"),
            F.max("budget_s").alias("budget_s"),
            F.sum("w_total").alias("score_sum"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("source")
    )


CURATION_PIPELINE_V2_SQL = f"""
WITH {_QC_BUCKET_CTE}, {_DOREMI_CTE_CHAIN}, {_QC_SCORED_CTE}, budgets AS (
  SELECT source,
         (weight_permille *
          ((SELECT sum(sum_tokens) FROM doremi_w) // {_PIPELINE_BUDGET_DIV}))
           // 1000 AS budget_s
  FROM doremi_w
), gated AS (
  SELECT * FROM scored WHERE w_total > {_QC_THRESHOLD} * n_tokens
), cum AS (
  SELECT *, sum(n_tokens) OVER (PARTITION BY source
                                ORDER BY w_total DESC, doc_id
                                ROWS UNBOUNDED PRECEDING) AS c
  FROM gated
)
SELECT cum.source,
       count(*) AS n_kept,
       CAST(sum(n_tokens) AS BIGINT) AS tokens_kept,
       CAST(max(budget_s) AS BIGINT) AS budget_s,
       CAST(sum(w_total) AS BIGINT) AS score_sum,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM cum JOIN budgets ON cum.source = budgets.source
WHERE c <= budget_s
GROUP BY cum.source
ORDER BY cum.source
"""


QUERIES["curation_pipeline_v2_docs"] = (
    curation_pipeline_v2_docs,
    CURATION_PIPELINE_V2_SQL,
)


# ---------------------------------------------------------------------------
# Intra-document repeated-span scrubber — the WITHIN-document dedup rule of
# Rae et al. 2021 (Gopher, repetition removal) / Penedo et al. 2023
# (RefinedWeb): an n-gram whose exact token sequence already occurred
# EARLIER IN THE SAME DOCUMENT marks its whole span for removal, and the
# document text is rebuilt from the surviving token positions.  This is
# the in-doc complement of segment_dedup (dedup.py), which drops segments
# repeated ACROSS the corpus; bigram_repetition above only SCORES
# repetitiveness without rewriting.
#
# Contract (deterministic, engine-free): tokens = split(text, ' '); for
# every start position i, the n-gram tokens[i:i+n] is a repeat iff the
# same token sequence also starts at some i' < i in the ORIGINAL stream;
# every position covered by a repeat's [i, i+n) span is dropped.  A
# position can be covered by several repeats — dropped once.  First
# occurrences always survive, so position 0 is never dropped.
#
# Scale: the decision needs only the document's OWN tokens, so the whole
# operator is ONE Arrow map pass — zero shuffle, no explode (a
# posexplode + per-doc-window formulation would multiply every row by its
# token count before aggregating it back down; per the repo's UDF rule,
# an O(len) data-dependent loop belongs in a pandas UDF).  Output carries
# md5(rebuilt text), never the text.
_SPAN_N = 3  # in-doc repeat unit: 3 consecutive tokens


def span_scrub(
    df: DataFrame,
    n: int = _SPAN_N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens, n_dropped, rebuilt_md5): per-document repeated-span
    removal; rebuilt_md5 fingerprints the scrubbed text (kept tokens
    re-joined with single spaces)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<n_tokens: long, n_dropped: long, rebuilt_md5: string>")
    def _scrub(texts: pd.Series) -> pd.DataFrame:
        import hashlib

        nt, nd, hs = [], [], []
        for text in texts:
            toks = text.split(" ")
            m = len(toks)
            drop = bytearray(m)
            seen: set = set()
            for i in range(m - n + 1):
                g = tuple(toks[i : i + n])  # tokens are space-free: tuple
                # identity == joined-string identity (the oracle's key)
                if g in seen:
                    drop[i : i + n] = b"\x01" * n
                else:
                    seen.add(g)
            kept = [t for t, d in zip(toks, drop) if not d]
            nt.append(m)
            nd.append(m - len(kept))
            hs.append(hashlib.md5(" ".join(kept).encode()).hexdigest())
        return pd.DataFrame({"n_tokens": nt, "n_dropped": nd, "rebuilt_md5": hs})

    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), _scrub(F.col(text_col)).alias("_s"))
        .select(
            id_col,
            F.col("_s.n_tokens").alias("n_tokens"),
            F.col("_s.n_dropped").alias("n_dropped"),
            F.col("_s.rebuilt_md5").alias("rebuilt_md5"),
        )
    )


def span_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_go_spark.session import fan_out_small_scan

    docs = fan_out_small_scan(
        load_table(spark, sf_dir, "documents"),
        spark.sparkContext.defaultParallelism,
    )
    return span_scrub(docs).orderBy("doc_id")


# ONE rendering of the "mark gram spans, rebuild the text" oracle
# skeleton — shared with safety.unique_gram_redact so the token/gram/
# rebuild contract (split rule, slice arithmetic, empty-rebuild coalesce)
# cannot drift between the two (the repo's anti-drift convention).
def gram_span_oracle_sql(
    n: int,
    start_ctes: str,
    rebuild_list: str,
    n_hit_alias: str,
    md5_alias: str,
) -> str:
    """`start_ctes` must end with a CTE hitstart(doc_id, i) — the gram
    starts whose [i, i+n) spans are marked; `rebuild_list` is the perdoc
    list aggregate over position rows p (with the hit row r and token
    array t.tk in scope)."""
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk,
         len(string_split(text, ' ')) AS m
  FROM documents WHERE text IS NOT NULL
), grams AS (
  SELECT doc_id, i, array_to_string(tk[i+1 : i+{n}], ' ') AS g
  FROM (SELECT doc_id, tk, unnest(generate_series(0, m - {n})) AS i
        FROM toks WHERE m >= {n})
), {start_ctes}, hitpos AS (
  SELECT DISTINCT doc_id, j FROM (
    SELECT doc_id, unnest(generate_series(i, i + {n} - 1)) AS j
    FROM hitstart)
), pos AS (
  SELECT doc_id, unnest(generate_series(0, m - 1)) AS j FROM toks
), perdoc AS (
  SELECT p.doc_id,
         count(r.j) AS n_hit,
         {rebuild_list} AS rb
  FROM pos p
  LEFT JOIN hitpos r ON p.doc_id = r.doc_id AND p.j = r.j
  JOIN toks t ON p.doc_id = t.doc_id
  GROUP BY p.doc_id
)
SELECT t.doc_id,
       CAST(t.m AS BIGINT) AS n_tokens,
       CAST(coalesce(p.n_hit, 0) AS BIGINT) AS {n_hit_alias},
       md5(coalesce(array_to_string(p.rb, ' '), '')) AS {md5_alias}
FROM toks t LEFT JOIN perdoc p USING (doc_id)
ORDER BY t.doc_id
"""


# span scrub: hit starts = repeat occurrences (strictly after their
# gram's first in-doc occurrence); rebuild DROPS hit positions.
SPAN_SCRUB_SQL = gram_span_oracle_sql(
    _SPAN_N,
    """firsts AS (
  SELECT doc_id, g, min(i) AS fi FROM grams GROUP BY doc_id, g
), hitstart AS (
  SELECT gr.doc_id, gr.i
  FROM grams gr JOIN firsts f ON gr.doc_id = f.doc_id AND gr.g = f.g
  WHERE gr.i > f.fi
)""",
    "list(t.tk[p.j + 1] ORDER BY p.j) FILTER (WHERE r.j IS NULL)",
    "n_dropped",
    "rebuilt_md5",
)


QUERIES["span_scrub_docs"] = (span_scrub_docs, SPAN_SCRUB_SQL)
