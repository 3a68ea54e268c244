"""Pipeline-safety operators for training-data preparation: benchmark
decontamination and PII redaction.

Both are first-class LLM-pipeline needs the reference (a metadata-layer
library, README.md:14-16) deliberately leaves to the compute engine:

- **Decontamination**: before training, any document sharing an n-token
  gram with an evaluation/benchmark set must be flagged (the GPT-3-style
  13-gram rule; n is a parameter).  Spark-first shape: the probe set's
  distinct gram hashes are SMALL (benchmarks are thousands of docs, not
  billions) — broadcast them and semi-join the corpus' exploded gram
  hashes, so the corpus is read once, nothing quadratic ever runs, and
  the only shuffle is the final per-doc aggregate.
- **PII redaction**: regexp_replace chains for emails, IPv4s and long
  digit runs — pure codegen expressions, one projection over the scan,
  no shuffle at all.  Patterns are restricted to syntax with identical
  semantics in Java regex (Spark) and RE2 (DuckDB) so the oracle can
  value-hash the REDACTED TEXT itself, not just the counts.

Both registry queries carry exact DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_go_spark.session import load_table


def _gram_hashes(df: DataFrame, id_col: str, text_col: str, n: int):
    """n-token-gram xxhash64 values per document, exploded — possibly
    with per-doc duplicates (consumers dedup only where it matters).
    Built as explode + codegen'd slice/concat/hash rather than a
    higher-order transform(): Spark's HOFs are interpreted, and the
    codegen form measured ~2.8x faster at sf0.1.  Hashing before any
    downstream movement means 8 bytes per gram cross the wire, not the
    n-token string."""
    toks = F.split(F.col(text_col), " ")
    return (
        df.select(F.col(id_col), toks.alias("_t"))
        .select(
            id_col,
            "_t",
            F.explode(
                F.sequence(
                    F.lit(1), F.greatest(F.size("_t") - (n - 1), F.lit(1))
                )
            ).alias("_i"),
        )
        .select(
            id_col,
            F.xxhash64(
                F.concat_ws(" ", F.slice(F.col("_t"), F.col("_i"), n))
            ).alias("_g"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """(id, n_hits): corpus documents sharing >= 1 n-token gram with ANY
    probe document, with the count of distinct shared grams.  Join order
    is the scale decision: probe grams broadcast to the corpus scan — at
    100 TB the corpus side streams through ONE shuffle-free stage
    (explode, hash, broadcast semi-join), and only the rare hits reach
    the aggregate, where count(DISTINCT) dedups a doc's repeated grams —
    dedup AFTER the semi-join, so no corpus-wide distinct shuffle ever
    runs."""
    probe_grams = (
        _gram_hashes(probes, id_col, text_col, n).select("_g").distinct()
    )
    corpus_grams = _gram_hashes(corpus, id_col, text_col, n)
    return (
        corpus_grams.join(F.broadcast(probe_grams), "_g", "left_semi")
        .groupBy(id_col)
        .agg(F.count_distinct("_g").alias("n_hits"))
    )


def decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: the 'benchmark' is the deterministic slice
    doc_id % 7 == 0 of the documents table itself; every OTHER document
    sharing an 8-gram with it is contaminated.  The synthetic corpus is
    near-dup-heavy and the 1-in-7 slice is wide enough that real hits
    exist even at sf0.01 (9 docs) — a 0-row result would make the
    oracle trivially green, so the slice is chosen to avoid that."""
    docs = load_table(spark, sf_dir, "documents")
    probes = docs.filter(F.col("doc_id") % 7 == 0)
    rest = docs.filter(F.col("doc_id") % 7 != 0)
    return (
        decontaminate(rest, probes)
        .select("doc_id", "n_hits")
        .orderBy("doc_id")
    )



def _gram_cte_sql(extra_cols: str = "") -> str:
    """The toks/exploded/grams oracle CTE chain — THE one SQL replay of
    _gram_hashes' 8-gram contract (split on single space,
    greatest(len-7,1) positions, 8-slot concat_ws), shared by the
    gram-consuming oracles in this module so the gram rule cannot
    diverge between them.  `extra_cols` threads extra projection columns
    (e.g. ", source") through the chain.  SPAN_DECONTAMINATE_SQL keeps a
    positional variant (it needs dl and the gram position i) — any
    change to the gram rule must land there too."""
    return f"""toks AS (
  SELECT doc_id{extra_cols}, string_split(text, ' ') AS t FROM documents
), exploded AS (
  SELECT doc_id{extra_cols}, t,
         unnest(generate_series(1, greatest(len(t) - 7, 1))) AS i
  FROM toks
), grams AS (
  SELECT DISTINCT doc_id{extra_cols},
         concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3],
                        t[i+4], t[i+5], t[i+6], t[i+7]) AS gram
  FROM exploded
)"""


DECONTAMINATE_SQL = f"""
WITH {_gram_cte_sql()}, probe AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % 7 = 0
)
SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM grams g JOIN probe USING (gram)
WHERE g.doc_id % 7 <> 0
GROUP BY g.doc_id
ORDER BY doc_id
"""


def _gram_hashes_pos(df: DataFrame, id_col: str, text_col: str, n: int):
    """Like _gram_hashes but keeps the gram's token position and the
    document token length — span detection needs to know WHERE the
    matching grams sit, not just that they exist."""
    toks = F.split(F.col(text_col), " ")
    return (
        df.select(F.col(id_col), toks.alias("_t"))
        .select(
            id_col,
            "_t",
            F.size("_t").alias("_dl"),
            F.explode(
                F.sequence(
                    F.lit(1), F.greatest(F.size("_t") - (n - 1), F.lit(1))
                )
            ).alias("_i"),
        )
        .select(
            id_col,
            "_dl",
            "_i",
            F.xxhash64(
                F.concat_ws(" ", F.slice(F.col("_t"), F.col("_i"), n))
            ).alias("_g"),
        )
    )


def span_decontaminate(
    corpus: DataFrame,
    probes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """(id, max_span_tokens, n_contam_grams): span-LEVEL decontamination
    (the exact-substring rule of Lee et al. 2022, "Deduplicating Training
    Data Makes Language Models Better") — for each corpus document, the
    longest run of CONSECUTIVE token positions whose n-grams all appear
    in the probe set, reported in tokens (a run of L consecutive matching
    gram starts covers L+n-1 tokens, clamped to the document length).
    Doc-level decontaminate() answers "is it contaminated"; this answers
    "how much is verbatim" — the signal that separates a quoted sentence
    from a wholesale benchmark copy.

    Scale shape: identical front half to decontaminate (probe gram hashes
    broadcast, corpus streamed once through explode+hash+semi-join, no
    shuffle); the islands detection (row_number over (doc, position))
    then runs over HITS ONLY, so the single shuffle is bounded by the
    contamination volume, never the corpus size."""
    from pyspark.sql.window import Window

    probe_grams = (
        _gram_hashes(probes, id_col, text_col, n).select("_g").distinct()
    )
    hits = _gram_hashes_pos(corpus, id_col, text_col, n).join(
        F.broadcast(probe_grams), "_g", "left_semi"
    )
    w = Window.partitionBy(id_col).orderBy("_i")
    runs = (
        hits.withColumn("_grp", F.col("_i") - F.row_number().over(w))
        .groupBy(id_col, "_grp")
        .agg(F.count(F.lit(1)).alias("_run"), F.max("_dl").alias("_dl"))
    )
    return runs.groupBy(id_col).agg(
        F.least(F.max("_run") + (n - 1), F.max("_dl"))
        .cast("long")
        .alias("max_span_tokens"),
        F.sum("_run").cast("long").alias("n_contam_grams"),
    )


def span_decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: same benchmark slice as decontaminate_docs
    (doc_id % 7 == 0), so the two rows agree on WHICH docs are flagged
    while this one grades the verbatim depth."""
    docs = load_table(spark, sf_dir, "documents")
    probes = docs.filter(F.col("doc_id") % 7 == 0)
    rest = docs.filter(F.col("doc_id") % 7 != 0)
    return (
        span_decontaminate(rest, probes)
        .select("doc_id", "max_span_tokens", "n_contam_grams")
        .orderBy("doc_id")
    )


SPAN_DECONTAMINATE_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), exploded AS (
  SELECT doc_id, t, len(t) AS dl,
         unnest(generate_series(1, greatest(len(t) - 7, 1))) AS i
  FROM toks
), grams AS (
  SELECT doc_id, dl, i,
         concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3],
                        t[i+4], t[i+5], t[i+6], t[i+7]) AS gram
  FROM exploded
), probe AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % 7 = 0
), hits AS (
  SELECT g.doc_id, g.dl, g.i,
         g.i - row_number() OVER (PARTITION BY g.doc_id ORDER BY g.i) AS grp
  FROM grams g
  WHERE g.doc_id % 7 <> 0 AND gram IN (SELECT gram FROM probe)
), runs AS (
  SELECT doc_id, count(*) AS run_len, max(dl) AS dl
  FROM hits GROUP BY doc_id, grp
)
SELECT doc_id,
       CAST(least(max(run_len) + 7, max(dl)) AS BIGINT) AS max_span_tokens,
       CAST(sum(run_len) AS BIGINT) AS n_contam_grams
FROM runs GROUP BY doc_id ORDER BY doc_id
"""


# Patterns valid with identical semantics in Java regex AND RE2: character
# classes, bounded repetition, alternation — no lookaround, no backrefs.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "long_digits": r"\b[0-9]{7,}\b",
}


def redact_pii(
    df: DataFrame, text_col: str = "text", patterns: dict[str, str] | None = None
) -> DataFrame:
    """Adds `<text_col>_redacted` plus one `n_<kind>` count per pattern.
    Pure regexp expressions — codegen, zero shuffle, the document never
    leaves its partition.  Counts are taken BEFORE redaction (a later
    pattern must not hide an earlier kind's matches); replacement order
    follows the dict, most-specific first."""
    patterns = patterns or PII_PATTERNS
    out = df
    for kind, pat in patterns.items():
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))),
        )
    red = F.col(text_col)
    for kind, pat in patterns.items():
        red = F.regexp_replace(red, pat, f"<{kind.upper()}>")
    return out.withColumn(f"{text_col}_redacted", red)


def redact_pii_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry query: the synthetic corpus carries no PII, so each doc
    first gets DETERMINISTIC synthetic PII appended (an email, an IPv4
    and an account number derived from doc_id), then the redactor runs.
    The oracle hash-checks md5 of the redacted text — the redaction
    output itself, not just the match counts."""
    docs = load_table(spark, sf_dir, "documents")
    salted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com at 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".17 acct 900"),
            (F.col("doc_id") + 1234567).cast("string"),
        ),
    )
    out = redact_pii(salted)
    return out.select(
        "doc_id",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_ipv4").cast("long").alias("n_ipv4"),
        F.col("n_long_digits").cast("long").alias("n_long_digits"),
        F.md5("text_redacted").alias("redacted_md5"),
    ).orderBy("doc_id")


REDACT_PII_SQL = r"""
WITH salted AS (
  SELECT doc_id,
         concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                '@example.com at 10.0.', CAST(doc_id % 256 AS VARCHAR),
                '.17 acct 900', CAST(doc_id + 1234567 AS VARCHAR)) AS text
  FROM documents
), counted AS (
  SELECT doc_id, text,
         len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
         len(regexp_extract_all(text,
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ipv4,
         len(regexp_extract_all(text, '\b[0-9]{7,}\b')) AS n_long_digits
  FROM salted
)
SELECT doc_id,
       CAST(n_email AS BIGINT) AS n_email,
       CAST(n_ipv4 AS BIGINT) AS n_ipv4,
       CAST(n_long_digits AS BIGINT) AS n_long_digits,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IPV4>', 'g'),
           '\b[0-9]{7,}\b', '<LONG_DIGITS>', 'g')) AS redacted_md5
FROM counted
ORDER BY doc_id
"""


def duplicated_gram_fraction(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """(id, n_grams, n_dup, dup_frac): per document, the fraction of its
    DISTINCT n-grams that also occur in at least one OTHER document —
    the Gopher/RefinedWeb inter-document duplication gate (complements
    the INTRA-doc repetition signals in curation.py).

    Plan: one distinct over (doc, gram-hash), a gram doc-frequency
    aggregate, and a join back — the join and the aggregate share the
    same hash partitioning on the 8-byte gram key, so Catalyst reuses
    the exchange; nothing wider than (id, hash) ever shuffles."""
    grams = _gram_hashes(df, id_col, text_col, n).dropDuplicates(
        [id_col, "_g"]
    )
    doc_freq = grams.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
    frac = F.col("n_dup") / F.col("n_grams")
    return (
        grams.join(doc_freq, "_g")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("_df") >= 2, 1).otherwise(0)).alias("n_dup"),
        )
        .select(
            id_col,
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_dup").cast("long").alias("n_dup"),
            F.round(frac, 4).alias("dup_frac"),
        )
    )


def duplicated_gram_fraction_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return duplicated_gram_fraction(docs).orderBy("doc_id")


DUP_GRAM_FRACTION_SQL = f"""
WITH {_gram_cte_sql()}, df AS (
  SELECT gram, count(*) AS n_docs FROM grams GROUP BY gram
)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN df.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       round(sum(CASE WHEN df.n_docs >= 2 THEN 1 ELSE 0 END) / count(*), 4) AS dup_frac
FROM grams g JOIN df USING (gram)
GROUP BY g.doc_id
ORDER BY doc_id
"""


QUERIES: dict = {
    "decontaminate_docs": (decontaminate_docs, DECONTAMINATE_SQL),
    "span_decontaminate_docs": (
        span_decontaminate_docs,
        SPAN_DECONTAMINATE_SQL,
    ),
    "redact_pii_docs": (redact_pii_docs, REDACT_PII_SQL),
    "duplicated_gram_fraction_docs": (
        duplicated_gram_fraction_docs,
        DUP_GRAM_FRACTION_SQL,
    ),
}


# ---------------------------------------------------------------------------
# Gram novelty: each source's MARGINAL contribution of new content — for
# every distinct corpus 8-gram, attribute it to the document that
# introduces it (min doc_id), then ask per source: of the grams you carry,
# how many did YOU introduce?  The add-or-drop signal for a crawl source:
# a source whose grams are all introduced elsewhere adds bytes, not data.
def gram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """(source, n_grams_distinct, n_introduced, novelty_micro): distinct
    grams appearing in the source, grams whose corpus-wide first document
    (min id) lies in the source, and their floor(1e6 * ratio).

    Plan: the (id, 8-byte gram hash) stream shuffles twice on the gram
    key (distinct + first-doc aggregate — both partial-aggregable) and
    once on the id key for the source attach; nothing wider than
    (id, hash) moves.  First-doc attribution is min(doc_id) — total
    order, deterministic on any engine."""
    # distinct (id, source) pairs, matching the oracle's DISTINCT — a
    # duplicated id row must not double-count introductions
    src = df.select(F.col(id_col), F.col(source_col)).dropDuplicates(
        [id_col, source_col]
    )
    grams = _gram_hashes(df, id_col, text_col, n).dropDuplicates(
        [id_col, "_g"]
    )
    with_src = grams.join(src, id_col)
    per_source = with_src.groupBy(source_col).agg(
        F.countDistinct("_g").alias("n_grams_distinct")
    )
    first_doc = grams.groupBy("_g").agg(F.min(id_col).alias(id_col))
    introduced = (
        first_doc.join(src, id_col)
        .groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n_introduced"))
        .withColumnRenamed(source_col, "_isrc")
    )
    # NULL-safe source join: a NULL source (real crawl data) must keep
    # its introduced count instead of silently reporting 0
    joined = per_source.join(
        introduced,
        per_source[source_col].eqNullSafe(introduced["_isrc"]),
        "left",
    )
    return (
        joined.select(
            source_col,
            F.col("n_grams_distinct").cast("long").alias("n_grams_distinct"),
            F.coalesce(F.col("n_introduced"), F.lit(0))
            .cast("long")
            .alias("n_introduced"),
        )
        .withColumn(
            "novelty_micro",
            # exact integer division; under ANSI the (astronomical)
            # product overflow raises loudly on both engines instead of
            # silently wrapping
            F.expr("n_introduced * 1000000 div n_grams_distinct"),
        )
        .orderBy(F.col(source_col).asc_nulls_last())
    )


def gram_novelty_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gram_novelty(load_table(spark, sf_dir, "documents"))


GRAM_NOVELTY_SQL = f"""
WITH {_gram_cte_sql(", source")}, per_source AS (
  SELECT source, count(DISTINCT gram) AS n_grams_distinct
  FROM grams GROUP BY source
), first_doc AS (
  SELECT gram, min(doc_id) AS doc_id FROM grams GROUP BY gram
), introduced AS (
  SELECT g.source, count(*) AS n_introduced
  FROM first_doc f JOIN (SELECT DISTINCT doc_id, source FROM grams) g
    USING (doc_id)
  GROUP BY g.source
)
SELECT p.source,
       CAST(p.n_grams_distinct AS BIGINT) AS n_grams_distinct,
       CAST(COALESCE(i.n_introduced, 0) AS BIGINT) AS n_introduced,
       CAST(COALESCE(i.n_introduced, 0) * 1000000
            // p.n_grams_distinct AS BIGINT) AS novelty_micro
FROM per_source p LEFT JOIN introduced i
  ON p.source IS NOT DISTINCT FROM i.source
ORDER BY p.source NULLS LAST
"""


QUERIES["gram_novelty_docs"] = (gram_novelty_docs, GRAM_NOVELTY_SQL)


# ---------------------------------------------------------------------------
# Unique-gram redaction — the k-anonymity-style privacy scrub: a token
# n-gram that appears in EXACTLY ONE document corpus-wide is
# identifier-shaped (names, account strings, one-off addresses survive
# regex PII filters), so every position it covers is masked and the text
# rebuilt with a redaction token.  Complements redact_pii (pattern-known
# PII) and span_scrub (in-doc repeats): the decision here needs CORPUS
# frequency, not patterns.  k=2 anonymity (survive iff seen in >= 2 docs)
# is the standard floor; a real deployment raises the threshold.
#
# Scale: one explode pass hashes each gram to 8 bytes (xxhash64) before
# anything moves; doc-frequency is a distinct + partial-aggregable count
# on the hash; only the unique-gram hits flow back through one join; the
# rebuild works from each doc's OWN token array (segment_dedup's shape).
# The mask substitution itself stays in the final projection.
_UGR_N = 3  # gram width; the fixture's 31-word vocab makes 3 the floor
_UGR_MASK = "<RED>"


def unique_gram_redact(
    df: DataFrame,
    n: int = _UGR_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    exact: bool = False,
    _gram_hash=None,
) -> DataFrame:
    """(id, n_tokens, n_redacted, redacted_md5): every position covered by
    a corpus-unique n-gram is replaced with the mask token;
    redacted_md5 fingerprints the rebuilt text.  A gram occurring twice
    WITHIN its single document is still unique to that document — both
    occurrences are masked.

    Privacy contract caveat (exact=False, the 100 TB default): uniqueness
    is decided on xxhash64(gram), so the guarantee is HASH-APPROXIMATE —
    a 64-bit collision between a truly unique, identifier-shaped gram and
    a gram from another document makes min(doc) != max(doc) and the
    identifier ESCAPES redaction (collisions can only under-redact, never
    over-redact: a hash unique to one doc proves every string behind it
    is too).  Collision odds are ~n_distinct_grams^2 / 2^65 (birthday
    bound); at 10^10 distinct grams that is ~2.7 expected collisions
    corpus-wide, each escaping only if one side is an actual identifier.

    exact=True restores the exact k-anonymity guarantee at O(collisions)
    extra cost: the per-hash aggregate ALSO carries min/max of the gram
    string (partial-aggregable — strings ride the same map-side combine),
    so a hash hiding >= 2 distinct strings is DETECTED (min != max), and
    only those collision groups re-group by the exact string to rescue
    any unique gram hidden under a shared hash.  Collision-free hashes —
    in practice all of them — are decided by the hash alone, exactly as
    the default path.

    `_gram_hash` injects the hash column builder (default F.xxhash64) so
    tests can force collisions; production callers never set it."""
    hash_fn = _gram_hash or F.xxhash64
    base = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_t")
    )
    gram_str = F.concat_ws(" ", F.slice("_t", F.col("_i") + 1, n))
    start_cols = [F.col(id_col), F.col("_i"), hash_fn(gram_str).alias("_g")]
    if exact:
        start_cols.append(gram_str.alias("_s"))
    starts = (
        base.filter(F.size("_t") >= n)  # sequence(0, m-n) descends if m<n
        .select(
            id_col,
            "_t",
            F.explode(F.sequence(F.lit(0), F.size("_t") - n)).alias("_i"),
        )
        .select(*start_cols)
    )
    # "exactly one distinct document" ⟺ min(doc) == max(doc): min/max are
    # partial-aggregable, so no (gram, doc) distinct shuffle ever runs —
    # hot boilerplate grams combine map-side.  The doc-frequency branch
    # and the hits join each re-run the cheap codegen explode (column-
    # pruned to what they need; exchange reuse does NOT apply because the
    # pruned schemas differ), and the join side adapts by size: a small
    # uniq set broadcasts (corpus side never shuffles), a huge one —
    # the realistic 100 TB case, where most long grams ARE unique —
    # falls back to sort-merge under autoBroadcastJoinThreshold.
    if not exact:
        uniq = (
            starts.groupBy("_g")
            .agg(F.min(id_col).alias("_lo"), F.max(id_col).alias("_hi"))
            .filter(F.col("_lo") == F.col("_hi"))
            .select("_g")
        )
        hits = starts.join(uniq, "_g").select(id_col, "_i")
    else:
        agg = starts.groupBy("_g").agg(
            F.min(id_col).alias("_lo"),
            F.max(id_col).alias("_hi"),
            F.min("_s").alias("_slo"),
            F.max("_s").alias("_shi"),
        )
        # min==max over the strings proves the hash maps to ONE string:
        # its doc range is the string's doc range, decided exactly
        clean_uniq = agg.filter(
            (F.col("_lo") == F.col("_hi")) & (F.col("_slo") == F.col("_shi"))
        ).select("_g")
        # >= 2 distinct strings share this hash: re-decide by the exact
        # string, for ONLY these grams (O(collision volume))
        collided = agg.filter(F.col("_slo") != F.col("_shi")).select("_g")
        rescue_src = starts.join(collided, "_g")
        rescue_uniq = (
            rescue_src.groupBy("_s")
            .agg(F.min(id_col).alias("_lo"), F.max(id_col).alias("_hi"))
            .filter(F.col("_lo") == F.col("_hi"))
            .select("_s")
        )
        hits = (
            starts.join(clean_uniq, "_g")
            .select(id_col, "_i")
            .unionByName(rescue_src.join(rescue_uniq, "_s").select(id_col, "_i"))
        )
    red = (
        hits.select(
            id_col,
            F.explode(
                F.sequence(F.col("_i"), F.col("_i") + (n - 1))
            ).alias("_j"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("_j").alias("_red"))  # set: overlaps dedup here
    )
    empty = F.array().cast("array<int>")
    mask_positions = F.coalesce(F.col("_red"), empty)
    rebuilt = F.concat_ws(
        " ",
        F.transform(
            "_t",
            lambda t, j: F.when(
                F.array_contains(mask_positions, j), F.lit(_UGR_MASK)
            ).otherwise(t),
        ),
    )
    return base.join(red, id_col, "left").select(
        id_col,
        F.size("_t").alias("n_tokens"),
        F.coalesce(F.size("_red"), F.lit(0)).alias("n_redacted"),
        F.md5(rebuilt.cast("binary")).alias("redacted_md5"),
    )


def unique_gram_redact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return unique_gram_redact(docs).orderBy("doc_id")


# The gram/position/rebuild skeleton is single-sourced with span_scrub's
# oracle (curation.gram_span_oracle_sql): only the hit criterion (corpus-
# unique grams) and the rebuild rule (MASK, not drop) differ.
from delta_go_spark.functions.curation import gram_span_oracle_sql  # noqa: E402

UNIQUE_GRAM_REDACT_SQL = gram_span_oracle_sql(
    _UGR_N,
    """uniq AS (
  SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS c FROM grams GROUP BY g)
  WHERE c = 1
), hitstart AS (
  SELECT gr.doc_id, gr.i FROM grams gr JOIN uniq USING (g)
)""",
    f"""list(CASE WHEN r.j IS NOT NULL THEN '{_UGR_MASK}'
                   ELSE t.tk[p.j + 1] END ORDER BY p.j)""",
    "n_redacted",
    "redacted_md5",
)


QUERIES["unique_gram_redact_docs"] = (
    unique_gram_redact_docs,
    UNIQUE_GRAM_REDACT_SQL,
)


# ---------------------------------------------------------------------------
# Unified contamination REPORT — the three decontamination signals the
# module provides (verbatim 8-gram overlap, span depth, embedding-space
# similarity) joined into the one per-document audit a release review
# actually reads, over a SINGLE eval slice (id % 7 == 0) so the signals
# describe the same held-out set.  A doc is flagged when it shares any
# verbatim gram with the eval set OR sits above the cosine threshold
# next to it (the span depth grades severity of the former).
#
# Anti-drift: the Spark side CALLS the three registered operators; the
# oracle embeds their registered SQL (verbatim subqueries for the gram
# rows; the semantic side re-renders its shared template at probe_mod=7)
# — the report cannot disagree with the standalone rows.  Scale: three
# audit passes over the corpus + three id-key left joins; a production
# run persists each signal's output and joins the artifacts.
def contamination_report_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from delta_go_spark.functions.similarity import (
        _SEMDECON_TAU_MICRO,
        semantic_decontaminate,
    )

    docs = load_table(spark, sf_dir, "documents")
    probes = docs.filter(F.col("doc_id") % 7 == 0)
    rest = docs.filter(F.col("doc_id") % 7 != 0)
    g = decontaminate(rest, probes).select("doc_id", "n_hits")
    s = span_decontaminate(rest, probes).select("doc_id", "max_span_tokens")
    m = semantic_decontaminate(
        load_table(spark, sf_dir, "embeddings"), probe_mod=7
    ).select(F.col("vec_id").alias("doc_id"), "max_cos_micro")
    return (
        rest.select("doc_id")
        .join(g, "doc_id", "left")
        .join(s, "doc_id", "left")
        # docs without an embedding row (or zero-norm) carry the sentinel
        # below any real cosine — identically on both engines
        .join(m, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_gram_hits"),
            F.coalesce("max_span_tokens", F.lit(0)).alias("max_span_tokens"),
            F.coalesce("max_cos_micro", F.lit(-2_000_000)).alias(
                "max_cos_micro"
            ),
        )
        .withColumn(
            "contaminated",
            (
                (F.col("n_gram_hits") > 0)
                | (F.col("max_cos_micro") >= _SEMDECON_TAU_MICRO)
            ).cast("int"),
        )
        .orderBy("doc_id")
    )


def _contamination_report_sql() -> str:
    from delta_go_spark.functions.similarity import (
        _SEMDECON_TAU_MICRO,
        _semantic_decon_sql,
    )

    return f"""
WITH gramq AS (SELECT * FROM ({DECONTAMINATE_SQL})),
spanq AS (SELECT * FROM ({SPAN_DECONTAMINATE_SQL})),
semq AS (SELECT * FROM ({_semantic_decon_sql(7, _SEMDECON_TAU_MICRO)})),
base AS (SELECT doc_id FROM documents WHERE doc_id % 7 != 0)
SELECT b.doc_id,
       CAST(coalesce(g.n_hits, 0) AS BIGINT) AS n_gram_hits,
       CAST(coalesce(s.max_span_tokens, 0) AS BIGINT) AS max_span_tokens,
       CAST(coalesce(m.max_cos_micro, -2000000) AS BIGINT) AS max_cos_micro,
       CAST(coalesce(g.n_hits, 0) > 0
            OR coalesce(m.max_cos_micro, -2000000) >= {_SEMDECON_TAU_MICRO}
            AS INT) AS contaminated
FROM base b
LEFT JOIN gramq g USING (doc_id)
LEFT JOIN spanq s USING (doc_id)
LEFT JOIN semq m ON b.doc_id = m.vec_id
ORDER BY b.doc_id
"""


CONTAMINATION_REPORT_SQL = _contamination_report_sql()


QUERIES["contamination_report_docs"] = (
    contamination_report_docs,
    CONTAMINATION_REPORT_SQL,
)
