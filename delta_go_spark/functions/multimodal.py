"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schemas, Arrow-batched
mapInPandas pipelines, partition-friendly layout; the codec step itself
(actual JPEG/audio decoding) is stubbed behind DETERMINISTIC_FAKE because
media libraries are not in this container.  Swapping `_decode_stub` for a
real decoder (PIL/torchaudio/ffmpeg) changes no Spark code: the UDF
signature, batch shape and schema stay identical.

Scale design: media bytes travel through Arrow record batches
(mapInPandas), never through Python pickling row-by-row; metadata-only
operations (filtering by size/kind, bucketing) stay in JVM expressions so
the binary column is not even read when pruned (parquet column pruning).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

DETERMINISTIC_FAKE = True  # container has no media libs; see module doc


def make_media_df(spark, n: int = 64) -> DataFrame:
    """Synthetic media table with deterministic binary payloads."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * (4 + i % 8)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + (i % 4) * 32 if kind != "audio" else None,
                64 + (i % 3) * 32 if kind != "audio" else None,
                1000 * (1 + i % 30) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_stub(content: bytes, kind: str) -> list[float]:
    """STUB for the real decoder (no media libs in this container).

    Produces a deterministic 16-dim feature from the bytes so the whole
    pipeline (batching, schema, joins) is testable end-to-end.  A real
    implementation would raise NotImplementedError without DETERMINISTIC_FAKE
    and decode with PIL/torchaudio here.
    """
    if not DETERMINISTIC_FAKE:
        raise NotImplementedError("media decoding requires PIL/torchaudio")
    # hash the UPPERCASE HEX of the bytes (not the raw bytes): every engine
    # can reproduce it — SQL sha256 implementations take text, not blobs
    h = hashlib.sha256((content or b"").hex().upper().encode()).digest()
    return [b / 255.0 for b in h[:16]]


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", IntegerType(), False),
        StructField("feature", ArrayType(FloatType(), False), False),
    ]
)


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    mapInPandas: each Arrow batch arrives as a pandas DataFrame; media
    bytes never round-trip through per-row pickling.  Output schema is
    fixed (FEATURE_SCHEMA) so downstream plans are stable.
    """

    # NOTE: the closure must be self-contained (stdlib only) — executors'
    # Python workers do not have this package on sys.path; cloudpickle
    # serializes `run` by value but cannot serialize module references.
    fake = DETERMINISTIC_FAKE

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        def decode(content: bytes) -> list[float]:
            if not fake:
                raise NotImplementedError("media decoding requires PIL/torchaudio")
            # MUST mirror _decode_stub AND MEDIA_PIPELINE_SQL exactly — the
            # three are kept in sync by hand because this closure cannot
            # reference the module (cloudpickle ships it by value; executor
            # workers do not have the package on sys.path).
            h = _hl.sha256((content or b"").hex().upper().encode()).digest()
            return [b / 255.0 for b in h[:16]]

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
                    "feature": [
                        decode(bytes(c) if c is not None else b"") for c in pdf["content"]
                    ],
                }
            )
            yield out

    return df.select("media_id", "kind", "content").mapInPandas(run, FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize pipeline: filter to images in JVM (binary column pruned for
    other kinds), then Arrow-batched transform.  The resize itself is the
    stubbed codec step."""

    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("content", BinaryType(), True),
            StructField("width", IntegerType(), False),
            StructField("height", IntegerType(), False),
        ]
    )

    fake = DETERMINISTIC_FAKE  # captured by value: workers lack this module

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("image resize requires PIL")
            # fake resize: deterministic truncate/pad to width*height bytes
            target = width * height
            def fake_resize(b):
                b = bytes(b or b"")
                return (b * (target // max(len(b), 1) + 1))[:target]

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": pdf["content"].map(fake_resize),
                    "width": width,
                    "height": height,
                }
            )

    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "content")
        .mapInPandas(run, out_schema)
    )


def sample_frames(df: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame sampling for videos: explode timestamps JVM-side (sequence),
    one row per sampled frame; the decode of each frame is the stubbed
    step, but the row explosion — the part that matters for scale — is a
    real JVM expression."""
    frames = df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
    return frames


def media_summary(df: DataFrame) -> DataFrame:
    """Metadata-only aggregation: never touches the binary column, so the
    parquet scan prunes it (verify via ReadSchema in explain)."""
    return (
        df.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.length("content")).alias("total_bytes"),
            F.avg("duration_ms").alias("avg_duration_ms"),
        )
        .orderBy("kind")
    )


# ---------------------------------------------------------------------------
# Registry entries.
def binary_stats_docs(spark, sf_dir: str) -> DataFrame:
    """Opaque-binary column operations with an exact oracle: the documents
    text re-encoded as a binary payload, then metadata-only expressions
    (byte length, digest, prefix) — the JVM-side operations a multimodal
    pipeline runs before any codec touches the payload."""
    from delta_go_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.md5(payload).alias("digest"),
        F.hex(F.substring(payload, 1, 4)).alias("magic_hex"),
    ).orderBy("doc_id")


BINARY_STATS_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text)                  AS digest,
       upper(to_hex(encode(substring(text, 1, 4)))) AS magic_hex
FROM documents
ORDER BY doc_id
"""


def media_pipeline_summary(spark, sf_dir: str) -> DataFrame:
    """Deterministic media pipeline end-to-end: synthesize binary media,
    Arrow-batched feature extraction (mapInPandas), metadata summary.
    Exact oracle (round 3): the deterministic fake decoder hashes the hex
    of the payload, so DuckDB rebuilds the identical media table and
    features from first principles — the value-hash now covers the whole
    mapInPandas pipeline, not just its row count."""
    df = make_media_df(spark, 96)
    feats = extract_features(df)  # carries kind through the Arrow batches
    return (
        feats.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.round(F.avg(F.element_at("feature", 1)), 4).alias("avg_f0"),
        )
        .orderBy("kind")
    )


# DuckDB rebuilds make_media_df + the fake decoder exactly: payload =
# sha256-digest(str(i)) repeated (4 + i%8) times; f0 = first byte of
# sha256(UPPER-HEX(payload)) / 255, truncated to float32 like the
# pipeline's ArrayType(FloatType) column so both engines average the
# same 32-bit values.
MEDIA_PIPELINE_SQL = """
WITH media AS (
  SELECT i,
         CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         repeat(unhex(sha256(CAST(i AS VARCHAR))), 4 + i % 8) AS content
  FROM range(96) t(i)
), feat AS (
  SELECT kind,
         octet_length(content) AS n_bytes,
         CAST(CAST(concat('0x', substring(sha256(hex(content)), 1, 2)) AS INT)
              / 255.0 AS FLOAT) AS f0
  FROM media
)
SELECT kind,
       count(*) AS n_items,
       CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
       round(avg(f0), 4) AS avg_f0
FROM feat
GROUP BY kind
ORDER BY kind
"""


QUERIES: dict = {
    "binary_stats_docs": (binary_stats_docs, BINARY_STATS_SQL),
    "media_pipeline_summary": (media_pipeline_summary, MEDIA_PIPELINE_SQL),
}


# ---------------------------------------------------------------------------
# Block-level content-addressable dedup: split each payload into fixed
# blocks, hash each block, and report how much of the corpus is duplicate
# blocks — the rsync/CAS storage trick every large media store runs before
# writing bytes (near-identical images/videos share most of their blocks
# even when whole-file hashes differ).  The payload here is the documents
# text (the same binary-contract anchor binary_stats_docs uses); block
# boundaries are CHARACTER offsets so Spark's and DuckDB's md5 hash the
# identical UTF-8 byte runs with no ASCII assumption — a true binary
# column swaps in byte-offset substring with the same plan shape.
#
# Scale: one scan -> codegen block explosion (explode(sequence) + md5 as
# plain row expressions, no interpreted lambda) -> two partial-aggregable
# groupBys + one join that only ever moves (source, 32-hex hash) pairs —
# duplicated_gram_fraction's proven shape, pointed at storage blocks.
_BLOCK_CHARS = 32


def block_dedup_docs(spark, sf_dir: str) -> DataFrame:
    """Per-source block-dedup report: total block instances, distinct
    blocks, blocks shared corpus-wide (count > 1 anywhere), and this
    source's instances that a CAS store would not re-write."""
    from delta_go_spark.session import load_table

    # length > 0, not just NOT NULL: an empty payload has ZERO blocks,
    # but Spark's sequence(0, -1) would yield [0, -1] (step defaults to -1
    # when start > stop) and explode two phantom blocks
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    nblk = F.ceil(F.length("text") / _BLOCK_CHARS).cast("int")
    blocks = docs.select(
        "source",
        F.explode(F.sequence(F.lit(0), nblk - 1)).alias("_i"),
        F.col("text"),
    ).select(
        "source",
        F.md5(
            F.expr(
                f"substring(text, 1 + _i * {_BLOCK_CHARS}, {_BLOCK_CHARS})"
            )
        ).alias("blk"),
    )
    gc = blocks.groupBy("blk").agg(F.count(F.lit(1)).alias("cnt"))
    sc = blocks.groupBy("source", "blk").agg(F.count(F.lit(1)).alias("n"))
    return (
        sc.join(gc, "blk")
        .groupBy("source")
        .agg(
            F.sum("n").alias("total_blocks"),
            F.count(F.lit(1)).alias("distinct_blocks"),
            F.count(F.when(F.col("cnt") > 1, 1)).alias("shared_blocks"),
            F.sum(F.when(F.col("cnt") > 1, F.col("n")).otherwise(0)).alias(
                "dup_instances"
            ),
        )
        .orderBy("source")
    )


BLOCK_DEDUP_SQL = f"""
WITH blocks AS (
  SELECT source,
         md5(unnest(list_transform(
           range(1, CAST(ceil(length(text) / {_BLOCK_CHARS}.0) AS INT) + 1),
           i -> substring(text, 1 + (i - 1) * {_BLOCK_CHARS},
                          {_BLOCK_CHARS})))) AS blk
  FROM documents WHERE text IS NOT NULL
), gc AS (
  SELECT blk, count(*) AS cnt FROM blocks GROUP BY blk
), sc AS (
  SELECT source, blk, count(*) AS n FROM blocks GROUP BY source, blk
)
SELECT sc.source,
       CAST(sum(sc.n) AS BIGINT) AS total_blocks,
       count(*) AS distinct_blocks,
       CAST(count(CASE WHEN gc.cnt > 1 THEN 1 END) AS BIGINT)
         AS shared_blocks,
       CAST(sum(CASE WHEN gc.cnt > 1 THEN sc.n ELSE 0 END) AS BIGINT)
         AS dup_instances
FROM sc JOIN gc ON sc.blk = gc.blk
GROUP BY sc.source
ORDER BY sc.source
"""


QUERIES["block_dedup_docs"] = (block_dedup_docs, BLOCK_DEDUP_SQL)
