"""Change-Data-Feed query: DML with `delta.enableChangeDataFeed` emits
preimage/postimage/delete rows under `_change_data/` (cdf.py); this
registry entry aggregates `table_changes` output and the oracle recomputes
the identical change set from the raw parquet — a hash match proves the
CDC write+read path captures exactly the rows the DML touched.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_go_spark.operators.delta_queries import _CACHE_ROOT
from delta_go_spark.session import load_table


def delta_cdf_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders -> Delta (CDF on); UPDATE zeroes 'P' totals, DELETE drops 'F'
    rows; aggregate the change feed by change type."""
    from pyspark.sql.types import StringType

    from delta_go_spark.cdf import table_changes
    from delta_go_spark.expressions import Column, EqualTo, Literal
    from delta_go_spark.log import DeltaLog
    from delta_go_spark.table import DeltaTable
    from delta_go_spark.writer import write_dataframe

    from delta_go_spark.operators.delta_queries import _ensure_built

    key = sf_dir.strip("/").replace("/", "_")
    path = os.path.join(_CACHE_ROOT, key, "orders_cdf")

    def build():
        base = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
        write_dataframe(
            base, path, configuration={"delta.enableChangeDataFeed": "true"}
        )
        t = DeltaTable.for_path(spark, path)
        t.update(
            EqualTo(Column("o_orderstatus", StringType()), Literal("P")),
            {"o_totalprice": F.lit(0.0)},
        )
        t.delete(EqualTo(Column("o_orderstatus", StringType()), Literal("F")))

    _ensure_built(path, 2, build, sf_dir=sf_dir, tables=("orders",))
    changes = table_changes(spark, path, start_version=1)
    return (
        changes.groupBy("_change_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(28,6)")), 2)
            .cast("double")
            .alias("sum_total"),
        )
        .orderBy("_change_type")
    )


DELTA_CDF_SQL = """
WITH pre AS (
  SELECT 'update_preimage' AS _change_type,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_total
  FROM orders WHERE o_orderstatus = 'P'
), post AS (
  SELECT 'update_postimage', CAST(count(*) AS BIGINT),
         CAST(0.0 AS DOUBLE)
  FROM orders WHERE o_orderstatus = 'P'
), del AS (
  SELECT 'delete', CAST(count(*) AS BIGINT),
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,6))), 2) AS DOUBLE)
  FROM orders WHERE o_orderstatus = 'F'
)
SELECT * FROM pre UNION ALL SELECT * FROM post UNION ALL SELECT * FROM del
ORDER BY _change_type
"""


QUERIES: dict = {
    "delta_cdf_agg": (delta_cdf_agg, DELTA_CDF_SQL),
}


def delta_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version-to-version ROW diff of a table WITHOUT change data feed —
    the audit/backfill question ("what changed between Monday's and
    today's snapshot?") answered at O(changed files) via snapshot_diff's
    file-set pruning.  Fixture: documents -> Delta (CDF OFF, the whole
    point); v1 UPDATEs text where doc_id % 7 == 1, v2 DELETEs
    doc_id % 7 == 2, v3 APPENDs a derived batch (doc_id + 1000000,
    doc_id % 7 == 3).  Diff v0 -> v3 on doc_id must classify exactly the
    updated/deleted/inserted keys and DROP every unchanged row that
    merely rode along in a rewritten file (the refinement plain file-
    level Changes cannot make).  Oracle: the same three change sets
    reconstructed from raw documents by the fixture rules."""
    from delta_go_spark.table import DeltaTable

    from delta_go_spark.operators.delta_queries import _ensure_built

    key = sf_dir.strip("/").replace("/", "_")
    path = os.path.join(_CACHE_ROOT, key, "docs_snapdiff")

    def build():
        docs = load_table(spark, sf_dir, "documents").withColumn(
            "mod7", F.col("doc_id") % 7
        )
        t = DeltaTable.create(spark, path, docs)
        t.update_where("mod7 = 1", {"text": F.lit("updated")})
        t.delete_where("mod7 = 2")
        # appended keys offset by max(doc_id)+1, NOT a literal: a fixed
        # offset collides with live ids at a large-enough sf, and a
        # collision classifies differently on the Spark (changed-files
        # view) vs oracle (whole-corpus join) side — a data-dependent
        # hash break.  The oracle replays the same offset as a scalar
        # subquery (SELECT max(doc_id)+1 FROM documents).
        off = docs.agg(F.max("doc_id")).collect()[0][0] + 1
        t.append(
            docs.filter(F.col("mod7") == 3).select(
                (F.col("doc_id") + F.lit(off)).alias("doc_id"),
                F.lit("appended").alias("text"),
                "lang",
                "source",
                "n_chars",
                "mod7",
            )
        )

    _ensure_built(path, 3, build, sf_dir=sf_dir, tables=("documents",))
    from delta_go_spark.cdf import snapshot_diff

    return snapshot_diff(
        spark, path, 0, 3, ["doc_id"], compare_cols=["text"]
    ).orderBy("change", "doc_id")


# The fixture rules replayed in SQL: update sets ONLY text, the append
# creates fresh keys, so text is the complete change signal.
DELTA_SNAPSHOT_DIFF_SQL = """
WITH old AS (
  SELECT doc_id, text FROM documents
), new AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 1 THEN 'updated' ELSE text END AS text
  FROM documents WHERE doc_id % 7 <> 2
  UNION ALL
  SELECT doc_id + (SELECT max(doc_id) + 1 FROM documents), 'appended'
  FROM documents WHERE doc_id % 7 = 3
), j AS (
  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
         o.text AS old_text, n.text AS new_text,
         o.doc_id IS NULL AS is_ins, n.doc_id IS NULL AS is_del
  FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
)
SELECT doc_id,
       CASE WHEN is_ins THEN 'inserted'
            WHEN is_del THEN 'deleted'
            ELSE 'updated' END AS change,
       old_text, new_text
FROM j
WHERE is_ins OR is_del OR (old_text IS DISTINCT FROM new_text)
ORDER BY change, doc_id
"""


QUERIES["delta_snapshot_diff"] = (delta_snapshot_diff, DELTA_SNAPSHOT_DIFF_SQL)
