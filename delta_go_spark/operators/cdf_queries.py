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
