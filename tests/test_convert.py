"""CONVERT TO DELTA (op/names.go CONVERT): in-place conversion of an
existing parquet directory — no data rewrite, one commit of Protocol +
Metadata + per-file AddFiles with footer stats, after which the directory
is a live Delta table (DML, time travel, pruning, SQL all work)."""

import os

import pytest
from pyspark.sql import functions as F

from delta_go_spark.maintenance import convert_to_delta
from delta_go_spark.snapshot import DeltaError
from delta_go_spark.table import DeltaTable


@pytest.fixture()
def parquet_dir(spark, tmp_path):
    path = str(tmp_path / "plain")
    spark.range(0, 300).select(
        "id",
        (F.col("id") % 3).cast("string").alias("p"),
        (F.col("id") * 2).alias("v"),
    ).write.partitionBy("p").parquet(path)
    return path


def test_convert_preserves_rows_and_schema(spark, parquet_dir):
    want = sorted(
        (r["id"], r["p"], r["v"])
        for r in spark.read.parquet(parquet_dir).collect()
    )
    t = DeltaTable.convert(spark, parquet_dir)
    got = sorted((r["id"], r["p"], r["v"]) for r in t.to_df().collect())
    assert got == want
    meta = t.log.snapshot().metadata()
    assert meta.partition_columns == ["p"]
    assert {f.name for f in meta.schema().fields} == {"id", "p", "v"}


def test_convert_does_not_rewrite_files(spark, parquet_dir):
    before = {
        os.path.join(root, f): os.path.getmtime(os.path.join(root, f))
        for root, _d, files in os.walk(parquet_dir)
        for f in files
        if f.endswith(".parquet")
    }
    convert_to_delta(spark, parquet_dir)
    after = {
        p: os.path.getmtime(p)
        for p in before
    }
    assert after == before  # same files, untouched
    snap = __import__("delta_go_spark.log", fromlist=["DeltaLog"]).DeltaLog.for_table(
        parquet_dir
    ).snapshot()
    assert len(snap.all_files()) == len(before)


def test_convert_partition_pruning_and_stats(spark, parquet_dir):
    from pyspark.sql.types import StringType

    from delta_go_spark.expressions import Column, EqualTo, Literal

    t = DeltaTable.convert(spark, parquet_dir)
    snap = t.log.snapshot()
    pruned = list(
        snap.scan(EqualTo(Column("p", StringType()), Literal("1"))).files()
    )
    assert 0 < len(pruned) < len(snap.all_files())
    # footer stats landed on every add
    assert all(a.stats for a in snap.all_files())
    # and the rows still match
    got = t.to_df(EqualTo(Column("p", StringType()), Literal("1"))).count()
    assert got == spark.read.parquet(parquet_dir).filter("p = '1'").count()


def test_convert_is_guarded_and_validates(spark, parquet_dir, tmp_path):
    convert_to_delta(spark, parquet_dir)
    with pytest.raises(DeltaError, match="already a Delta table"):
        convert_to_delta(spark, parquet_dir)
    with pytest.raises(DeltaError, match="no parquet files"):
        empty = str(tmp_path / "empty")
        os.makedirs(empty)
        convert_to_delta(spark, empty)
    with pytest.raises(DeltaError, match="partition columns"):
        other = str(tmp_path / "other")
        spark.range(3).write.parquet(other)
        convert_to_delta(spark, other, partition_by=["nope"])


def test_converted_table_is_live_for_dml_and_time_travel(spark, parquet_dir):
    t = DeltaTable.convert(spark, parquet_dir)
    n0 = t.to_df().count()
    t.delete_where("v >= 400")
    t2 = DeltaTable.for_path(spark, parquet_dir)
    assert t2.to_df().count() == 200
    assert t2.version_as_of(0).count() == n0  # pre-DML state preserved
    hist = [h.operation for h in t2.history()]  # ascending by version
    assert hist[0] == "CONVERT" and hist[-1] == "DELETE"


def test_convert_sql_statement(spark, tmp_path):
    from delta_go_spark.sql import DeltaSqlContext

    path = str(tmp_path / "sqlconv")
    spark.range(0, 50).select(
        "id", (F.col("id") % 2).cast("string").alias("p")
    ).write.partitionBy("p").parquet(path)
    sql = DeltaSqlContext(spark)
    out = sql.sql(f"CONVERT TO DELTA '{path}' PARTITIONED BY (p)").collect()
    assert out[0]["version"] == 0
    assert DeltaTable.for_path(spark, path).to_df().count() == 50


def test_convert_unpartitioned_dir(spark, tmp_path):
    path = str(tmp_path / "flat")
    spark.range(0, 100).select("id", (F.col("id") * 3).alias("v")).write.parquet(
        path
    )
    t = DeltaTable.convert(spark, path)
    assert t.log.snapshot().metadata().partition_columns == []
    assert t.to_df().agg(F.sum("v")).collect()[0][0] == sum(3 * i for i in range(100))
