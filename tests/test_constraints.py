"""CHECK constraints (public Delta writer-v3 semantics, exceeds the
reference): stored as delta.constraints.<name>, enforced on append,
UPDATE and MERGE; NULL satisfies; existing rows validated on ADD."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from delta_go_spark.expressions import Column, EqualTo, Literal
from delta_go_spark.snapshot import DeltaError
from delta_go_spark.table import DeltaTable


def _table(spark, tmp_path, name):
    path = str(tmp_path / name)
    # nullable k (createDataFrame, unlike spark.range's non-null id) so the
    # NULL-satisfies-CHECK case is not shadowed by the NOT NULL invariant
    df = spark.createDataFrame(
        [(i, i % 5) for i in range(1, 101)], "k long, v long"
    )
    DeltaTable.create(spark, path, df)
    return DeltaTable.for_path(spark, path)


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    t = _table(spark, tmp_path, "tc1")
    with pytest.raises(DeltaError, match="CHECK constraint"):
        t.add_check_constraint("k_big", "k > 50")  # existing rows violate
    t.add_check_constraint("k_pos", "k > 0")  # all rows satisfy
    cfg = t.log.update().metadata().configuration
    assert cfg["delta.constraints.k_pos"] == "k > 0"


def test_append_and_dml_enforce_constraint(spark, tmp_path):
    t = _table(spark, tmp_path, "tc2")
    t.add_check_constraint("k_pos", "k > 0")
    t = DeltaTable.for_path(spark, t.log.table_path)
    # violating append rejected, nothing committed
    v = t.log.update().version
    with pytest.raises(DeltaError, match="k_pos"):
        t.append(spark.createDataFrame([(0, 1)], "k long, v long"))
    assert t.log.update().version == v
    # satisfying append lands
    t.append(spark.createDataFrame([(200, 1)], "k long, v long"))
    assert t.to_df().count() == 101
    # UPDATE driving a row out of bounds rejected
    with pytest.raises(DeltaError, match="k_pos"):
        t.update(EqualTo(Column("k", LongType()), Literal(200)),
                 {"k": F.lit(-1).cast("long")})
    # MERGE insert of a violating row rejected
    with pytest.raises(DeltaError, match="k_pos"):
        t.merge(spark.createDataFrame([(-5, 9)], "k long, v long"), on="k")
    # NULL satisfies (SQL CHECK semantics)
    t.append(spark.createDataFrame([(None, 3)], "k long, v long"))
    assert t.to_df().filter(F.col("k").isNull()).count() == 1


def test_drop_constraint_reopens_writes(spark, tmp_path):
    t = _table(spark, tmp_path, "tc3")
    t.add_check_constraint("v_small", "v < 5")
    t = DeltaTable.for_path(spark, t.log.table_path)
    with pytest.raises(DeltaError):
        t.append(spark.createDataFrame([(300, 99)], "k long, v long"))
    t.drop_check_constraint("v_small")
    t = DeltaTable.for_path(spark, t.log.table_path)
    t.append(spark.createDataFrame([(300, 99)], "k long, v long"))
    assert t.to_df().filter(F.col("v") == 99).count() == 1
    with pytest.raises(ValueError):
        t.drop_check_constraint("nope")


def test_generated_columns(spark, tmp_path):
    """Generated columns (delta.generationExpression in field metadata):
    computed at create, computed when absent on append, validated when
    supplied; the expression round-trips through the schema JSON."""
    from delta_go_spark.writer import GENERATION_EXPRESSION_KEY

    path = str(tmp_path / "tgen")
    base = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    t = DeltaTable.create(spark, path, base, generated={"v2": "v * 2"})
    got = {r["k"]: r["v2"] for r in t.to_df().collect()}
    assert got == {1: 20, 2: 40}
    # expression survives in the committed schema metadata
    field = {f.name: f for f in t.log.update().metadata().schema().fields}["v2"]
    assert field.metadata[GENERATION_EXPRESSION_KEY] == "v * 2"

    # append WITHOUT the generated column: computed from the formula
    t.append(spark.createDataFrame([(3, 30)], "k long, v long"))
    assert {r["k"]: r["v2"] for r in t.to_df().collect()}[3] == 60

    # append WITH a matching value: accepted
    t.append(spark.createDataFrame([(4, 40, 80)], "k long, v long, v2 long"))
    assert t.to_df().count() == 4

    # append WITH a contradicting value: rejected, nothing committed
    v_before = t.log.update().version
    with pytest.raises(DeltaError, match="generated column"):
        t.append(spark.createDataFrame([(5, 50, 999)], "k long, v long, v2 long"))
    assert t.log.update().version == v_before
    assert t.to_df().count() == 4


def test_generated_columns_dml_and_streaming(spark, tmp_path):
    """Every write path keeps stored generated values in sync with the
    formula: UPDATE/MERGE rewrites recompute them after base-column
    assignments, merge-inserts compute them for absent columns, and the
    streaming committer applies the same rules as batch appends."""
    from delta_go_spark.streaming.committer import DeltaStreamCommitter

    path = str(tmp_path / "tgendml")
    base = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    t = DeltaTable.create(spark, path, base, generated={"v2": "v * 2"})

    # UPDATE of the base column recomputes the generated one
    t.update(EqualTo(Column("v", LongType()), Literal(10)), {"v": F.lit(15).cast("long")})
    assert {r["k"]: r["v2"] for r in t.to_df().collect()} == {1: 30, 2: 40}

    # explicitly assigning a contradicting generated value is rejected
    v_before = t.log.update().version
    with pytest.raises(DeltaError, match="generated column"):
        t.update(
            EqualTo(Column("k", LongType()), Literal(2)),
            {"v2": F.lit(999).cast("long")},
        )
    assert t.log.update().version == v_before

    # MERGE update recomputes; merge-insert computes the absent column
    src = spark.createDataFrame([(2, 25), (3, 30)], "k long, v long")
    t.merge(src, on="k", update_set={"v": F.col("_s_v")})
    assert {r["k"]: r["v2"] for r in t.to_df().collect()} == {1: 30, 2: 50, 3: 60}

    # streaming sink: absent generated column computed; mismatch rejected
    committer = DeltaStreamCommitter(path, app_id="genapp")
    committer.commit_batch(spark.createDataFrame([(4, 40)], "k long, v long"), 0)
    assert {r["k"]: r["v2"] for r in t.to_df().collect()}[4] == 80
    with pytest.raises(DeltaError, match="generated column"):
        committer.commit_batch(
            spark.createDataFrame([(5, 50, 1)], "k long, v long, v2 long"), 1
        )
