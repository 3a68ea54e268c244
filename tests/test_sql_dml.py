"""SQL-text DML through DeltaSqlContext: DELETE FROM / UPDATE ... SET /
TRUNCATE TABLE parse into the engine's Expression AST (file pruning
applies) and commit through the same transactions as the Python API."""

import pytest
from pyspark.sql import functions as F

from delta_go_spark.sql import DeltaSqlContext
from delta_go_spark.sqlpred import PredicateParseError, parse_predicate
from delta_go_spark.table import DeltaTable


def _ctx(spark, tmp_path, name):
    path = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, "ab" if i % 2 else "cd", i * 2) for i in range(100)],
        "k long, p string, v long",
    )
    DeltaTable.create(spark, path, df)
    sess = DeltaSqlContext(spark)
    sess.register(name, path)
    return sess, DeltaTable.for_path(spark, path)


def test_sql_delete(spark, tmp_path):
    sess, t = _ctx(spark, tmp_path, "tsqldel")
    out = sess.sql("DELETE FROM tsqldel WHERE k >= 90 OR p = 'zz'")
    assert out.collect()[0]["version"] == t.log.update().version
    rows = {r["k"] for r in t.to_df().collect()}
    assert rows == set(range(90))


def test_sql_update_multi_assign(spark, tmp_path):
    sess, t = _ctx(spark, tmp_path, "tsqlupd")
    sess.sql("UPDATE tsqlupd SET v = 0, p = 'xx' WHERE k < 3")
    got = {r["k"]: (r["p"], r["v"]) for r in t.to_df().collect()}
    for k in (0, 1, 2):
        assert got[k] == ("xx", 0)
    assert got[3] == ("ab", 6)  # untouched row


def test_sql_update_like_and_in(spark, tmp_path):
    sess, t = _ctx(spark, tmp_path, "tsqlupd2")
    sess.sql("UPDATE tsqlupd2 SET v = -1 WHERE p LIKE 'a%' AND k IN (1, 3)")
    got = {r["k"]: r["v"] for r in t.to_df().collect()}
    assert got[1] == -1 and got[3] == -1 and got[5] == 10


def test_sql_truncate(spark, tmp_path):
    sess, t = _ctx(spark, tmp_path, "tsqltrunc")
    sess.sql("TRUNCATE TABLE tsqltrunc")
    assert t.to_df().count() == 0


def test_sql_dml_does_not_shadow_select(spark, tmp_path):
    sess, t = _ctx(spark, tmp_path, "tsqlsel")
    t.register_temp_view("tsqlsel")
    n = sess.sql("SELECT count(*) AS n FROM tsqlsel").collect()[0]["n"]
    assert n == 100


def test_predicate_parser_errors(spark):
    from pyspark.sql.types import LongType, StructField, StructType

    s = StructType([StructField("k", LongType())])
    with pytest.raises(PredicateParseError, match="unknown column"):
        parse_predicate("zz = 1", s)
    with pytest.raises(PredicateParseError):
        parse_predicate("k = ", s)
    with pytest.raises(PredicateParseError, match="trailing"):
        parse_predicate("k = 1 k", s)


def test_sql_delete_prunes_partitions(spark, tmp_path):
    """The parsed predicate reaches the DML pruner: a partition-restricted
    SQL DELETE must not rewrite other partitions' files."""
    path = str(tmp_path / "tsqlprune")
    df = spark.createDataFrame(
        [(i, str(i % 4)) for i in range(80)], "k long, p string"
    )
    DeltaTable.create(spark, path, df, partition_by=["p"])
    t = DeltaTable.for_path(spark, path)
    before = {a.path for a in t.log.update().all_files()}
    other_part = {p for p in before if "p=3" not in p and "p%3D3" not in p}

    sess = DeltaSqlContext(spark)
    sess.register("tsqlprune", path)
    sess.sql("DELETE FROM tsqlprune WHERE p = '3'")
    after = {a.path for a in t.log.update().all_files()}
    assert other_part <= after  # untouched partitions survive byte-identical
    assert t.to_df().filter(F.col("p") == "3").count() == 0
    assert t.to_df().count() == 60


def test_facade_where_sql_helpers(spark, tmp_path):
    sess, t = _ctx(spark, tmp_path, "tsqlfacade")
    t.update_where("k < 2", {"v": F.lit(-5).cast("long")})
    t.delete_where("k >= 95 AND p = 'ab'")
    got = {r["k"]: r["v"] for r in t.to_df().collect()}
    assert got[0] == -5 and got[1] == -5
    assert 95 not in got and 97 not in got  # odd ks >= 95 ('ab') deleted
    assert 96 in got  # 'cd' rows survive
    # predicate also drives pruned reads
    assert t.to_df(t.parse_predicate("p = 'cd' AND k < 10")).count() == 5


def test_sql_dml_edge_cases(spark, tmp_path):
    sess, t = _ctx(spark, tmp_path, "tsqledge")
    # case-insensitive table name
    sess.sql("UPDATE TSQLEDGE SET v = 1 WHERE k = 0")
    assert {r["v"] for r in t.to_df().filter(F.col("k") == 0).collect()} == {1}
    # WHERE inside a string literal must not split the SET clause
    sess.sql("UPDATE tsqledge SET p = 'a where b' WHERE k = 1")
    assert t.to_df().filter(F.col("p") == "a where b").count() == 1
    # UPDATE without WHERE touches every row
    sess.sql("UPDATE tsqledge SET v = 7")
    assert t.to_df().filter(F.col("v") != 7).count() == 0
    # DELETE without WHERE = delete-all (schema survives)
    sess.sql("DELETE FROM tsqledge")
    assert t.to_df().count() == 0


def test_sql_dml_rejects_malformed(spark, tmp_path):
    from delta_go_spark.sqlpred import PredicateParseError

    sess, t = _ctx(spark, tmp_path, "tsqlbad")
    with pytest.raises((ValueError, PredicateParseError)):
        sess.sql("UPDATE tsqlbad SET v = 1 AND k = 2 WHERE k = 0")
    with pytest.raises(PredicateParseError, match="boolean literal"):
        sess.sql("DELETE FROM tsqlbad WHERE p = true")
    with pytest.raises(PredicateParseError, match="IS NOT NULL"):
        sess.sql("DELETE FROM tsqlbad WHERE k NOT IS NULL")
    with pytest.raises(PredicateParseError, match="LIKE NULL"):
        sess.sql("DELETE FROM tsqlbad WHERE p LIKE NULL")
    # nothing committed by the rejected statements
    assert t.to_df().count() == 100


def test_sql_merge_upsert_from_temp_view(spark, tmp_path):
    sess, t = _ctx(spark, tmp_path, "tsqlmrg")
    spark.createDataFrame(
        [(1, "zz", -1), (200, "nn", -2)], "k long, p string, v long"
    ).createOrReplaceTempView("mrg_src")
    out = sess.sql(
        "MERGE INTO tsqlmrg AS t USING mrg_src AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v, p = s.p "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert out.collect()[0]["version"] == t.log.update().version
    got = {r["k"]: (r["p"], r["v"]) for r in t.to_df().collect()}
    assert got[1] == ("zz", -1)          # matched: updated from source
    assert got[200] == ("nn", -2)        # not matched: inserted
    assert got[2] == ("cd", 4)           # untouched
    assert len(got) == 101


def test_sql_merge_delete_matched_between_delta_tables(spark, tmp_path):
    sess, t = _ctx(spark, tmp_path, "tsqlmrg2")
    src_path = str(tmp_path / "mrg2src")
    DeltaTable.create(
        spark,
        src_path,
        spark.createDataFrame([(0, "x", 0), (4, "x", 0)], "k long, p string, v long"),
    )
    sess.register("mrg2src", src_path)
    sess.sql(
        "MERGE INTO tsqlmrg2 USING mrg2src ON tsqlmrg2.k = mrg2src.k "
        "WHEN MATCHED THEN DELETE"
    )
    rows = {r["k"] for r in t.to_df().collect()}
    assert rows == set(range(100)) - {0, 4}


def test_sql_merge_literal_assignment_and_bare_key(spark, tmp_path):
    sess, t = _ctx(spark, tmp_path, "tsqlmrg3")
    spark.createDataFrame([(7,), (8,)], "k long").createOrReplaceTempView(
        "mrg3_src"
    )
    sess.sql(
        "MERGE INTO tsqlmrg3 USING mrg3_src ON k "
        "WHEN MATCHED THEN UPDATE SET v = 999"
    )
    got = {r["k"]: r["v"] for r in t.to_df().collect()}
    assert got[7] == 999 and got[8] == 999 and got[9] == 18
    assert len(got) == 100  # no insert clause -> no new rows


def test_sql_merge_renamed_source_key(spark, tmp_path):
    sess, t = _ctx(spark, tmp_path, "tsqlmrg4")
    spark.createDataFrame(
        [(3, 111)], "src_k long, v long"
    ).createOrReplaceTempView("mrg4_src")
    sess.sql(
        "MERGE INTO tsqlmrg4 t USING mrg4_src s ON t.k = s.src_k "
        "WHEN MATCHED THEN UPDATE SET v = s.v"
    )
    got = {r["k"]: r["v"] for r in t.to_df().collect()}
    assert got[3] == 111 and got[2] == 4


def test_sql_merge_rejects_malformed(spark, tmp_path):
    sess, t = _ctx(spark, tmp_path, "tsqlmrg5")
    spark.createDataFrame([(1, 0)], "k long, v long").createOrReplaceTempView(
        "mrg5_src"
    )
    with pytest.raises(ValueError, match="WHEN clauses"):
        sess.sql("MERGE INTO tsqlmrg5 USING mrg5_src ON k WHEN MATCHED THEN FROB")
    with pytest.raises(ValueError, match="SET clause"):
        sess.sql(
            "MERGE INTO tsqlmrg5 USING mrg5_src ON k "
            "WHEN MATCHED THEN UPDATE SET nosuch = 1"
        )
    # An unsupported trailing clause must RAISE, never silently execute a
    # partial merge: the lazy UPDATE-SET regex used to absorb the whole
    # conditional DELETE into the SET text and run update-only.
    with pytest.raises(ValueError, match="WHEN clauses"):
        sess.sql(
            "MERGE INTO tsqlmrg5 USING mrg5_src ON k "
            "WHEN MATCHED THEN UPDATE SET v = 1 "
            "WHEN MATCHED AND v = 0 THEN DELETE"
        )
    with pytest.raises(ValueError, match="WHEN clauses"):
        sess.sql(
            "MERGE INTO tsqlmrg5 USING mrg5_src ON k "
            "WHEN NOT MATCHED THEN INSERT * "
            "WHEN NOT MATCHED BY SOURCE THEN DELETE"
        )
    # nothing committed by the rejected statements
    assert t.to_df().filter(F.col("v") != 2 * F.col("k")).count() == 0


def test_sql_merge_set_rhs_references_renamed_join_column(spark, tmp_path):
    # ON renames the source join column (src_k -> k); a SET rhs naming the
    # ORIGINAL source column must follow the rename instead of failing on
    # an unresolved _s_src_k.
    sess, t = _ctx(spark, tmp_path, "tsqlmrg6")
    spark.createDataFrame(
        [(5, "zz")], "src_k long, p string"
    ).createOrReplaceTempView("mrg6_src")
    sess.sql(
        "MERGE INTO tsqlmrg6 t USING mrg6_src s ON t.k = s.src_k "
        "WHEN MATCHED THEN UPDATE SET v = s.src_k, p = s.p"
    )
    got = {r["k"]: (r["p"], r["v"]) for r in t.to_df().collect()}
    assert got[5] == ("zz", 5)
    assert got[6] == ("cd", 12)


def test_sql_describe_history(spark, tmp_path):
    sess, t = _ctx(spark, tmp_path, "tsqlhist")
    sess.sql("DELETE FROM tsqlhist WHERE k >= 50")
    rows = sess.sql("DESCRIBE HISTORY tsqlhist").collect()
    assert [r["version"] for r in rows] == [1, 0]   # newest first
    assert rows[0]["operation"] == "DELETE"
    assert rows[1]["operation"] in ("CREATE TABLE", "WRITE")
    assert all(r["timestamp_ms"] > 0 for r in rows)


def test_sql_optimize_and_vacuum(spark, tmp_path):
    sess, t = _ctx(spark, tmp_path, "tsqlopt")
    # several small appends -> compactable files
    for i in range(3):
        t.append(spark.createDataFrame([(1000 + i, "zz", 0)], "k long, p string, v long"))
    v0 = t.version()
    out = sess.sql("OPTIMIZE tsqlopt").collect()
    assert out[0]["version"] == v0 + 1 == t.log.update().version
    assert t.to_df().count() == 103  # compaction preserves rows
    # optimizing an already-compact table is a no-op reporting the version
    again = sess.sql("OPTIMIZE tsqlopt").collect()
    assert again[0]["version"] == t.log.update().version

    # vacuum with 0-hour retention drops files the compaction removed
    dry = {r["path"] for r in sess.sql("VACUUM tsqlopt RETAIN 0 HOURS DRY RUN").collect()}
    assert dry, "compacted-away files should be vacuum candidates"
    gone = {r["path"] for r in sess.sql("VACUUM tsqlopt RETAIN 0 HOURS").collect()}
    assert gone == dry
    import os
    assert all(not os.path.exists(p) for p in gone)
    assert t.to_df().count() == 103  # table still fully readable


def test_sql_optimize_zorder_by(spark, tmp_path):
    sess, t = _ctx(spark, tmp_path, "tsqlzord")
    v0 = t.version()
    out = sess.sql("OPTIMIZE tsqlzord ZORDER BY (k, v)").collect()
    assert out[0]["version"] >= v0
    assert t.to_df().count() == 100


def test_sql_describe_detail_and_restore(spark, tmp_path):
    sess, t = _ctx(spark, tmp_path, "tsqldet")
    d = sess.sql("DESCRIBE DETAIL tsqldet").collect()[0]
    assert d["format"] == "delta" and d["version"] == 0
    assert d["num_files"] >= 1 and d["size_in_bytes"] > 0
    assert d["partition_columns"] == []

    sess.sql("DELETE FROM tsqldet WHERE k < 50")
    assert t.to_df().count() == 50
    sess.sql("RESTORE TABLE tsqldet TO VERSION AS OF 0")
    assert t.to_df().count() == 100
    # restore is itself a commit; history is preserved
    assert t.version() == 2


def test_sql_alter_add_columns(spark, tmp_path):
    sess, t = _ctx(spark, tmp_path, "tsqladdc")
    sess.sql("ALTER TABLE tsqladdc ADD COLUMNS (tag string, score double)")
    df = t.to_df()
    assert {"tag", "score"} <= set(df.columns)
    # existing rows read the new columns as NULLs
    assert df.filter(F.col("tag").isNull()).count() == 100


def test_sql_alter_constraint_roundtrip(spark, tmp_path):
    from delta_go_spark.snapshot import DeltaError

    sess, t = _ctx(spark, tmp_path, "tsqlcons")
    sess.sql("ALTER TABLE tsqlcons ADD CONSTRAINT vpos CHECK (v >= 0)")
    bad = spark.createDataFrame([(999, "ab", -5)], "k long, p string, v long")
    with pytest.raises(DeltaError):
        t.append(bad)
    sess.sql("ALTER TABLE tsqlcons DROP CONSTRAINT vpos")
    t.append(bad)
    assert t.to_df().count() == 101


def test_sql_set_tblproperties(spark, tmp_path):
    sess, t = _ctx(spark, tmp_path, "tsqlprops")
    sess.sql(
        "ALTER TABLE tsqlprops SET TBLPROPERTIES "
        "('delta.appendOnly' = 'true', 'team.owner' = 'data''s own')"
    )
    cfg = t.log.update().metadata().configuration
    assert cfg["delta.appendOnly"] == "true"
    assert cfg["team.owner"] == "data's own"   # escaped quote round-trips
    from delta_go_spark.snapshot import DeltaError

    from delta_go_spark.expressions import Column, EqualTo, Literal
    from pyspark.sql.types import LongType

    with pytest.raises(DeltaError):            # appendOnly now enforced
        t.delete(EqualTo(Column("k", LongType()), Literal(0)))


def test_sql_create_table_clone(spark, tmp_path):
    sess, t = _ctx(spark, tmp_path, "tsqlclsrc")
    dst = str(tmp_path / "tsqlcldst")
    out = sess.sql(
        f"CREATE TABLE tclone DEEP CLONE tsqlclsrc LOCATION '{dst}'"
    )
    assert out.collect()[0]["version"] == 0
    # the clone is registered and queryable under its new name
    assert sess.sql("SELECT count(*) AS n FROM tclone").collect()[0]["n"] == 100
    # and is deep: truncating + vacuuming the source leaves it intact
    sess.sql("TRUNCATE TABLE tsqlclsrc")
    t.vacuum(retention_millis=0)
    assert sess.sql("SELECT count(*) AS n FROM tclone").collect()[0]["n"] == 100


def test_sql_alter_add_column_with_parenthesized_type(spark, tmp_path):
    sess, t = _ctx(spark, tmp_path, "tsqldec")
    sess.sql("ALTER TABLE tsqldec ADD COLUMNS (price decimal(10,2))")
    assert "price" in t.to_df().columns


def test_sql_alter_add_column_rejects_not_null(spark, tmp_path):
    sess, _ = _ctx(spark, tmp_path, "tsqlnn")
    with pytest.raises(ValueError, match="nullable"):
        sess.sql("ALTER TABLE tsqlnn ADD COLUMNS (c long NOT NULL)")


def test_sql_tblproperties_rejects_partial_and_constraints(spark, tmp_path):
    sess, t = _ctx(spark, tmp_path, "tsqlbadp")
    # one malformed pair must fail the WHOLE statement, not drop the pair
    with pytest.raises(ValueError, match="malformed"):
        sess.sql(
            "ALTER TABLE tsqlbadp SET TBLPROPERTIES "
            "('delta.appendOnly' = 'true', 'delta.enableChangeDataFeed' = true)"
        )
    assert "delta.appendOnly" not in (
        t.log.update().metadata().configuration or {}
    )
    # constraint keys must go through add_check_constraint
    with pytest.raises(ValueError, match="add_check_constraint"):
        sess.sql(
            "ALTER TABLE tsqlbadp SET TBLPROPERTIES "
            "('delta.constraints.c1' = 'v > 100')"
        )


def test_sql_clone_refuses_registered_name(spark, tmp_path):
    sess, _ = _ctx(spark, tmp_path, "tsqlclna")
    dst = str(tmp_path / "clnb")
    with pytest.raises(ValueError, match="already registered"):
        sess.sql(f"CREATE TABLE tsqlclna SHALLOW CLONE tsqlclna LOCATION '{dst}'")


def test_sql_multiline_constraint(spark, tmp_path):
    sess, t = _ctx(spark, tmp_path, "tsqlml")
    sess.sql("ALTER TABLE tsqlml ADD CONSTRAINT vpos CHECK (\n  v >= 0\n)")
    assert "delta.constraints.vpos" in t.log.update().metadata().configuration


def test_sql_alter_add_columns_no_space_form(spark, tmp_path):
    sess, t = _ctx(spark, tmp_path, "tsqlnosp")
    sess.sql("ALTER TABLE tsqlnosp ADD COLUMNS(tag string)")
    assert "tag" in t.to_df().columns


def test_api_add_columns_rejects_not_null(spark, tmp_path):
    from pyspark.sql.types import StructType

    _, t = _ctx(spark, tmp_path, "tapinn")
    with pytest.raises(ValueError, match="nullable"):
        t.add_columns(StructType.fromDDL("c long NOT NULL").fields)


def test_describe_history_sql(spark, tmp_path):
    """DESCRIBE HISTORY t [LIMIT n]: newest first, one row per commit,
    operation + parameters from the CommitInfo the engine itself wrote."""
    from pyspark.sql import functions as F

    from delta_go_spark.sql import DeltaSqlContext
    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "hist")
    df = spark.range(0, 10).select(F.col("id").alias("k"))
    DeltaTable.create(spark, path, df)
    t = DeltaTable.for_path(spark, path)
    t.append(spark.range(10, 20).select(F.col("id").alias("k")))
    t.delete_where("k >= 15")

    ctx = DeltaSqlContext(spark)
    ctx.register("hist_t", path)
    rows = ctx.sql("DESCRIBE HISTORY hist_t").collect()
    assert [r["version"] for r in rows] == [2, 1, 0]
    assert rows[0]["operation"] == "DELETE"
    assert all(r["timestamp_ms"] is not None for r in rows)

    limited = ctx.sql("DESCRIBE HISTORY hist_t LIMIT 2").collect()
    assert [r["version"] for r in limited] == [2, 1]
