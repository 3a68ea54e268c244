"""Stats-based data skipping (exceeds the reference — AddFile.Stats is
carried but never parsed there; see SURVEY.md §2.A note)."""

import json

from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType

from delta_go_spark.expressions import (
    And,
    Column,
    EqualTo,
    GreaterThan,
    IsNotNull,
    IsNull,
    LessThan,
    Literal,
    Not,
    Or,
)
from delta_go_spark.log import DeltaLog
from delta_go_spark.scan import stats_may_match
from delta_go_spark.writer import write_dataframe

STATS = json.dumps(
    {
        "numRecords": 10,
        "minValues": {"k": 100, "s": "m"},
        "maxValues": {"k": 200, "s": "p"},
        "nullCount": {"k": 0, "s": 2, "v": 10},
    }
)


def test_range_pruning_rules():
    k = Column("k", LongType())
    # outside [100, 200] -> skip
    assert not stats_may_match(EqualTo(k, Literal(99)), STATS)
    assert not stats_may_match(EqualTo(k, Literal(201)), STATS)
    assert stats_may_match(EqualTo(k, Literal(150)), STATS)
    assert not stats_may_match(GreaterThan(k, Literal(200)), STATS)
    assert stats_may_match(GreaterThan(k, Literal(199)), STATS)
    assert not stats_may_match(LessThan(k, Literal(100)), STATS)
    assert stats_may_match(LessThan(k, Literal(101)), STATS)
    # literal-on-left flips the operator
    assert not stats_may_match(GreaterThan(Literal(100), k), STATS)
    assert stats_may_match(GreaterThan(Literal(150), k), STATS)


def test_null_and_string_rules():
    k = Column("k", LongType())
    s = Column("s", StringType())
    v = Column("v", DoubleType())
    assert not stats_may_match(IsNull(k), STATS)  # nullCount 0
    assert stats_may_match(IsNull(s), STATS)
    assert not stats_may_match(IsNotNull(v), STATS)  # all-null column
    # all-null column fails any comparison
    assert not stats_may_match(EqualTo(v, Literal(1.0)), STATS)
    assert not stats_may_match(EqualTo(s, Literal("q")), STATS)
    assert stats_may_match(EqualTo(s, Literal("n")), STATS)


def test_boolean_composition_and_conservatism():
    k = Column("k", LongType())
    inside = EqualTo(k, Literal(150))
    outside = EqualTo(k, Literal(999))
    assert not stats_may_match(And(inside, outside), STATS)
    assert stats_may_match(Or(inside, outside), STATS)
    assert not stats_may_match(Or(outside, outside), STATS)
    # NOT is conservative: never prunes
    assert stats_may_match(Not(outside), STATS)
    # missing stats / malformed stats / unknown column: keep the file
    assert stats_may_match(outside, None)
    assert stats_may_match(outside, "{not json")
    assert stats_may_match(EqualTo(Column("zz", LongType()), Literal(1)), STATS)


def test_end_to_end_file_skipping(spark, tmp_path):
    """Four appended files with disjoint k-ranges; a point predicate must
    read exactly one file yet return exactly the right rows."""
    path = str(tmp_path / "tskip")
    for lo in (0, 1000, 2000, 3000):
        df = spark.range(lo, lo + 100).select(F.col("id").alias("k"))
        write_dataframe(df, path)
    snap = DeltaLog.for_table(path).snapshot()
    assert snap.num_of_files() >= 4

    pred = And(
        GreaterThan(Column("k", LongType()), Literal(2009)),
        LessThan(Column("k", LongType()), Literal(2020)),
    )
    scan = snap.scan(pred)
    kept = list(scan.files())
    assert len(kept) < snap.num_of_files()
    assert scan.files_skipped_by_stats > 0
    rows = sorted(r["k"] for r in scan.to_df(spark).collect())
    assert rows == list(range(2010, 2020))


def test_in_expression_pruning_and_eval():
    from delta_go_spark.expressions import In, Like

    k = Column("k", LongType())
    s = Column("s", StringType())
    # stats fixture: k in [100, 200]
    assert not stats_may_match(In(k, (Literal(1), Literal(99))), STATS)
    assert stats_may_match(In(k, (Literal(1), Literal(150))), STATS)
    assert not stats_may_match(In(k, (Literal(201), Literal(999))), STATS)
    # eval semantics: SQL 3-valued IN
    assert In(k, (Literal(5), Literal(7))).eval({"k": "5"}) is True
    assert In(k, (Literal(5), Literal(7))).eval({"k": "6"}) is False
    assert In(k, (Literal(5), Literal(None))).eval({"k": "6"}) is None
    assert In(k, (Literal(5),)).eval({"k": None}) is None
    # LIKE eval + spark parity of wildcard translation
    assert Like(s, "ab%").eval({"s": "abcdef"}) is True
    assert Like(s, "ab_").eval({"s": "abc"}) is True
    assert Like(s, "ab_").eval({"s": "abcd"}) is False
    assert Like(s, "a.c").eval({"s": "abc"}) is False  # dot is literal


def test_in_partition_pruning_end_to_end(spark, tmp_path):
    from pyspark.sql.types import LongType as LT

    from delta_go_spark.expressions import In
    from delta_go_spark.writer import write_dataframe

    path = str(tmp_path / "tin")
    df = spark.range(0, 100).select(F.col("id").alias("k"), (F.col("id") % 4).alias("p"))
    write_dataframe(df, path, partition_by=["p"])
    snap = DeltaLog.for_table(path).snapshot()
    scan = snap.scan(In(Column("p", LT()), (Literal(1), Literal(3))))
    kept = list(scan.files())
    assert 0 < len(kept) < snap.num_of_files()
    rows = scan.to_df(spark)
    assert {r["p"] for r in rows.select("p").distinct().collect()} == {1, 3}
    assert rows.count() == 50


def test_footer_stats_dropped_when_any_row_group_lacks_them(tmp_path):
    """A column whose statistics are absent from ANY row group must not appear
    in the emitted Delta stats at all: partially-aggregated min/max (or a
    fabricated nullCount=0) would let stats_may_match prune files that do
    contain matching rows — silently wrong results."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from delta_go_spark.writer import _stats_from_footer

    path = str(tmp_path / "nostats.parquet")
    tbl = pa.table({"k": [1, 2, None], "s": ["a", "b", "c"]})
    pq.write_table(tbl, path, write_statistics=False)
    stats = json.loads(_stats_from_footer(path))
    assert stats["numRecords"] == 3
    assert stats["minValues"] == {} and stats["maxValues"] == {}
    assert stats["nullCount"] == {}

    # control: with statistics present everything is emitted (k has a null)
    path2 = str(tmp_path / "stats.parquet")
    pq.write_table(tbl, path2, write_statistics=True)
    stats2 = json.loads(_stats_from_footer(path2))
    assert stats2["nullCount"] == {"k": 1, "s": 0}
    assert stats2["minValues"]["k"] == 1 and stats2["maxValues"]["k"] == 2

    # absent stats must not prune: IS NULL / comparisons stay "may match"
    from pyspark.sql.types import LongType as LT

    from delta_go_spark.expressions import Column, EqualTo, IsNull, Literal
    from delta_go_spark.scan import stats_may_match

    k = Column("k", LT())
    s = json.dumps(stats)
    assert stats_may_match(EqualTo(k, Literal(99)), s)
    assert stats_may_match(IsNull(k), s)


def test_startswith_stats_and_partition_pruning(spark, tmp_path):
    """StartsWith constrains string order, so min/max footer stats prune
    files by prefix range (prefix <= v < prefix_upper_bound); partition
    values prune by direct eval."""
    import json

    from delta_go_spark.expressions import StartsWith, prefix_upper_bound
    from delta_go_spark.scan import stats_may_match
    from pyspark.sql.types import StringType as ST

    s = Column("s", ST())
    stats = json.dumps(
        {"numRecords": 10,
         "minValues": {"s": "alpha"}, "maxValues": {"s": "delta"},
         "nullCount": {"s": 0}}
    )
    assert stats_may_match(StartsWith(s, "b"), stats)       # b* in [alpha, delta]
    assert stats_may_match(StartsWith(s, "alp"), stats)
    assert not stats_may_match(StartsWith(s, "e"), stats)   # e* > max
    assert stats_may_match(StartsWith(s, "a"), stats)       # min itself is a*
    assert not stats_may_match(StartsWith(s, "Zeta"), stats)  # Z* < min ('Z' < 'a')
    # eval semantics: null-propagating
    assert StartsWith(s, "ab").eval({"s": "abc"}) is True
    assert StartsWith(s, "ab").eval({"s": "xbc"}) is False
    assert StartsWith(s, "ab").eval({"s": None}) is None
    assert prefix_upper_bound("ab") == "ac"

    # end-to-end through the data source: file pruning visible in partitions()
    from delta_go_spark.datasource import DeltaGoBatchReader, register
    from delta_go_spark.table import DeltaTable

    register(spark)
    path = str(tmp_path / "tsw")
    df = spark.createDataFrame(
        [(1, "apple"), (2, "apricot"), (3, "banana"), (4, "cherry")],
        "k long, s string",
    )
    DeltaTable.create(spark, path, df.repartition(4, "s"))
    got = (
        spark.read.format("delta_go").load(path)
        .filter(F.col("s").startswith("ap"))
    )
    assert {r["s"] for r in got.collect()} == {"apple", "apricot"}
    # reader-level: the pushed StartsWith prunes non-matching files
    reader = DeltaGoBatchReader(got.schema, {"path": path})
    from delta_go_spark import expressions as E
    from pyspark.sql.types import StringType

    reader._pushed = [E.StartsWith(E.Column("s", StringType()), "ap")]
    kept = reader.partitions()
    all_files = DeltaGoBatchReader(got.schema, {"path": path}).partitions()
    assert sum(len(p.files) for p in kept) < sum(len(p.files) for p in all_files)


def test_metadata_only_count(spark, tmp_path):
    """Bare and partition-only counts come from log stats (no scan job);
    data-column predicates refuse (conservative skipping would overcount);
    stats-stripped files are counted by scanning ONLY those files."""
    import json as _json
    import os
    import re

    import pytest
    from pyspark.sql import functions as F

    from delta_go_spark.expressions import Column as C, EqualTo, GreaterThan, Literal
    from delta_go_spark.scan import metadata_only_count
    from delta_go_spark.table import DeltaTable
    from pyspark.sql.types import LongType, StringType

    path = str(tmp_path / "cnt_tbl")
    df = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd", i * 2) for i in range(100)],
        "k long, par string, v long",
    )
    t = DeltaTable.create(spark, path, df, partition_by=["par"])
    snap = t.log.update()
    assert metadata_only_count(snap) == 100
    assert t.count() == 100
    par_even = EqualTo(C("par", StringType()), Literal("even"))
    assert metadata_only_count(snap, par_even) == 50

    # data-column predicate: the stats path must refuse...
    data_pred = GreaterThan(C("k", LongType()), Literal(10))
    with pytest.raises(ValueError, match="partition-only"):
        metadata_only_count(snap, data_pred)
    # ...and the facade falls back to a real scan with the right answer
    assert t.count(data_pred) == 89

    # strip numRecords from the commit JSON: fallback scans ONLY those files
    log_file = os.path.join(path, "_delta_log", "00000000000000000000.json")
    lines = []
    for line in open(log_file):
        o = _json.loads(line)
        if "add" in o and "even" in str(o["add"].get("partitionValues")):
            stats = _json.loads(o["add"]["stats"])
            stats.pop("numRecords")
            o["add"]["stats"] = _json.dumps(stats)
        lines.append(_json.dumps(o))
    with open(log_file, "w") as f:
        f.write("\n".join(lines) + "\n")
    t2 = DeltaTable.for_path(spark, path)
    snap2 = t2.log.update()
    with pytest.raises(ValueError, match="lack numRecords"):
        metadata_only_count(snap2, spark=None)
    assert metadata_only_count(snap2, spark=spark) == 100


def test_sql_bare_count_is_metadata_only(spark, tmp_path):
    from delta_go_spark.sql import DeltaSqlContext
    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "cnt_sql")
    DeltaTable.create(
        spark, path, spark.createDataFrame([(i,) for i in range(7)], "k long")
    )
    sess = DeltaSqlContext(spark)
    sess.register("cnt_sql", path)
    assert sess.sql("SELECT COUNT(*) FROM cnt_sql").collect()[0]["count"] == 7
    assert sess.sql("SELECT count(*) AS n FROM cnt_sql").collect()[0]["n"] == 7
    # non-bare forms still go through Spark SQL
    got = sess.sql("SELECT count(*) AS n FROM cnt_sql WHERE k < 3").collect()
    assert got[0]["n"] == 3
