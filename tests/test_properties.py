"""Property-based tests (hypothesis) — a test dimension the reference has
none of (SURVEY.md §5: go test + testify only).

Targets the correctness keystones: expression evaluation (3-valued logic),
the pushed/residual predicate split (pruning soundness), partition-value
string parsing, and schema write-compatibility.
"""

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql.types import (
    DateType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

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
    parse_partition_value,
    split_metadata_and_data_predicates,
)
from delta_go_spark.types import is_write_compatible

PCOLS = ["p1", "p2"]
DCOLS = ["d1", "d2"]


def leaf(col_name: str, value: int):
    c = Column(col_name, IntegerType())
    lit = Literal(value, IntegerType())
    return st.sampled_from(
        [EqualTo(c, lit), GreaterThan(c, lit), LessThan(c, lit), IsNull(c), IsNotNull(c)]
    )


@st.composite
def predicates(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        col = draw(st.sampled_from(PCOLS + DCOLS))
        value = draw(st.integers(min_value=-5, max_value=5))
        return draw(leaf(col, value))
    a = draw(predicates(depth=depth + 1))
    b = draw(predicates(depth=depth + 1))
    return draw(st.sampled_from([And(a, b), Or(a, b), Not(a)]))


@st.composite
def records(draw):
    # raw partition-value strings: None = NULL, else int string
    return {
        c: draw(st.one_of(st.none(), st.integers(-5, 5).map(str)))
        for c in PCOLS + DCOLS
    }


@given(predicates(), records())
@settings(max_examples=300, deadline=None)
def test_split_preserves_semantics(pred, record):
    """pushed AND residual ≡ original predicate, for every record.
    (partition_utils.go:12-54 contract — the split must never change what
    a row-level filter would select.)"""
    pushed, residual = split_metadata_and_data_predicates(pred, PCOLS)

    def ev(e):
        return e.eval(record) if e is not None else True

    def and3(a, b):
        if a is False or b is False:
            return False
        if a is None or b is None:
            return None
        return True

    assert and3(ev(pushed), ev(residual)) == pred.eval(record)


@given(predicates())
@settings(max_examples=300, deadline=None)
def test_pushed_references_only_partition_cols(pred):
    pushed, _res = split_metadata_and_data_predicates(pred, PCOLS)
    if pushed is not None:
        assert pushed.references() <= {c.lower() for c in PCOLS}


@given(predicates(), records())
@settings(max_examples=300, deadline=None)
def test_pruning_is_sound(pred, record):
    """A file excluded by the pushed predicate (eval is not True) cannot
    contain a row the full predicate accepts with the same partition
    values — i.e. pruning never drops matching rows (scan.go:185-199)."""
    pushed, _res = split_metadata_and_data_predicates(pred, PCOLS)
    if pushed is None:
        return
    if pred.eval(record) is True:
        assert pushed.eval(record) is True


@given(st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)))
def test_partition_value_int_roundtrip(v):
    raw = None if v is None else str(v)
    assert parse_partition_value(raw, IntegerType()) == v
    assert parse_partition_value(raw, LongType()) == v


@given(st.dates(min_value=datetime.date(1, 1, 1), max_value=datetime.date(9999, 12, 31)))
def test_partition_value_date_roundtrip(d):
    assert parse_partition_value(d.isoformat(), DateType()) == d


@given(st.text(min_size=1, max_size=20))
def test_partition_value_string_identity(s):
    assert parse_partition_value(s, StringType()) == s


_names = st.sampled_from(["a", "b", "c", "d", "e"])


@st.composite
def schemas(draw):
    names = draw(st.lists(_names, min_size=1, max_size=5, unique=True))
    return StructType(
        [
            StructField(
                n,
                draw(st.sampled_from([IntegerType(), LongType(), StringType()])),
                draw(st.booleans()),
            )
            for n in names
        ]
    )


@given(schemas())
def test_schema_self_compatible(s):
    assert is_write_compatible(s, s)


@given(schemas())
@settings(max_examples=200, deadline=None)
def test_adding_nullable_column_is_compatible(s):
    wider = StructType([*s.fields, StructField("zz_new", StringType(), True)])
    assert is_write_compatible(s, wider)
    # and the reverse (dropping a column) is NOT
    assert not is_write_compatible(wider, s)


@given(schemas())
@settings(max_examples=200, deadline=None)
def test_nullable_flip_rules(s):
    # nullable -> non-nullable is forbidden; the reverse is allowed
    flipped = StructType(
        [StructField(f.name, f.dataType, not f.nullable) for f in s.fields]
    )
    any_tightened = any(f.nullable and not g.nullable for f, g in zip(s.fields, flipped.fields))
    if any_tightened:
        assert not is_write_compatible(s, flipped)


# ---------------------------------------------------------------------------
# Action JSON round-trip: serialize -> parse -> identical (the log IS the
# database; envelope fidelity is existential).
from delta_go_spark.actions import (  # noqa: E402
    AddFile,
    RemoveFile,
    SetTransaction,
    action_from_json,
    action_to_json,
)

_path = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")), min_size=1, max_size=40
)
_pv = st.dictionaries(
    st.sampled_from(["p", "q"]), st.one_of(st.none(), st.text(max_size=10)), max_size=2
)


@given(
    _path,
    _pv,
    st.integers(0, 2**40),
    st.integers(0, 2**40),
    st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_addfile_json_roundtrip(path, pv, size, mtime, dc):
    a = AddFile(
        path=path, partition_values=pv, size=size, modification_time=mtime, data_change=dc
    )
    back = action_from_json(action_to_json(a))
    assert isinstance(back, AddFile)
    assert back.path == a.path
    assert (back.partition_values or {}) == (a.partition_values or {})
    assert back.size == a.size and back.data_change == a.data_change


@given(_path, st.integers(0, 2**40), st.booleans())
@settings(max_examples=200, deadline=None)
def test_removefile_json_roundtrip(path, ts, dc):
    r = RemoveFile(path=path, deletion_timestamp=ts, data_change=dc)
    back = action_from_json(action_to_json(r))
    assert isinstance(back, RemoveFile)
    assert back.path == r.path and back.deletion_timestamp == ts


@given(st.text(min_size=1, max_size=20), st.integers(0, 2**31), st.integers(0, 2**40))
@settings(max_examples=100, deadline=None)
def test_settransaction_json_roundtrip(app, v, ts):
    t = SetTransaction(app_id=app, version=v, last_updated=ts)
    back = action_from_json(action_to_json(t))
    assert isinstance(back, SetTransaction)
    assert back.app_id == app and back.version == v


@given(
    st.lists(st.text(alphabet="abcXYZ019", min_size=0, max_size=6), min_size=1, max_size=8),
    st.text(alphabet="abcXYZ019", min_size=1, max_size=4),
)
@settings(max_examples=300, deadline=None)
def test_startswith_stats_pruning_is_sound(values, prefix):
    """If ANY value in a file matches the prefix, min/max skipping must
    keep the file (false pruning = silently wrong results; false keeps are
    just wasted I/O)."""
    import json

    from pyspark.sql.types import StringType

    from delta_go_spark.expressions import StartsWith
    from delta_go_spark.scan import stats_may_match

    stats = json.dumps(
        {
            "numRecords": len(values),
            "minValues": {"s": min(values)},
            "maxValues": {"s": max(values)},
            "nullCount": {"s": 0},
        }
    )
    pred = StartsWith(Column("s", StringType()), prefix)
    if any(v.startswith(prefix) for v in values):
        assert stats_may_match(pred, stats)


# ---------------------------------------------------------------------------
# Round-7 integer machinery: quota allocation and the two-pass global prefix.
# Spark-backed, so examples are few but each is checked exactly against a
# pure-Python replay.


def _session():
    from delta_go_spark.session import get_spark

    return get_spark()  # the repo's one session recipe — no config drift


@given(
    st.lists(st.integers(0, 50), min_size=1, max_size=8),
    st.integers(1, 200),
)
@settings(max_examples=12, deadline=None)
def test_proportional_quota_matches_hamilton_replay(counts, n):
    from delta_go_spark.functions.sampling import proportional_quota

    spark = _session()
    rows = [
        (f"s{i:02d}", j) for i, c in enumerate(counts) for j in range(c)
    ]
    if not rows:
        return
    df = spark.createDataFrame(rows, "source string, doc_id long")
    got = {
        r["source"]: (r["n_total"], r["quota"])
        for r in proportional_quota(df, n).collect()
    }

    # INDEPENDENT Hamilton invariants (not a copy of the implementation):
    per = {f"s{i:02d}": c for i, c in enumerate(counts) if c > 0}
    total = sum(per.values())
    eff = min(n, total)
    assert set(got) == set(per)
    assert sum(q for _, q in got.values()) == eff  # exact-sum contract
    floors = {s: (c * eff) // total for s, c in per.items()}
    for s, c in per.items():
        nt, q = got[s]
        assert nt == c
        assert 0 <= q <= c  # never more than the stratum holds
        # fair rounding: each quota is the floor or ceil of its exact share
        assert q in (floors[s], floors[s] + 1) or q == c
    # the number of +1 top-ups equals exactly what the floors left short
    # (when no stratum is saturated, the usual case under these bounds)
    if all(got[s][1] < c or floors[s] >= c for s, c in per.items()):
        ups = sum(1 for s in per if got[s][1] == floors[s] + 1)
        assert ups == eff - sum(min(floors[s], per[s]) for s in per)
    # LARGEST-remainder: every topped-up stratum's remainder must be >=
    # every skipped (non-saturated) stratum's remainder — the property a
    # smallest-remainder or key-order top-up would violate
    rems = {s: (c * eff) % total for s, c in per.items()}
    upped = [s for s in per if got[s][1] == floors[s] + 1]
    skipped = [
        s for s, c in per.items()
        if got[s][1] == floors[s] and floors[s] < c
    ]
    if upped and skipped:
        assert min(rems[s] for s in upped) >= max(rems[s] for s in skipped)


@given(
    st.lists(
        st.tuples(st.integers(0, 100), st.integers(0, 20)),
        min_size=1,
        max_size=60,
    ),
    st.integers(2, 6),
)
@settings(max_examples=10, deadline=None)
def test_global_prefix_matches_sorted_replay(items, nparts):
    """row_number and running sum from the range-partitioned two-pass form
    must equal the single-ordered-scan truth for any data and any
    partition count."""
    from pyspark.sql import functions as F

    from delta_go_spark.functions.sampling import _global_prefix

    spark = _session()
    rows = [(i, k, v) for i, (k, v) in enumerate(items)]
    df = spark.createDataFrame(rows, "id long, k long, v long")
    out = _global_prefix(
        df,
        [F.desc("k"), F.asc("id")],
        sum_col="v",
        num_partitions=nparts,
    )
    got = {
        r["id"]: (r["_grn"], r["_gcum"])
        for r in out.collect()
    }
    expected = {}
    run = 0
    for pos, (i, k, v) in enumerate(
        sorted(rows, key=lambda r: (-r[1], r[0])), start=1
    ):
        run += v
        expected[i] = (pos, run)
    assert got == expected


# ---------------------------------------------------------------------------
# Round-10 pure-logic properties, evaluated through DuckDB (no Spark job per
# example): the Hilbert curve SQL rendering and the water-filling rule.


def _xy2d_ref(order: int, x: int, y: int) -> int:
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


@given(
    bits=st.integers(min_value=1, max_value=6),
    pts=st.lists(
        st.tuples(st.integers(0, 63), st.integers(0, 63)),
        min_size=1,
        max_size=20,
    ),
)
@settings(max_examples=60, deadline=None)
def test_hilbert_sql_matches_reference(bits, pts):
    """The shared-engine SQL rendering of the xy2d walk equals the
    reference transform for arbitrary in-range cells and curve orders —
    the string both the Spark plan and the DuckDB oracle evaluate."""
    import duckdb

    from delta_go_spark.maintenance import hilbert_index_sql

    n = 1 << bits
    pts = [(x % n, y % n) for x, y in pts]
    con = duckdb.connect()
    values = ", ".join(f"({x}, {y})" for x, y in pts)
    sql = hilbert_index_sql("x", "y", bits=bits)
    rows = con.execute(
        f"SELECT x, y, {sql} AS d FROM (VALUES {values}) AS t(x, y)"
    ).fetchall()
    for x, y, d in rows:
        assert d == _xy2d_ref(n, x, y)
    # and d is a bijection onto [0, n^2) — check on the points we have
    assert len({d for _, _, d in rows}) == len({(x, y) for x, y, _ in rows})


@given(
    counts=st.lists(st.integers(0, 10_000), min_size=1, max_size=12),
    budget=st.integers(0, 60_000),
)
@settings(max_examples=80, deadline=None)
def test_waterfill_sql_invariants(counts, budget):
    """For ANY per-key counts and budget, the SQL rule must satisfy the
    max-min-fair contract: allocations never exceed holdings; capped keys
    share one water level T; kept keys hold at most T; the total spend is
    within the budget with integer slack < number of capped keys (floor
    division leftover), and equals the full corpus when the budget covers
    it."""
    import duckdb

    from delta_go_spark.functions.sampling import waterfill_sql

    con = duckdb.connect()
    values = ", ".join(f"('k{i:02d}', {c})" for i, c in enumerate(counts))
    sql = waterfill_sql(
        f"SELECT k, CAST(c AS BIGINT) AS c FROM (VALUES {values}) AS t(k, c)",
        str(budget),
        "k",
    )
    rows = con.execute(sql).fetchall()
    total = sum(counts)
    alloc = {k: a for k, _, a, _ in rows}
    capped = {k for k, _, _, f in rows if f == 1}
    have = {k: c for k, c, _, _ in rows}
    assert all(alloc[k] <= have[k] for k in alloc)
    if budget >= total:
        assert not capped and sum(alloc.values()) == total
    else:
        levels = {alloc[k] for k in capped}
        assert len(levels) == 1
        t = levels.pop()
        assert all(have[k] <= t for k in alloc if k not in capped)
        spent = sum(alloc.values())
        assert spent <= budget
        assert budget - spent < len(capped)  # floor-division slack bound
