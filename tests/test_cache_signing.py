"""The content-signed fixture cache (round 10): _ensure_built embeds a
recipe signature — build-closure bytecode + constants, the caller's explicit
constants string, and the content signature of the source fixtures — in a
file written inside the artifact AFTER a complete build.  A stale signature
(recipe changed, fixture regenerated) rebuilds instead of silently serving
the old artifact; this retires the manual "wipe the nested cache dir when a
build recipe changes" rule flagged by the r9 verdict (the _ensure_built
caches were keyed by version count only).
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _mk_build(spark, path, segment):
    """Build closure writing a one-commit Delta table whose content records
    `segment` — textually identical closures with a DIFFERENT inline
    constant get different code signatures (the stale-recipe simulation)."""

    def build():
        from delta_go_spark.writer import write_dataframe

        df = spark.range(5).select(
            F.col("id"), F.lit(segment).alias("seg")
        )
        write_dataframe(df, path)

    return build


def _read_seg(spark, path):
    from delta_go_spark.table import DeltaTable

    return DeltaTable.for_path(spark, path).to_df().select("seg").first()["seg"]


def test_stale_recipe_rebuilds(spark, tmp_path):
    """Build with constant A, flip the closure constant to B, assert the
    cache REBUILDS (the r9 verdict's 'done' criterion)."""
    from delta_go_spark.operators.delta_queries import _ensure_built

    path = str(tmp_path / "t")

    # NOTE: the two closures are built by the same factory, so their
    # co_code is identical — only the captured constant differs, which
    # reaches the signature through the defaults/closure... it does NOT:
    # cell variables are invisible to co_consts.  The factory interpolates
    # the constant into the RECIPE string the way real call sites do for
    # module-level constants.
    _ensure_built(path, 0, _mk_build(spark, path, "A"), recipe="seg=A")
    assert _read_seg(spark, path) == "A"

    # same recipe -> served from cache (no rebuild: content still A even
    # though the closure would now write B — proves the cache actually
    # caches when the signature matches)
    _ensure_built(path, 0, _mk_build(spark, path, "B"), recipe="seg=A")
    assert _read_seg(spark, path) == "A"

    # flipped recipe -> rebuild with the new constant
    _ensure_built(path, 0, _mk_build(spark, path, "B"), recipe="seg=B")
    assert _read_seg(spark, path) == "B"


def test_inline_constant_change_rebuilds(spark, tmp_path):
    """An INLINE literal change inside the build closure itself (no recipe
    string needed) must change the code signature and rebuild — this is
    what signs the delta_queries fixtures, whose constants are inline."""
    from delta_go_spark.operators.delta_queries import _ensure_built

    path = str(tmp_path / "t")

    def build_a():
        from delta_go_spark.writer import write_dataframe

        write_dataframe(
            spark.range(5).select("id", F.lit("A").alias("seg")), path
        )

    def build_b():
        from delta_go_spark.writer import write_dataframe

        write_dataframe(
            spark.range(5).select("id", F.lit("B").alias("seg")), path
        )

    _ensure_built(path, 0, build_a)
    assert _read_seg(spark, path) == "A"
    _ensure_built(path, 0, build_b)  # literal 'A' -> 'B' lives in co_consts
    assert _read_seg(spark, path) == "B"


def test_identical_closures_share_cache(spark, tmp_path):
    """Two textually identical closures (different def sites) must produce
    the SAME signature — otherwise the two sites sharing orders_2commits
    would thrash-rebuild every run."""
    from delta_go_spark.operators.delta_queries import _code_sig

    def build_x():
        from delta_go_spark.writer import write_dataframe

        write_dataframe(
            spark.range(5).select("id", F.lit("A").alias("seg")), path
        )

    def build_y():
        from delta_go_spark.writer import write_dataframe

        write_dataframe(
            spark.range(5).select("id", F.lit("A").alias("seg")), path
        )

    path = str(tmp_path / "t")
    assert _code_sig(build_x.__code__) == _code_sig(build_y.__code__)


def test_regenerated_fixture_rebuilds(spark, tmp_path):
    """Regenerating a source fixture in place (same path, new content ->
    new mtime/size) must rebuild any cache that declared it as a source."""
    from delta_go_spark.operators.delta_queries import _ensure_built

    fx_dir = tmp_path / "sf"
    fx_dir.mkdir()
    fx = fx_dir / "documents.parquet"
    shutil.copyfile(os.path.join(SF_DIR, "documents.parquet"), fx)

    path = str(tmp_path / "t")
    calls = []

    def mk(tag):
        def build():
            from delta_go_spark.writer import write_dataframe

            calls.append(tag)
            write_dataframe(
                spark.range(5).select("id", F.lit("A").alias("seg")), path
            )

        return build

    _ensure_built(path, 0, mk("first"), sf_dir=str(fx_dir), tables=("documents",))
    _ensure_built(path, 0, mk("second"), sf_dir=str(fx_dir), tables=("documents",))
    assert calls == ["first"]  # cached: same fixture content

    # regenerate the fixture in place (bump mtime_ns)
    os.utime(fx, ns=(1, 1))
    _ensure_built(path, 0, mk("third"), sf_dir=str(fx_dir), tables=("documents",))
    assert calls == ["first", "third"]


def test_half_built_still_rebuilds(spark, tmp_path):
    """The original crash-safety contract survives the signing change: a
    table SHORT of expected_version rebuilds even with a valid signature
    file lying around (signature is written after a COMPLETE build, but a
    later amputation — the partial-build simulation — must still rebuild)."""
    import glob

    from delta_go_spark.log import DeltaLog
    from delta_go_spark.operators.delta_queries import _ensure_built
    from delta_go_spark.table import DeltaTable

    path = str(tmp_path / "t")

    def build():
        from delta_go_spark.writer import write_dataframe

        df = spark.range(5).select("id", F.lit("A").alias("seg"))
        write_dataframe(df, path)
        DeltaTable.for_path(spark, path).append(
            spark.range(5, 8).select("id", F.lit("A").alias("seg"))
        )

    _ensure_built(path, 1, build)
    # amputate the second commit: looks like a run that died mid-build
    for f in glob.glob(os.path.join(path, "_delta_log", "*")):
        if not os.path.basename(f).startswith(f"{0:020d}.json"):
            os.remove(f)
    assert DeltaLog.for_table(path).update().version == 0

    _ensure_built(path, 1, build)
    assert DeltaLog.for_table(path).update().version == 1
