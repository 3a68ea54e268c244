"""delta_go_spark — a PySpark-native analytics engine with the capabilities of
csimplestring/delta-go (Delta Lake transaction-log protocol), plus the data
plane the reference delegates to a compute engine (README.md:14-16 of the
reference): relational queries, dedup, similarity search, text analysis and
streaming ingest over versioned parquet tables.

Layout:
  types.py        Delta JSON schema <-> pyspark.sql.types + compat checks
  actions.py      the 7 Delta log action types
  store.py        atomic log-store contract + local implementation
  filenames.py    _delta_log file naming helpers
  snapshot.py     log segment discovery + state replay -> Snapshot
  expressions.py  partition-predicate expression AST
  scan.py         predicate split + partition-pruned file scan
  transaction.py  optimistic transactions + conflict detection
  checkpoint.py   parquet checkpoint read/write + _last_checkpoint
  history.py      time travel + change feed
  table.py        DeltaTable facade (metadata plane -> DataFrame data plane)
  operators/      relational query library (TPC-H-ish, windows, rollup, ...)
  functions/      dedup, similarity search, text analysis, multimodal
  streaming/      structured-streaming Delta committer
"""

__version__ = "0.3.0"


# Lazy re-exports of the user-facing surface: importing the package stays
# cheap (no pyspark import until first use), while
# `from delta_go_spark import DeltaTable` works as users expect.
_LAZY = {
        "DeltaTable": ("delta_go_spark.table", "DeltaTable"),
        "DeltaLog": ("delta_go_spark.log", "DeltaLog"),
        "DeltaSqlContext": ("delta_go_spark.sql", "DeltaSqlContext"),
        "table_changes": ("delta_go_spark.cdf", "table_changes"),
        "write_dataframe": ("delta_go_spark.writer", "write_dataframe"),
        "vacuum": ("delta_go_spark.vacuum", "vacuum"),
        "optimize": ("delta_go_spark.maintenance", "optimize"),
        "zorder": ("delta_go_spark.maintenance", "zorder"),
        "restore": ("delta_go_spark.maintenance", "restore"),
        "register": ("delta_go_spark.datasource", "register"),
        "DeltaStreamCommitter": (
            "delta_go_spark.streaming.committer",
            "DeltaStreamCommitter",
        ),
        "DeltaUpsertStreamCommitter": (
            "delta_go_spark.streaming.committer",
            "DeltaUpsertStreamCommitter",
        ),
}

__all__ = [*_LAZY, "__version__"]


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        value = getattr(importlib.import_module(module), attr)
        globals()[name] = value  # cache: next access skips __getattr__
        return value
    raise AttributeError(f"module 'delta_go_spark' has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
