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

__version__ = "0.1.0"
