"""Partition-pruned file scan over a snapshot.

Reference: scan.go (filtered scan + accepter), with the predicate split of
partition_utils.go.  Pruning happens before any Spark job: the pushed
conjunct is evaluated per AddFile against its partitionValues, the
residual comes back to the caller to apply on data rows
(scan.go:37-39 contract) — Catalyst then re-applies its own pushdown on
the surviving parquet files for row-group-level skipping.
"""

from __future__ import annotations

from collections.abc import Iterator

from delta_go_spark.actions import AddFile
from delta_go_spark.expressions import (
    Expression,
    split_metadata_and_data_predicates,
)


class DeltaScan:
    """reference: scan.go:54-231."""

    def __init__(self, snapshot, predicate: Expression | None = None):
        self.snapshot = snapshot
        self.predicate = predicate
        if predicate is not None:
            pcols = self.snapshot.metadata().partition_columns
            self.pushed, self.residual = split_metadata_and_data_predicates(
                predicate, pcols
            )
        else:
            self.pushed, self.residual = None, None

    def input_predicate(self) -> Expression | None:
        """reference: scan.go:33-35."""
        return self.predicate

    def pushed_predicate(self) -> Expression | None:
        """Partition-only conjunct used for file pruning
        (reference: scan.go:41-43)."""
        return self.pushed

    def residual_predicate(self) -> Expression | None:
        """Caller must apply this on data rows (reference: scan.go:37-39)."""
        return self.residual

    def _accept(self, add: AddFile) -> bool:
        """Evaluate the pushed predicate over one file's partitionValues
        (reference: scan.go:185-199).  Only a `true` verdict accepts — a
        NULL verdict (null partition value) excludes the file, exactly as
        SQL WHERE would exclude its rows."""
        if self.pushed is None:
            return True
        record = {k.lower(): v for k, v in (add.partition_values or {}).items()}
        return self.pushed.eval(record) is True

    def files(self) -> Iterator[AddFile]:
        """Surviving active files.  The snapshot state is already deduped
        (newest add per canonical path wins, removes tombstoned —
        replay_action.go:80-116), so this is a filter over all_files()."""
        for add in self.snapshot.all_files():
            if self._accept(add):
                yield add

    def to_df(self, spark):
        """Data plane: read surviving files, apply the residual predicate.

        Catalyst receives the residual as a real filter, so row-group
        pruning and column pruning still engage on the parquet scan."""
        from delta_go_spark.datareader import files_to_df

        df = files_to_df(
            spark,
            self.snapshot,
            list(self.files()),
        )
        # Apply the FULL predicate, not just the residual: partition columns
        # are materialized in the DataFrame, so re-filtering them is free
        # row-group pruning for Catalyst and guards the file-level prune.
        if self.predicate is not None:
            df = df.filter(self.predicate.to_spark())
        return df
