"""Structured-Streaming sink into a Delta table with exactly-once batches.

The reference carries SetTransaction markers precisely for this
(action/trx.go, replay fold replay_action.go:81-82, STREAMING_UPDATE op
op/names.go:20); this module is the Spark side that uses them: a
foreachBatch committer that records (appId=query id, version=batch id) in
the same atomic commit as the data, and skips batches that were already
committed (the replay-after-failure case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from delta_go_spark import ops
from delta_go_spark.actions import SetTransaction
from delta_go_spark.log import DeltaLog
from delta_go_spark.snapshot import DeltaError


class DeltaStreamCommitter:
    """Use as: stream.writeStream.foreachBatch(committer).start().

    Exactly-once: batch N is committed together with
    SetTransaction(app_id, N); on restart, batches with id <= the recorded
    version are no-ops.
    """

    def __init__(self, table_path: str, app_id: str, partition_by: list[str] | None = None):
        self.table_path = table_path
        self.app_id = app_id
        self.partition_by = partition_by

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.commit_batch(batch_df, batch_id)

    def commit_batch(self, batch_df: DataFrame, batch_id: int) -> int | None:
        """Returns the committed Delta version, or None if the batch was
        already committed (idempotent replay)."""
        from delta_go_spark.actions import Metadata
        from delta_go_spark.types import schema_to_json
        from delta_go_spark.writer import stage_files

        log = DeltaLog.for_table(self.table_path)
        txn = log.start_transaction()
        last = txn.txn_version(self.app_id)
        if last >= batch_id:
            return None  # already committed: exactly-once replay guard

        exists = txn.snapshot is not None and txn.read_version >= 0
        partition_by = list(self.partition_by or [])
        if exists:
            meta = txn.snapshot.metadata()
            partition_by = meta.partition_columns
            # the streaming sink is a write path like any other: generated
            # columns are computed/validated and CHECK constraints reject
            # the batch before anything is staged
            from delta_go_spark.writer import (
                apply_generated_columns,
                check_constraints,
            )

            batch_df = apply_generated_columns(batch_df, meta.schema())
            check_constraints(batch_df, meta.configuration, meta.schema())

        new_files = stage_files(batch_df, self.table_path, partition_by)

        if not exists:
            txn.update_metadata(
                Metadata(
                    schema_string=schema_to_json(batch_df.schema),
                    partition_columns=partition_by,
                    created_time=log.clock.now_millis(),
                )
            )
        actions = [SetTransaction(self.app_id, batch_id, log.clock.now_millis())]
        actions.extend(new_files)
        try:
            return txn.commit(actions, ops.STREAMING_UPDATE)
        except DeltaError:
            # a concurrent replay of the same app may have won; re-check
            check = DeltaLog.for_table(self.table_path).start_transaction()
            if check.txn_version(self.app_id) >= batch_id:
                return None
            raise
