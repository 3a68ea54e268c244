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


class DeltaUpsertStreamCommitter:
    """Streaming CDC-apply: each micro-batch is MERGEd into the target —
    the foreachBatch upsert pattern that keeps a mirror table converged
    with a change stream.

    A CDF batch (carries `_change_type`/`_commit_version`) is applied
    with full change semantics: preimages dropped, the LATEST change per
    key wins (one micro-batch can span several source commits), deletes
    remove matched target rows, inserts/postimages upsert.  A plain
    append batch upserts directly; a duplicate key there raises only when
    it hits an existing target row (merge's multiple-match rule) —
    duplicates matching no target row insert BOTH copies, so pass
    `order_by` for a latest-wins compaction when the stream can repeat
    keys within a batch.

    Atomic + exactly-once per batch id: deletes and upserts are folded
    into ONE merge transaction (delete_condition) carrying the
    SetTransaction token — readers never observe deletes without the
    corresponding upserts, and the guard at the top skips replayed
    batches entirely."""

    def __init__(
        self,
        table_path: str,
        app_id: str,
        on: str,
        update_set: dict | None = None,
        order_by: list | None = None,
    ):
        self.table_path = table_path
        self.app_id = app_id
        self.on = on
        self.update_set = update_set
        self.order_by = order_by

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.commit_batch(batch_df, batch_id)

    def commit_batch(self, batch_df: DataFrame, batch_id: int) -> int | None:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from delta_go_spark.dml import DeltaDml
        from delta_go_spark.writer import CHANGE_TYPE_COL

        log = DeltaLog.for_table(self.table_path)
        if log.start_transaction().txn_version(self.app_id) >= batch_id:
            return None  # replayed batch: skip before any work

        df = batch_df
        is_cdf = CHANGE_TYPE_COL in df.columns
        order = self.order_by
        if is_cdf:
            df = df.filter(F.col(CHANGE_TYPE_COL) != "update_preimage")
            if order is None:
                if "_commit_version" not in df.columns:
                    raise ValueError(
                        "CDF batch without _commit_version: pass order_by "
                        "so latest-wins compaction is deterministic"
                    )
                # within one version a key can carry BOTH a delete and an
                # insert (pre-CDF rewrite commits degrade to file-level
                # delete+insert) — the insert is the surviving state, so
                # non-delete outranks delete at equal versions
                order = [
                    F.col("_commit_version").desc(),
                    (F.col(CHANGE_TYPE_COL) != "delete").desc(),
                ]
        if order is not None:
            w = Window.partitionBy(self.on).orderBy(*order)
            df = (
                df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        delete_col = None
        if is_cdf:
            # one source frame, flagged rows delete: the whole batch is a
            # SINGLE merge transaction — no window where readers see the
            # deletes without the corresponding upserts
            delete_col = "__dgs_is_delete"
            df = df.withColumn(
                delete_col, F.col(CHANGE_TYPE_COL) == "delete"
            ).drop(CHANGE_TYPE_COL, "_commit_version")

        dml = DeltaDml(batch_df.sparkSession, self.table_path)
        update_set = self.update_set
        if update_set is None:
            update_set = {
                c: F.col(f"_s_{c}")
                for c in df.columns
                if c != self.on and c != delete_col
            }
        return dml.merge(
            df,
            on=self.on,
            update_set=update_set,
            delete_condition=delete_col,
            txn_app_id=self.app_id,
            txn_version=batch_id,
        )


class DeltaIncrementalAggCommitter:
    """Incremental materialized aggregate: maintain a per-key (n, total)
    table from a source table's Change Data Feed — the CDC-driven view
    maintenance every warehouse bolts on top of a change stream.

    Additive aggregates are SIGN-summable from changes: insert/postimage
    rows contribute +1/+value, delete/preimage rows -1/-value, so each
    micro-batch folds to ONE tiny per-key delta frame (a single groupBy
    over the batch) merged into the aggregate table — work proportional
    to the CHANGE volume, never the table size (the 100 TB property; a
    recomputation would scan the world every trigger).  This also makes
    the result independent of CDF fidelity: a pre-CDF file-rewrite commit
    that degrades to whole-file delete+insert nets the same deltas.

    Exactly-once per batch id: the delta merge carries the SetTransaction
    token (same contract as DeltaUpsertStreamCommitter).  A group whose
    count reaches zero keeps its zero row (documented; removing it would
    need a second transaction and buys nothing for correctness).
    """

    def __init__(
        self, table_path: str, app_id: str, key: str, value_col: str
    ):
        self.table_path = table_path
        self.app_id = app_id
        self.key = key
        self.value_col = value_col

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        self.commit_batch(batch_df, batch_id)

    def commit_batch(self, batch_df: DataFrame, batch_id: int) -> int | None:
        from pyspark.sql import functions as F

        from delta_go_spark.dml import DeltaDml
        from delta_go_spark.writer import CHANGE_TYPE_COL

        if CHANGE_TYPE_COL not in batch_df.columns:
            raise ValueError(
                "DeltaIncrementalAggCommitter needs a CDF batch "
                f"(readChangeFeed=true); no {CHANGE_TYPE_COL} column"
            )
        log = DeltaLog.for_table(self.table_path)
        txn = log.start_transaction()
        if txn.txn_version(self.app_id) >= batch_id:
            return None  # replayed batch

        if batch_df.filter(F.col(self.key).isNull()).limit(1).count():
            # merge's equi-join (standard SQL MERGE ON semantics) never
            # matches NULL = NULL, so a NULL group would insert a fresh
            # duplicate row EVERY batch instead of accumulating — refuse
            # loudly rather than silently diverge
            raise ValueError(
                f"NULL values in aggregate key '{self.key}': the merge "
                "join cannot accumulate a NULL group; filter or coalesce "
                "the key upstream"
            )
        sign = F.when(
            F.col(CHANGE_TYPE_COL).isin("insert", "update_postimage"), 1
        ).otherwise(-1)
        deltas = (
            batch_df.groupBy(F.col(self.key))
            .agg(
                F.sum(sign).alias("n"),
                # coalesce: a batch whose contributions for a key are all
                # NULL in value_col sums to NULL, and NULL would poison
                # the running total (total + NULL = NULL) forever
                F.coalesce(
                    F.sum(sign * F.col(self.value_col)), F.lit(0.0)
                ).alias("total"),
            )
        )

        exists = txn.snapshot is not None and txn.read_version >= 0
        if not exists:
            from delta_go_spark.actions import Metadata, SetTransaction
            from delta_go_spark.types import schema_to_json
            from delta_go_spark.writer import stage_files

            txn.update_metadata(
                Metadata(
                    schema_string=schema_to_json(deltas.schema),
                    created_time=log.clock.now_millis(),
                )
            )
            actions = [
                SetTransaction(
                    self.app_id, batch_id, log.clock.now_millis()
                ),
                *stage_files(deltas, self.table_path, []),
            ]
            try:
                return txn.commit(actions, ops.STREAMING_UPDATE)
            except DeltaError:
                check = DeltaLog.for_table(self.table_path).start_transaction()
                if check.txn_version(self.app_id) >= batch_id:
                    return None
                raise

        dml = DeltaDml(batch_df.sparkSession, self.table_path)
        return dml.merge(
            deltas,
            on=self.key,
            update_set={
                "n": F.col("n") + F.col("_s_n"),
                "total": F.coalesce(F.col("total"), F.lit(0.0))
                + F.col("_s_total"),
            },
            txn_app_id=self.app_id,
            txn_version=batch_id,
        )
