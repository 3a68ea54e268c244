"""DeltaTable: the user-facing facade joining the metadata plane
(DeltaLog/Snapshot/transactions) with the Spark data plane.

This is the surface a user of the reference would target after switching:
open a table, read it as a DataFrame (optionally time-traveled or
predicate-pruned), write DataFrames into it transactionally, register it
for SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from delta_go_spark.expressions import Expression
from delta_go_spark.log import DeltaLog
from delta_go_spark.writer import write_dataframe


class DeltaTable:
    def __init__(self, spark: SparkSession, table_path: str):
        self.spark = spark
        self.log = DeltaLog.for_table(table_path)

    @classmethod
    def for_path(cls, spark: SparkSession, table_path: str) -> "DeltaTable":
        return cls(spark, table_path)

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        table_path: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        configuration: dict[str, str] | None = None,
        generated: dict[str, str] | None = None,
    ) -> "DeltaTable":
        """`generated` maps column name -> SQL expression: the column is
        computed from the expression (or validated, if the frame already
        carries it) and the expression is recorded in the field metadata
        (`delta.generationExpression`, the public Delta layout) so every
        later write computes/validates it too."""
        if generated:
            from pyspark.sql import functions as F

            from delta_go_spark.writer import GENERATION_EXPRESSION_KEY

            for name, expr_sql in generated.items():
                col = F.col(name) if name in df.columns else F.expr(expr_sql)
                df = df.withColumn(
                    name,
                    col.alias(name, metadata={GENERATION_EXPRESSION_KEY: expr_sql}),
                )
        write_dataframe(df, table_path, "append", partition_by, configuration)
        return cls(spark, table_path)

    # -- read --------------------------------------------------------------
    def to_df(self, predicate: Expression | None = None) -> DataFrame:
        snap = self.log.update()
        if predicate is None:
            return snap.to_df(self.spark)
        return snap.scan(predicate).to_df(self.spark)

    def version_as_of(self, version: int) -> DataFrame:
        return self.log.snapshot_for_version_as_of(version).to_df(self.spark)

    def timestamp_as_of(self, timestamp_millis: int) -> DataFrame:
        return self.log.snapshot_for_timestamp_as_of(timestamp_millis).to_df(self.spark)

    def register_temp_view(self, name: str) -> None:
        self.to_df().createOrReplaceTempView(name)

    # -- write -------------------------------------------------------------
    def append(self, df: DataFrame, merge_schema: bool = False) -> int:
        return write_dataframe(
            df, self.log.table_path, "append", merge_schema=merge_schema
        )

    def overwrite(self, df: DataFrame, merge_schema: bool = False) -> int:
        return write_dataframe(
            df, self.log.table_path, "overwrite", merge_schema=merge_schema
        )

    # -- DML (copy-on-write; see dml.py) -----------------------------------
    def parse_predicate(self, where_sql: str) -> Expression:
        """SQL WHERE text -> Expression typed against this table's schema
        (sqlpred grammar); usable with to_df/delete/update/table_changes
        for SQL-driven yet fully file-pruned operations."""
        from delta_go_spark.sqlpred import parse_predicate

        return parse_predicate(where_sql, self.log.update().metadata().schema())

    def delete_where(self, where_sql: str) -> int:
        """DELETE with a SQL WHERE string (same pruning as delete())."""
        return self.delete(self.parse_predicate(where_sql))

    def update_where(self, where_sql: str, assignments: dict) -> int:
        """UPDATE with a SQL WHERE string (same pruning as update())."""
        return self.update(self.parse_predicate(where_sql), assignments)

    def delete(self, predicate: Expression) -> int:
        from delta_go_spark.dml import DeltaDml

        return DeltaDml(self.spark, self.log.table_path).delete(predicate)

    def update(self, predicate: Expression, assignments: dict) -> int:
        from delta_go_spark.dml import DeltaDml

        return DeltaDml(self.spark, self.log.table_path).update(predicate, assignments)

    def merge(self, source: DataFrame, on: str, **kwargs) -> int:
        from delta_go_spark.dml import DeltaDml

        return DeltaDml(self.spark, self.log.table_path).merge(source, on, **kwargs)

    def truncate(self) -> int:
        from delta_go_spark.dml import DeltaDml

        return DeltaDml(self.spark, self.log.table_path).truncate()

    # -- maintenance / schema evolution ------------------------------------
    def optimize(self, **kwargs) -> int | None:
        from delta_go_spark.maintenance import optimize

        return optimize(self.spark, self.log.table_path, **kwargs)

    def vacuum(self, retention_millis: int | None = None, dry_run: bool = False):
        from delta_go_spark.vacuum import vacuum

        return vacuum(self.log.table_path, retention_millis, dry_run)

    def zorder(self, cols: list[str], n_files: int | None = None) -> int | None:
        from delta_go_spark.maintenance import zorder

        return zorder(self.spark, self.log.table_path, cols, n_files)

    def compute_stats(self) -> int | None:
        """Backfill per-file stats for active files missing them
        (maintenance.compute_stats) — enables data skipping and
        metadata-only COUNT on files from stats-less writers."""
        from delta_go_spark.maintenance import compute_stats

        return compute_stats(self.spark, self.log.table_path)

    @classmethod
    def replace(
        cls,
        spark: SparkSession,
        table_path: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        configuration: dict[str, str] | None = None,
    ) -> "DeltaTable":
        """CREATE OR REPLACE TABLE — one atomic commit swaps data, schema,
        partitioning and configuration (op/names.go REPLACE_TABLE); see
        writer.replace_table."""
        from delta_go_spark.writer import replace_table

        replace_table(
            df, table_path, partition_by=partition_by, configuration=configuration
        )
        return cls.for_path(spark, table_path)

    def upgrade_protocol(
        self, min_reader_version: int = 1, min_writer_version: int = 2
    ) -> int:
        """UPGRADE PROTOCOL (op/names.go UPGRADE_PROTOCOL): commit a
        Protocol action raising the table's reader/writer requirements.
        Downgrades are rejected (a lowered floor would un-protect readers
        that relied on it), and this writer refuses to raise the floor
        past its own pinned (1, 2) support — committing a requirement the
        engine itself cannot honor would brick the table for its own
        writes (prepareCommit enforces the same pin as a backstop)."""
        from delta_go_spark import ops
        from delta_go_spark.actions import Protocol
        from delta_go_spark.snapshot import DeltaError

        cur = self.log.snapshot().protocol()
        # Component-wise, not lexicographic: (2, 1) against a (1, 2) table
        # raises the reader floor while LOWERING the writer floor — still a
        # downgrade for writers even though the tuple compares greater.
        if (
            min_reader_version < cur.min_reader_version
            or min_writer_version < cur.min_writer_version
        ):
            raise DeltaError(
                f"cannot downgrade protocol ({cur.min_reader_version},"
                f"{cur.min_writer_version}) -> ({min_reader_version},"
                f"{min_writer_version})"
            )
        txn = self.log.start_transaction()
        return txn.commit(
            [Protocol(min_reader_version, min_writer_version)],
            ops.UPGRADE_PROTOCOL,
            operation_parameters={
                "minReaderVersion": str(min_reader_version),
                "minWriterVersion": str(min_writer_version),
            },
        )

    @classmethod
    def convert(
        cls,
        spark: SparkSession,
        directory: str,
        partition_by: list[str] | None = None,
    ) -> "DeltaTable":
        """Convert an existing parquet directory into a Delta table in
        place (no data rewrite) and return it — op/names.go CONVERT; see
        maintenance.convert_to_delta."""
        from delta_go_spark.maintenance import convert_to_delta

        convert_to_delta(spark, directory, partition_by=partition_by)
        return cls.for_path(spark, directory)

    def restore(self, version: int) -> int:
        from delta_go_spark.maintenance import restore

        return restore(self.spark, self.log.table_path, version)

    def clone_shallow(self, dest_path: str) -> "DeltaTable":
        """Zero-copy fork: dest's log references this table's data files
        by absolute path (maintenance.clone_shallow)."""
        from delta_go_spark.maintenance import clone_shallow

        clone_shallow(self.spark, self.log.table_path, dest_path)
        return DeltaTable.for_path(self.spark, dest_path)

    def clone_deep(self, dest_path: str) -> "DeltaTable":
        """Independent fork: every live data file is copied under dest's
        root (maintenance.clone_deep) — source VACUUM can never break
        the clone."""
        from delta_go_spark.maintenance import clone_deep

        clone_deep(self.spark, self.log.table_path, dest_path)
        return DeltaTable.for_path(self.spark, dest_path)

    def restore_to_timestamp(self, timestamp_millis: int) -> int:
        from delta_go_spark.maintenance import restore_to_timestamp

        return restore_to_timestamp(
            self.spark, self.log.table_path, timestamp_millis
        )

    def changes_df(self, start_version: int = 0) -> DataFrame:
        from delta_go_spark.maintenance import changes_df

        return changes_df(self.spark, self.log.table_path, start_version)

    def table_changes(
        self,
        start_version: int = 0,
        end_version: int | None = None,
        predicate: Expression | None = None,
        start_timestamp: int | None = None,
        end_timestamp: int | None = None,
    ) -> DataFrame:
        """Row-level Change Data Feed (see cdf.table_changes).  `predicate`
        filters change rows; its partition conjunct prunes whole files;
        timestamp bounds (epoch millis) may replace version bounds."""
        from delta_go_spark.cdf import table_changes

        return table_changes(
            self.spark,
            self.log.table_path,
            start_version,
            end_version,
            predicate=predicate,
            start_timestamp=start_timestamp,
            end_timestamp=end_timestamp,
        )

    def add_check_constraint(self, name: str, expr_sql: str) -> int:
        """ADD CONSTRAINT name CHECK (expr): validates EXISTING rows first
        (one scan), then records `delta.constraints.<name>` so every later
        write/UPDATE/MERGE enforces it (public Delta CHECK semantics —
        NULL satisfies; violation = expression false)."""
        import dataclasses

        from delta_go_spark import ops
        from delta_go_spark.writer import CONSTRAINT_PREFIX, check_constraints

        key = f"{CONSTRAINT_PREFIX}{name}"
        txn = self.log.start_transaction()
        meta = txn.snapshot.metadata()
        if key in (meta.configuration or {}):
            raise ValueError(f"constraint {name} already exists")
        # Validate against THIS transaction's snapshot and record the read;
        # require_serializable because this metadata-only commit's validity
        # depends on the data it read — a concurrent append of violating
        # rows must conflict instead of slipping under a constraint
        # validated on other data (see read_whole_table).
        txn.read_whole_table(require_serializable=True)
        check_constraints(txn.snapshot.scan().to_df(self.spark), {key: expr_sql})
        cfg = dict(meta.configuration or {})
        cfg[key] = expr_sql
        txn.update_metadata(dataclasses.replace(meta, configuration=cfg))
        return txn.commit(
            [],
            ops.SET_TABLE_PROPERTIES,
            operation_parameters={"constraint": name},
        )

    def drop_check_constraint(self, name: str) -> int:
        import dataclasses

        from delta_go_spark import ops
        from delta_go_spark.writer import CONSTRAINT_PREFIX

        key = f"{CONSTRAINT_PREFIX}{name}"
        txn = self.log.start_transaction()
        meta = txn.snapshot.metadata()
        if key not in (meta.configuration or {}):
            raise ValueError(f"no such constraint: {name}")
        cfg = {k: v for k, v in meta.configuration.items() if k != key}
        txn.update_metadata(dataclasses.replace(meta, configuration=cfg))
        return txn.commit(
            [], ops.SET_TABLE_PROPERTIES, operation_parameters={"constraint": name}
        )

    def add_columns(self, new_fields: list) -> int:
        """ADD COLUMNS: append nullable fields to the schema (the only
        schema change the write-compat rules allow without rewriting —
        type_utils.go:109-133; existing files read the new columns as
        null).  NOT NULL fields are refused: existing rows would read
        NULL under a non-nullable schema, violating the invariant."""
        from pyspark.sql.types import StructType

        from delta_go_spark import ops
        from delta_go_spark.types import schema_to_json

        import dataclasses

        bad = [f.name for f in new_fields if not f.nullable]
        if bad:
            raise ValueError(
                f"ADD COLUMNS requires nullable columns (existing rows "
                f"read them as NULL); NOT NULL on: {bad}"
            )
        txn = self.log.start_transaction()
        meta = txn.snapshot.metadata()
        evolved = StructType([*meta.schema().fields, *new_fields])
        txn.update_metadata(
            dataclasses.replace(meta, schema_string=schema_to_json(evolved))
        )
        return txn.commit([], ops.ADD_COLUMNS, operation_parameters={})

    def set_properties(self, props: dict) -> int:
        """SET TBLPROPERTIES: merge keys into the table configuration in
        one metadata-only commit; validated configs (config.py) take
        effect from the next operation.  `delta.constraints.*` keys are
        refused — they would bypass add_check_constraint's whole-table
        validation and SERIALIZABLE isolation."""
        import dataclasses
        import json

        from delta_go_spark import ops

        from delta_go_spark.writer import CONSTRAINT_PREFIX

        clean = {str(k): str(v) for k, v in props.items()}
        guarded = [k for k in clean if k.startswith(CONSTRAINT_PREFIX)]
        if guarded:
            raise ValueError(
                f"set constraints via add_check_constraint, not "
                f"TBLPROPERTIES (would skip existing-data validation): "
                f"{guarded}"
            )
        txn = self.log.start_transaction()
        meta = txn.snapshot.metadata()
        cfg = dict(meta.configuration or {})
        cfg.update(clean)
        txn.update_metadata(dataclasses.replace(meta, configuration=cfg))
        return txn.commit(
            [], ops.SET_TABLE_PROPERTIES,
            # full key->value map, as the Delta spec records it — keys
            # alone would leave history unable to say WHAT was set
            operation_parameters={
                "properties": json.dumps(clean, sort_keys=True)
            },
        )

    def count(self, predicate: "Expression | None" = None) -> int:
        """COUNT(*) — answered from log stats in O(#files) when the
        predicate is absent or partition-only (scan.metadata_only_count);
        falls back to the real scan for data-column predicates."""
        from delta_go_spark.scan import metadata_only_count

        snap = self.log.update()
        try:
            return metadata_only_count(snap, predicate, self.spark)
        except ValueError:
            return self.to_df(predicate).count()

    # -- metadata ----------------------------------------------------------
    def version(self) -> int:
        return self.log.update().version

    def history(self):
        latest = self.log.update().version
        return [self.log.commit_info_at(v) for v in range(latest + 1)]
