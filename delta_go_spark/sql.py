"""SQL-text access to Delta tables, including time-travel clauses.

Spark SQL itself has no notion of our Python-side Delta tables, so this
context registers each table's CURRENT snapshot as a temp view on demand
and rewrites the Delta time-travel syntax —

    SELECT ... FROM t VERSION AS OF 3
    SELECT ... FROM t TIMESTAMP AS OF '2026-01-01 00:00:00'

— into views over the pinned snapshot before handing the text to
spark.sql.  Everything downstream is stock Catalyst: the rewritten query
is a plain Spark SQL query over parquet-backed views.
"""

from __future__ import annotations

import datetime
import re

from pyspark.sql import DataFrame, SparkSession

from delta_go_spark.log import DeltaLog


def _split_top_level_commas(text: str) -> list[str]:
    """Split on commas outside single-quoted strings (SET-clause lists)."""
    parts, buf, in_str = [], [], False
    for ch in text:
        if ch == "'":
            in_str = not in_str
            buf.append(ch)
        elif ch == "," and not in_str:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return parts


class DeltaSqlContext:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, str] = {}

    def register(self, name: str, table_path: str) -> None:
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            raise ValueError(f"invalid table name: {name}")
        self._tables[name] = table_path

    def _key_for(self, name: str) -> str:
        """Registered-table key for `name`, case-insensitively (statement
        keywords are case-insensitive, so table names are accepted in any
        casing too)."""
        for k in self._tables:
            if k.lower() == name.lower():
                return k
        raise ValueError(f"table not registered: {name}")

    def _view_for_version(self, name: str, version: int) -> str:
        view = f"{name}__v{version}"
        log = DeltaLog.for_table(self._tables[name])
        log.snapshot_for_version_as_of(version).to_df(self.spark).createOrReplaceTempView(view)
        return view

    def _view_for_timestamp(self, name: str, ts_text: str) -> str:
        ts = datetime.datetime.fromisoformat(ts_text)
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=datetime.timezone.utc)
        millis = int(ts.timestamp() * 1000)
        log = DeltaLog.for_table(self._tables[name])
        snap = log.snapshot_for_timestamp_as_of(millis)
        view = f"{name}__t{snap.version}"
        snap.to_df(self.spark).createOrReplaceTempView(view)
        return view

    def _view_for_changes(self, name: str, start: int, end: int | None) -> str:
        from delta_go_spark.cdf import table_changes

        view = f"{name}__changes_{start}_{end if end is not None else 'latest'}"
        table_changes(
            self.spark, self._tables[name], start, end
        ).createOrReplaceTempView(view)
        return view

    def _view_for_changes_ts(
        self, name: str, start_text: str, end_text: str | None
    ) -> str:
        """table_changes(name, '<ts>' [, '<ts>']) — timestamp-argument form
        of Delta's CDF TVF (bounds resolve first-at-or-after /
        last-at-or-before)."""
        from delta_go_spark.cdf import table_changes

        def millis(text: str) -> int:
            try:
                ts = datetime.datetime.fromisoformat(text)
            except ValueError as e:
                raise ValueError(
                    f"table_changes({name!r}, ...): quoted argument {text!r} "
                    "must be an ISO timestamp (use unquoted integers for "
                    "version bounds)"
                ) from e
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=datetime.timezone.utc)
            return int(ts.timestamp() * 1000)

        start_ms = millis(start_text)
        end_ms = millis(end_text) if end_text is not None else None
        view = f"{name}__changes_ts_{start_ms}_{end_ms if end_ms is not None else 'latest'}"
        table_changes(
            self.spark,
            self._tables[name],
            start_timestamp=start_ms,
            end_timestamp=end_ms,
        ).createOrReplaceTempView(view)
        return view

    # -- SQL DML statements -------------------------------------------------
    def _dml_statement(self, text: str) -> DataFrame | None:
        """DELETE FROM t WHERE ... / UPDATE t SET c = lit [, ...] WHERE ...
        / TRUNCATE TABLE t / MERGE INTO t USING s ON ... WHEN ... — routed
        through the engine's DML (predicates
        parse into the Expression AST, so file pruning applies exactly as
        in the Python API).  Returns a 1-row (version) frame, or None when
        the text is not a DML statement."""
        from delta_go_spark.expressions import TRUE
        from delta_go_spark.sqlpred import (
            parse_literal,
            parse_predicate,
            split_where,
        )
        from delta_go_spark.table import DeltaTable

        stripped = text.strip().rstrip(";")
        names = "|".join(re.escape(n) for n in self._tables) or r"(?!x)x"

        def result(version: int) -> DataFrame:
            return self.spark.createDataFrame([(version,)], "version long")

        def resolve(name: str) -> DeltaTable:
            return DeltaTable.for_path(
                self.spark, self._tables[self._key_for(name)]
            )

        m = re.fullmatch(
            rf"\s*DELETE\s+FROM\s+({names})\b(.*)",
            stripped,
            flags=re.IGNORECASE | re.DOTALL,
        )
        if m:
            t = resolve(m.group(1))
            head, where = split_where(m.group(2))
            if head:
                raise ValueError(f"unexpected text after table name: {head!r}")
            schema = t.log.snapshot().metadata().schema()
            # no WHERE = delete every row (SQL semantics)
            pred = parse_predicate(where, schema) if where else TRUE
            return result(t.delete(pred))

        m = re.fullmatch(
            rf"\s*UPDATE\s+({names})\s+SET\s+(.+)",
            stripped,
            flags=re.IGNORECASE | re.DOTALL,
        )
        if m:
            from pyspark.sql import functions as F

            t = resolve(m.group(1))
            schema = t.log.snapshot().metadata().schema()
            # split SET text from WHERE outside string literals — a regex
            # would cut inside a value like 'a where b'
            set_text, where = split_where(m.group(2))
            pred = parse_predicate(where, schema) if where else TRUE
            fields = {f.name.lower(): f for f in schema.fields}
            assignments = {}
            for part in _split_top_level_commas(set_text):
                am = re.fullmatch(
                    r"\s*([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+?)\s*", part
                )
                if not am or am.group(1).lower() not in fields:
                    raise ValueError(f"cannot parse SET clause: {part!r}")
                col, lit_text = am.group(1), am.group(2)
                lit = parse_literal(lit_text, col, schema)
                field = fields[col.lower()]
                assignments[field.name] = F.lit(lit.value).cast(field.dataType)
            return result(t.update(pred, assignments))

        m = re.fullmatch(
            rf"\s*TRUNCATE\s+TABLE\s+({names})\s*",
            stripped,
            flags=re.IGNORECASE,
        )
        if m:
            return result(resolve(m.group(1)).truncate())

        # CONVERT TO DELTA '<path>' [PARTITIONED BY (a, b)] — in-place
        # conversion of an existing parquet directory (op/names.go CONVERT)
        m = re.fullmatch(
            r"\s*CONVERT\s+TO\s+DELTA\s+'([^']+)'"
            r"(?:\s+PARTITIONED\s+BY\s*\(([^)]*)\))?\s*",
            stripped,
            flags=re.IGNORECASE,
        )
        if m:
            from delta_go_spark.maintenance import convert_to_delta

            parts = (
                [c.strip() for c in m.group(2).split(",") if c.strip()]
                if m.group(2) is not None
                else None
            )
            return result(
                convert_to_delta(self.spark, m.group(1), partition_by=parts)
            )

        m = re.fullmatch(
            rf"\s*MERGE\s+INTO\s+({names})(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?"
            rf"\s+USING\s+([A-Za-z_]\w*)(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?"
            rf"\s+ON\s+(.+?)((?:\s+WHEN\s+.+)+)",
            stripped,
            flags=re.IGNORECASE | re.DOTALL,
        )
        if m:
            return result(self._merge_statement(*m.groups()))

        # -- utility statements (Delta SQL surface) -------------------------
        m = re.fullmatch(
            rf"\s*DESCRIBE\s+HISTORY\s+({names})(?:\s+LIMIT\s+(\d+))?\s*",
            stripped,
            flags=re.IGNORECASE,
        )
        if m:
            t = resolve(m.group(1))
            import json as _json

            # newest first, fetching ONLY the requested commits: LIMIT on
            # a long-history table must not read every version's log JSON
            latest = t.log.update().version
            lim = int(m.group(2)) if m.group(2) is not None else latest + 1
            infos = [
                t.log.commit_info_at(v)
                for v in range(latest, max(-1, latest - lim), -1)
            ]
            rows = [
                (
                    ci.version,
                    ci.timestamp,
                    ci.operation,
                    _json.dumps(ci.operation_parameters or {}, sort_keys=True),
                    ci.read_version,
                    ci.is_blind_append,
                )
                for ci in infos
            ]
            return self.spark.createDataFrame(
                rows,
                "version long, timestamp_ms long, operation string, "
                "operation_parameters string, read_version long, "
                "is_blind_append boolean",
            )

        m = re.fullmatch(
            rf"\s*OPTIMIZE\s+({names})"
            rf"(?:\s+WHERE\s+(.+?))?"
            rf"(?:\s+ZORDER\s+BY\s*\(\s*([A-Za-z0-9_\s,]+?)\s*\))?\s*",
            stripped,
            flags=re.IGNORECASE | re.DOTALL,
        )
        if m:
            t = resolve(m.group(1))
            pred = None
            if m.group(2):
                schema = t.log.snapshot().metadata().schema()
                pred = parse_predicate(m.group(2), schema)
            if m.group(3):
                if pred is not None:
                    raise ValueError(
                        "OPTIMIZE ... WHERE with ZORDER BY is not supported"
                    )
                cols = [c.strip() for c in m.group(3).split(",") if c.strip()]
                v = t.zorder(cols)
            else:
                v = t.optimize(predicate=pred)
            # None = nothing to compact; report the (unchanged) version
            return result(v if v is not None else t.version())

        m = re.fullmatch(
            rf"\s*DESCRIBE\s+DETAIL\s+({names})\s*",
            stripped,
            flags=re.IGNORECASE,
        )
        if m:
            t = resolve(m.group(1))
            snap = t.log.update()
            meta = snap.metadata()
            files = snap.all_files()
            return self.spark.createDataFrame(
                [
                    (
                        "delta",
                        meta.id,
                        meta.name,
                        self._tables[self._key_for(m.group(1))],
                        list(meta.partition_columns),
                        len(files),
                        sum(f.size for f in files),
                        snap.version,
                        meta.configuration or {},
                    )
                ],
                "format string, id string, name string, location string, "
                "partition_columns array<string>, num_files long, "
                "size_in_bytes long, version long, "
                "properties map<string,string>",
            )

        m = re.fullmatch(
            rf"\s*RESTORE\s+(?:TABLE\s+)?({names})\s+TO\s+"
            rf"(?:VERSION\s+AS\s+OF\s+(\d+)|TIMESTAMP\s+AS\s+OF\s+'([^']+)')\s*",
            stripped,
            flags=re.IGNORECASE,
        )
        if m:
            t = resolve(m.group(1))
            if m.group(2) is not None:
                return result(t.restore(int(m.group(2))))
            ts = datetime.datetime.fromisoformat(m.group(3))
            if ts.tzinfo is None:
                ts = ts.replace(tzinfo=datetime.timezone.utc)
            return result(t.restore_to_timestamp(int(ts.timestamp() * 1000)))

        m = re.fullmatch(
            rf"\s*VACUUM\s+({names})"
            rf"(?:\s+RETAIN\s+(\d+)\s+HOURS)?(\s+DRY\s+RUN)?\s*",
            stripped,
            flags=re.IGNORECASE,
        )
        if m:
            t = resolve(m.group(1))
            retention = (
                int(m.group(2)) * 3_600_000 if m.group(2) is not None else None
            )
            deleted = t.vacuum(
                retention_millis=retention, dry_run=bool(m.group(3))
            )
            return self.spark.createDataFrame(
                [(p,) for p in deleted], "path string"
            )

        # ANALYZE TABLE t COMPUTE DELTA STATISTICS — footer-stats backfill
        # for files from stats-less writers (OSS Delta's statement shape).
        m = re.fullmatch(
            rf"\s*ANALYZE\s+TABLE\s+({names})\s+COMPUTE\s+DELTA\s+"
            rf"STATISTICS\s*",
            stripped,
            flags=re.IGNORECASE,
        )
        if m:
            t = resolve(m.group(1))
            v = t.compute_stats()
            # no-op (nothing missing) still reports the current version,
            # matching the OPTIMIZE statement's convention
            return result(v if v is not None else t.version())

        # ALTER TABLE t ADD COLUMN[S] (c1 type1 [, ...]) — metadata-only
        # schema evolution (the one legal in-place change); old files read
        # the new columns as typed NULLs.
        m = re.fullmatch(
            rf"\s*ALTER\s+TABLE\s+({names})\s+ADD\s+COLUMNS?\b\s*(.+?)\s*",
            stripped,
            flags=re.IGNORECASE | re.DOTALL,
        )
        if m:
            from pyspark.sql.types import StructType

            t = resolve(m.group(1))
            ddl = m.group(2).strip()
            if ddl.startswith("(") and ddl.endswith(")"):
                # strip ONE optional outer paren layer; column types may
                # themselves carry parens (decimal(10,2)), so fall back to
                # the raw text when the stripped form fails to parse
                try:
                    fields = StructType.fromDDL(ddl[1:-1]).fields
                except Exception:
                    fields = StructType.fromDDL(ddl).fields
            else:
                fields = StructType.fromDDL(ddl).fields
            # nullability is enforced in DeltaTable.add_columns, so the
            # Python API path is covered too
            return result(t.add_columns(list(fields)))

        # ALTER TABLE t ADD CONSTRAINT name CHECK (expr) / DROP CONSTRAINT
        m = re.fullmatch(
            rf"\s*ALTER\s+TABLE\s+({names})\s+ADD\s+CONSTRAINT\s+"
            rf"([A-Za-z_]\w*)\s+CHECK\s*\((.+)\)\s*",
            stripped,
            flags=re.IGNORECASE | re.DOTALL,
        )
        if m:
            t = resolve(m.group(1))
            return result(t.add_check_constraint(m.group(2), m.group(3)))
        m = re.fullmatch(
            rf"\s*ALTER\s+TABLE\s+({names})\s+DROP\s+CONSTRAINT\s+"
            rf"([A-Za-z_]\w*)\s*",
            stripped,
            flags=re.IGNORECASE,
        )
        if m:
            t = resolve(m.group(1))
            return result(t.drop_check_constraint(m.group(2)))

        # ALTER TABLE t SET TBLPROPERTIES ('k' = 'v' [, ...])
        m = re.fullmatch(
            rf"\s*ALTER\s+TABLE\s+({names})\s+SET\s+TBLPROPERTIES\s*"
            rf"\((.+)\)\s*",
            stripped,
            flags=re.IGNORECASE | re.DOTALL,
        )
        if m:
            t = resolve(m.group(1))
            # the WHOLE list must be well-formed quoted pairs — a partial
            # finditer would silently drop malformed pairs (e.g. an
            # unquoted value) while applying the rest
            pair = r"'(?:[^']|'')*'\s*=\s*'(?:[^']|'')*'"
            if not re.fullmatch(
                rf"\s*{pair}(?:\s*,\s*{pair})*\s*", m.group(2), flags=re.DOTALL
            ):
                raise ValueError(
                    f"malformed TBLPROPERTIES (every key and value must be "
                    f"single-quoted): {m.group(2)!r}"
                )
            props: dict[str, str] = {}
            for kv in re.finditer(
                r"'((?:[^']|'')*)'\s*=\s*'((?:[^']|'')*)'", m.group(2)
            ):
                props[kv.group(1).replace("''", "'")] = kv.group(2).replace(
                    "''", "'"
                )
            return result(t.set_properties(props))

        # CREATE TABLE new [SHALLOW|DEEP] CLONE t LOCATION '<path>' — the
        # clone registers under the new name for subsequent statements.
        m = re.fullmatch(
            rf"\s*CREATE\s+TABLE\s+([A-Za-z_]\w*)\s+(SHALLOW|DEEP)?\s*"
            rf"CLONE\s+({names})\s+LOCATION\s+'([^']+)'\s*",
            stripped,
            flags=re.IGNORECASE,
        )
        if m:
            new_name = m.group(1)
            if any(k.lower() == new_name.lower() for k in self._tables):
                raise ValueError(
                    f"table name already registered: {new_name!r} — "
                    "rebinding it to the clone would silently redirect "
                    "every later statement"
                )
            t = resolve(m.group(3))
            deep = (m.group(2) or "SHALLOW").upper() == "DEEP"
            c = t.clone_deep(m.group(4)) if deep else t.clone_shallow(m.group(4))
            self.register(m.group(1), m.group(4))
            return result(c.version())

        # Metadata-only COUNT(*): a bare full-table count never scans data —
        # it sums numRecords over the log (scan.metadata_only_count), the
        # O(#files) fast path Delta engines implement.  Only the exact bare
        # form is intercepted; any WHERE/joins go through Spark as usual.
        m = re.fullmatch(
            rf"\s*SELECT\s+COUNT\s*\(\s*\*\s*\)(?:\s+AS\s+([A-Za-z_]\w*))?"
            rf"\s+FROM\s+({names})\s*",
            stripped,
            flags=re.IGNORECASE,
        )
        if m:
            alias = m.group(1) or "count"
            return self.spark.createDataFrame(
                [(resolve(m.group(2)).count(),)], f"{alias} long"
            )
        return None

    def _merge_statement(
        self,
        target: str,
        target_alias: str | None,
        source: str,
        source_alias: str | None,
        on_text: str,
        clauses_text: str,
    ) -> int:
        """MERGE INTO t [AS a] USING s [AS b] ON <equi-key>
             [WHEN MATCHED THEN UPDATE SET c = <b.c | literal> [, ...]
              | WHEN MATCHED THEN DELETE]
             [WHEN NOT MATCHED THEN INSERT *]

        The Delta MERGE surface (reference: op/names.go MERGE), restricted
        to the engine's upsert shape: one equi-join key, UPDATE-from-source
        or literal assignments, INSERT *.  `s` resolves to another
        registered Delta table's current snapshot, else to any Spark
        table/temp view.  Routed through DeltaTable.merge, so conflict
        detection, CDF, constraints and generated columns all apply."""
        from pyspark.sql import functions as F

        from delta_go_spark.sqlpred import parse_literal
        from delta_go_spark.table import DeltaTable

        t = DeltaTable.for_path(
            self.spark, self._tables[self._key_for(target)]
        )
        try:
            src_key = self._key_for(source)
        except ValueError:
            src_key = None
        if src_key is not None:
            src_df = DeltaLog.for_table(self._tables[src_key]).update().to_df(
                self.spark
            )
        else:
            src_df = self.spark.table(source)

        t_names = {n.lower() for n in (target, target_alias) if n}
        s_names = {n.lower() for n in (source, source_alias) if n}

        # ON: qualified or bare single equi-key; different source/target
        # column names are allowed (the source side is renamed to match).
        om = re.fullmatch(
            r"\s*(?:([A-Za-z_]\w*)\.)?([A-Za-z_]\w*)\s*=\s*"
            r"(?:([A-Za-z_]\w*)\.)?([A-Za-z_]\w*)\s*",
            on_text,
            flags=re.DOTALL,
        ) or re.fullmatch(r"\s*([A-Za-z_]\w*)\s*", on_text)
        if om is None:
            raise ValueError(f"MERGE: cannot parse ON condition: {on_text!r}")
        if len(om.groups()) == 1:
            on_col = src_col = om.group(1)
        else:
            q1, c1, q2, c2 = om.groups()
            if q1 and q1.lower() in s_names or q2 and q2.lower() in t_names:
                c1, c2 = c2, c1  # written source-first; normalize
            on_col, src_col = c1, c2
        if src_col.lower() != on_col.lower():
            src_df = src_df.withColumnRenamed(src_col, on_col)

        schema = t.log.snapshot().metadata().schema()
        fields = {f.name.lower(): f for f in schema.fields}
        update_set: dict | None = None
        delete_matched = False
        insert_not_matched = False
        seen = 0
        for cm in re.finditer(
            r"WHEN\s+MATCHED\s+THEN\s+DELETE"
            r"|WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+(.+?)(?=\s+WHEN\s+|\s*$)"
            r"|WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*",
            clauses_text,
            flags=re.IGNORECASE | re.DOTALL,
        ):
            seen += 1
            text = cm.group(0)
            if re.match(r"WHEN\s+NOT", text, re.IGNORECASE):
                insert_not_matched = True
            elif re.search(r"THEN\s+DELETE", text, re.IGNORECASE):
                delete_matched = True
            else:
                update_set = {}
                for part in _split_top_level_commas(cm.group(1)):
                    am = re.fullmatch(
                        r"\s*([A-Za-z_]\w*)\s*=\s*(.+?)\s*", part, re.DOTALL
                    )
                    if not am or am.group(1).lower() not in fields:
                        raise ValueError(
                            f"MERGE: cannot parse SET clause: {part!r}"
                        )
                    col = fields[am.group(1).lower()]
                    rhs = am.group(2)
                    rm = re.fullmatch(
                        r"(?:([A-Za-z_]\w*)\.)?([A-Za-z_]\w*)", rhs
                    )
                    if rm and (
                        (rm.group(1) or "").lower() in s_names
                        or rm.group(1) is None
                        and rm.group(2).lower() in
                        {c.lower() for c in src_df.columns}
                        and not re.fullmatch(
                            r"true|false|null", rm.group(2), re.IGNORECASE
                        )
                    ):
                        rhs_col = rm.group(2)
                        # The source join column is aliased `_mk` (not
                        # `_s_<col>`) inside DeltaTable.merge, and ON may
                        # additionally have renamed it (src_col -> on_col)
                        # — a SET rhs naming it by EITHER name must map to
                        # _mk or it resolves to a nonexistent column.
                        if rhs_col.lower() in (src_col.lower(), on_col.lower()):
                            update_set[col.name] = F.col("_mk")
                        else:
                            update_set[col.name] = F.col(f"_s_{rhs_col}")
                    else:
                        lit = parse_literal(rhs, col.name, schema)
                        update_set[col.name] = F.lit(lit.value).cast(
                            col.dataType
                        )
        # The UPDATE alternative is bounded by the SAME lookahead the
        # finditer uses — an unbounded lazy `.+?` under DOTALL would
        # absorb a trailing unsupported clause (e.g. a conditional
        # `WHEN MATCHED AND ... THEN DELETE`) and silently drop it.  The
        # WHEN-count cross-check catches anything that still slips both
        # regexes (raise, never execute a partial merge).
        n_when = len(
            re.findall(
                r"\bWHEN\s+(?:NOT\s+)?MATCHED\b", clauses_text, re.IGNORECASE
            )
        )
        if not seen or seen != n_when or not re.fullmatch(
            r"(?:\s*WHEN\s+(?:NOT\s+)?MATCHED\s+THEN\s+(?:DELETE|UPDATE\s+SET"
            r"\s+.+?(?=\s+WHEN\s+|\s*$)|INSERT\s+\*)\s*){1,3}",
            clauses_text,
            flags=re.IGNORECASE | re.DOTALL,
        ):
            raise ValueError(
                f"MERGE: cannot parse WHEN clauses: {clauses_text!r}"
            )
        return t.merge(
            src_df,
            on=on_col,
            update_set=update_set,
            delete_matched=delete_matched,
            insert_not_matched=insert_not_matched,
        )

    def sql(self, text: str) -> DataFrame:
        dml = self._dml_statement(text)
        if dml is not None:
            return dml
        out = text
        for name in self._tables:
            # regex-safe table name: registered names may contain metachars
            pat = re.escape(name)
            # table_changes(name, start [, end]) — Delta's CDF TVF syntax
            def sub_c(m, _name=name):
                end = int(m.group(2)) if m.group(2) is not None else None
                return self._view_for_changes(_name, int(m.group(1)), end)

            out = re.sub(
                rf"\btable_changes\s*\(\s*['\"]?{pat}['\"]?\s*,\s*(\d+)"
                rf"(?:\s*,\s*(\d+))?\s*\)",
                sub_c,
                out,
                flags=re.IGNORECASE,
            )

            # table_changes(name, '<timestamp>' [, '<timestamp>'])
            def sub_cts(m, _name=name):
                return self._view_for_changes_ts(_name, m.group(1), m.group(2))

            out = re.sub(
                rf"\btable_changes\s*\(\s*['\"]?{pat}['\"]?\s*,\s*'([^']+)'"
                rf"(?:\s*,\s*'([^']+)')?\s*\)",
                sub_cts,
                out,
                flags=re.IGNORECASE,
            )
            # VERSION AS OF <n>
            def sub_v(m, _name=name):
                return self._view_for_version(_name, int(m.group(1)))

            out = re.sub(
                rf"\b{pat}\s+VERSION\s+AS\s+OF\s+(\d+)",
                sub_v,
                out,
                flags=re.IGNORECASE,
            )

            # TIMESTAMP AS OF '<ts>'
            def sub_t(m, _name=name):
                return self._view_for_timestamp(_name, m.group(1))

            out = re.sub(
                rf"\b{pat}\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'",
                sub_t,
                out,
                flags=re.IGNORECASE,
            )

            # plain references get the CURRENT snapshot
            if re.search(rf"\b{pat}\b", out):
                DeltaLog.for_table(self._tables[name]).update().to_df(
                    self.spark
                ).createOrReplaceTempView(name)
        return self.spark.sql(out)
