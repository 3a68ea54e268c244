"""Delta schema handling: Delta's JSON schema format IS Spark's
(reference: types/type_parser.go:67-111), so `StructType.fromJson` /
`.json()` do the (de)serialization.  This module adds the validation and
write-compatibility semantics of the reference's types/type_utils.go.
"""

from __future__ import annotations

import json
import re

from pyspark.sql.types import (
    ArrayType,
    DataType,
    MapType,
    StructField,
    StructType,
)


class SchemaError(ValueError):
    pass


def schema_from_json(schema_string: str) -> StructType:
    """Parse Metadata.schemaString (reference: types/type_parser.go:113-156)."""
    return StructType.fromJson(json.loads(schema_string))


def schema_to_json(schema: StructType) -> str:
    """Emit the Delta/Spark JSON schema format (types/type_parser.go:67-111)."""
    return json.dumps(schema.jsonValue(), separators=(",", ":"))


# Characters parquet cannot carry in field names
# (reference: types/type_utils.go:204-234).
_INVALID_NAME_CHARS = re.compile(r"[ ,;{}()\n\t=]")


def explode_nested_field_names(schema: StructType) -> list[str]:
    """All field names at every nesting depth, dotted
    (reference: types/type_utils.go:236-288)."""
    out: list[str] = []

    def walk(prefix: str, dt: DataType) -> None:
        if isinstance(dt, StructType):
            for f in dt.fields:
                name = f"{prefix}.{f.name}" if prefix else f.name
                out.append(name)
                walk(name, f.dataType)
        elif isinstance(dt, ArrayType):
            walk(prefix, dt.elementType)
        elif isinstance(dt, MapType):
            walk(f"{prefix}.key" if prefix else "key", dt.keyType)
            walk(f"{prefix}.value" if prefix else "value", dt.valueType)

    walk("", schema)
    return out


def check_column_name_duplication(schema: StructType) -> None:
    """No duplicate names (case-insensitive) at any nesting depth
    (reference: types/type_utils.go:290-300)."""
    seen: set[str] = set()
    for name in explode_nested_field_names(schema):
        low = name.lower()
        if low in seen:
            raise SchemaError(f"found duplicate column(s): {name}")
        seen.add(low)


def check_field_names(names: list[str]) -> None:
    """Reject parquet-illegal characters in field names
    (reference: types/type_utils.go:204-234)."""
    for n in names:
        if _INVALID_NAME_CHARS.search(n):
            raise SchemaError(
                f"attribute name '{n}' contains an invalid character among ' ,;{{}}()\\n\\t='"
            )


def check_unenforceable_not_null(schema: StructType) -> None:
    """NOT NULL inside array/map elements cannot be enforced
    (reference: types/type_utils.go:23-48)."""

    def walk_type(dt: DataType, inside_collection: bool) -> None:
        if isinstance(dt, StructType):
            for f in dt.fields:
                if inside_collection and not f.nullable:
                    raise SchemaError(
                        f"NOT NULL constraint on field {f.name} inside a "
                        "non-struct collection type is not enforceable"
                    )
                walk_type(f.dataType, inside_collection)
        elif isinstance(dt, ArrayType):
            walk_type(dt.elementType, True)
        elif isinstance(dt, MapType):
            walk_type(dt.keyType, True)
            walk_type(dt.valueType, True)

    for f in schema.fields:
        walk_type(f.dataType, False)


def _find_field(struct: StructType, name: str) -> StructField | None:
    """Case-insensitive field lookup; names differing only by case are
    ambiguous (reference: types/type_utils.go:100-107)."""
    matches = [f for f in struct.fields if f.name.lower() == name.lower()]
    if len(matches) > 1:
        raise SchemaError(f"ambiguous (case-insensitively duplicate) field name: {name}")
    return matches[0] if matches else None


def is_write_compatible(existing: StructType, new: StructType) -> bool:
    """May `new` replace `existing` without breaking readers?

    Rules (reference: types/type_utils.go:109-133): every existing field
    must exist in new with the same datatype; nullable may not flip to
    non-nullable; new columns may be added.
    """

    def struct_compatible(old: StructType, newer: StructType) -> bool:
        for f in old.fields:
            try:
                nf = _find_field(newer, f.name)
            except SchemaError:
                return False
            if nf is None:
                return False
            if f.nullable and not nf.nullable:
                return False
            if not type_compatible(f.dataType, nf.dataType):
                return False
        return True

    def type_compatible(old: DataType, newer: DataType) -> bool:
        if isinstance(old, StructType) and isinstance(newer, StructType):
            return struct_compatible(old, newer)
        if isinstance(old, ArrayType) and isinstance(newer, ArrayType):
            if old.containsNull and not newer.containsNull:
                return False
            return type_compatible(old.elementType, newer.elementType)
        if isinstance(old, MapType) and isinstance(newer, MapType):
            if old.valueContainsNull and not newer.valueContainsNull:
                return False
            return type_compatible(old.keyType, newer.keyType) and type_compatible(
                old.valueType, newer.valueType
            )
        return old == newer

    return struct_compatible(existing, new)


def validate_schema(schema: StructType) -> None:
    """Full validation suite run on metadata update
    (reference: trnx.go:347-374)."""
    check_column_name_duplication(schema)
    check_field_names(explode_nested_field_names(schema))
    check_unenforceable_not_null(schema)


def validate_partition_columns(schema: StructType, partition_columns: list[str]) -> None:
    """Partition columns must exist in the schema and must not be ALL the
    columns (reference: trnx.go:376-388)."""
    names = {f.name.lower() for f in schema.fields}
    for c in partition_columns:
        if c.lower() not in names:
            raise SchemaError(f"partition column {c} not found in schema")
    if schema.fields and len(partition_columns) >= len(schema.fields):
        raise SchemaError("data written into a Delta table must contain at least one non-partitioned column")
