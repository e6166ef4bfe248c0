"""Database-metadata → Avro schema deriver — the avrogenerator analog.

The reference ships com.linkedin.datastream.avrogenerator: it inspects a
database table's column metadata (DatabaseSource.java:23-100) and emits an
Avro record schema whose fields carry db provenance in a ``meta`` string
(FieldMetadata.java:20-100; AvroJson.java:32-120). This module re-expresses
that surface in Python with the same observable semantics:

- the DB-type → Avro-type table mirrors Types.java:13-33 exactly
  (NUMBER maps to "string" with precision/scale in metadata — the
  reference's deliberate lossless-decimal choice);
- field ``meta`` strings use the same ``key=value;`` wire format parsed by
  FieldMetadata.parseMetadata (";"/"=" delimiters, trailing ";" legal);
- nullable columns become the union [type, "null"] with a null default
  (AvroJson.nullableType:76-84 — type first, then "null").

On top of the reference surface, two Spark-first additions: a Spark
StructType → Avro deriver (the engine's tables are Spark schemas) and a
DuckDB DESCRIBE adapter filling the DatabaseSource role so the generator
is fully exercisable in-sandbox (the reference needs a live Oracle/MySQL).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

#: Types.java:13-33, verbatim: database primitive name → Avro primitive.
DB_TO_AVRO: dict[str, str] = {
    "NUMBER": "string",  # lossless decimals: value + precision/scale meta
    "FLOAT": "float",
    "INTEGER": "int",
    "LONG": "long",
    "DOUBLE": "double",
    "RAW": "bytes",
    "LONG RAW": "bytes",
    "CLOB": "string",
    "NCLOB": "string",
    "VARCHAR": "string",
    "VARCHAR2": "string",
    "NVARCHAR": "string",
    "NVARCHAR2": "string",
    "TIMESTAMP": "long",
    "CHAR": "string",
    "DATE": "long",
    "BLOB": "bytes",
    "ARRAY": "array",
    "TABLE": "record",
    "XMLTYPE": "string",
}


def db_type_to_avro(db_type: str) -> str:
    """Types.fromString + getAvroType (spaces legal: "LONG RAW")."""
    t = db_type.strip().upper()
    if t not in DB_TO_AVRO:
        raise ValueError(f"unsupported database type: {db_type!r}")
    return DB_TO_AVRO[t]


def parse_field_meta(meta: str) -> dict[str, str]:
    """FieldMetadata.parseMetadata parity: "a=1;b=2;" → {"a": "1", "b": "2"}."""
    trimmed = meta[:-1] if meta.endswith(";") else meta
    out: dict[str, str] = {}
    for part in trimmed.split(";"):
        kv = part.split("=")
        if len(kv) != 2:
            raise ValueError(f"Ill-formatted meta key-value pair: {part}")
        out[kv[0]] = kv[1]
    return out


def format_field_meta(pairs: dict[str, str]) -> str:
    return "".join(f"{k}={v};" for k, v in pairs.items())


@dataclass
class ColumnMeta:
    """One column's database metadata (FieldMetadata.java:20-46).

    Nested types (FieldType.java:8-31's three kinds): a column whose
    db_type is ARRAY carries its single element type in ``element``
    (Oracle collections are strictly mono-typed — FieldType.java:27-29);
    a TABLE (struct) column carries its child columns in ``children``.
    ``type_name`` is the custom database type's name (e.g. SETTING,
    PHONE_NUMBERS) used to name the nested Avro record / array, matching
    AvroJson.arrayType's UPPER_UNDERSCORE -> lowerCamel rename
    (AvroJson.java:50-58) and recordType's name field
    (AvroJson.java:63-71). Elements/children recurse to any depth —
    arrays of structs of arrays all derive.
    """

    name: str
    db_type: str
    position: int
    nullable: bool = True
    precision: int | None = None
    scale: int | None = None
    element: "ColumnMeta | None" = None
    children: "list[ColumnMeta] | None" = None
    type_name: str | None = None

    def meta_string(self) -> str:
        pairs = {
            "dbFieldName": self.name,
            "dbFieldPosition": str(self.position),
            "dbFieldType": self.db_type.strip().upper(),
        }
        if self.precision is not None:
            pairs["numberPrecision"] = str(self.precision)
        if self.scale is not None:
            pairs["numberScale"] = str(self.scale)
        if self.nullable:
            pairs["nullable"] = "Y"
        return format_field_meta(pairs)

    @classmethod
    def from_meta_string(cls, meta: str, *, position: int | None = None) -> "ColumnMeta":
        m = parse_field_meta(meta)
        return cls(
            name=m["dbFieldName"],
            db_type=m["dbFieldType"],
            position=position if position is not None else int(m["dbFieldPosition"]),
            nullable=m.get("nullable", "") == "Y",
            precision=int(m["numberPrecision"]) if "numberPrecision" in m else None,
            scale=int(m["numberScale"]) if "numberScale" in m else None,
        )


def _lower_camel(upper_underscore: str) -> str:
    """UPPER_UNDERSCORE -> lowerCamel (AvroJson.arrayType's rename)."""
    parts = upper_underscore.strip().lower().split("_")
    return parts[0] + "".join(p.capitalize() for p in parts[1:])


def _avro_type(col: ColumnMeta) -> object:
    """The Avro TYPE value for a column: a primitive name string, or the
    nested array/record document (AvroJson.arrayType/recordType parity)."""
    avro_type = db_type_to_avro(col.db_type)
    if avro_type == "array":
        if col.element is None:
            raise ValueError(
                f"column {col.name!r}: ARRAY requires an `element` type "
                "(Oracle collections are strictly mono-typed)"
            )
        return {
            "type": "array",
            # AvroJson.arrayType:50-58 names the array after the custom
            # collection type, lower-camelized
            "name": _lower_camel(col.type_name or col.name),
            "items": _avro_type(col.element),
        }
    if avro_type == "record":
        if not col.children:
            raise ValueError(
                f"column {col.name!r}: TABLE (struct) requires `children`"
            )
        name = col.type_name or col.name
        return {
            "type": "record",
            "name": name,
            "meta": format_field_meta({"dbTableName": name}),
            "fields": [
                _avro_field(c)
                for c in sorted(col.children, key=lambda c: c.position)
            ],
        }
    return avro_type


def _avro_field(col: ColumnMeta) -> dict:
    avro_type = _avro_type(col)
    field: dict = {"name": col.name, "meta": col.meta_string()}
    if col.nullable:
        # AvroJson.nullableType order: the real type first, then "null"
        field["type"] = [avro_type, "null"]
        field["default"] = None  # AvroJson.nullDefault
    else:
        field["type"] = avro_type
    return field


def generate_table_schema(
    schema_name: str,
    table_name: str,
    columns: list[ColumnMeta],
    namespace: str = "com.example.events",
    primary_keys: list[str] | None = None,
) -> dict:
    """The SchemaGenerator flow: table metadata in, Avro record out.

    Record-level ``meta`` carries dbTableName/dbSchemaName (and pk=… when
    primary keys are known — the FieldMetadata doc example shows exactly
    this "dbTableName=…;pk=…;" shape).
    """
    meta = {"dbSchemaName": schema_name, "dbTableName": table_name}
    if primary_keys:
        meta["pk"] = ",".join(primary_keys)
    return {
        "type": "record",
        "name": table_name,
        "namespace": namespace,
        "doc": f"Auto-generated Avro schema for {schema_name}.{table_name}",
        "meta": format_field_meta(meta),
        "fields": [_avro_field(c) for c in sorted(columns, key=lambda c: c.position)],
    }


# --------------------------------------------------------------------------
# Spark-first surfaces
# --------------------------------------------------------------------------

#: Spark SQL type name → (db type enum, avro type) for the engine's own
#: tables; decimals go the reference's NUMBER→string route.
_SPARK_TO_DB = {
    "string": "VARCHAR",
    "int": "INTEGER",
    "integer": "INTEGER",
    "bigint": "LONG",
    "long": "LONG",
    "float": "FLOAT",
    "double": "DOUBLE",
    "binary": "BLOB",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "date": "DATE",
    "boolean": "INTEGER",  # reference has no BOOLEAN; 0/1 int convention
}


def _spark_field_to_col(name: str, dtype, nullable: bool, position: int) -> ColumnMeta:
    """Recursive Spark DataType -> ColumnMeta (arrays/structs nest to any
    depth — the FieldType tree the reference models for Oracle custom
    types, derived here from the engine's own schema objects)."""
    from pyspark.sql import types as T

    if isinstance(dtype, T.DecimalType):
        return ColumnMeta(
            name, "NUMBER", position, nullable, dtype.precision, dtype.scale
        )
    if isinstance(dtype, T.ArrayType):
        elem = _spark_field_to_col(
            f"{name}_item", dtype.elementType, dtype.containsNull, 0
        )
        return ColumnMeta(
            name, "ARRAY", position, nullable,
            element=elem, type_name=name.upper(),
        )
    if isinstance(dtype, T.StructType):
        children = [
            _spark_field_to_col(f.name, f.dataType, f.nullable, i)
            for i, f in enumerate(dtype.fields)
        ]
        return ColumnMeta(
            name, "TABLE", position, nullable,
            children=children, type_name=name.upper(),
        )
    t = dtype.simpleString()
    db = _SPARK_TO_DB.get(t)
    if db is None:
        raise ValueError(f"no avro mapping for Spark type {t!r} ({name})")
    return ColumnMeta(name, db, position, nullable)


def spark_schema_to_avro(
    schema, table_name: str, schema_name: str = "spark", namespace: str = "com.example.events"
) -> dict:
    """Derive the Avro record for a Spark StructType (engine-native path).

    Decimal(p, s) maps to NUMBER → "string" with precision/scale metadata,
    byte-compatible with the reference's Oracle NUMBER handling; arrays
    and structs recurse into nested Avro array/record documents.
    """
    cols = [
        _spark_field_to_col(f.name, f.dataType, f.nullable, i)
        for i, f in enumerate(schema.fields)
    ]
    return generate_table_schema(schema_name, table_name, cols, namespace)


#: DuckDB DESCRIBE type → db type enum (the in-sandbox DatabaseSource).
_DUCK_TO_DB = {
    "VARCHAR": "VARCHAR",
    "BIGINT": "LONG",
    "INTEGER": "INTEGER",
    "SMALLINT": "INTEGER",
    "TINYINT": "INTEGER",
    "DOUBLE": "DOUBLE",
    "FLOAT": "FLOAT",
    "REAL": "FLOAT",
    "BLOB": "BLOB",
    "DATE": "DATE",
    "TIMESTAMP": "TIMESTAMP",
    "TIMESTAMP_NS": "TIMESTAMP",
    "BOOLEAN": "INTEGER",
}


def duckdb_table_schema(
    con, table_name: str, schema_name: str = "main", namespace: str = "com.example.events"
) -> dict:
    """DatabaseSource-over-DuckDB: DESCRIBE the table/view, derive Avro.

    Fills the reference's getTableMetadata role (DatabaseSource.java:74-77)
    so schema generation is executable against the sandbox's SQL engine.
    """
    rows = con.sql(f"DESCRIBE {table_name}").fetchall()
    cols: list[ColumnMeta] = []
    for i, r in enumerate(rows):
        name, duck_type, nullable = r[0], r[1], (r[2] or "YES") == "YES"
        dt = duck_type.upper()
        if dt.startswith("DECIMAL("):
            p, s = dt[len("DECIMAL(") : -1].split(",")
            cols.append(ColumnMeta(name, "NUMBER", i, nullable, int(p), int(s)))
            continue
        db = _DUCK_TO_DB.get(dt)
        if db is None:
            raise ValueError(f"no avro mapping for DuckDB type {dt!r} ({name})")
        cols.append(ColumnMeta(name, db, i, nullable))
    return generate_table_schema(schema_name, table_name, cols, namespace)


def schema_json(schema: dict) -> str:
    """Canonical JSON form (what the reference's AvroJson.toSchema parses)."""
    return json.dumps(schema, indent=2)
