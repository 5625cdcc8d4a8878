"""Field-id based schema versioning: add / rename / type-widen.

Mirrors the *semantics* of the reference's migration-with-backfill scheme
(``/root/reference/db/migrations/parser/20221108151545_divided_commission_signed_lp.up.sql``
adds columns; ``20260406161622_add_tx_type_burn.up.sql`` extends an enum;
``20260514121725_add_first_invalid_height.up.sql`` adds a nullable column) in
the Iceberg way: every column has a stable numeric id; renames change only the
display name; widenings change only the type; reads of old data files are
aligned to the current schema by id.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TYPE_MAP = {
    "string": T.StringType(),
    "binary": T.BinaryType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "smallint": T.ShortType(),
    "tinyint": T.ByteType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
}

# widenings that are lossless (Iceberg-compatible set)
_WIDEN_OK = {
    ("int", "long"),
    ("int", "double"),
    ("long", "double"),
    ("float", "double"),
}

_CANON = {"bigint": "long", "integer": "int"}


def _canon_type(s: str) -> str:
    return _CANON.get(s, s)


def _parse_type(s: str) -> T.DataType:
    if s in _TYPE_MAP:
        return _TYPE_MAP[s]
    if s.startswith(("decimal", "array", "map", "struct")):
        return T._parse_datatype_string(s)
    raise ValueError(f"unsupported lakehouse type: {s}")


@dataclass
class Field:
    id: int
    name: str
    type: str
    nullable: bool = True

    def to_dict(self) -> dict:
        return {"id": self.id, "name": self.name, "type": self.type, "nullable": self.nullable}


@dataclass
class TableSchema:
    """A versioned schema: list of Fields + monotone schema_version."""

    fields: list[Field] = field(default_factory=list)
    schema_version: int = 1

    # ---------- conversions ----------

    @classmethod
    def from_spark(cls, st: T.StructType) -> "TableSchema":
        fields = [
            Field(
                id=i + 1,
                name=f.name,
                type=_canon_type(f.dataType.simpleString()),
                nullable=f.nullable,
            )
            for i, f in enumerate(st.fields)
        ]
        return cls(fields=fields, schema_version=1)

    def to_spark(self) -> T.StructType:
        return T.StructType(
            [T.StructField(f.name, _parse_type(f.type), f.nullable) for f in self.fields]
        )

    def to_dict(self) -> dict:
        return {
            "schema_version": self.schema_version,
            "fields": [f.to_dict() for f in self.fields],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "TableSchema":
        return cls(
            fields=[Field(**f) for f in d["fields"]],
            schema_version=d["schema_version"],
        )

    def field_by_name(self, name: str) -> Field:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(name)

    def names(self) -> list[str]:
        return [f.name for f in self.fields]


def evolve(schema: TableSchema, change: str, spec: dict) -> TableSchema:
    """Apply one evolution step; returns a NEW TableSchema (version+1).

    change ∈ {add_column, rename_column, widen_type}; spec examples:
      {"name": "fetch_status", "type": "int"}
      {"old": "lang", "new": "language"}
      {"name": "fetch_status", "to": "long"}
    """
    fields = [Field(**f.to_dict()) for f in schema.fields]
    if change == "add_column":
        if any(f.name == spec["name"] for f in fields):
            raise ValueError(f"column exists: {spec['name']}")
        next_id = max((f.id for f in fields), default=0) + 1
        _parse_type(spec["type"])  # validate
        fields.append(Field(id=next_id, name=spec["name"], type=spec["type"], nullable=True))
    elif change == "rename_column":
        tgt = next((f for f in fields if f.name == spec["old"]), None)
        if tgt is None:
            raise KeyError(spec["old"])
        if any(f.name == spec["new"] for f in fields):
            raise ValueError(f"column exists: {spec['new']}")
        tgt.name = spec["new"]
    elif change == "widen_type":
        tgt = next((f for f in fields if f.name == spec["name"]), None)
        if tgt is None:
            raise KeyError(spec["name"])
        if (_canon_type(tgt.type), _canon_type(spec["to"])) not in _WIDEN_OK:
            raise ValueError(f"illegal widen {tgt.type} -> {spec['to']}")
        tgt.type = _canon_type(spec["to"])
    else:
        raise ValueError(f"unknown change: {change}")
    return TableSchema(fields=fields, schema_version=schema.schema_version + 1)


def align_to(df: DataFrame, file_schema: TableSchema, current: TableSchema) -> DataFrame:
    """Project a DataFrame read with ``file_schema`` into ``current`` shape.

    Columns are matched by field id (renames follow the id); missing ids
    become NULL (added columns); types are cast (widenings). This is the
    read-side half of schema evolution — old files never get rewritten.
    """
    by_id = {f.id: f for f in file_schema.fields}
    cols = []
    for f in current.fields:
        old = by_id.get(f.id)
        if old is None:
            cols.append(F.lit(None).cast(_parse_type(f.type)).alias(f.name))
        elif old.name == f.name and old.type == f.type:
            cols.append(F.col(f.name))
        else:
            cols.append(F.col(old.name).cast(_parse_type(f.type)).alias(f.name))
    return df.select(*cols)
