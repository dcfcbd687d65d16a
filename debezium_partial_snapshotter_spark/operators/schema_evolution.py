"""Transactional schema evolution: add-column and type-widen (north rule).

The reference motivates partial re-snapshots with exactly this scenario —
recovering tables whose schema migration broke (``README.md:11``). Here
evolution is first-class: when an incoming batch's payload struct has new
nullable columns or widened integer types, the merged schema commits in
the SAME manifest swap as the batch's data (LakeTable.replace_buckets
``new_schema=``), so readers never observe data ahead of its schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StructField,
    StructType,
)

_WIDENING: dict[tuple[str, str], DataType] = {
    ("short", "integer"): IntegerType(),
    ("short", "long"): LongType(),
    ("integer", "long"): LongType(),
    ("integer", "short"): IntegerType(),
    ("long", "integer"): LongType(),
    ("long", "short"): LongType(),
    ("float", "double"): DoubleType(),
    ("double", "float"): DoubleType(),
}


def _widen(a: DataType, b: DataType) -> DataType:
    if a == b:
        return a
    key = (a.typeName(), b.typeName())
    if key in _WIDENING:
        return _WIDENING[key]
    raise TypeError(f"incompatible evolution {a} -> {b}")


def merge_schemas(table_schema: StructType, batch_schema: StructType) -> StructType:
    """Table schema ∪ batch schema with integer/float widening; new
    columns append as nullable. Raises on incompatible changes (a rename
    or narrow is an operator error, same policy as Iceberg)."""
    out: list[StructField] = []
    batch_by_name = {f.name: f for f in batch_schema.fields}
    seen = set()
    for f in table_schema.fields:
        seen.add(f.name)
        if f.name in batch_by_name:
            out.append(
                StructField(
                    f.name,
                    _widen(f.dataType, batch_by_name[f.name].dataType),
                    f.nullable or batch_by_name[f.name].nullable,
                )
            )
        else:
            out.append(f)
    for f in batch_schema.fields:
        if f.name not in seen:
            out.append(StructField(f.name, f.dataType, True))
    return StructType(out)


def conform(df: DataFrame, schema: StructType) -> DataFrame:
    """Project df to ``schema``: missing columns -> NULL, present columns
    cast (the widening direction only, guaranteed by merge_schemas)."""
    cols = []
    for f in schema.fields:
        if f.name in df.columns:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def schemas_equal(a: StructType, b: StructType) -> bool:
    """Name/type equality. Nullability is NOT schema evolution — parquet
    sources routinely loosen it and no reader-visible shape changes."""
    return [(f.name, f.dataType) for f in a.fields] == [
        (f.name, f.dataType) for f in b.fields
    ]
