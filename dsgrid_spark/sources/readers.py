"""File readers with declared schemas.

Reference dsgrid/spark/functions.py:402-494 (parquet/csv/json shims),
dsgrid/config/file_schema.py:20-145 (declared FileSchema: presence check,
ignored columns, renames), dsgrid/utils/spark.py:204-294 (suffix dispatch).
Schemas are declared, never inferred (SURVEY §1.3).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

from pydantic import BaseModel, Field
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BooleanType, ByteType, DataType, DoubleType, FloatType, IntegerType,
    LongType, ShortType, StringType, StructField, StructType,
    TimestampNTZType, TimestampType,
)

# reference dsgrid/spark/types.py:52-68 SUPPORTED_TYPES
SUPPORTED_TYPES: dict[str, DataType] = {
    "bool": BooleanType(),
    "int8": ByteType(),
    "int16": ShortType(),
    "int32": IntegerType(),
    "int64": LongType(),
    "float32": FloatType(),
    "float64": DoubleType(),
    "timestamp_tz": TimestampType(),
    "timestamp_ntz": TimestampNTZType(),
    "string": StringType(),
}


class ColumnSchema(BaseModel):
    name: str
    dtype: str  # key into SUPPORTED_TYPES
    rename_to: Optional[str] = None


class FileSchema(BaseModel):
    """Declared file schema (reference file_schema.py:20-77)."""

    columns: list[ColumnSchema] = Field(default_factory=list)
    ignored_columns: list[str] = Field(default_factory=list)

    def to_struct(self) -> StructType:
        return StructType(
            [StructField(c.name, SUPPORTED_TYPES[c.dtype], True) for c in self.columns]
        )


def read_parquet(spark: SparkSession, path: str | Path) -> DataFrame:
    return spark.read.parquet(str(path))


def read_csv(spark: SparkSession, path: str | Path,
             schema: FileSchema | StructType | None = None) -> DataFrame:
    """Header CSV with a (possibly partial) declared column schema.

    The reference routes CSV through DuckDB to preserve NULLs and allow a
    partial schema (spark/functions.py:426-466); Spark handles both
    directly: read header'd strings, then cast only the declared columns.
    """
    raw = spark.read.csv(str(path), header=True)
    if schema is None:
        return raw
    struct = schema.to_struct() if isinstance(schema, FileSchema) else schema
    cols = []
    declared = {f.name: f.dataType for f in struct.fields}
    for c in raw.columns:
        cols.append(F.col(c).cast(declared[c]).alias(c) if c in declared else F.col(c))
    return raw.select(*cols)


def read_json(spark: SparkSession, path: str | Path) -> DataFrame:
    """Line-delimited JSON, FAILFAST (reference spark/functions.py:469-484)."""
    return spark.read.json(str(path), mode="FAILFAST")


def read_file(spark: SparkSession, path: str | Path,
              schema: FileSchema | None = None) -> DataFrame:
    """Suffix-dispatched reader + declared-schema application.

    Applies presence check, ignored-column drop, and renames
    (reference file_schema.py:80-145).
    """
    p = Path(path)
    suffix = p.suffix.lower()
    if suffix == ".parquet" or p.is_dir():
        df = read_parquet(spark, p)
    elif suffix == ".csv":
        df = read_csv(spark, p, schema)
    elif suffix == ".json":
        df = read_json(spark, p)
    else:
        raise ValueError(f"unsupported file type: {p}")
    if schema is None:
        return df
    missing = [c.name for c in schema.columns if c.name not in df.columns]
    if missing:
        raise ValueError(f"{p}: missing declared columns {missing}")
    df = df.drop(*[c for c in schema.ignored_columns if c in df.columns])
    for c in schema.columns:
        if c.rename_to:
            df = df.withColumnRenamed(c.name, c.rename_to)
    return df


def dataframe_from_records(spark: SparkSession, records: list[dict],
                           schema: str | StructType | None = None) -> DataFrame:
    """In-memory records → DF (reference utils/spark.py:129-170)."""
    if schema is not None:
        return spark.createDataFrame(records, schema)
    return spark.createDataFrame(records)


def dimension_cross_product(spark: SparkSession,
                            dimensions: dict[str, list[str]]) -> DataFrame:
    """Cross-product of dimension id lists → association DF.

    The reference spills through a temp CSV for scale
    (utils/spark.py:736-786); a fold of crossJoins over tiny single-column
    DFs keeps it fully distributed with no temp files — the product is
    built by the engine, never materialized on the driver.
    """
    out: DataFrame | None = None
    for name, ids in dimensions.items():
        piece = spark.createDataFrame([(i,) for i in ids], f"{name} string")
        out = piece if out is None else out.crossJoin(piece)
    if out is None:
        raise ValueError("no dimensions given")
    return out
