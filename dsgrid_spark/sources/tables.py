"""Loaders for the driver-provided TPC-H-ish test tables (TESTDATA.md).

``events.ts`` has shipped in two physical encodings across testdata
generations: parquet TIMESTAMP(NANOS), which Spark reads only as a long
(``spark.sql.legacy.parquet.nanosAsLong``), and plain TIMESTAMP(MICROS),
which Spark reads natively. We detect which one we got and normalize to
a microsecond TimestampType column, matching DuckDB's nanos→micros
truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def prep_session(spark: SparkSession) -> SparkSession:
    """Runtime-settable conf needed to read the testdata deterministically."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prep_session(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # nanos-as-long encoding; integer division — ts exceeds 2^53,
            # double division would lose microsecond precision
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            # native micros encoding read as NTZ; session tz is UTC, so the
            # cast is instant-preserving and downstream ops see the same
            # TIMESTAMP (ltz) type as the nanos path produced
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}
