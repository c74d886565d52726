"""Loaders for the driver-provided TPC-H-ish test tables (TESTDATA.md).

``events.ts`` is stored as parquet TIMESTAMP(NANOS); Spark reads it only
as a long (``spark.sql.legacy.parquet.nanosAsLong``) — we convert to a
microsecond TimestampType column, matching DuckDB's nanos→micros
truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

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
        # integer division: ts exceeds 2^53, double division would lose
        # microsecond precision
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str,
                names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLE_NAMES)}
