"""Reproducible sampling / capping for training-data pipelines.

``df.sample`` is seed-and-partitioning dependent: the same corpus
resampled after a repartition yields a different subset, which breaks
dataset reproducibility guarantees. These operators derive the decision
from a content hash (md5 of the key), so the same row always makes the
same cut — across runs, engines, and cluster layouts — and any engine
can recompute the subset for audit.

All JVM column expressions; the cap is one window (WindowGroupLimit
prunes per-partition before the shuffle for small caps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_BUCKETS = 1_000_000


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, 1e6): first 8 hex chars of
    md5(key||salt) as an integer. md5 (not xxhash64) so external engines
    can recompute membership."""
    return F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8),
        16, 10,
    ).cast("long") % _BUCKETS


def deterministic_sample(df: DataFrame, key_column: str, fraction: float,
                         salt: str = "") -> DataFrame:
    """Keep ~fraction of rows, chosen by content hash of the key.

    Change ``salt`` to draw an independent sample; the same
    (key, salt) always lands on the same side of the cut.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(fraction * _BUCKETS)
    return df.filter(hash_bucket(F.col(key_column), salt) < threshold)


def cap_per_group(df: DataFrame, group_columns: list[str], key_column: str,
                  max_rows: int, salt: str = "") -> DataFrame:
    """Keep at most ``max_rows`` rows per group, in deterministic
    hash-of-key order (a reproducible 'at most N docs per domain' cap —
    the standard de-biasing step before training-data mixing).
    """
    w = Window.partitionBy(*group_columns).orderBy(
        hash_bucket(F.col(key_column), salt), F.col(key_column)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_rows)
        .drop("__rn")
    )
