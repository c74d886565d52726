"""Missing-association pattern mining — Spark-native re-expression of the
reference's Rust diagnostic (rust/src/lib.rs:477-630 find_minimal_patterns,
invoked from dsgrid/utils/dataset.py:256-293).

When registration finds missing dimension combinations, a raw list of
missing rows is unreadable at scale; the useful output is the MINIMAL
CLOSED patterns — "geography=06037 x (every metric) x (every hour) is
missing" — that compactly explain the gap.

Semantics mirrored from the Rust: a pattern (columns=values) is CLOSED
when its matching rows cover the full cross product of every other
column's observed values; it is MINIMAL when no sub-pattern of it is
already closed. The Rust edition walks an in-memory bitmap index;
Spark-first this is level-wise distributed groupBys — candidate
generation per level is one aggregation over the missing table, so the
miner works on a billion-row missing set, which the bitmap never could.
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import combinations

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class MissingPattern:
    columns: tuple[str, ...]
    values: tuple[str, ...]
    num_rows: int

    def __str__(self) -> str:
        cols = " | ".join(self.columns)
        vals = " | ".join(self.values)
        return f"{cols} = {vals} ({self.num_rows} missing rows)"


def find_missing_patterns(missing: DataFrame,
                          max_columns: int | None = None,
                          limit: int = 1000) -> list[MissingPattern]:
    """Minimal closed patterns in a missing-associations table.

    ``missing`` has one row per absent dimension combination (the
    expected-minus-actual anti-join). Returns at most ``limit`` patterns,
    smallest column count first.
    """
    columns = missing.columns
    if not columns:
        return []
    missing = missing.distinct().persist()
    try:
        distinct_counts = missing.agg(*[
            F.count_distinct(F.col(c)).alias(c) for c in columns
        ]).collect()[0].asDict()

        patterns: list[MissingPattern] = []
        covered: set[tuple[tuple[str, str], ...]] = set()
        max_k = min(len(columns), max_columns or len(columns))
        for k in range(1, max_k + 1):
            for subset in combinations(columns, k):
                others = [c for c in columns if c not in subset]
                required = 1
                for c in others:
                    required *= distinct_counts[c]
                rows = (
                    missing.groupBy(*subset).count()
                    .filter(F.col("count") == required)
                    .collect()
                )
                for r in rows:
                    key = tuple((c, str(r[c])) for c in subset)
                    # minimal: no closed sub-pattern already explains it
                    if any(set(sub) <= set(key) for sub in covered):
                        continue
                    covered.add(key)
                    patterns.append(MissingPattern(
                        columns=subset,
                        values=tuple(str(r[c]) for c in subset),
                        num_rows=int(r["count"]),
                    ))
                    if len(patterns) >= limit:
                        return patterns
        return patterns
    finally:
        missing.unpersist()


def missing_associations(expected: DataFrame, actual: DataFrame) -> DataFrame:
    """expected-minus-actual over shared columns (the miner's input;
    reference builds this diff before invoking the Rust tool)."""
    cols = [c for c in expected.columns if c in actual.columns]
    return expected.select(*cols).join(
        actual.select(*cols).distinct(), cols, "left_anti"
    )
