"""As-of and range joins — temporal joins Spark has no native operator for.

The reference engine has no temporal joins either (its time ops are
resolution conversions, SURVEY §2.10); these cover the adjacent need in
fact processing: join facts to a slowly-changing dimension (as-of) and
to an interval table (range) WITHOUT the cartesian / nested-loop plan a
naive non-equi join produces.

Both are compositions of built-in DataFrame ops, so Catalyst plans them
as ordinary shuffles + sort/hash joins:

- ``asof_join``: union the two sides, one window pass per key ordered by
  time, ``last(..., ignorenulls)`` carries the most recent right-hand
  values forward onto left rows. One shuffle, state = one row of carried
  values per key — no per-left-row probe, no range explosion.
- ``range_join``: bin time into fixed-width buckets; each right interval
  explodes into the buckets it covers, the left point maps to exactly
  one bucket, and the bucket equi-join (plus exact predicate re-check)
  replaces the nested-loop. Fan-out is interval_len / bucket_width, so
  pick a bucket near the typical interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_MICROS = 1_000_000


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    value_columns: list[str],
    how: str = "inner",
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach ``value_columns`` from the matching
    right row with the same ``on`` keys:

    - ``direction='backward'`` (default): latest right row with
      ``right_time <= left_time`` (ties prefer the right row) — the SQL
      ``ASOF JOIN`` default.
    - ``'forward'``: earliest right row with ``right_time >= left_time``.
    - ``'nearest'``: whichever of the two is closer in time; exact-tie
      prefers backward (pandas ``merge_asof`` conventions).

    ``how='inner'`` drops left rows with no match; ``'left'`` keeps them
    with NULLs. ``tolerance_seconds`` additionally NULLs/drops matches
    farther than the tolerance. All directions are ONE shuffle on the
    keys (union + window carry; 'nearest' adds a second in-partition
    sort, no extra shuffle). ``value_columns`` must not collide with
    left's columns.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    overlap = set(value_columns) & set(left.columns)
    if overlap:
        raise ValueError(f"value_columns collide with left columns: {overlap}")

    lt = left.select(
        "*",
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
    )
    rt = right.select(
        *on,
        F.col(right_time).alias("__t"),
        *value_columns,
        F.lit(0).alias("__side"),
    )
    u = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort before left rows at equal time (in either sort
    # direction), so an exactly simultaneous right row is visible to the
    # left row (>= / <= semantics)
    frame = (Window.unboundedPreceding, Window.currentRow)
    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(*frame)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").desc(), F.col("__side").asc())
        .rowsBetween(*frame)
    )
    windows = {"backward": [("", w_back)], "forward": [("", w_fwd)],
               "nearest": [("__b_", w_back), ("__f_", w_fwd)]}[direction]
    for prefix, w in windows:
        for vc in value_columns:
            u = u.withColumn(prefix + vc if prefix else vc,
                             F.last(vc, ignorenulls=True).over(w))
        u = u.withColumn(
            f"{prefix}__rt" if prefix else "__rt",
            F.last(F.when(F.col("__side") == 0, F.col("__t")),
                   ignorenulls=True).over(w),
        )
    out = u.filter(F.col("__side") == 1)
    if direction == "nearest":
        t, rb, rf = (F.unix_micros(F.col("__t")),
                     F.unix_micros(F.col("__b___rt")),
                     F.unix_micros(F.col("__f___rt")))
        pick_fwd = F.col("__b___rt").isNull() | (
            F.col("__f___rt").isNotNull() & ((rf - t) < (t - rb)))
        for vc in value_columns:
            out = out.withColumn(
                vc, F.when(pick_fwd, F.col(f"__f_{vc}"))
                .otherwise(F.col(f"__b_{vc}")))
        out = out.withColumn(
            "__rt", F.when(pick_fwd, F.col("__f___rt"))
            .otherwise(F.col("__b___rt")))
        drop_extra = [f"__b_{vc}" for vc in value_columns] + [
            f"__f_{vc}" for vc in value_columns] + ["__b___rt", "__f___rt"]
        out = out.drop(*drop_extra)
    if tolerance_seconds is not None:
        dist = F.abs(F.unix_micros(F.col("__t"))
                     - F.unix_micros(F.col("__rt")))
        stale = F.col("__rt").isNull() | (
            dist > int(tolerance_seconds * _MICROS))
        for vc in value_columns:
            out = out.withColumn(vc, F.when(stale, F.lit(None))
                                 .otherwise(F.col(vc)))
    if how == "inner":
        out = out.filter(F.col("__rt").isNotNull())
        if tolerance_seconds is not None:
            out = out.filter(F.col(value_columns[0]).isNotNull())
    return out.drop("__t", "__rt", "__side")


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    on: list[str] | None = None,
    bucket_seconds: int = 3600,
    end_inclusive: bool = False,
) -> DataFrame:
    """Join left rows whose ``left_point`` timestamp falls inside a
    right-row interval ``[right_start, right_end)`` (or ``[..]`` when
    ``end_inclusive``), optionally also matching ``on`` keys.

    A (left, right) pair can only meet in the left point's single
    bucket, so the bucket equi-join introduces no duplicates; the exact
    range predicate is re-checked after the join.
    """
    on = on or []
    width = bucket_seconds * _MICROS
    lb = left.withColumn(
        "__b", F.floor(F.unix_micros(F.col(left_point)) / F.lit(width))
    )
    span = F.sequence(
        F.floor(F.unix_micros(F.col(right_start)) / F.lit(width)),
        F.floor(F.unix_micros(F.col(right_end)) / F.lit(width)),
    )
    rb = right.withColumn("__b", F.explode(span))
    joined = lb.join(rb, on=["__b", *on])
    upper = (
        F.col(left_point) <= F.col(right_end)
        if end_inclusive
        else F.col(left_point) < F.col(right_end)
    )
    return joined.filter(
        (F.col(left_point) >= F.col(right_start)) & upper
    ).drop("__b")
