"""Projection datasets: exponential growth and annual multipliers.

Reference dsgrid/dataset/growth_rates.py:13-162. A projection dataset
combines an ``initial_value`` dataset (data at a base model year) with a
``growth_rate`` dataset:

- exponential growth: ``P(t) = P0 * (1 + r)^(t - t0)``
- annual multiplier:  ``P(t) = P0 * r(t)``

Both are broadcast-or-hash joins on the shared dimension columns plus a
column expression — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dsgrid_spark.common import VALUE_COLUMN

MODEL_YEAR = "model_year"
GROWTH_RATE_COLUMN = "__growth_rate"


def apply_annual_multiplier(initial: DataFrame, rates: DataFrame,
                            value_column: str = VALUE_COLUMN) -> DataFrame:
    """P(t) = P0 * r(t); join on all shared dim columns incl. model_year.

    Reference growth_rates.py:63-102.
    """
    join_cols = [c for c in initial.columns if c in set(rates.columns) and c != value_column]
    rates_r = rates.withColumnRenamed(value_column, GROWTH_RATE_COLUMN)
    out = initial.join(rates_r, join_cols, "inner")
    return out.withColumn(
        value_column, F.col(value_column) * F.col(GROWTH_RATE_COLUMN)
    ).drop(GROWTH_RATE_COLUMN)


def apply_exponential_growth(initial: DataFrame, rates: DataFrame,
                             base_year: str,
                             value_column: str = VALUE_COLUMN) -> DataFrame:
    """P(t) = P0 * (1 + r)^(t - t0).

    ``initial`` holds data at ``model_year == base_year``; ``rates`` holds
    one growth-rate row per target model year (value = r). The initial
    dataset is fanned out to every target year via the join on the
    non-model-year dims (reference growth_rates.py:103-162 uses an
    explicit cross join; an equi-join on the shared non-year dims is the
    same fan-out with the rate attached in one pass).
    """
    base = initial.filter(F.col(MODEL_YEAR) == base_year).drop(MODEL_YEAR)
    join_cols = [
        c for c in base.columns
        if c in set(rates.columns) and c not in (value_column, MODEL_YEAR)
    ]
    rates_r = rates.withColumnRenamed(value_column, GROWTH_RATE_COLUMN)
    out = base.join(rates_r, join_cols, "inner")
    years = F.col(MODEL_YEAR).cast("int") - F.lit(int(base_year))
    return out.withColumn(
        value_column,
        F.col(value_column) * F.pow(F.lit(1.0) + F.col(GROWTH_RATE_COLUMN), years),
    ).drop(GROWTH_RATE_COLUMN)
