"""Unit conversion.

Reference dsgrid/units/energy.py:49-133 + dsgrid/units/convert.py:15-72:
attach from_unit/to_unit via the metric dimension records (broadcast
joins), then scale values through a when-ladder. We use a tiny conversion
table joined in instead of a generated when-ladder — same plan shape
(broadcast hash join), table-driven.
"""

from __future__ import annotations

from itertools import product

from pyspark.sql import DataFrame, SparkSession, functions as F

from dsgrid_spark.common import VALUE_COLUMN

# multipliers to a common base unit per family (energy: Wh-base; power: W)
_TO_BASE = {
    # energy
    "Wh": 1.0, "kWh": 1e3, "MWh": 1e6, "GWh": 1e9, "TWh": 1e12,
    # 1 therm = 29.3071 kWh; 1 MBtu = 293.071 kWh (reference units/constants.py)
    "therm": 29.3071 * 1e3, "MBtu": 293.071 * 1e3,
    # power
    "W": 1.0, "kW": 1e3, "MW": 1e6, "GW": 1e9, "TW": 1e12,
}
_FAMILY = {u: ("power" if u.endswith("W") and "h" not in u else "energy")
           for u in _TO_BASE}


def conversion_factor(from_unit: str, to_unit: str) -> float:
    if from_unit == to_unit:
        return 1.0
    if _FAMILY[from_unit] != _FAMILY[to_unit]:
        raise ValueError(f"incompatible units {from_unit} -> {to_unit}")
    return _TO_BASE[from_unit] / _TO_BASE[to_unit]


def conversion_table(spark: SparkSession) -> DataFrame:
    """All (from_unit, to_unit, factor) pairs as a broadcast-able DF."""
    rows = [
        (f, t, conversion_factor(f, t))
        for f, t in product(_TO_BASE, _TO_BASE)
        if _FAMILY[f] == _FAMILY[t]
    ]
    return spark.createDataFrame(rows, "from_unit string, to_unit string, factor double")


def convert_units(
    df: DataFrame,
    metric_column: str,
    from_records: DataFrame,
    to_records: DataFrame,
    value_column: str = VALUE_COLUMN,
) -> DataFrame:
    """Scale values from each metric's source unit to its target unit.

    ``from_records``/``to_records``: metric dimension record tables with
    (id, unit). Short-circuits to a no-op when all units already match
    (reference units/convert.py:50-54).
    """
    f = from_records.select(F.col("id").alias("__fid"), F.col("unit").alias("__fu"))
    t = to_records.select(F.col("id").alias("__tid"), F.col("unit").alias("__tu"))
    pairs = (
        f.join(t, F.col("__fid") == F.col("__tid"), "inner")
        .select("__fid", "__fu", "__tu")
        .collect()
    )
    if all(r["__fu"] == r["__tu"] for r in pairs):
        return df
    spark = df.sparkSession
    factors = spark.createDataFrame(
        [(r["__fid"], conversion_factor(r["__fu"], r["__tu"])) for r in pairs],
        "__fid string, __factor double",
    )
    out = df.join(F.broadcast(factors), df[metric_column] == F.col("__fid"), "left")
    return out.withColumn(
        value_column, F.col(value_column) * F.coalesce(F.col("__factor"), F.lit(1.0))
    ).drop("__fid", "__factor")
