"""Dimension model: the eight fixed dimension types and record tables.

Reference: dsgrid/dimension/base_models.py:12-22 (DimensionType enum) and
:54-104 (record models). Dimension record tables are tiny (10s-1000s of
rows) and always broadcast in joins.
"""

from __future__ import annotations

from enum import Enum


class DimensionType(str, Enum):
    """The eight dsgrid dimension types (reference base_models.py:12-22)."""

    METRIC = "metric"
    GEOGRAPHY = "geography"
    SECTOR = "sector"
    SUBSECTOR = "subsector"
    TIME = "time"
    WEATHER_YEAR = "weather_year"
    MODEL_YEAR = "model_year"
    SCENARIO = "scenario"


#: dimension types that appear as (string) stacked columns in a fact table
STACKED_DIMENSION_TYPES = [
    DimensionType.METRIC,
    DimensionType.GEOGRAPHY,
    DimensionType.SECTOR,
    DimensionType.SUBSECTOR,
    DimensionType.WEATHER_YEAR,
    DimensionType.MODEL_YEAR,
    DimensionType.SCENARIO,
]


class TimeDimensionType(str, Enum):
    """Reference dsgrid/dimension/time.py:15-23."""

    DATETIME = "datetime"
    ANNUAL = "annual"
    REPRESENTATIVE_PERIOD = "representative_period"
    DATETIME_EXTERNAL_TZ = "datetime_external_tz"
    INDEX = "index"
    #: no time column at all — time ops and consistency checks are skipped
    #: (reference dimensions.py:858 NoOpTimeDimensionModel)
    NOOP = "noop"


class TimeIntervalType(str, Enum):
    """What span a timestamp labels (reference dsgrid/dimension/time.py:95-116).

    PERIOD_BEGINNING is the dsgrid default; converting between beginning
    and ending shifts timestamps by one frequency step.
    """

    PERIOD_BEGINNING = "period_beginning"
    PERIOD_ENDING = "period_ending"
    INSTANTANEOUS = "instantaneous"


class MeasurementType(str, Enum):
    """How a value represents its interval (reference dsgrid/dimension/time.py)."""

    MEAN = "mean"
    MIN = "min"
    MAX = "max"
    MEASURED = "measured"
    TOTAL = "total"


class RepresentativePeriodFormat(str, Enum):
    """Reference dsgrid/dimension/time.py:34-50."""

    ONE_WEEK_PER_MONTH_BY_HOUR = "one_week_per_month_by_hour"
    ONE_WEEKDAY_DAY_AND_ONE_WEEKEND_DAY_PER_MONTH_BY_HOUR = (
        "one_weekday_day_and_one_weekend_day_per_month_by_hour"
    )


class LeapDayAdjustmentType(str, Enum):
    """Reference dsgrid/dimension/time.py:53-92."""

    DROP_DEC31 = "drop_dec31"
    DROP_FEB29 = "drop_feb29"
    DROP_JAN1 = "drop_jan1"
    NONE = "none"


class DaylightSavingAdjustmentType(str, Enum):
    """Reference dsgrid/dimension/time.py:143-188."""

    DROP_SPRING_FORWARD_DUPLICATE_FALLBACK = "drop_spring_forward_duplicate_fallback"
    DROP_SPRING_FORWARD_INTERPOLATE_FALLBACK = "drop_spring_forward_interpolate_fallback"
    NONE = "none"


class DimensionMappingType(str, Enum):
    """Mapping semantics (reference dsgrid/config/dimension_mapping_base.py:14-39).

    The type determines which fraction-sum invariant must hold
    (reference archetype flags, dimension_mapping_base.py:43-130):
    - aggregation/disaggregation/reassignment + ONE_TO_ONE: fractions sum
      to 1.0 grouped by from_id (fractional weights are valid)
    - *_ASSIGNMENT: fractions sum to 1.0 grouped by to_id
    - DUPLICATION and *_EXPLICIT_MULTIPLIERS: no fraction-sum check
    """

    ONE_TO_ONE = "one_to_one"
    MANY_TO_ONE_AGGREGATION = "many_to_one_aggregation"
    MANY_TO_ONE_REASSIGNMENT = "many_to_one_reassignment"
    MANY_TO_MANY_AGGREGATION = "many_to_many_aggregation"
    ONE_TO_MANY_DISAGGREGATION = "one_to_many_disaggregation"
    MANY_TO_MANY_DISAGGREGATION = "many_to_many_disaggregation"
    MANY_TO_ONE_ASSIGNMENT = "many_to_one_assignment"
    ONE_TO_MANY_ASSIGNMENT = "one_to_many_assignment"
    MANY_TO_MANY_ASSIGNMENT = "many_to_many_assignment"
    ONE_TO_ONE_EXPLICIT_MULTIPLIERS = "one_to_one_explicit_multipliers"
    ONE_TO_MANY_EXPLICIT_MULTIPLIERS = "one_to_many_explicit_multipliers"
    MANY_TO_ONE_EXPLICIT_MULTIPLIERS = "many_to_one_explicit_multipliers"
    MANY_TO_MANY_EXPLICIT_MULTIPLIERS = "many_to_many_explicit_multipliers"
    DUPLICATION = "duplication"
