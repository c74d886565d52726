"""Shared constants for the dsgrid-spark engine.

Mirrors the reference's conventions (dsgrid/common.py:30-32): the single
measure column is named ``value``; two-table lookups may carry an optional
``scaling_factor``; mapping tables are ``from_id, to_id, from_fraction``.
"""

from __future__ import annotations

VALUE_COLUMN = "value"
SCALING_FACTOR_COLUMN = "scaling_factor"

FROM_ID_COLUMN = "from_id"
TO_ID_COLUMN = "to_id"
FROM_FRACTION_COLUMN = "from_fraction"

# internal column used while a mapping's fractions are being accumulated
FRACTION_COLUMN = "fraction"

# surrogate key joining load_data to load_data_lookup in two-table datasets
TWO_TABLE_ID_COLUMN = "id"

# default file-target size used by the parquet sink (reference
# dsgrid/utils/spark.py:61 uses 128 MB)
MAX_PARTITION_SIZE_MB = 128
