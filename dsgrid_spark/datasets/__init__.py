"""Dataset schema handlers (one-table / two-table, stacked / pivoted)."""
