"""QueryContext: tracks which physical columns carry which dimension as the
table mutates (the reference's 'IR', dsgrid/query/query_context.py:26-288),
plus the content-hash result cache (query_submitter.py:133-171).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from pathlib import Path


@dataclass
class QueryContext:
    #: dimension type -> current physical column name(s)
    dimension_columns: dict[str, str] = field(default_factory=dict)
    value_column: str = "value"
    scratch_dir: Path | None = None

    def rename(self, dimension: str, new_column: str) -> None:
        self.dimension_columns[dimension] = new_column

    def metadata(self) -> dict:
        """metadata.json payload written beside query results
        (reference query_submitter.py:614-653)."""
        return {
            "dimension_columns": dict(self.dimension_columns),
            "value_column": self.value_column,
        }


def content_hash(*parts) -> str:
    """Stable hash of query JSON + dataset/mapping versions.

    Reference query_submitter.py:140-146: the cache key must include every
    input that can change results.
    """
    h = hashlib.sha256()
    for p in parts:
        if isinstance(p, (dict, list)):
            p = json.dumps(p, sort_keys=True, default=str)
        h.update(str(p).encode())
    return h.hexdigest()[:24]


class ResultCache:
    """Content-hash keyed parquet cache dirs (query_submitter.py:133-171)."""

    def __init__(self, root: Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def path_for(self, key: str) -> Path:
        return self.root / key

    def get(self, key: str) -> Path | None:
        p = self.path_for(key)
        return p if (p / "_SUCCESS").exists() else None
