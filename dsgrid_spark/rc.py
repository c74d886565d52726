"""Runtime configuration file (reference dsgrid/dsgrid_rc.py).

The reference's rc carries database/thrift/hive settings for its DB
backends; the Spark-first analog carries what this engine actually
parameterizes: a default registry root and extra Spark confs. Lookup
order: ``$DSGRID_SPARK_RC`` (explicit path) → ``~/.dsgrid_spark.json``.
JSON5-lite (comments + trailing commas) like the query specs.

Fields (all optional)::

    {
      "registry": "/path/or/uri/to/registry",   // default for CLI --registry
      "spark_conf": {"spark.sql.shuffle.partitions": "64"},
      "timings": false
    }
"""

from __future__ import annotations

import json
import os
from pathlib import Path

RC_FILENAME = ".dsgrid_spark.json"
RC_ENV = "DSGRID_SPARK_RC"


def rc_path() -> Path:
    override = os.environ.get(RC_ENV)
    if override:
        return Path(override)
    return Path.home() / RC_FILENAME


def load_rc() -> dict:
    """Read the rc file; missing file → empty config (never raises for
    absence — the rc is purely optional)."""
    path = rc_path()
    if not path.is_file():
        return {}
    from dsgrid_spark.cli import _strip_json5, _strip_trailing_commas

    text = path.read_text()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        return json.loads(_strip_trailing_commas(_strip_json5(text)))


def apply_rc_conf(spark) -> None:
    """Apply the rc's runtime-settable spark confs to a live session."""
    for k, v in load_rc().get("spark_conf", {}).items():
        try:
            spark.conf.set(k, str(v))
        except Exception:  # static conf on a live session
            pass
