"""Resumable mapping plans: per-step content-hash parquet checkpoints.

Reference MapOperationCheckpoint (dsgrid/query/query_submitter.py:924-949,
dsgrid/query/dataset_mapping_plan.py:35-43, dataset_mapping_manager.py):
a long mapping plan over a huge dataset can die mid-way; completed steps
are persisted and a rerun resumes from the longest completed prefix whose
hash still matches.

Unlike the reference (which round-trips every persisted step), steps only
write parquet when flagged — the default plan stays pure DataFrame
lineage so Catalyst optimizes across steps.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame

from dsgrid_spark.query.context import content_hash


@dataclass
class PlanStep:
    name: str
    fn: Callable[[DataFrame], DataFrame]
    #: write a parquet checkpoint after this step (resume point)
    persist: bool = False


@dataclass
class MappingPlanRunner:
    scratch_dir: Path
    #: extra hash inputs (dataset version, query json, ...)
    key_parts: tuple = field(default_factory=tuple)

    def _step_key(self, steps_done: list[str]) -> str:
        return content_hash(list(self.key_parts), steps_done)

    def _ckpt_path(self, key: str) -> Path:
        return Path(self.scratch_dir) / f"ckpt_{key}"

    def run(self, df: DataFrame, steps: list[PlanStep]) -> DataFrame:
        """Execute steps in order, resuming from the longest checkpointed
        prefix. Checkpoint hashes chain over step names + key_parts, so
        editing any earlier step invalidates everything after it."""
        spark = df.sparkSession
        done: list[str] = []
        # find longest completed prefix, scanning from the full plan down
        resume_at = 0
        for i in range(len(steps), 0, -1):
            if not steps[i - 1].persist:
                continue
            key = self._step_key([s.name for s in steps[:i]])
            p = self._ckpt_path(key)
            if (p / "_SUCCESS").exists():
                df = spark.read.parquet(str(p))
                resume_at = i
                break
        for i in range(resume_at, len(steps)):
            # positional index, not steps.index(step): two equal steps
            # (same name/fn/persist) must checkpoint under distinct prefixes
            step = steps[i]
            done = [s.name for s in steps[: i + 1]]
            df = step.fn(df)
            if step.persist:
                key = self._step_key(done)
                p = self._ckpt_path(key)
                df.write.mode("overwrite").parquet(str(p))
                # underscore prefix: Spark/Hadoop readers skip it as metadata
                (p / "_step.json").write_text(json.dumps({"steps": done}))
                df = spark.read.parquet(str(p))
        return df
