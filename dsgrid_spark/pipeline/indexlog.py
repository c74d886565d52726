"""Exactly-once batch appends for persisted indexes.

The persisted term index (``retrieval.append_term_index``) and IVF index
(``similarity.append_ivf_index``) grow by parquet appends. A plain
append is not idempotent: a retried batch (driver crash, orchestrator
re-run) double-counts its rows silently. This module supplies the same
exactly-once discipline the registry's streaming-ingest lineage guard
uses (``pipeline/ingest.py``), adapted to index trees:

- Every appended batch carries a caller-supplied ``batch_id`` and lands
  in batch-scoped partition directories
  (``.../bucket=K/batch=<id>/`` resp. ``.../cluster=K/batch=<id>/``) —
  the data of one batch is physically addressable.
- A tiny ``<index>/batches/`` parquet log records one row per committed
  batch, written LAST. Log entry present == the batch's data, derived
  tables, and stats are all complete.
- An append therefore runs: (1) if the batch id is already logged,
  return without touching anything (replay skip); (2) delete any
  partition directories left by a previous crashed attempt of the SAME
  batch (so a retry with drifted content cannot leave orphan rows);
  (3) write data; (4) log the batch.

Crash anywhere before (4) and the retry redoes (2)-(4) to the identical
end state; crash after (4) and the retry is a no-op. READERS FILTER TO
COMMITTED BATCHES (:func:`read_committed`): the ``batch`` partition
column makes the filter a partition-pruning predicate, so a crashed
append's orphan directories are invisible to every search and derived
aggregate until the same batch id is retried — readers see each batch
atomically at its log commit, never half of one.

Auto batch ids are RESERVED before any data is written via an intent
marker directory (``<index>/intents/<id>/``): a retry of a crashed
auto-id append finds the open intent (marker present, log entry absent)
and reuses that id even if other batches committed in between — without
the marker, the log-size-derived id would drift and the crashed
attempt's orphans would never be cleaned. The marker is removed when
the batch commits.

Partition deletion goes through the Hadoop FileSystem API (via the
JVM gateway), so it works on any Spark-supported filesystem, not just
``file://``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F

_BATCH_ID_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,127}$")

#: reserved id for the rows written by the initial index build
BASE_BATCH = "base"


def check_batch_id(batch_id: str) -> str:
    """Validate a batch id for use as a partition-directory component.

    Restricting to ``[A-Za-z0-9._-]`` keeps the id round-trippable
    through ``batch=<id>`` partition paths on every filesystem (no
    escaping, no path traversal).
    """
    if not isinstance(batch_id, str) or not _BATCH_ID_RE.match(batch_id):
        raise ValueError(
            f"batch_id must match {_BATCH_ID_RE.pattern!r}, got "
            f"{batch_id!r}")
    return batch_id


def delete_glob(spark: SparkSession, pattern: str) -> int:
    """Recursively delete every path matching a Hadoop glob; returns the
    number of paths removed (0 when nothing matched)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(pattern)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    matches = fs.globStatus(jpath)
    n = 0
    for st in (matches or []):
        fs.delete(st.getPath(), True)
        n += 1
    return n


def _log_path(index_path: str) -> str:
    return f"{index_path}/batches"


def committed_batches(spark: SparkSession, index_path: str) -> set[str]:
    """Batch ids whose append fully completed (log entry exists)."""
    try:
        rows = (spark.read.parquet(_log_path(index_path))
                .select("batch").distinct().collect())
    except Exception:
        return set()
    return {r["batch"] for r in rows}


def log_snapshot(spark: SparkSession, index_path: str,
                 *columns: str) -> tuple[set[str], dict[str, int]]:
    """Committed ids AND summed metrics from ONE read of the log.

    A query that derives its corpus stats and its committed-batch
    filter from two separate log reads can straddle a concurrent
    commit (new totals, old postings or vice versa); deriving both
    from a single collect makes the query's view of the index one
    consistent snapshot. The log is one row per batch — collecting it
    is bounded by batch count, not data size.
    """
    try:
        rows = (spark.read.parquet(_log_path(index_path))
                .select("batch", *columns).collect())
    except Exception:
        return set(), {c: 0 for c in columns}
    ids = {r["batch"] for r in rows}
    totals = {c: sum(int(r[c]) for r in rows) for c in columns}
    return ids, totals


def next_auto_batch_id(committed: set[str]) -> str:
    """Deterministic id for callers that don't name their batches.

    Derived from the committed-log size; prefer
    :func:`claim_auto_batch_id`, which additionally persists an intent
    marker so the id survives a crash even when OTHER batches commit
    before the retry (this bare derivation regenerates the same id only
    if the log has not moved).
    """
    n = len(committed) + 1
    while f"auto{n:06d}" in committed:
        n += 1
    return f"auto{n:06d}"


def _intents_path(index_path: str) -> str:
    return f"{index_path}/intents"


def open_intents(spark: SparkSession, index_path: str) -> set[str]:
    """Batch ids with an intent marker on disk (reserved, possibly
    in-flight or crashed)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(f"{_intents_path(index_path)}/*")
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    matches = fs.globStatus(jpath)
    return {st.getPath().getName() for st in (matches or [])}


def claim_auto_batch_id(spark: SparkSession, index_path: str,
                        committed: set[str]) -> str:
    """Reserve and return the auto batch id for an un-named append.

    If a previous auto-id append crashed (intent marker present, no log
    entry), its id is reused — smallest first, deterministically — so
    the retry deletes exactly that attempt's orphan directories no
    matter how many OTHER batches committed in between (the round-6
    advice hole in the log-size derivation). Otherwise the next free id
    is derived past every committed AND reserved id, and its marker
    directory is created BEFORE returning, i.e. before any data write.
    """
    intents = open_intents(spark, index_path)
    crashed = sorted(intents - committed)
    if crashed:
        return crashed[0]
    taken = committed | intents
    n = len(taken) + 1
    while f"auto{n:06d}" in taken:
        n += 1
    batch_id = f"auto{n:06d}"
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(
        f"{_intents_path(index_path)}/{batch_id}")
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.mkdirs(jpath)
    return batch_id


def clear_intent(spark: SparkSession, index_path: str,
                 batch_id: str) -> None:
    """Drop a batch's intent marker (call after ``log_batch``; a no-op
    for caller-named batches that never claimed one)."""
    delete_glob(spark, f"{_intents_path(index_path)}/{batch_id}")


def read_committed(spark: SparkSession, index_path: str, subdir: str,
                   include: tuple[str, ...] = (),
                   ids: set[str] | None = None) -> DataFrame:
    """Read an index subtree filtered to COMMITTED batches (plus any
    explicitly included in-flight ids — the append path aggregates over
    committed + its own batch).

    ``batch`` is a partition column, so the isin filter prunes orphan
    directories from crashed appends at planning time: they are never
    listed into the scan, and readers observe each batch atomically at
    its log commit. Pass ``ids`` (from :func:`log_snapshot`) when the
    caller also reads log metrics, so filter and totals come from the
    same snapshot.
    """
    if ids is None:
        ids = committed_batches(spark, index_path)
    batch_ids = sorted(ids | set(include))
    return (spark.read.parquet(f"{index_path}/{subdir}")
            .filter(F.col("batch").isin(batch_ids)))


def log_batch(spark: SparkSession, index_path: str, batch_id: str,
              **metrics: int) -> None:
    """Record a completed batch (call LAST in the append sequence).

    One row, partitioned by batch id so a crashed half-written log
    attempt is scoped to its own directory and cleaned before rewrite.
    """
    lp = _log_path(index_path)
    delete_glob(spark, f"{lp}/batch={batch_id}")
    # the constant marker keeps at least one data column next to the
    # batch partition column (Spark rejects all-partition-column writes)
    metrics = {"committed": 1, **metrics}
    cols = sorted(metrics)
    row = [tuple(int(metrics[c]) for c in cols) + (batch_id,)]
    schema = ", ".join([f"{c} long" for c in cols] + ["batch string"])
    (spark.createDataFrame(row, schema)
       .coalesce(1).write.mode("append").partitionBy("batch").parquet(lp))


def logged_totals(spark: SparkSession, index_path: str,
                  *columns: str) -> dict[str, int]:
    """Sum the named metric columns across every committed batch.

    Stats derived from the log (plus the in-flight batch's delta) stay
    correct under retries — unlike read-modify-write against the
    previous stats file, which double-counts when a crash lands between
    the stats write and the log write.
    """
    agg = (spark.read.parquet(_log_path(index_path))
           .agg(*[F.coalesce(F.sum(c), F.lit(0)).alias(c)
                  for c in columns])
           .collect()[0])
    return {c: int(agg[c]) for c in columns}


def vacuum(spark: SparkSession, index_path: str,
           ttl_seconds: float = 86400.0) -> dict[str, int]:
    """Delete crashed-append debris from an index tree: batch data
    directories whose id never committed, and expired or stale intent
    markers.

    Reader isolation already makes orphans INVISIBLE
    (:func:`read_committed` prunes them at planning time) and intent
    markers make crashed auto-id appends RETRYABLE — but an abandoned
    crashed batch leaks its partition directories forever; vacuum
    closes that lifecycle. Rules:

    - Committed batches are never touched (their ids are in the log).
    - An uncommitted batch is judged as a UNIT: it expires only when
      EVERY artifact it has — its intent marker and all of its data
      directories — is older than ``ttl_seconds``. A single young
      artifact keeps the whole batch (an in-flight append always
      survives, whether auto-id or caller-named), and an intent is
      only ever removed TOGETHER with the batch's data dirs — removing
      the marker while data remained would free the auto id for
      re-claim over leftover rows and strand a crashed retry's own
      orphan cleanup (the intent contract).
    - An intent whose batch COMMITTED (a crash landed between
      ``log_batch`` and ``clear_intent``) is stale bookkeeping and is
      removed regardless of age — the committed data is never touched.
    - Every expired batch is RE-CHECKED immediately before deletion
      (committed? data dirs appeared or rejuvenated? intent mtime
      moved?) so a slow append racing the vacuum's upfront snapshot is
      skipped; the residual check-to-delete window is covered by the
      contract that ``ttl_seconds`` exceeds the longest possible append
      duration.

    Readers racing a vacuum stay consistent: every search filters to
    committed batch ids, so a concurrently deleted orphan was never in
    any reader's plan. Data dirs are matched two levels deep
    (``<subtree>/<col>=K/batch=B`` — the postings/vectors/codes layout
    shared by every index in this package), which can never match the
    ``batches/batch=B`` log itself. Returns removal counts.
    """
    import time as _time

    committed = committed_batches(spark, index_path)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    cutoff = _time.time() * 1000.0 - ttl_seconds * 1000.0

    def statuses(pattern):
        p = jvm.org.apache.hadoop.fs.Path(pattern)
        fs = p.getFileSystem(conf)
        return fs, list(fs.globStatus(p) or [])

    fs_i, intent_sts = statuses(f"{_intents_path(index_path)}/*")
    fs_d, data_sts = statuses(f"{index_path}/*/*/batch=*")

    # group every artifact of each UNCOMMITTED batch; stale intents of
    # committed batches are removable immediately (data never touched)
    stale_committed_intents = []
    intent_of: dict[str, object] = {}
    artifacts: dict[str, list] = {}
    for st in intent_sts:
        bid = st.getPath().getName()
        if bid in committed:
            stale_committed_intents.append(st)
        else:
            intent_of[bid] = st
            artifacts.setdefault(bid, []).append(st)
    data_of: dict[str, list] = {}
    for st in data_sts:
        bid = st.getPath().getName().split("=", 1)[1]
        if bid in committed:
            continue
        data_of.setdefault(bid, []).append(st)
        artifacts.setdefault(bid, []).append(st)

    removed_dirs = 0
    removed_intents = 0
    for bid, sts in artifacts.items():
        if any(st.getModificationTime() >= cutoff for st in sts):
            continue  # some artifact is young: the batch may be live
        # TOCTOU re-check immediately before deletion: the upfront
        # snapshot may predate a slow in-flight append's FIRST data
        # write (an intent claimed > ttl ago whose append only now
        # started writing would otherwise lose its marker mid-append,
        # freeing the auto id for re-claim over its rows). The batch is
        # skipped if it committed since the snapshot, if its data-dir
        # set changed or grew young entries, or if its intent marker's
        # mtime moved. The residual window between this re-check and
        # the deletes is bounded by ``ttl_seconds``, which must exceed
        # the longest possible append duration (the intent contract).
        if bid in committed_batches(spark, index_path):
            continue
        _, fresh = statuses(f"{index_path}/*/*/batch={bid}")
        snap = {str(st.getPath()) for st in data_of.get(bid, [])}
        if ({str(st.getPath()) for st in fresh} != snap
                or any(st.getModificationTime() >= cutoff for st in fresh)):
            continue
        if bid in intent_of:
            _, ist = statuses(f"{_intents_path(index_path)}/{bid}")
            old_mtime = intent_of[bid].getModificationTime()
            if (not ist
                    or ist[0].getModificationTime() != old_mtime):
                continue
        for st in data_of.get(bid, []):
            fs_d.delete(st.getPath(), True)
            removed_dirs += 1
        # marker removed LAST, and only with its data gone: a crash
        # mid-vacuum leaves the id reserved over the remaining orphans
        if bid in intent_of:
            fs_i.delete(intent_of[bid].getPath(), True)
            removed_intents += 1
    for st in stale_committed_intents:
        fs_i.delete(st.getPath(), True)
        removed_intents += 1
    return {"data_dirs_removed": removed_dirs,
            "intents_removed": removed_intents}
