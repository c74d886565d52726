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

COMPACTION (:func:`compact`) merges many small committed batch
directories into one coalesced batch — the antidote to the small-files
problem a long-running daily append regime accumulates (thousands of
``batch=`` dirs each holding a few row groups turn every search's file
listing and scan-task scheduling into the bottleneck long before the
bytes do). The replacement is recorded in a tiny
``<index>/compactions/`` parquet log (one row per replaced batch,
partitioned by the replacing id) written BEFORE the compacted batch
commits; a replaced batch becomes invisible exactly at the replacing
batch's log commit — the same atomic-at-commit contract appends have.
Readers derive "visible = logged − replaced-by-a-logged-batch" from
:func:`committed_batches` / :func:`log_snapshot`, so no search or
stats query changes. Replaced batches' data and log rows are PURGED by
:func:`vacuum` under the same ttl contract that protects in-flight
appends (a reader planned against the pre-compaction snapshot must
finish within ``ttl_seconds``), or immediately via ``compact(...,
purge=True)`` when the caller knows no reader is live. Compaction
rows are kept forever (bytes per corpus lifetime: one short row per
retired batch id) because they also guard id reuse: a purged batch id
must never be re-issued to, or replayed as, a fresh append — both
checks go through :func:`batch_sets`'s ``ingested`` view.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F

_BATCH_ID_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,127}$")

#: reserved id for the rows written by the initial index build
BASE_BATCH = "base"

#: id namespace reserved for compaction batches. The separation is
#: load-bearing, not cosmetic: a compaction that crashes between its
#: ``compactions/`` write and its log commit leaves an open intent and
#: dormant ``(replaced, by=<id>)`` rows — if an ordinary auto-id append
#: could ever adopt that intent (the crashed-id reuse rule) and commit
#: under it, the dormant rows would activate and silently hide every
#: batch they name. Appends therefore may not claim or be named inside
#: this namespace; only a compact retry adopts a crashed ``cmp`` id,
#: and its cleanup deletes the stale rows before rewriting.
COMPACT_PREFIX = "cmp"

#: the claimable compaction-id shape; only THIS is refused to callers
#: (a broader startswith ban would break replays of pre-existing
#: committed batches that happen to start with "cmp"). 6-or-more
#: digits, anchored: claim_auto_batch_id's %06d format emits SEVEN
#: digits once the taken-count passes 999999, and a caller-supplied id
#: of that shape must be refused too or it could later collide with a
#: compaction claim and activate its dormant replacement rows. Shorter
#: cmp-prefixed names ("cmp-jan", "cmpany2024") stay valid.
_COMPACT_ID_RE = re.compile(rf"^{COMPACT_PREFIX}\d{{6,}}$")


class ConcurrentCompactionError(RuntimeError):
    """A second compactor tried to run while another holds the index's
    compaction lock (see :func:`acquire_compact_lock`)."""


class StaleGenerationError(RuntimeError):
    """The index's centroid generation changed between an append's
    assignment and its commit (a rebalance flipped mid-append).
    Committing would land OLD-generation cluster numbers in the
    NEW-generation view — searches would silently mis-prune — so the
    append aborted before its log write. Crash-equivalent and
    retryable: nothing became visible; re-run the append (the retry
    adopts the same intent id and re-assigns against the live
    generation)."""


class AppendsBlockedError(RuntimeError):
    """The index is in a blocking maintenance pass
    (``rebalance_index(..., block_appends=True)``): appends fail
    loudly instead of racing the rebalance's atomic flip. Retry after
    the rebalance finishes (the marker is removed on completion, and
    expires under its ttl if the rebalancer crashed)."""


def check_batch_id(batch_id: str) -> str:
    """Validate a CALLER-SUPPLIED batch id for use as a
    partition-directory component.

    Restricting to ``[A-Za-z0-9._-]`` keeps the id round-trippable
    through ``batch=<id>`` partition paths on every filesystem (no
    escaping, no path traversal). The ``cmp`` namespace is reserved
    for compaction (see :data:`COMPACT_PREFIX`): an append committing
    under a crashed compaction's id would activate its dormant
    replacement rows.
    """
    if not isinstance(batch_id, str) or not _BATCH_ID_RE.match(batch_id):
        raise ValueError(
            f"batch_id must match {_BATCH_ID_RE.pattern!r}, got "
            f"{batch_id!r}")
    if _COMPACT_ID_RE.match(batch_id):
        # only the exact claimable shape is reserved — "cmp-jan" or
        # "cmpany2024" remain valid caller names (a pre-existing
        # committed batch with such a name must keep replaying as a
        # no-op, not start raising)
        raise ValueError(
            f"batch ids of the form {COMPACT_PREFIX}<6+ digits> are "
            f"reserved for compaction, got {batch_id!r}")
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


# ---------------------------------------------------------------------------
# Driver-side metadata IO (r13, guide §5/§1.2): every batch-log row,
# meta/stats row and committed-set resolution used to be a full Spark
# job — a 1-task parquet write with the whole FileSource commit protocol
# (temp dir, task file, rename, _SUCCESS), or a 1-2-task scan+collect —
# measured 0.15-0.5 s EACH on local[32], times 2-4 per index build and
# 2 per search call (q32 'bdf': 1.25 s of its 2.7 s warm path; q30
# 'store' pays the same around its sigstore build). These files are
# driver-bounded BY CONSTRUCTION (one row per batch / one meta row), so
# the driver reads and writes them directly with pyarrow when the index
# lives on the local filesystem, and falls back to the Spark path
# verbatim on any other scheme (hdfs/s3a keep the cluster-FS story).
# Atomicity matches the Spark writer: appends land as a hidden temp
# file renamed into place (readers never see a partial file);
# overwrites build a sibling temp dir and swap.

_DEFAULT_FS_CACHE: dict[int, str] = {}


def _meta_local_dir(spark: SparkSession, path: str) -> str | None:
    """Local-filesystem directory for ``path`` when it resolves to the
    local FS (explicit ``file:`` scheme, or no scheme under a ``file:``
    default FS), else None — the driver-side metadata fast path only
    applies where the driver can touch the files directly."""
    from urllib.parse import urlparse
    u = urlparse(path)
    if u.scheme == "file":
        return u.path
    if u.scheme:
        return None
    key = id(spark._jsc)
    fsdef = _DEFAULT_FS_CACHE.get(key)
    if fsdef is None:
        try:
            fsdef = spark._jsc.hadoopConfiguration().get(
                "fs.defaultFS", "file:///")
        except Exception:
            return None
        _DEFAULT_FS_CACHE[key] = fsdef
    return path if fsdef.startswith("file:") else None


def _partition_value(raw: str):
    """Spark-style partition-value inference (int, then double, else
    string) for the one hive level metadata dirs carry (``batch=<id>``,
    ``by=<id>``). Batch ids are ``[A-Za-z0-9._-]`` by check_batch_id,
    so no unescaping is needed."""
    try:
        return int(raw)
    except ValueError:
        pass
    try:
        return float(raw)
    except ValueError:
        return raw


def read_meta_rows(spark: SparkSession, dirpath: str):
    """Driver-side read of a SMALL parquet metadata directory: the
    batch log (one row per batch), the compaction log, meta/stats rows.

    Returns a list of dicts (hive ``k=v`` partition levels resolved
    like Spark resolves them, keys normalized across files with missing
    columns read as None — the ``mergeSchema`` behavior the log readers
    rely on), or None when the path is not on the local filesystem
    (callers fall back to ``spark.read``). Raises FileNotFoundError
    when the directory is missing or holds no data files, mirroring
    spark.read.parquet's analysis error so existing try/except call
    sites keep their semantics. NOT for data-scale tables — postings/
    sigs/codebooks stay on the scan path."""
    loc = _meta_local_dir(spark, dirpath)
    if loc is None:
        return None
    import os as _os

    import pyarrow.parquet as _pq

    rows: list[dict] = []
    n_files = 0

    def _walk(d: str, extra: dict) -> None:
        nonlocal n_files
        for name in sorted(_os.listdir(d)):
            if name.startswith((".", "_")):
                continue
            p = _os.path.join(d, name)
            if _os.path.isdir(p):
                if "=" in name:
                    k, _, v = name.partition("=")
                    _walk(p, {**extra, k: _partition_value(v)})
                continue
            if not name.endswith(".parquet"):
                continue
            n_files += 1
            for r in _pq.read_table(p).to_pylist():
                r.update(extra)
                rows.append(r)

    if not _os.path.isdir(loc):
        raise FileNotFoundError(dirpath)
    _walk(loc, {})
    if n_files == 0:
        raise FileNotFoundError(f"no parquet data files under {dirpath}")
    keys = set()
    for r in rows:
        keys.update(r)
    for r in rows:
        for k in keys - r.keys():
            r[k] = None
    return rows


def _pa_schema(schema_ddl: str):
    """pyarrow schema for a DDL of scalar (or array-of-scalar) fields,
    or None when a type has no mapping (caller falls back to the Spark
    writer)."""
    import pyarrow as pa
    from pyspark.sql.types import (ArrayType, BinaryType, BooleanType,
                                   ByteType, DoubleType, FloatType,
                                   IntegerType, LongType, ShortType,
                                   StringType, StructType)
    try:
        st = StructType.fromDDL(schema_ddl)
    except Exception:
        return None
    mapping = {LongType: pa.int64(), IntegerType: pa.int32(),
               ShortType: pa.int16(), ByteType: pa.int8(),
               DoubleType: pa.float64(), FloatType: pa.float32(),
               StringType: pa.string(), BooleanType: pa.bool_(),
               BinaryType: pa.binary()}
    fields = []
    for f in st.fields:
        dt = f.dataType
        if isinstance(dt, ArrayType):
            inner = mapping.get(type(dt.elementType))
            t = pa.list_(inner) if inner is not None else None
        else:
            t = mapping.get(type(dt))
        if t is None:
            return None
        fields.append(pa.field(f.name, t))
    return pa.schema(fields)


def write_meta_rows(spark: SparkSession, dirpath: str, rows,
                    schema_ddl: str,
                    partition: tuple[str, str] | None = None) -> bool:
    """Driver-side parquet write of a BOUNDED metadata row set; returns
    False when the fast path doesn't apply (non-local FS, unmappable
    type) and the caller must run the Spark write it replaces.

    ``partition=None``: overwrite ``dirpath`` (sibling temp dir built
    first, then swapped — the same not-yet-visible-until-complete
    window the Spark overwrite has). ``partition=(col, value)``: append
    one ``<dirpath>/<col>=<value>/`` partition directory, written as a
    hidden temp file renamed into place so readers never observe a
    partial file — the partition column stays in the directory name
    only, exactly as ``partitionBy`` writes it."""
    loc = _meta_local_dir(spark, dirpath)
    if loc is None:
        return False
    schema = _pa_schema(schema_ddl)
    if schema is None:
        return False
    import os as _os
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.parquet as _pq

    rows = [tuple(r) for r in rows]
    try:
        cols = {f.name: pa.array([r[i] for r in rows], type=f.type)
                for i, f in enumerate(schema)}
    except (pa.ArrowInvalid, pa.ArrowTypeError, IndexError):
        return False
    table = pa.table(cols, schema=schema)
    token = _uuid.uuid4().hex[:12]
    if partition is not None:
        col, value = partition
        pdir = _os.path.join(loc, f"{col}={value}")
        _os.makedirs(pdir, exist_ok=True)
        tmp = _os.path.join(pdir, f".part-{token}.parquet.tmp")
        _pq.write_table(table, tmp, compression="snappy")
        _os.rename(tmp, _os.path.join(pdir, f"part-00000-{token}.parquet"))
        return True
    tmpdir = f"{loc}__tmp_{token}"
    _os.makedirs(tmpdir)
    _pq.write_table(table, _os.path.join(tmpdir, f"part-00000-{token}.parquet"),
                    compression="snappy")
    if _os.path.isdir(loc):
        import shutil as _shutil
        _shutil.rmtree(loc)
    _os.rename(tmpdir, loc)
    return True


def _log_path(index_path: str) -> str:
    return f"{index_path}/batches"


def _compactions_path(index_path: str) -> str:
    return f"{index_path}/compactions"


def _raw_logged(spark: SparkSession, index_path: str) -> set[str]:
    """Every batch id with a log row — INCLUDING batches already
    replaced by a committed compaction (internal; readers want
    :func:`committed_batches`)."""
    try:
        rows = read_meta_rows(spark, _log_path(index_path))
        if rows is None:
            rows = (spark.read.parquet(_log_path(index_path))
                    .select("batch").distinct().collect())
    except Exception:
        return set()
    return {r["batch"] for r in rows}


def _replacements(spark: SparkSession, index_path: str) -> list[tuple]:
    """(replaced, by) pairs from the compaction log ([] when none).

    Existence is probed with one FileSystem call first: most indexes
    are never compacted, and letting the parquet read throw would cost
    a full analysis failure plus a noisy stack-trace WARN on EVERY
    committed-batch resolution."""
    cp = _compactions_path(index_path)
    loc = _meta_local_dir(spark, cp)
    if loc is not None:
        import os as _os
        if not _os.path.isdir(loc):
            return []
        try:
            rows = read_meta_rows(spark, cp)
            return [(r["replaced"], r["by"]) for r in rows]
        except Exception:
            return []
    jp = spark._jvm.org.apache.hadoop.fs.Path(cp)
    if not jp.getFileSystem(spark._jsc.hadoopConfiguration()).exists(jp):
        return []
    try:
        rows = (spark.read.parquet(cp)
                .select("replaced", "by").collect())
    except Exception:
        return []
    return [(r["replaced"], r["by"]) for r in rows]


def batch_sets(spark: SparkSession,
               index_path: str) -> tuple[set[str], set[str]]:
    """``(visible, ingested)`` batch-id sets from one log view.

    ``visible`` — logged batches minus those replaced by a COMMITTED
    compaction: the set every reader filters to. ``ingested`` —
    logged OR ever-replaced: the set appenders must consult for the
    replay check and for auto-id claims. A batch compacted away and
    purged is absent from ``visible`` (its rows live on in the
    compacted batch) but must stay in ``ingested`` forever — a replay
    of it must no-op, and its id must never be re-issued to a NEW
    batch (the compaction row naming it as replaced would make the
    newcomer invisible).
    """
    raw = _raw_logged(spark, index_path)
    replaced = _retired(raw, _replacements(spark, index_path))
    return raw - replaced, raw | replaced


def _retired(raw: set[str], pairs: list[tuple]) -> set[str]:
    """Batch ids retired by a committed compaction, resolved
    TRANSITIVELY: a pair ``(r, by)`` retires ``r`` when its replacer
    chain terminates in a raw-logged batch — ``by`` logged, or ``by``
    itself retired by such a chain. Non-transitive resolution (the
    first cut's ``by in raw``) broke the permanent replay/id-reuse
    guard: compact b1,b2 → cmp3, later compact cmp3 → cmp5, purge
    cmp3's log row — b1's pair then pointed at a no-longer-logged
    cmp3 and b1 silently left ``ingested``, so a replay re-ingested
    rows that live on inside cmp5. Pairs whose chain never reaches a
    logged batch (a crashed compaction's dormant rows) stay inert.
    Fixpoint depth is the compaction-chain length, bounded by the
    number of compactions ever run."""
    retired: set[str] = set()
    changed = True
    while changed:
        changed = False
        for r, by in pairs:
            if r not in retired and (by in raw or by in retired):
                retired.add(r)
                changed = True
    return retired


def committed_batches(spark: SparkSession, index_path: str) -> set[str]:
    """Batch ids visible to readers: append fully committed (log entry
    exists) and not replaced by a committed compaction."""
    return batch_sets(spark, index_path)[0]


def resolve_as_of(spark: SparkSession, index_path: str,
                  as_of, raw: set[str] | None = None) -> set[str]:
    """Validate a PINNED batch set for a reproducible read.

    Capture ``committed_batches(...)`` once, pass it back as ``as_of``
    to any search, and the read returns identical results no matter
    what appends or compactions commit in between — batch dirs are
    immutable and a replaced-but-unpurged batch remains readable (the
    pin's validity ends exactly when :func:`vacuum`/:func:`purge_replaced`
    reclaims a pinned batch, which the ttl grace delays past any
    reasonably-lived pin; a stale pin then fails HERE, loudly, instead
    of silently returning partial data). Two checks:

    - every pinned id must still have a log row (not purged, not a
      typo, not an id from some other index);
    - the pin must not mix a batch with its own replacement chain
      (e.g. ``{day1, cmp000003}`` where cmp000003 absorbed day1 —
      reading both would double-count day1's rows).
    """
    if isinstance(as_of, str):
        # set("base") would explode into characters and report them as
        # purged batches — the same string-degrades-silently family as
        # the --candidates path guard
        raise ValueError("as_of must be a collection of batch ids, "
                         f"got the single string {as_of!r}")
    pin = set(as_of)
    if not pin:
        raise ValueError("as_of is empty: pin the result of "
                         "committed_batches(...) / log_snapshot(...)")
    raw = _raw_logged(spark, index_path) if raw is None else raw
    missing = sorted(pin - raw)
    if missing:
        raise ValueError(
            f"as_of batches no longer readable (purged, or never "
            f"committed here): {missing}")
    pairs = _replacements(spark, index_path)
    doubled = _retired(pin, pairs) & pin
    if doubled:
        raise ValueError(
            f"as_of mixes batches with their own replacements "
            f"(double-counted rows): {sorted(doubled)}")
    # a purge that crashed between data-dir deletion and log-row
    # deletion leaves a pinned RETIRED batch with a log row but no
    # data — without this check the pin would read silently partial
    # (pinned totals present, pinned rows gone). Only retired pinned
    # ids can be purge victims, so only they pay the glob. A crash
    # mid-deletion can still leave partial dirs briefly; re-running
    # purge finishes the deletion and this check then fails the pin
    # loudly.
    retired_in_pin = _retired(raw, pairs) & pin
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    for bid in sorted(retired_in_pin):
        p = jvm.org.apache.hadoop.fs.Path(
            f"{index_path}/*/*/batch={bid}")
        if not list(p.getFileSystem(conf).globStatus(p) or []):
            raise ValueError(
                f"as_of batch {bid!r} was replaced and its data has "
                f"been purged (crashed purge left its log row); the "
                f"pin is no longer readable")
    return pin


def _parse_as_of_ms(as_of: str) -> int:
    """Epoch millis for an ISO-8601 ``as_of`` string (naive timestamps
    are read as UTC — commit times are recorded in UTC epoch millis)."""
    from datetime import datetime, timezone

    try:
        dt = datetime.fromisoformat(as_of)
    except ValueError:
        raise ValueError(
            f"as_of must be a collection of batch ids or an ISO-8601 "
            f"timestamp, got {as_of!r}")
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def resolve_timestamp(spark: SparkSession, index_path: str,
                      as_of: str) -> set[str]:
    """The batch set that was VISIBLE at time T — time-travel for
    callers who did not capture a pin before they needed one.

    T is an ISO-8601 string (``"2026-08-16T12:00:00+00:00"``; naive =
    UTC). Resolution replays the log's own commit times
    (``committed_at_ms``, written by :func:`log_batch`): batches
    committed at or before T, minus those retired by a compaction
    whose replacing batch ALSO committed at or before T — exactly
    :func:`committed_batches` as it would have answered then. The
    result is a plain batch set; pass it through :func:`resolve_as_of`
    (``resolve_batches`` does) so the purged-data checks still apply —
    a view whose data vacuum already reclaimed fails loudly, never
    partially. Log rows predating the commit-time column (older
    engines) carry NULL and count as committed in the unknown past,
    i.e. at-or-before every T.
    """
    t_ms = _parse_as_of_ms(as_of)
    try:
        rows = read_meta_rows(spark, _log_path(index_path))
        if rows is None:
            rows = (spark.read.option("mergeSchema", "true")
                    .parquet(_log_path(index_path))
                    .select("batch", "committed_at_ms").collect())
        elif rows and "committed_at_ms" not in rows[0]:
            raise KeyError("committed_at_ms")
    except Exception:
        raise ValueError(
            f"as_of timestamp given but no batch log (or no "
            f"committed_at_ms column — a pre-commit-time index) at "
            f"{index_path!r}")
    at_ms = {r["batch"]: r["committed_at_ms"] for r in rows}
    view, lost = _view_at(at_ms, _replacements(spark, index_path), t_ms)
    if lost:
        raise ValueError(
            f"cannot reconstruct the view at {as_of!r}: batches purged "
            f"from the log may have been visible then ({sorted(lost)});"
            f" time-travel reaches only unpurged history")
    if not view:
        raise ValueError(
            f"no batch was committed at or before {as_of!r}")
    return view


def _view_at(at_ms: dict, pairs: list[tuple],
             t_ms: int) -> tuple[set[str], set[str]]:
    """The pure core of :func:`resolve_timestamp`:
    ``(visible-at-T, lost)`` from the log's commit times and the
    replacement pairs.

    A batch is in the view iff it had a log row committed at-or-before
    T (NULL commit time = the unknown past, counts as before every T)
    and its replacer CHAIN does not reach a batch committed by T — the
    flip instant is the replacer's commit, and :func:`_retired`
    resolves chains transitively, so a chain through a PURGED
    intermediate (no log row, but its own pair's replacer committed
    <= T) still dates the retirement. ``lost`` is the purged pair
    sources whose retirement cannot be dated at-or-before T: they MAY
    have been visible at T and their rows are gone, so the caller must
    fail loudly rather than return a silently-partial view.
    Property-tested against an event-replay reference
    (tests/test_properties.py)."""
    raw_at_t = {b for b, ms in at_ms.items()
                if ms is None or int(ms) <= t_ms}
    retired_at_t = _retired(raw_at_t, pairs)
    lost = {r for r, _ in pairs
            if r not in at_ms and r not in retired_at_t}
    return raw_at_t - retired_at_t, lost


def resolve_batches(spark: SparkSession, index_path: str,
                    as_of=None) -> set[str]:
    """The batch set a search should read: the validated pin when
    ``as_of`` is given (:func:`resolve_as_of`), else the live
    committed set — the one helper every ``as_of=``-bearing entry
    point shares, so the pin contract lives in exactly one place.
    ``as_of`` may also be an ISO-8601 timestamp STRING — resolved to
    the batch set visible at that instant (:func:`resolve_timestamp`)
    and then validated like any pin."""
    if isinstance(as_of, str):
        as_of = resolve_timestamp(spark, index_path, as_of)
    if as_of is not None:
        return resolve_as_of(spark, index_path, as_of)
    return committed_batches(spark, index_path)


def log_snapshot(spark: SparkSession, index_path: str,
                 *columns: str,
                 as_of=None) -> tuple[set[str], dict[str, int]]:
    """Committed ids AND summed metrics from ONE read of the log.

    A query that derives its corpus stats and its committed-batch
    filter from two separate log reads can straddle a concurrent
    commit (new totals, old postings or vice versa); deriving both
    from a single collect makes the query's view of the index one
    consistent snapshot. The log is one row per batch — collecting it
    is bounded by batch count, not data size. Batches replaced by a
    committed compaction are excluded from ids AND totals (the
    compacted batch's row carries their summed metrics, so totals are
    unchanged by compaction); the compaction-log read happens AFTER
    the log read, so a compaction committing in between is simply not
    seen yet — the snapshot stays the consistent pre-compaction view.

    ``as_of`` (a batch set from an earlier snapshot, validated by
    :func:`resolve_as_of`; or an ISO-8601 timestamp string resolved by
    :func:`resolve_timestamp`) pins the view: ids and totals come from
    exactly those batches' log rows, reproducing the earlier read
    regardless of appends or compactions since.
    """
    if isinstance(as_of, str):
        as_of = resolve_timestamp(spark, index_path, as_of)
    try:
        rows = read_meta_rows(spark, _log_path(index_path))
        if rows is None:
            rows = (spark.read.parquet(_log_path(index_path))
                    .select("batch", *columns).collect())
        else:
            for c in columns:
                if rows and c not in rows[0]:
                    # a column absent from EVERY log file — the Spark
                    # select would throw here too
                    raise KeyError(c)
    except Exception:
        if as_of is not None:
            raise ValueError("as_of given but the index has no batch "
                             "log")
        return set(), {c: 0 for c in columns}
    if as_of is not None:
        ids = resolve_as_of(spark, index_path, as_of,
                            raw={r["batch"] for r in rows})
        kept = [r for r in rows if r["batch"] in ids]
    else:
        raw = {r["batch"] for r in rows}
        replaced = _retired(raw, _replacements(spark, index_path))
        kept = [r for r in rows if r["batch"] not in replaced]
        ids = {r["batch"] for r in kept}
    totals = {c: sum(int(r[c]) for r in kept) for c in columns}
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
                        committed: set[str],
                        prefix: str = "auto") -> str:
    """Reserve and return the auto batch id for an un-named append.

    If a previous auto-id attempt IN THIS NAMESPACE crashed (intent
    marker present, no log entry), its id is reused — smallest first,
    deterministically — so the retry deletes exactly that attempt's
    orphan directories no matter how many OTHER batches committed in
    between (the round-6 advice hole in the log-size derivation).
    Otherwise the next free id is derived past every committed AND
    reserved id, and its marker directory is created BEFORE returning,
    i.e. before any data write.

    ``prefix`` namespaces the claim: appends use ``auto``, compaction
    uses :data:`COMPACT_PREFIX`. Adoption of crashed intents never
    crosses namespaces — an append adopting a crashed COMPACTION id
    would activate that attempt's dormant replacement rows when it
    commits (and a compact retry adopting a crashed APPEND id would
    delete an in-flight append's data). This also makes one concurrent
    auto append safe alongside one compaction.
    """
    intents = open_intents(spark, index_path)
    crashed = sorted(i for i in (intents - committed)
                     if i.startswith(prefix))
    if crashed:
        return crashed[0]
    taken = committed | intents
    n = len(taken) + 1
    while f"{prefix}{n:06d}" in taken:
        n += 1
    batch_id = f"{prefix}{n:06d}"
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


def _lock_path(index_path: str, name: str) -> str:
    # locks live in their own subtree: intents/ names are batch ids
    # (open_intents/claim_auto_batch_id treat every entry as one), and
    # the 2-level batch globs never look here
    return f"{index_path}/locks/{name}.lock"


def acquire_compact_lock(spark: SparkSession, index_path: str,
                         ttl_seconds: float = 86400.0,
                         name: str = "compact") -> None:
    """Claim the index's single-compactor lock, or raise
    :class:`ConcurrentCompactionError`.

    Two compactions racing over the same sources would BOTH commit a
    full copy and readers would then double-count every compacted row —
    the one operational mistake the rest of this module's armor turns
    into silent corruption rather than a loud failure. The lock is an
    atomic ``createNewFile`` of a well-known marker: exactly one of two
    racers creates it; the loser raises. A crashed holder's stale lock
    (mtime older than ``ttl_seconds``, the same contract vacuum uses:
    the ttl must exceed the longest possible compaction) is broken —
    via an atomic RENAME to a breaker-unique tombstone, so of two
    racing breakers exactly one proceeds and the loser can never
    delete the fresh lock the winner re-created; a lock re-acquired
    between the staleness stat and the rename is detected by the
    tombstone's (rename-preserved) mtime and handed straight back.
    """
    import time as _time

    jvm = spark._jvm
    lp = jvm.org.apache.hadoop.fs.Path(_lock_path(index_path, name))
    fs = lp.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.mkdirs(lp.getParent())
    if fs.createNewFile(lp):
        return
    cutoff = _time.time() * 1000.0 - ttl_seconds * 1000.0
    try:
        seen = fs.getFileStatus(lp).getModificationTime()
    except Exception:
        # holder released between our create and stat: one retry
        if fs.createNewFile(lp):
            return
        raise ConcurrentCompactionError(
            f"another compaction holds {_lock_path(index_path, name)}")
    if seen >= cutoff:
        raise ConcurrentCompactionError(
            f"another compaction holds {_lock_path(index_path, name)} "
            f"(age under ttl_seconds={ttl_seconds}); if its holder "
            f"crashed, retry after the ttl or delete the lock")
    # stale: break it by RENAMING it to a breaker-unique tombstone —
    # the rename is the atomic arbitration point, so of two racing
    # breakers exactly one wins and the loser can never delete the
    # fresh lock the winner immediately re-creates (check-then-delete
    # let both proceed). Rename preserves mtime, so the tombstone's
    # mtime re-check still catches a lock re-acquired between our stat
    # and our rename — that one is handed straight back.
    import os as _os
    tomb = jvm.org.apache.hadoop.fs.Path(
        f"{_lock_path(index_path, name)}.broken-{_os.getpid()}-"
        f"{_time.monotonic_ns()}")
    try:
        won = fs.rename(lp, tomb)
    except Exception:
        won = False
    if not won:
        raise ConcurrentCompactionError(
            f"lost the race breaking stale lock "
            f"{_lock_path(index_path, name)}")
    try:
        t_mtime = fs.getFileStatus(tomb).getModificationTime()
    except Exception:
        t_mtime = None
    if t_mtime != seen:
        # we displaced a freshly re-acquired LIVE lock: restore it
        restored = False
        try:
            restored = fs.rename(tomb, lp)
        except Exception:
            restored = False
        if not restored:
            # a THIRD racer re-created lp between our rename and this
            # restore. The tombstone IS the displaced holder's live
            # re-acquired lock — deleting it would erase the only
            # evidence that two compactions may now be interleaved.
            # Leave it for vacuum to reap: fsck surfaces breaker
            # tombstones as warnings, so the overlap is visible to an
            # operator instead of silently swallowed.
            pass
        raise ConcurrentCompactionError(
            f"lock {_lock_path(index_path, name)} was re-acquired "
            f"while being broken")
    fs.delete(tomb, False)
    if not fs.createNewFile(lp):
        raise ConcurrentCompactionError(
            f"lost the race re-claiming stale lock "
            f"{_lock_path(index_path, name)}")


def release_compact_lock(spark: SparkSession, index_path: str,
                         name: str = "compact") -> None:
    """Drop the single-compactor lock (call in a finally around
    :func:`compact` / rebalance work)."""
    delete_glob(spark, _lock_path(index_path, name))


#: the well-known append-block marker's lock name (the ``.lock``
#: suffix keeps it under vacuum's stale-lock reaping)
APPEND_BLOCK_NAME = "append-block"


def block_appends(spark: SparkSession, index_path: str) -> None:
    """Raise the index's append-block marker: every subsequent
    vector-index append fails with :class:`AppendsBlockedError` at its
    start AND at its pre-commit check, turning "schedule rebalances
    during quiescence" from an ops convention into an enforced mode
    (``rebalance_index(..., block_appends=True)``). Idempotent; the
    marker's mtime is refreshed so a leftover stale marker becomes
    live again for this run."""
    jvm = spark._jvm
    lp = jvm.org.apache.hadoop.fs.Path(
        _lock_path(index_path, APPEND_BLOCK_NAME))
    fs = lp.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.mkdirs(lp.getParent())
    fs.delete(lp, False)
    fs.createNewFile(lp)


def unblock_appends(spark: SparkSession, index_path: str) -> None:
    """Drop the append-block marker (call in a finally around the
    blocking maintenance work)."""
    delete_glob(spark, _lock_path(index_path, APPEND_BLOCK_NAME))


def check_appends_allowed(spark: SparkSession, index_path: str,
                          ttl_seconds: float = 86400.0) -> None:
    """Raise :class:`AppendsBlockedError` while the append-block marker
    is live (younger than ``ttl_seconds`` — a crashed blocking
    rebalance must not block appends forever; vacuum also reaps the
    marker under its lock ttl). ONE FileSystem probe — the per-append
    cost of the enforced-quiescence mode."""
    import time as _time

    jvm = spark._jvm
    lp = jvm.org.apache.hadoop.fs.Path(
        _lock_path(index_path, APPEND_BLOCK_NAME))
    fs = lp.getFileSystem(spark._jsc.hadoopConfiguration())
    try:
        mtime = fs.getFileStatus(lp).getModificationTime()
    except Exception:
        return  # no marker: appends allowed
    if mtime >= _time.time() * 1000.0 - ttl_seconds * 1000.0:
        raise AppendsBlockedError(
            f"appends to {index_path!r} are blocked by a running "
            f"maintenance pass ({_lock_path(index_path, APPEND_BLOCK_NAME)}"
            f"); retry after it completes")


def check_generation_unchanged(spark: SparkSession, index_path: str,
                               gen: str | None) -> None:
    """Abort an in-flight append whose centroid generation went stale:
    re-resolve the LIVE committed view's generation and raise
    :class:`StaleGenerationError` when it differs from ``gen`` (the
    generation the append assigned against). Called by every
    vector-index append immediately before its ``log_batch`` — the
    pre-commit twin of the rebalance's own visible-set re-check, so an
    append racing a rebalance loses LOUDLY no matter which side
    commits first: if the rebalance flips first, the append aborts
    here; if the append commits first, the rebalance aborts on its
    re-check. The residual window is one log write on each side."""
    now_gen = resolve_generation(spark, index_path,
                                 committed_batches(spark, index_path))
    if now_gen != gen:
        raise StaleGenerationError(
            f"centroid generation of {index_path!r} flipped "
            f"{gen!r} -> {now_gen!r} while this append was in flight "
            f"(a rebalance committed); the append aborted before its "
            f"commit and nothing became visible — retry it (the retry "
            f"re-assigns against the live generation)")


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
    Every row carries ``committed_at_ms`` (epoch millis at commit) —
    the column :func:`resolve_timestamp` turns into time-travel; it is
    excluded from metric summing everywhere (it is a timestamp, not a
    delta).
    """
    import time as _time

    lp = _log_path(index_path)
    delete_glob(spark, f"{lp}/batch={batch_id}")
    # the constant marker keeps at least one data column next to the
    # batch partition column (Spark rejects all-partition-column writes)
    metrics = {"committed": 1,
               "committed_at_ms": int(_time.time() * 1000), **metrics}
    cols = sorted(metrics)
    # r13: the one-row log write goes through the driver-side metadata
    # writer (no Spark job, no commit protocol — atomic temp+rename
    # into the batch dir); the Spark write remains the non-local path
    vals = tuple(int(metrics[c]) for c in cols)
    if write_meta_rows(spark, lp, [vals],
                       ", ".join(f"{c} long" for c in cols),
                       partition=("batch", batch_id)):
        return
    row = [vals + (batch_id,)]
    schema = ", ".join([f"{c} long" for c in cols] + ["batch string"])
    from dsgrid_spark.session import one_slice_df
    (one_slice_df(spark, row, schema)
       .write.mode("append").partitionBy("batch").parquet(lp))


def logged_totals(spark: SparkSession, index_path: str,
                  *columns: str) -> dict[str, int]:
    """Sum the named metric columns across every committed batch.

    Stats derived from the log (plus the in-flight batch's delta) stay
    correct under retries — unlike read-modify-write against the
    previous stats file, which double-counts when a crash lands between
    the stats write and the log write. Batches replaced by a committed
    compaction contribute nothing (their metrics ride the compacted
    batch's row), so totals are invariant under compaction.
    """
    return log_snapshot(spark, index_path, *columns)[1]


def reset_log(spark: SparkSession, index_path: str) -> None:
    """Delete the exactly-once bookkeeping (batch log, intents, and
    compaction log) ahead of a full index REBUILD — called FIRST by
    every ``write_*`` so a crash mid-rebuild cannot leave committed ids
    pointing at vanished data. The compaction log must go too: a stale
    ``(replaced=X, by=Y)`` row would lie dormant until some future
    append commits a NEW batch named ``Y`` and then silently hide a
    healthy batch ``X``."""
    delete_glob(spark, _log_path(index_path))
    delete_glob(spark, _intents_path(index_path))
    delete_glob(spark, _compactions_path(index_path))
    # a dead compactor's lock must not outlive the index it was
    # compacting (the rebuild is a new lifecycle)
    delete_glob(spark, f"{index_path}/locks")


def fsck(spark: SparkSession, index_path: str,
         lock_ttl_seconds: float = 86400.0) -> dict:
    """Read-only integrity check for any index this package persists —
    the "fsck" an operator runs before trusting a tree that crashed,
    was hand-edited, or predates a fix. NEVER mutates. Verifies the
    invariants the exactly-once machinery maintains and classifies
    everything else:

    ERRORS (reads are or will be wrong/broken — fix before serving):
    unreadable batch log with data present; a payload subtree mixing
    partition columns; a MIXED flat+generation centroid/codebook
    layout (root-level partition discovery fails); a committed view
    whose centroid generation cannot be resolved or whose
    centroid/codebook tables are unreadable; a missing meta/stats row.

    WARNINGS (readable now, needs operator attention): a VISIBLE batch
    with no data directories anywhere (a crashed purge's data-less log
    row — pins into it already fail loudly, but the live view silently
    lacks its rows; also matches a legitimately empty append, which
    only the operator can tell apart); stale locks / breaker
    tombstones / append-block markers older than ``lock_ttl_seconds``.

    INFO (normal lifecycle states): crashed-append orphan dirs (vacuum
    reclaims), open intents, retired-but-unpurged batches (the reader
    grace), dormant compaction rows (a crashed compaction's inert
    replacement pairs), live locks younger than the ttl.

    Cost: FileSystem listings plus one collect of the one-row-per-batch
    log and the tiny meta/centroid tables — no payload scan. Returns
    ``{"ok": <no errors>, "kind", "errors", "warnings", "info"}``.
    """
    import time as _time

    from dsgrid_spark.pipeline.stream_index import index_kind

    errors: list[str] = []
    warnings: list[str] = []
    info: dict = {}
    kind = index_kind(spark, index_path)  # raises on non-index dirs
    out = {"kind": kind, "path": index_path}

    raw = _raw_logged(spark, index_path)
    pairs = _replacements(spark, index_path)
    visible, ingested = batch_sets(spark, index_path)
    info["visible_batches"] = len(visible)
    info["retired_batches"] = len(ingested - visible)

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()

    def _glob(pattern):
        p = jvm.org.apache.hadoop.fs.Path(pattern)
        return list(p.getFileSystem(conf).globStatus(p) or [])

    # payload layout sanity (mixed partition columns refuse compaction
    # and signal a foreign write landed in the tree)
    try:
        subs = payload_subdirs(spark, index_path)
        info["payload_subtrees"] = sorted(subs)
    except ValueError as exc:
        errors.append(str(exc))
        subs = {}

    # per-batch data-dir census over every payload subtree
    dirs_of: dict[str, int] = {}
    for st in _glob(f"{index_path}/*/*/batch=*"):
        bid = st.getPath().getName().split("=", 1)[1]
        dirs_of[bid] = dirs_of.get(bid, 0) + 1
    dataless = sorted(b for b in visible if dirs_of.get(b, 0) == 0)
    if dataless and raw:
        warnings.append(
            f"visible batches with no data directories (crashed purge's "
            f"data-less log rows, or legitimately empty appends): "
            f"{dataless}")
    orphans = sorted(set(dirs_of) - ingested)
    if orphans:
        info["orphan_batches"] = orphans  # vacuum's job
    unpurged = sorted(b for b in (ingested - visible)
                      if dirs_of.get(b, 0) > 0)
    if unpurged:
        info["retired_unpurged_batches"] = unpurged  # reader grace
    dormant = sorted({by for r, by in pairs
                      if by not in raw
                      and by not in _retired(raw, pairs)})
    if dormant:
        info["dormant_compaction_ids"] = dormant  # inert by design
    intents = sorted(open_intents(spark, index_path))
    if intents:
        info["open_intents"] = intents

    # generation-dependent tables (vector kinds)
    if kind in ("ivf", "binary", "pq"):
        from dsgrid_spark.pipeline.pq import (_read_centroids,
                                              _read_codebooks,
                                              codebook_generations)
        from dsgrid_spark.pipeline.rebalance import _flat_entries

        gens = centroid_generations(spark, index_path)
        _, flat = _flat_entries(spark, _centroids_path(index_path))
        flat_data = [st for st in flat
                     if not st.getPath().getName().startswith(("_", "."))]
        if gens and flat_data:
            errors.append(
                f"MIXED centroid layout: flat files "
                f"{[str(s.getPath().getName()) for s in flat_data]} next "
                f"to generation dirs {sorted(gens)} — root-level "
                f"partition discovery fails; a rebalance migrates this "
                f"(or remove the flat files once a committed generation "
                f"marker exists)")
        gen = None
        if visible:
            try:
                gen = resolve_generation(spark, index_path, visible)
            except ValueError as exc:
                errors.append(f"generation resolution failed: {exc}")
            if gen is not None or (not gens and not errors):
                try:
                    cents = _read_centroids(spark, index_path, gen)
                    info["n_clusters"] = len(cents)
                except ValueError as exc:
                    errors.append(str(exc))
        info["centroid_generation"] = gen
        if kind == "pq":
            marked = codebook_generations(spark, index_path)
            _, cb_flat = _flat_entries(spark, f"{index_path}/codebooks")
            cb_flat_data = [st for st in cb_flat if not
                            st.getPath().getName().startswith(("_", "."))]
            if marked and cb_flat_data:
                # NOT an error: _read_codebooks reads flat-first (flat
                # files are only removed after a retrain verifies both
                # gen-scoped copies complete), so reads stay correct in
                # this state — it's a crashed retrain awaiting retry
                warnings.append(
                    f"MIXED codebook layout: flat files next to "
                    f"generation dirs {sorted(marked)} — a crashed "
                    f"codebook retrain; reads use the flat files "
                    f"(authoritative until a retrain completes); "
                    f"re-run the rebalance to finish the migration")
            if visible and not errors:
                try:
                    _read_codebooks(spark, index_path, gen)
                except Exception as exc:
                    errors.append(f"codebooks unreadable for generation "
                                  f"{gen!r}: {exc}")

    # meta/stats row
    meta_sub = {"term": "stats", "sigs": "meta", "pq": "meta",
                "binary": "meta"}.get(kind)
    if meta_sub is not None:
        try:
            rows = read_meta_rows(spark, f"{index_path}/{meta_sub}")
            if rows is None:
                spark.read.parquet(
                    f"{index_path}/{meta_sub}").collect()[0]
            elif not rows:
                raise ValueError("empty meta row set")
        except Exception:
            errors.append(f"missing or unreadable {meta_sub}/ row")

    # locks / tombstones / append-block markers
    cutoff = _time.time() * 1000.0 - lock_ttl_seconds * 1000.0
    held, stale, tombs = [], [], []
    for st in _glob(f"{index_path}/locks/*.lock"):
        (stale if st.getModificationTime() < cutoff else held).append(
            st.getPath().getName())
    for st in _glob(f"{index_path}/locks/*.lock.broken-*"):
        tombs.append(st.getPath().getName())
    if stale:
        warnings.append(f"stale locks past lock_ttl_seconds (a crashed "
                        f"holder; vacuum reaps): {sorted(stale)}")
    if tombs:
        warnings.append(f"breaker tombstones (a crashed stale-lock "
                        f"break; vacuum reaps): {sorted(tombs)}")
    if held:
        info["held_locks"] = sorted(held)

    out["ok"] = not errors
    out["errors"] = errors
    out["warnings"] = warnings
    out["info"] = info
    return out


def _centroids_path(index_path: str) -> str:
    return f"{index_path}/centroids"


def centroid_generations(spark: SparkSession,
                         index_path: str) -> set[str]:
    """Batch ids that ESTABLISHED a centroid generation — the initial
    build (``base``) and every committed rebalance (its ``cmp`` id) —
    i.e. the ``centroids/batch=<id>`` directory names. Empty for
    indexes without centroids (term, sigs) and for the legacy flat
    ``centroids/`` layout (pre-generation builds)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(
        f"{_centroids_path(index_path)}/batch=*")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return {st.getPath().getName().split("=", 1)[1]
            for st in (fs.globStatus(p) or [])}


def resolve_generation(spark: SparkSession, index_path: str,
                       batch_ids, validate_pin: bool = False) -> str | None:
    """The centroid generation a batch view reads: the UNIQUE
    generation-establishing batch inside ``batch_ids`` (the committed
    set, or a pin). Cluster numbers are only meaningful within one
    generation — every batch in a consistent view was assigned against
    the same centroids, and the view always contains the batch that
    established them (a rebalance retires EVERY previously-visible
    batch, and :func:`compact` copies the generation marker onto any
    batch that absorbs its establisher). ``None`` means the legacy
    flat ``centroids/`` layout (single implicit generation).

    ``validate_pin=True`` (set by searches for EXPLICIT ``as_of``
    pins) additionally checks each pinned batch's commit instant
    against the generation-establishment timeline: a CAPTURED
    committed set is always consistent, but a hand-assembled pin can
    put a batch assigned under generation B next to generation A's
    marker — its cluster numbers would then be read against the wrong
    centroids, silently mis-pruning (the one generation mix
    :func:`resolve_as_of`'s replacement check cannot see, because
    post-rebalance batches are in nobody's replaced set). Generation
    IDENTITY rides the marker rows' ``gen_src`` column (transfers by
    :func:`compact` preserve it; only build/rebalance establish a new
    one), so the timeline is just the establishment markers' commit
    times."""
    gens = centroid_generations(spark, index_path)
    if not gens:
        return None
    hit = set(batch_ids) & gens
    if len(hit) != 1:
        raise ValueError(
            f"cannot resolve the centroid generation for batch view "
            f"{sorted(batch_ids)}: generation markers {sorted(gens)} "
            f"intersect it as {sorted(hit)} (expected exactly one). "
            f"The view mixes generations or its generation was purged.")
    gen = hit.pop()
    if validate_pin:
        _check_pin_generation(spark, index_path, set(batch_ids), gen)
    return gen


def _check_pin_generation(spark: SparkSession, index_path: str,
                          pin: set[str], gen: str) -> None:
    """Raise when a pinned batch committed under a DIFFERENT centroid
    generation than the pin's marker (see resolve_generation). Best
    effort by construction: batches or markers without recorded commit
    times (pre-commit-time layouts) are skipped rather than guessed."""
    try:
        cent = (spark.read.option("mergeSchema", "true")
                .parquet(_centroids_path(index_path))
                .select("batch", "gen_src").distinct().collect())
    except Exception:
        return  # pre-identity marker layout: nothing to key on
    src_of = {r["batch"]: r["gen_src"] for r in cent}
    identity = src_of.get(gen)
    if identity is None:
        return
    try:
        rows = (spark.read.option("mergeSchema", "true")
                .parquet(_log_path(index_path))
                .select("batch", "committed_at_ms").collect())
    except Exception:
        return
    at = {r["batch"]: r["committed_at_ms"] for r in rows}
    # establishment events: markers that INTRODUCED their identity
    # (gen_src == own batch id) — transfers are not identity changes
    events = sorted((int(at[b]), s) for b, s in src_of.items()
                    if s == b and at.get(b) is not None)

    def identity_at(ms: int):
        cur = None
        for t, s in events:
            if t <= ms:
                cur = s
            else:
                break
        return cur

    bad = sorted(
        b for b in pin
        if at.get(b) is not None
        and identity_at(int(at[b])) not in (None, identity))
    if bad:
        raise ValueError(
            f"as_of pin mixes centroid generations: batches {bad} "
            f"committed under a different generation than the pin's "
            f"marker {gen!r} ({identity!r}) — their cluster numbers "
            f"would be read against the wrong centroids. Pin a SET "
            f"captured from committed_batches(...), or a timestamp.")


def payload_subdirs(spark: SparkSession,
                    index_path: str) -> dict[str, str]:
    """Discover the index's payload subtrees: every first-level subdir
    holding the shared ``<subdir>/<col>=K/batch=B`` layout, mapped to
    its partition column name. Derived from the tree itself (the same
    two-level glob :func:`vacuum` trusts), so :func:`compact` needs no
    per-index schema registry — postings/sigs/codes/bits/vectors are
    all found, while ``batches/`` (one level), ``meta/``, and
    ``centroids/`` (no batch dirs) never match."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(f"{index_path}/*/*/batch=*")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    subs: dict[str, str] = {}
    for st in (fs.globStatus(p) or []):
        coldir = st.getPath().getParent()
        sub = coldir.getParent().getName()
        col = coldir.getName().split("=", 1)[0]
        if subs.setdefault(sub, col) != col:
            raise ValueError(
                f"subtree {sub!r} mixes partition columns "
                f"({subs[sub]!r} and {col!r}); refusing to compact")
    return subs


def compact(spark: SparkSession, index_path: str,
            batches: list[str] | None = None,
            purge: bool = False,
            lock_ttl_seconds: float = 86400.0) -> str | None:
    """Merge committed batch directories into ONE coalesced batch,
    exactly-once and crash-safe — the maintenance pass that keeps a
    daily-append index from drowning in small files (a year of appends
    is 365 ``batch=`` dirs per partition key; scan-task scheduling and
    file listing degrade long before the bytes do).

    Every payload subtree (:func:`payload_subdirs`) is rewritten for
    the source batches into ``batch=<new id>`` with one shuffle per
    subtree (``repartition`` on the partition key — the same file
    shape as a fresh build), the source batches' log metrics are summed
    onto the new batch's log row (so :func:`logged_totals` is invariant
    under compaction), and the replacement is recorded in
    ``compactions/`` BEFORE the commit. The sequence:

    1. claim an auto id (intent marker — a crashed compaction retries
       under the same id and cleans its own orphans);
    2. delete any previous attempt's data dirs and compaction rows;
    3. rewrite payloads; 4. write ``(replaced, by)`` rows;
    5. ``log_batch`` — THE COMMIT: the new batch becomes visible and
       the sources invisible at this instant, atomically, because
       readers resolve "replaced" only against logged ``by`` ids;
    6. clear the intent.

    Source data/log rows are NOT deleted here unless ``purge=True``
    (safe only when no reader is live); the default leaves them for
    :func:`vacuum`, whose ``ttl_seconds`` contract guarantees any
    reader that planned against the pre-compaction snapshot has
    finished. ONE COMPACTOR AT A TIME per index, ENFORCED: the run
    holds the :func:`acquire_compact_lock` marker for its duration —
    two concurrent compactions over the same sources would both commit
    a full copy and readers would double-count every compacted row, so
    the second compactor raises :class:`ConcurrentCompactionError`
    instead (``lock_ttl_seconds`` is the stale-lock grace; it must
    exceed the longest possible compaction). Concurrent APPENDS are
    safe: an uncommitted batch is not visible, so it is never a
    source, and the ``cmp`` id namespace keeps the compactor's intent
    from ever colliding with an append's (see :data:`COMPACT_PREFIX`).

    ``batches=None`` compacts every visible batch; an explicit list
    must name visible batches only. Returns the new batch id, or None
    when there is nothing to merge (fewer than two sources).
    """
    acquire_compact_lock(spark, index_path,
                         ttl_seconds=lock_ttl_seconds)
    try:
        return _compact_locked(spark, index_path, batches, purge)
    finally:
        release_compact_lock(spark, index_path)


def _compact_locked(spark: SparkSession, index_path: str,
                    batches: list[str] | None,
                    purge: bool) -> str | None:
    visible, ingested = batch_sets(spark, index_path)
    if batches is None:
        sources = sorted(visible)
    else:
        sources = sorted(set(batches))
        unknown = set(sources) - visible
        if unknown:
            raise ValueError(
                f"cannot compact non-visible batches: {sorted(unknown)}"
                " (not committed, or already replaced)")
    if len(sources) < 2:
        return None
    batch_id = claim_auto_batch_id(spark, index_path, ingested,
                                   prefix=COMPACT_PREFIX)
    delete_glob(spark, f"{index_path}/*/*/batch={batch_id}")
    delete_glob(spark, f"{_compactions_path(index_path)}/by={batch_id}")
    delete_glob(spark,
                f"{_centroids_path(index_path)}/batch={batch_id}")
    delete_glob(spark, f"{index_path}/codebooks/batch={batch_id}")
    log_rows = (spark.read.parquet(_log_path(index_path))
                .filter(F.col("batch").isin(sources)).collect())
    metrics = {}
    for r in log_rows:
        for c, v in r.asDict().items():
            if c in ("batch", "committed", "committed_at_ms") \
                    or v is None:
                continue
            metrics[c] = metrics.get(c, 0) + int(v)
    subs = payload_subdirs(spark, index_path)
    if not subs:
        # committing a data-less batch while marking sources replaced
        # would purge real data later — refuse loudly instead
        raise ValueError(f"no <subdir>/<col>=K/batch=B payload found "
                         f"under {index_path!r}; not an index tree?")
    for sub, col in sorted(subs.items()):
        df = (spark.read.parquet(f"{index_path}/{sub}")
              .filter(F.col("batch").isin(sources)))
        (df.drop("batch").withColumn("batch", F.lit(batch_id))
           .repartition(F.col(col))
           .write.mode("append").partitionBy(col, "batch")
           .parquet(f"{index_path}/{sub}"))
    # absorbing the batch that ESTABLISHED the current centroid
    # generation transfers its marker: the compacted batch becomes the
    # establisher of the SAME generation (identical centroid rows
    # under the new batch id), so readers' generation resolution —
    # "the unique gen-marked batch in my view" — keeps working after
    # the source retires. Tiny payload (K centroid rows).
    gen_sources = centroid_generations(spark, index_path) & set(sources)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    for g in sorted(gen_sources):
        # gen-scoped dirs are read DIRECTLY (pq._read_centroids's
        # convention): a legacy index with a crashed half-migrated
        # centroid layout stays compactable
        (spark.read.parquet(f"{_centroids_path(index_path)}/batch={g}")
           .withColumn("batch", F.lit(batch_id))
           .coalesce(1)
           .write.mode("append").partitionBy("batch")
           .parquet(_centroids_path(index_path)))
        # a generation-scoped codebook table (retrained PQ) rides the
        # same marker transfer — the absorbing batch becomes the
        # establisher of the SAME generation for both tables
        cb = f"{index_path}/codebooks/batch={g}"
        cbp = jvm.org.apache.hadoop.fs.Path(cb)
        if cbp.getFileSystem(conf).exists(cbp):
            (spark.read.parquet(cb)
               .withColumn("batch", F.lit(batch_id))
               .coalesce(1)
               .write.mode("append").partitionBy("batch")
               .parquet(f"{index_path}/codebooks"))
        # the generation's drift-calibration record rides the same
        # transfer (missing it is harmless — the auto gate would just
        # recalibrate — but carrying it keeps the gate armed)
        db = f"{index_path}/drift_baseline/batch={g}"
        dbp = jvm.org.apache.hadoop.fs.Path(db)
        if dbp.getFileSystem(conf).exists(dbp):
            (spark.read.parquet(db)
               .withColumn("batch", F.lit(batch_id))
               .coalesce(1)
               .write.mode("append").partitionBy("batch")
               .parquet(f"{index_path}/drift_baseline"))
    if not write_meta_rows(spark, _compactions_path(index_path),
                           [(s,) for s in sources], "replaced string",
                           partition=("by", batch_id)):
        from dsgrid_spark.session import one_slice_df
        (one_slice_df(spark, [(s, batch_id) for s in sources],
                      "replaced string, by string")
           .write.mode("append").partitionBy("by")
           .parquet(_compactions_path(index_path)))
    log_batch(spark, index_path, batch_id, **metrics)
    clear_intent(spark, index_path, batch_id)
    if purge:
        purge_replaced(spark, index_path)
    return batch_id


def compact_if_fragmented(spark: SparkSession, index_path: str,
                          max_batches: int = 32,
                          purge: bool = False,
                          lock_ttl_seconds: float = 86400.0) -> str | None:
    """The cron-shaped maintenance gate for :func:`compact`: merge only
    when the VISIBLE batch count exceeds ``max_batches`` — one log read
    when healthy, the full rewrite only past the threshold (the
    rebalance_if_skewed convention). A steady daily-append index then
    self-limits to ~max_batches directories per partition key without
    paying a rewrite per cron tick. Returns the new batch id or None.
    """
    if max_batches < 1:
        raise ValueError(f"max_batches must be positive, got "
                         f"{max_batches}")
    if len(committed_batches(spark, index_path)) <= max_batches:
        return None
    return compact(spark, index_path, purge=purge,
                   lock_ttl_seconds=lock_ttl_seconds)


def purge_replaced(spark: SparkSession, index_path: str,
                   older_than_ms: float | None = None) -> dict[str, int]:
    """Delete the data directories and log rows of batches replaced by
    a COMMITTED compaction. ``older_than_ms`` (epoch millis) gives
    readers a grace window measured FROM THE RETIREMENT INSTANT: a
    batch is skipped while the compaction that retired it (its direct
    replacer's ``compactions/by=…`` dir, or the replacer's own log
    row) is younger than the cutoff — the moment the sources became
    invisible, NOT the sources' own write times, which may predate the
    compaction by months (keying on those purged just-replaced data
    out from under a reader seconds after the commit).
    :func:`vacuum` passes its ttl cutoff; ``None`` purges immediately
    (offline maintenance). Deletion order is data first, log row last:
    a crash in between leaves a data-less log row that stays invisible
    (still marked retired — resolution is transitive, :func:`_retired`)
    and is finished by the next purge. Compaction rows themselves are
    never deleted — they are the permanent guard against reuse of
    retired ids."""
    raw = _raw_logged(spark, index_path)
    pairs = _replacements(spark, index_path)
    replaced = _retired(raw, pairs)
    direct_by = {r: by for r, by in pairs}
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()

    def _mtime(path_str):
        p = jvm.org.apache.hadoop.fs.Path(path_str)
        fs = p.getFileSystem(conf)
        sts = list(fs.globStatus(p) or [])
        return max((st.getModificationTime() for st in sts),
                   default=None)

    removed_dirs = 0
    removed_log_rows = 0
    for bid in sorted(replaced & raw):
        if older_than_ms is not None:
            by = direct_by.get(bid)
            retired_at = max(
                (t for t in (
                    _mtime(f"{_compactions_path(index_path)}/by={by}"),
                    _mtime(f"{_log_path(index_path)}/batch={by}"))
                 if t is not None),
                default=None)
            # unknown retirement time (replacer already purged of both
            # artifacts) means the retirement is at least one full
            # purge cycle old — eligible
            if retired_at is not None and retired_at >= older_than_ms:
                continue
        p = jvm.org.apache.hadoop.fs.Path(
            f"{index_path}/*/*/batch={bid}")
        fs = p.getFileSystem(conf)
        dirs = list(fs.globStatus(p) or [])
        for st in dirs:
            fs.delete(st.getPath(), True)
            removed_dirs += 1
        # a retired generation-establishing batch's centroid (and, for
        # retrained PQ, codebook) dirs go with its data
        # (compact/rebalance already transferred the live generation's
        # marker to the replacing batch); pins into that generation
        # fail loudly at resolve_generation afterwards
        removed_dirs += delete_glob(
            spark, f"{_centroids_path(index_path)}/batch={bid}")
        removed_dirs += delete_glob(
            spark, f"{index_path}/codebooks/batch={bid}")
        removed_dirs += delete_glob(
            spark, f"{index_path}/drift_baseline/batch={bid}")
        removed_log_rows += delete_glob(
            spark, f"{_log_path(index_path)}/batch={bid}")
    return {"data_dirs_removed": removed_dirs,
            "log_rows_removed": removed_log_rows}


def vacuum(spark: SparkSession, index_path: str,
           ttl_seconds: float = 86400.0,
           lock_ttl_seconds: float = 86400.0) -> dict[str, int]:
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
    ``batches/batch=B`` log itself. Batches replaced by a committed
    compaction are purged under the same cutoff
    (:func:`purge_replaced`); for the orphan rules above, "committed"
    means EVER LOGGED OR REPLACED — a replaced-but-unpurged batch is
    retired bookkeeping handled by the purge pass, never an orphan.
    Stale compactor locks are reaped under ``lock_ttl_seconds`` — a
    ttl INDEPENDENT of the reader-grace ``ttl_seconds``, so shortening
    reader grace can never delete a live compactor's lock. Returns
    removal counts.
    """
    import time as _time

    cutoff = _time.time() * 1000.0 - ttl_seconds * 1000.0
    purged = purge_replaced(spark, index_path, older_than_ms=cutoff)
    committed = batch_sets(spark, index_path)[1]
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()

    def statuses(pattern):
        p = jvm.org.apache.hadoop.fs.Path(pattern)
        fs = p.getFileSystem(conf)
        return fs, list(fs.globStatus(p) or [])

    fs_i, intent_sts = statuses(f"{_intents_path(index_path)}/*")
    fs_d, data_sts = statuses(f"{index_path}/*/*/batch=*")
    # a crashed rebalance's centroid (and codebook) generation dirs
    # are artifacts of its (uncommitted) batch like any payload dir —
    # judged and deleted with the batch as a unit
    data_sts = data_sts + statuses(
        f"{_centroids_path(index_path)}/batch=*")[1]
    data_sts = data_sts + statuses(
        f"{index_path}/codebooks/batch=*")[1]
    data_sts = data_sts + statuses(
        f"{index_path}/drift_baseline/batch=*")[1]

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
        if bid in batch_sets(spark, index_path)[1]:
            continue
        _, fresh = statuses(f"{index_path}/*/*/batch={bid}")
        fresh = fresh + statuses(
            f"{_centroids_path(index_path)}/batch={bid}")[1]
        fresh = fresh + statuses(
            f"{index_path}/codebooks/batch={bid}")[1]
        fresh = fresh + statuses(
            f"{index_path}/drift_baseline/batch={bid}")[1]
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
    # a compactor that died holding the single-compactor lock would
    # otherwise block compaction until someone notices. Staleness is
    # judged on ``lock_ttl_seconds`` — a SEPARATE ttl from the
    # reader-grace ``ttl_seconds``: an operator shortening the reader
    # grace (its documented purpose) must not thereby delete a LIVE
    # compactor's lock and re-enable the concurrent-compaction
    # double-count the lock exists to prevent. Crashed breakers'
    # tombstones (``*.lock.broken-*``) are reaped under the same ttl.
    lock_cutoff = _time.time() * 1000.0 - lock_ttl_seconds * 1000.0
    removed_locks = 0
    for pattern in (f"{index_path}/locks/*.lock",
                    f"{index_path}/locks/*.lock.broken-*"):
        fs_l, lock_sts = statuses(pattern)
        for st in lock_sts:
            if st.getModificationTime() < lock_cutoff:
                fs_l.delete(st.getPath(), False)
                removed_locks += 1
    return {"data_dirs_removed": removed_dirs + purged["data_dirs_removed"],
            "intents_removed": removed_intents,
            "replaced_log_rows_removed": purged["log_rows_removed"],
            "stale_locks_removed": removed_locks}
