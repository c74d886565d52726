"""Sinks: parquet (size-targeted), csv, json.

Reference dsgrid/utils/spark.py:530-657. The reference writes, measures
files, then rewrites with coalesce/repartition to hit ~128 MB; Spark-first
we set ``maxRecordsPerFile``/AQE coalescing and (optionally) a rebalance
repartition BEFORE the single write — no second pass over the data.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame

from dsgrid_spark.common import MAX_PARTITION_SIZE_MB


def write_parquet(df: DataFrame, path: str | Path, *,
                  target_partition_mb: int = MAX_PARTITION_SIZE_MB,
                  partition_by: list[str] | None = None,
                  overwrite: bool = True) -> None:
    """Single-pass parquet write targeting ~target_partition_mb files.

    AQE's coalescePartitions already merges small shuffle outputs;
    ``maxRecordsPerFile`` is derived from plan statistics / schema width
    (no extra job — see ``_records_per_file``). At cluster scale prefer
    ``partition_by`` on a low-cardinality dimension (scenario/model_year)
    so downstream queries prune partitions.
    """
    writer = df.write.mode("overwrite" if overwrite else "error")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.option("maxRecordsPerFile", _records_per_file(df, target_partition_mb))
    writer.parquet(str(path))


def _records_per_file(df: DataFrame, target_mb: int) -> int:
    """Rows per file WITHOUT running a job.

    Estimate the encoded row width from the schema (plus Catalyst's
    ``sizeInBytes``/``rowCount`` statistics when the optimizer has them —
    parquet footers provide both for plain scans). The old
    ``limit(1000).collect()`` sample cost a full extra job per sink call;
    at cluster scale a sink must not launch jobs beyond the write itself.
    """
    size = row_count = None
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        size = int(stats.sizeInBytes().toString())
        rc = stats.rowCount()
        row_count = int(rc.get().toString()) if rc.isDefined() else None
    except Exception:
        pass
    if size is not None and row_count:
        # in-plan size is uncompressed columnar; parquet lands ~3x smaller
        row_bytes = max(1, size // row_count)
        rows = (target_mb * 1024 * 1024 * 3) // row_bytes
    else:
        from pyspark.sql import types as T

        fixed = {T.BooleanType: 1, T.ByteType: 1, T.ShortType: 2,
                 T.IntegerType: 4, T.FloatType: 4, T.DateType: 4,
                 T.LongType: 8, T.DoubleType: 8, T.TimestampType: 8}
        width = sum(fixed.get(type(f.dataType), 24)
                    for f in df.schema.fields) or 8
        rows = (target_mb * 1024 * 1024 * 3) // width
    return int(min(max(rows, 10_000), 50_000_000))


def compact_parquet(spark, path: str | Path, *,
                    target_mb: int = MAX_PARTITION_SIZE_MB,
                    min_fill: float = 0.5,
                    partition_by: list[str] | None = None) -> dict:
    """Small-files compaction: rewrite a parquet dataset whose average
    data file is below ``min_fill * target_mb`` into ~target_mb files.

    The 100 TB problem this solves: streaming sinks, incremental batch
    appends, and over-parallel writes accumulate thousands of KB-scale
    files per dataset; every downstream scan then pays a task + footer
    read per file, and the driver pays the listing. Compaction is ONE
    read → repartition(total_bytes / target) → write pass; the file
    listing is metadata-only through the filesystem interface (works
    over file:// and object-store URIs).

    Swap is rename-based: write to a temp dir, move the old dir aside,
    move the new one in, delete the old. Atomic on local/HDFS; on object
    stores rename is a copy, and the swap is NOT safe under concurrent
    readers — run compaction in a maintenance window or on a new version
    directory (the registry's immutable-version layout does the latter
    by construction). Returns a report dict; ``skipped=True`` when the
    dataset is already compact.
    """
    from dsgrid_spark.filesystem import filesystem_for

    path = str(path)
    fs = filesystem_for(spark, path)
    files = fs.list_sizes(path)
    total = sum(sz for _, sz in files)
    report = {"files_before": len(files), "bytes": total,
              "target_mb": target_mb, "skipped": False}
    if len(files) <= 1 or (
            total / max(len(files), 1)) >= min_fill * target_mb * 1024 * 1024:
        report["skipped"] = True
        report["files_after"] = len(files)
        return report
    n_target = max(1, -(-total // (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp, old = f"{path}__compact_tmp", f"{path}__compact_old"
    for leftover in (tmp, old):
        if fs.exists(leftover):
            fs.rm_tree(leftover)
    writer = df.repartition(int(n_target)).write.mode("error")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)
    # Hadoop's FileSystem.rename reports failure by RETURNING False, not
    # raising (ADVICE r4): every rename result must be checked, or a failed
    # second rename would skip the restore branch and rm_tree(old) would
    # delete the only copy of the dataset.
    if not fs.rename(path, old):
        raise IOError(f"compaction aborted: could not move {path} aside")
    try:
        if not fs.rename(tmp, path):
            raise IOError(f"compaction swap failed: could not move {tmp} "
                          f"into place at {path}")
    except BaseException:
        # restore: never leave the dataset path empty
        if not fs.rename(old, path):
            raise IOError(
                f"compaction restore FAILED: dataset preserved at {old}; "
                f"manually move it back to {path}"
            )
        raise
    fs.rm_tree(old)
    report["files_after"] = len(fs.list_sizes(path))
    return report


def write_csv(df: DataFrame, path: str | Path, single_file: bool = False) -> None:
    """CSV sink; ``single_file`` routes via pandas for small result tables
    (reference query_submitter.py:640-641)."""
    if single_file:
        df.toPandas().to_csv(str(path), index=False)
    else:
        df.write.mode("overwrite").option("header", True).csv(str(path))


def write_json(df: DataFrame, path: str | Path) -> None:
    df.write.mode("overwrite").json(str(path))


def write_zip(df: DataFrame, path: str | Path,
              table_format: str = "parquet") -> Path:
    """Write the result table and bundle it into one zip file
    (reference query_submitter.py:630-634 — used to hand a query result
    to a user as a single artifact). Driver-side zipfile over the
    written files; the write itself is distributed as usual."""
    import tempfile
    import zipfile

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        inner = Path(td) / f"table.{table_format}"
        if table_format == "parquet":
            write_parquet(df, inner)
        elif table_format == "csv":
            write_csv(df, inner)
        else:
            raise ValueError(f"unsupported zip table format {table_format!r}")
        with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
            for f in sorted(inner.rglob("*")):
                if f.is_file() and not f.name.startswith("."):
                    zf.write(f, f.relative_to(Path(td)))
    return path


def write_training_shards(df: DataFrame, path: str | Path, n_shards: int,
                          key_column: str, salt: str = "",
                          manifest: bool = True) -> dict | None:
    """Deterministic sharded export of a training mix.

    Rows land in ``shard=K`` directories by content hash of the key —
    stable across runs, engines, and cluster layouts (``df.sample``/
    ``repartition`` alone are not) — and are pseudo-shuffled within each
    shard by an independent hash (the 'global shuffle at export' that
    training dataloaders rely on, done once here instead of at read
    time). Returns the manifest (per-shard row counts) when requested.

    Scale: one shuffle (repartition on the shard id), an in-partition
    sort (no extra exchange), one write. The manifest adds one aggregate
    pass whose shuffle carries ``n_shards`` rows; skip it with
    ``manifest=False`` when the export is on the critical path.
    """
    import json

    from pyspark.sql import functions as F

    from dsgrid_spark.pipeline.sampling import hash_bucket

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    path = Path(path)
    key = F.col(key_column)
    tagged = (
        df.withColumn("shard", hash_bucket(key, salt) % n_shards)
        .withColumn("__ord", hash_bucket(key, salt + "|order"))
    )
    (
        tagged.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "__ord", key_column)
        .drop("__ord")
        .write.mode("overwrite").partitionBy("shard")
        .parquet(str(path))
    )
    if not manifest:
        return None
    counts = {
        int(r["shard"]): r["count"]
        for r in tagged.groupBy("shard").count().collect()
    }
    info = {
        "n_shards": n_shards,
        "key_column": key_column,
        "salt": salt,
        "rows_total": sum(counts.values()),
        "rows_per_shard": {str(k): counts.get(k, 0) for k in range(n_shards)},
    }
    (path / "_manifest.json").write_text(json.dumps(info, indent=2))
    return info


def write_bucketed(df: DataFrame, table: str, bucket_columns: list[str],
                   n_buckets: int = 64, sort_columns: list[str] | None = None,
                   overwrite: bool = True) -> None:
    """Persist as a bucketed table so repeated joins/aggregations on the
    bucket keys skip their shuffle entirely.

    At 100 TB the fact table is written once bucketed by its hottest join
    key (e.g. the two-table surrogate ``id`` or ``geography``); every
    subsequent query joins/aggregates shuffle-free on that key. Requires
    ``saveAsTable`` (bucket metadata lives in the session catalog).
    """
    writer = df.write.format("parquet").mode(
        "overwrite" if overwrite else "error"
    ).bucketBy(n_buckets, *bucket_columns)
    if sort_columns:
        writer = writer.sortBy(*sort_columns)
    writer.saveAsTable(table)


def diagnose_skew(df: DataFrame, column: str, k: int = 10) -> list[tuple]:
    """Top-k key frequencies — the reference's skew trigger was found by
    watching one executor spill 4 GiB (utils/dataset.py:719-741); this
    surfaces it up front so ``salt_partitions`` can be set deliberately."""
    from pyspark.sql import functions as F

    rows = (
        df.groupBy(column).count()
        .orderBy(F.desc("count")).limit(k).collect()
    )
    return [(r[column], r["count"]) for r in rows]


def _spread16(x):
    """Interleave-ready bit spread: 16-bit value -> even bit positions of
    a 32-bit lane (classic Morton magic numbers), as column arithmetic."""
    from pyspark.sql import functions as F

    x = x.cast("long").bitwiseAND(F.lit(0xFFFF))
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def zorder_key(columns, mins: list[float], maxs: list[float]):
    """Morton key over 2 numeric columns, each min-max binned to 16
    bits — pure column arithmetic."""
    from pyspark.sql import functions as F

    if len(columns) != 2:
        raise ValueError("zorder_key interleaves exactly 2 columns")
    lanes = []
    for c, lo, hi in zip(columns, mins, maxs):
        span = (hi - lo) or 1.0
        binned = F.least(
            F.lit(65535),
            F.greatest(
                F.lit(0),
                F.floor((c.cast("double") - F.lit(float(lo)))
                        * F.lit(65536.0 / span)).cast("long")))
        lanes.append(_spread16(binned))
    return lanes[0].bitwiseOR(F.shiftleft(lanes[1], 1))


def write_zordered(df: DataFrame, path: str | Path, columns: list[str],
                   n_files: int = 16) -> None:
    """Write parquet Z-ORDERED on two numeric columns (Morton-interleaved
    16-bit bins, range-partitioned into ~n_files files) so parquet
    row-group min/max stats prune scans filtered on EITHER column — the
    Delta-OPTIMIZE-ZORDER layout technique without the table format.

    A plain sort on (a, b) clusters a perfectly but scatters b; the
    Z-curve keeps both dimensions locally clustered, so a selective
    filter on either one touches a bounded fraction of files. Bin
    bounds come from one min/max aggregate (a 4-scalar job).
    """
    from pyspark.sql import functions as F

    a, b = (F.col(c) for c in columns)
    agg = df.agg(F.min(a).cast("double"), F.max(a).cast("double"),
                 F.min(b).cast("double"), F.max(b).cast("double")).collect()[0]
    lo_a, hi_a, lo_b, hi_b = (float(x) for x in agg)
    z = zorder_key([a, b], [lo_a, lo_b], [hi_a, hi_b])
    (df.withColumn("__z", z)
       .repartitionByRange(n_files, "__z")
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode("overwrite").parquet(str(path)))
