"""SparkSession management.

Design stance (SURVEY.md §7.1): ONE long-lived session for the whole query
lifecycle — the reference restarts the JVM per dataset and passes parquet
paths between phases (dsgrid/project.py:279-283); we instead scope conf
changes on the live session and let AQE re-plan at runtime.

All defaults target scale: AQE on (runtime coalescing + skew-join
handling), broadcast threshold generous enough for dimension/mapping
tables, Arrow enabled for the few Pandas-UDF paths.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

_DEFAULT_CONF = {
    # AQE replaces the reference's manual repartition/salting in most cases
    # (dsgrid/utils/dataset.py:695-758); keep salting only as escape hatch.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # r12 (guide §2.2): let AQE re-plan (and coalesce) the shuffles that
    # MATERIALIZE persisted plans. Off, every persist().count() of a
    # tiny aggregated table runs all spark.sql.shuffle.partitions reduce
    # tasks (measured: q30's eager cache fills at 32-33 tasks each for
    # 250-row tables; the slot dropped 11.0 -> 9.0 s with this on); at
    # corpus scale the same knob sizes cached-plan shuffles by bytes
    # instead of a fixed count. Trade-off: a cached plan's output
    # partitioning may change across materializations, which nothing in
    # this engine relies on (no zipPartitions over cached frames).
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    # dimension / mapping tables are tiny; let Spark broadcast aggressively
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Arrow for pandas_udf / applyInPandas paths (pipeline operators)
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # match the reference's parquet timestamp convention
    # (dsgrid/spark/functions.py:289-298)
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # read TIMESTAMP(NANOS) parquet columns as long (reference
    # dsgrid/spark/functions.py:289-298 sets the same)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
}


def get_spark(app_name: str = "dsgrid-spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the engine session with scale-oriented defaults."""
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = builder.master(master)
    # In local mode the driver JVM IS the executor; the 1g default heap
    # starves 32 task threads and spills everything. Static confs, so set
    # at build time; no-ops when attaching to a live session.
    builder = builder.config(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
    builder = builder.config(
        "spark.driver.maxResultSize",
        os.environ.get("SPARK_GRAFT_MAX_RESULT", "4g"))
    for k, v in _DEFAULT_CONF.items():
        builder = builder.config(k, v)
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return builder.getOrCreate()


def apply_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-created session."""
    for k, v in _DEFAULT_CONF.items():
        if k.startswith("spark.sql."):
            try:
                spark.conf.set(k, v)
            except Exception:  # static confs on a live session — skip
                pass
    return spark


@contextmanager
def scoped_conf(spark: SparkSession, conf: dict):
    """Scope runtime-settable confs without a session restart.

    The reference restarts the whole session to apply
    ``spark_conf_per_dataset`` (dsgrid/project.py:279-283); runtime confs
    (shuffle partitions, AQE knobs, session tz) don't need that. Note the
    scope only affects *executions* happening inside it — pair with an
    eager materialization (cache write) for per-dataset confs.
    """
    prior: dict[str, str | None] = {}
    for k, v in conf.items():
        try:
            prior[k] = spark.conf.get(k)
        except Exception:
            prior[k] = None
        spark.conf.set(k, str(v))
    try:
        yield spark
    finally:
        for k, v in prior.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def ensure_min_partitions(df, min_partitions: int | None = None):
    """Round-robin repartition ``df`` iff it has fewer partitions than the
    session's core count (``sparkContext.defaultParallelism`` by default).

    Heavy per-row expression work (minhash/simhash folds, shingle
    construction) inherits the scan's partitioning. A small input — one
    parquet file, a broadcast-semi-join survivor set — arrives as 1-2
    partitions, so a 5 s fold runs on one core while 31 idle. On a real
    corpus the scan already has thousands of splits and this is a no-op,
    which is exactly the right scale behavior: pay a tiny shuffle only
    when the cluster is wider than the data.

    Checking ``rdd.getNumPartitions()`` converts the plan but launches no
    job.
    """
    if min_partitions is None:
        min_partitions = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= min_partitions:
        return df
    return df.repartition(min_partitions)


def one_slice_df(spark: SparkSession, rows, schema):
    """``createDataFrame`` for SMALL driver-side row lists destined for
    a single-file write (meta rows, batch-log rows, centroid tables).

    Plain ``createDataFrame(list)`` parallelizes into
    ``defaultParallelism`` Python slices; a downstream ``coalesce(1)``
    then evaluates ALL of them sequentially inside one task — 32
    Python-worker round-trips, measured ~3 s PER TINY WRITE on
    local[32] (a PQ index build pays it four times: centroids,
    codebooks, meta, log). One explicit slice makes it one round-trip
    (~0.3 s). Only for driver-bounded lists — anything scale-bearing
    wants the parallel default.

    r12 optimization (guide §4: eliminate the JVM↔Python boundary):
    rows of plain scalars/arrays are planned as a JVM LITERAL relation
    (``range(1, numPartitions=1).select(inline(array(structs)))``) —
    ZERO Python-worker launches, so every action that scans the frame
    (a log write, a meta write, a broadcast qterms fan-out re-read per
    job) skips the pickled-RDD round-trip entirely (measured ~0.21 s →
    ~0.04 s per tiny write; an index build pays it 2-4 times). Rows
    whose literal tree would be large (> ~4096 scalar cells, e.g. a
    4096×64 centroid table) or whose values aren't plain
    scalars/lists keep the one-slice pickled-RDD path — Catalyst
    analysis of a huge literal tree costs more than one Python task.
    """
    rows = list(rows)
    sch = schema
    if isinstance(sch, str):
        from pyspark.sql.types import StructType
        try:
            sch = StructType.fromDDL(sch)
        except Exception:
            sch = None
    lit_df = (_literal_rows_df(spark, rows, sch)
              if sch is not None else None)
    if lit_df is not None:
        return lit_df
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)


_ONE_SLICE_LITERAL_CELL_CAP = 4096


def _literal_rows_df(spark: SparkSession, rows, schema):
    """JVM-literal plan for :func:`one_slice_df`, or None when the rows
    don't fit the literal fast path (empty, too many cells, or values
    that aren't plain scalars / nested lists of scalars).

    The relation is built as ONE SQL string handed to a single
    ``F.expr`` — building the same tree through the Column API costs
    ~3 ms of py4j round trips PER CELL (measured 15 s for a 512-row
    label table), which is slower than the pickled-RDD path it
    replaces. Literal forms are chosen so the parsed value is exactly
    the Python value: ``CAST('<repr>' AS DOUBLE)`` round-trips every
    finite double, ints are bounds-checked against their target width
    (a silent non-ANSI overflow-to-NULL would diverge from
    createDataFrame, which raises), strings are backslash-escaped,
    bytes ride as ``X'hex'``."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (ArrayType, BinaryType, BooleanType,
                                   ByteType, DoubleType, FloatType,
                                   IntegerType, LongType, ShortType,
                                   StringType)

    rows = list(rows)
    if not rows:
        return None

    import math

    int_bounds = {ByteType: 7, ShortType: 15, IntegerType: 31,
                  LongType: 63}
    # literal path only for values whose PYTHON type already matches the
    # declared field type — a blanket cast would silently parse e.g. a
    # str into a timestamp where createDataFrame raises, and this fast
    # path must be semantics-identical to the pickled-RDD one
    type_ok = {BooleanType: bool, ByteType: int, ShortType: int,
               IntegerType: int, LongType: int,
               FloatType: (int, float), DoubleType: (int, float),
               StringType: str, BinaryType: (bytes, bytearray)}

    cells = 0

    def sql_cell(val, dt):
        nonlocal cells
        cells += 1
        if cells > _ONE_SLICE_LITERAL_CELL_CAP:
            raise TypeError("literal tree too large")
        ddl = dt.simpleString()
        if val is None:
            return f"CAST(NULL AS {ddl})"
        if isinstance(dt, ArrayType):
            if not isinstance(val, (list, tuple)):
                raise TypeError("array field expects a list")
            if not val:
                return f"CAST(array() AS {ddl})"
            inner = ", ".join(sql_cell(v, dt.elementType) for v in val)
            return f"CAST(array({inner}) AS {ddl})"
        ok = type_ok.get(type(dt))
        if (ok is None or not isinstance(val, ok)
                or (isinstance(val, bool)
                    and not isinstance(dt, BooleanType))):
            raise TypeError(f"no literal form for {type(val).__name__}")
        if isinstance(dt, BooleanType):
            return "TRUE" if val else "FALSE"
        if isinstance(dt, (FloatType, DoubleType)):
            v = float(val)
            if not math.isfinite(v):
                raise TypeError("non-finite float")
            return f"CAST('{v!r}' AS {ddl})"
        if isinstance(dt, StringType):
            s = val.replace("\\", "\\\\").replace("'", "\\'")
            return f"'{s}'"
        if isinstance(dt, BinaryType):
            return f"X'{bytes(val).hex()}'"
        b = int_bounds[type(dt)]
        if not -(1 << b) <= val < (1 << b):
            raise TypeError("int out of range for declared type")
        return f"CAST({int(val)} AS {ddl})"

    try:
        structs = []
        for row in rows:
            if len(row) != len(schema.fields):
                raise TypeError("row width != schema width")
            fields = ", ".join(
                "'%s', %s" % (f.name.replace("\\", "\\\\")
                              .replace("'", "\\'"),
                              sql_cell(v, f.dataType))
                for v, f in zip(row, schema.fields))
            structs.append(f"named_struct({fields})")
    except TypeError:
        return None
    lit_df = spark.range(0, 1, 1, 1).select(
        F.expr("inline(array(%s))" % ", ".join(structs)))
    # union with an empty all-NULL relation widens every field to
    # nullable, matching the pickled-RDD path's schema exactly (literal
    # structs infer non-nullable fields, and Spark 4 folds the
    # when(true, ...) trick away during analysis)
    empty = spark.range(0, 0, 1, 1).select(*[
        F.lit(None).cast(f.dataType).alias(f.name) for f in schema.fields])
    return lit_df.unionByName(empty)


@contextmanager
def session_time_zone(spark: SparkSession, tz: str):
    """Scope ``spark.sql.session.timeZone`` without leaking across queries.

    The reference restarts/re-confs the session around queries so that
    ``hour()``/grouping is deterministic in the project time zone
    (dsgrid/query/query_submitter.py:697-727). A scoped conf on one live
    session achieves the same.
    """
    prior = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", tz)
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)
