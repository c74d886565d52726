"""Streaming ingestion of dsgrid-shaped facts.

The reference is batch-only (SURVEY §2.10); this extends the same
operators to Structured Streaming: stream a fact table (e.g. telemetry
landing as parquet/json files), map dimensions with the SAME broadcast
map-joins (stream-static joins), and maintain windowed aggregates with
watermarks for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import DataStreamWriter

from dsgrid_spark.common import FRACTION_COLUMN, VALUE_COLUMN


def read_fact_stream(spark, path: str, schema, fmt: str = "parquet") -> DataFrame:
    """File-source stream of fact rows with a declared schema."""
    return spark.readStream.format(fmt).schema(schema).load(path)


def map_dimension_stream(stream: DataFrame, records: DataFrame,
                         column: str) -> DataFrame:
    """Stream-static broadcast join version of map_stacked_dimension."""
    recs = records.filter(F.col("to_id").isNotNull()).select(
        F.col("from_id").alias("__from_id"),
        F.col("to_id").alias("__to_id"),
        F.col("from_fraction").cast("double").alias("__ff"),
    )
    out = (
        stream.join(F.broadcast(recs), stream[column] == recs["__from_id"])
        .drop(column, "__from_id")
        .withColumnRenamed("__to_id", column)
    )
    prior = F.col(FRACTION_COLUMN) if FRACTION_COLUMN in stream.columns else F.lit(1.0)
    return out.withColumn(FRACTION_COLUMN, prior * F.col("__ff")).drop("__ff")


def windowed_total(stream: DataFrame, time_column: str, dims: list[str],
                   window: str = "1 hour", watermark: str = "2 hours",
                   value_column: str = VALUE_COLUMN) -> DataFrame:
    """Watermarked tumbling-window sum per dimension combination."""
    value = F.col(value_column)
    if FRACTION_COLUMN in stream.columns:
        value = value * F.col(FRACTION_COLUMN)
    return (
        stream.withWatermark(time_column, watermark)
        .groupBy(F.window(F.col(time_column), window).alias("window"), *dims)
        .agg(F.sum(value).alias(value_column))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *dims, value_column,
        )
    )


def running_total_stream(
    stream: DataFrame,
    dims: list[str],
    value_column: str = VALUE_COLUMN,
) -> DataFrame:
    """Custom stateful operator: cumulative per-key total across
    micro-batches via ``applyInPandasWithState``.

    Built-in streaming aggregations are per-window; a monotonically
    growing lifetime total per dimension combination needs explicit state
    (one float per key — state size is bounded by key cardinality, not
    stream length, so this scales to arbitrarily long streams).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType, StringType, StructField, StructType,
    )

    out_schema = StructType(
        [StructField(d, StringType()) for d in dims]
        + [StructField("running_total", DoubleType())]
    )
    state_schema = StructType([StructField("total", DoubleType())])

    def update(key, pdfs, state: GroupState):
        total = state.get[0] if state.exists else 0.0
        for pdf in pdfs:
            total += float(pdf[value_column].sum())
        state.update((total,))
        yield pd.DataFrame(
            {**{d: [k] for d, k in zip(dims, key)}, "running_total": [total]}
        )

    return (
        stream.groupBy(*dims)
        .applyInPandasWithState(
            update, out_schema, state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def sessionize(df: DataFrame, time_column: str, keys: list[str],
               gap: str = "8 hours",
               value_column: str | None = None,
               watermark: str | None = None) -> DataFrame:
    """Gap-based sessionization via the built-in ``session_window``:
    events for the same key chain into one session while consecutive
    gaps stay under ``gap``; the window end is last-event + gap.

    Works on batch AND streaming input (pass ``watermark`` for streams
    so session state is evicted once the watermark passes a session's
    end). Catalyst's native session-window aggregation does the merge —
    no per-row Python, state bounded by open sessions per key.
    """
    if watermark is not None:
        df = df.withWatermark(time_column, watermark)
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_column is not None:
        aggs.append(F.sum(value_column).alias("value_sum"))
    return (
        df.groupBy(*keys, F.session_window(F.col(time_column), gap).alias("__s"))
        .agg(*aggs)
        .select(
            *keys,
            F.col("__s.start").alias("session_start"),
            F.col("__s.end").alias("session_end"),
            "n_events",
            *(["value_sum"] if value_column is not None else []),
        )
    )


def local_prededup(stream: DataFrame, key_columns: list[str]) -> DataFrame:
    """Partition-LOCAL first-occurrence dedup — a stateless narrow op
    that drops rows whose key already appeared earlier in the same input
    partition of the same micro-batch. Composable BEFORE a stateful
    operator in the same streaming query (ROADMAP r5 item 2: Structured
    Streaming interprets any groupBy as cross-batch state, so a
    within-batch reduction can only be expressed as a stateless
    map — this is the Arrow-batched one).

    Semantics-preserving under ``dedup_stream``: the stateful operator
    still removes cross-partition and cross-batch duplicates; this only
    removes rows that operator would have dropped anyway, BEFORE they
    pay the shuffle to the state partitioning and the per-row state
    lookup. Win scales with the within-partition duplicate rate
    (boilerplate-heavy crawl batches); near-zero cost when there are no
    local dups (one Arrow pass, no shuffle, no state).
    """
    cols = list(key_columns)

    def _drop_local(frames):
        seen: set = set()
        for pdf in frames:
            pdf = pdf.drop_duplicates(subset=cols)
            if len(cols) == 1:
                keys = pdf[cols[0]]
                mask = ~keys.isin(seen)
                out = pdf[mask]
                seen.update(out[cols[0]].tolist())
            else:
                keys = list(zip(*(pdf[c] for c in cols)))
                mask = [k not in seen for k in keys]
                out = pdf[mask]
                seen.update(k for k, m in zip(keys, mask) if m)
            if len(out):
                yield out

    return stream.mapInPandas(_drop_local, stream.schema)


def dedup_stream(stream: DataFrame, key_columns: list[str],
                 time_column: str | None = None,
                 watermark: str = "2 hours",
                 prebatch: bool = False) -> DataFrame:
    """Streaming exact dedup on arrival order: the first row per key wins
    across micro-batches (the ingestion-time variant of exact_dedup for
    a continuously landing corpus).

    With ``time_column`` set, ``dropDuplicatesWithinWatermark`` bounds
    state by the watermark horizon — keys older than the watermark are
    evicted, so state is O(keys per horizon), not O(stream length).
    Without it, state grows with distinct keys (only for bounded key
    domains).

    ``prebatch=True`` inserts :func:`local_prededup` before the stateful
    operator: within-partition duplicate keys are dropped while still
    narrow, shrinking the rows that shuffle into (and probe) the state
    store by the local duplicate rate. First-arrival winners are
    unchanged — partition order is arrival order, so the locally-kept
    row is the one the state op would have kept.
    """
    if prebatch:
        stream = local_prededup(stream, key_columns)
    if time_column is not None:
        return (
            stream.withWatermark(time_column, watermark)
            .dropDuplicatesWithinWatermark(key_columns)
        )
    return stream.dropDuplicates(key_columns)


ROCKSDB_STATE_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def rocksdb_state_conf(changelog_checkpointing: bool = True) -> dict:
    """Session confs that move streaming state off the JVM heap into
    RocksDB — required for large stateful streams.

    The default HDFSBackedStateStoreProvider keeps EVERY key in executor
    heap: a 100 TB-corpus dedup stream (one fingerprint per distinct
    document) or a wide sessionization OOMs long before the data does.
    RocksDB state is native-memory + local-disk with incremental
    changelog checkpointing, so state size is bounded by disk, not heap.

    The provider is read at stream START for a NEW checkpoint and pinned
    in the checkpoint metadata thereafter — apply around ``start()``
    (e.g. ``with scoped_conf(spark, rocksdb_state_conf()): ...``);
    existing checkpoints keep their original provider.

    Used by default in nothing: the harness's bounded-key tests are
    faster on the heap provider; flip it per deployment.
    """
    conf = {"spark.sql.streaming.stateStore.providerClass":
            ROCKSDB_STATE_PROVIDER}
    if changelog_checkpointing:
        # upload per-batch deltas instead of full snapshots
        conf["spark.sql.streaming.stateStore.rocksdb."
             "changelogCheckpointing.enabled"] = "true"
    return conf


def normalize_text_stream(stream: DataFrame, text_column: str = "text",
                          fingerprint_column: str = "fingerprint") -> DataFrame:
    """Attach the batch pipeline's normalization fingerprint to a
    document stream (same xxhash64-of-normalized-text as
    ``pipeline.text.fingerprint``), so streaming dedup keys match the
    batch corpus exactly — a stream deduped on this column and a batch
    exact_dedup produce consistent representatives."""
    from dsgrid_spark.pipeline.text import fingerprint

    return stream.withColumn(fingerprint_column, fingerprint(F.col(text_column)))


def write_stream_parquet(df: DataFrame, path: str, checkpoint: str,
                         trigger_once: bool = True) -> DataStreamWriter:
    w = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    return w.trigger(availableNow=True) if trigger_once else w
