"""Reproducible sampling / capping for training-data pipelines.

``df.sample`` is seed-and-partitioning dependent: the same corpus
resampled after a repartition yields a different subset, which breaks
dataset reproducibility guarantees. These operators derive the decision
from a content hash (md5 of the key), so the same row always makes the
same cut — across runs, engines, and cluster layouts — and any engine
can recompute the subset for audit.

All JVM column expressions; the cap is one window (WindowGroupLimit
prunes per-partition before the shuffle for small caps).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, functions as F

_BUCKETS = 1_000_000


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, 1e6): first 8 hex chars of
    md5(key||salt) as an integer. md5 (not xxhash64) so external engines
    can recompute membership."""
    return F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, 8),
        16, 10,
    ).cast("long") % _BUCKETS


def deterministic_sample(df: DataFrame, key_column: str, fraction: float,
                         salt: str = "") -> DataFrame:
    """Keep ~fraction of rows, chosen by content hash of the key.

    Change ``salt`` to draw an independent sample; the same
    (key, salt) always lands on the same side of the cut.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(fraction * _BUCKETS)
    return df.filter(hash_bucket(F.col(key_column), salt) < threshold)


def cap_per_group(df: DataFrame, group_columns: list[str], key_column: str,
                  max_rows: int, salt: str = "") -> DataFrame:
    """Keep at most ``max_rows`` rows per group, in deterministic
    hash-of-key order (a reproducible 'at most N docs per domain' cap —
    the standard de-biasing step before training-data mixing).
    """
    w = Window.partitionBy(*group_columns).orderBy(
        hash_bucket(F.col(key_column), salt), F.col(key_column)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_rows)
        .drop("__rn")
    )


def stratified_sample(df: DataFrame, group_column: str,
                      fractions: dict[str, float], key_column: str,
                      default_fraction: float = 0.0,
                      salt: str = "") -> DataFrame:
    """Deterministic per-stratum sampling to target fractions (the
    language/domain re-balancing step of a training-data mix).

    Each stratum's fraction becomes a hash threshold, attached via a
    broadcast join of the (tiny) fractions table — one scan, no shuffle
    of the corpus, and the same (key, salt) is kept or dropped
    identically across runs, engines, and cluster layouts.
    """
    for g, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {g!r} must be in [0, 1], got {f}")
    spark = df.sparkSession
    frac_df = spark.createDataFrame(
        [(g, int(f * _BUCKETS)) for g, f in fractions.items()],
        f"{group_column} string, __threshold long",
    )
    return (
        df.join(F.broadcast(frac_df), group_column, "left")
        .withColumn("__threshold",
                    F.coalesce("__threshold",
                               F.lit(int(default_fraction * _BUCKETS))))
        .filter(hash_bucket(F.col(key_column), salt) < F.col("__threshold"))
        .drop("__threshold")
    )


def mixture_thresholds(totals: dict[str, int],
                       weights: dict[str, float]) -> dict[str, int]:
    """Per-group hash thresholds hitting target mixture shares.

    Given per-group corpus sizes (token/char mass) and target mixture
    weights, pick keep-fractions so the sampled mixture matches the
    weight ratios while using as much data as possible: the binding
    group (smallest size/weight ratio) is kept whole and every other
    group is downsampled to match. The arithmetic is plain IEEE-double
    ``1e6 * w * budget / total`` with a floor, so any engine recomputes
    identical thresholds for audit.
    """
    present = {g: w for g, w in weights.items()
               if w > 0 and totals.get(g, 0) > 0}
    if not present:
        return {}
    budget = min(totals[g] / w for g, w in present.items())
    return {
        g: int(math.floor(1000000.0 * w * budget / totals[g]))
        for g, w in present.items()
    }


def temperature_weights(totals: dict[str, int],
                        alpha: float = 0.3) -> dict[str, float]:
    """Temperature-based mixture weights from corpus masses:
    ``w_g ∝ (n_g / N)^alpha``, normalized to sum 1 — the multilingual
    rebalancing rule (XLM-R / mT5 style alpha-sampling: alpha=1
    reproduces natural proportions, alpha→0 approaches uniform, the
    usual 0.2–0.7 range boosts low-resource groups without drowning
    high-resource ones). Feed the result straight into
    :func:`mixture_thresholds` / :func:`mixture_sample`.

    Driver-side arithmetic over one row per group (the same bounded
    totals dict mixture_sample already aggregates); deterministic IEEE
    doubles so an auditor recomputes identical weights.
    """
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    present = {g: n for g, n in totals.items() if n > 0}
    if not present:
        return {}
    total = sum(present.values())
    raw = {g: (n / total) ** alpha for g, n in present.items()}
    z = sum(raw.values())
    return {g: r / z for g, r in raw.items()}


def mixture_sample(df: DataFrame, group_column: str,
                   weights: dict[str, float], key_column: str,
                   size_column: str | None = None,
                   salt: str = "") -> DataFrame:
    """Token-weighted domain mixture sampling (the data-mixing step of a
    training-data pipeline): deterministically sample each group so the
    sampled token mass per group approaches the target ``weights``
    ratios, keeping the binding group whole.

    ``size_column`` is the per-row mass (token/char count); ``None``
    weights rows equally. Groups absent from ``weights`` are dropped.
    The only driver-side materialization is one row per group (bounded
    by domain cardinality, not data size); the corpus itself is a single
    scan filtered against a broadcast threshold table — no shuffle.
    """
    mass = (F.sum(F.col(size_column)) if size_column
            else F.count(F.lit(1))).alias("_t")
    totals = {
        r[group_column]: r["_t"]
        for r in df.groupBy(group_column).agg(mass).collect()
    }
    thresholds = mixture_thresholds(totals, weights)
    spark = df.sparkSession
    if not thresholds:
        return df.filter(F.lit(False))
    thr_df = spark.createDataFrame(
        list(thresholds.items()), f"{group_column} string, __threshold long"
    )
    return (
        df.join(F.broadcast(thr_df), group_column, "inner")
        .filter(hash_bucket(F.col(key_column), salt) < F.col("__threshold"))
        .drop("__threshold")
    )


def chunk_token_stream(df: DataFrame, group_columns: list[str],
                       key_column: str, size_column: str,
                       chunk_tokens: int, salt: str = "") -> DataFrame:
    """Token-EXACT sequence packing (GPT-style concat-and-chunk): within
    each group, concatenate documents in deterministic hash order into
    one virtual token stream and cut it every ``chunk_tokens`` tokens.
    Unlike ``pack_sequences`` (whole documents, budget may overflow),
    chunks here have exactly ``chunk_tokens`` tokens and documents SPLIT
    across chunk boundaries: each row comes back once per chunk it
    overlaps, with the token span it contributes.

    Adds ``chunk_index`` (0-based within the group), ``tok_start`` /
    ``tok_end`` (the row's half-open token span inside that chunk).
    Zero-token rows are dropped (they contribute nothing to any chunk).

    Scale: one window per group computes the running offset (same
    partitioning as the final explode — no extra shuffle); the explode
    emits size/chunk_tokens + 1 rows per document, i.e. output is
    proportional to the token stream, never quadratic. Groups pack in
    parallel; shard a monolithic corpus first (e.g. with
    ``shuffle_corpus`` and ``shard`` as the group column).
    """
    if chunk_tokens <= 0:
        raise ValueError(
            f"chunk_tokens must be positive, got {chunk_tokens}")
    w = (
        Window.partitionBy(*group_columns)
        .orderBy(hash_bucket(F.col(key_column), salt), F.col(key_column))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    size = F.col(size_column).cast("long")
    end = F.sum(size).over(w)
    start = (end - size).alias("__start")
    L = F.lit(chunk_tokens)
    out = (
        df.filter(size > 0)
        .withColumn("__start", start)
        .withColumn("__end", end)
        .withColumn(
            "chunk_index",
            F.explode(F.sequence(
                F.floor(F.col("__start") / L),
                F.floor((F.col("__end") - 1) / L))),
        )
        .withColumn(
            "tok_start",
            F.greatest(F.col("__start"), F.col("chunk_index") * L)
            - F.col("chunk_index") * L,
        )
        .withColumn(
            "tok_end",
            F.least(F.col("__end"), (F.col("chunk_index") + 1) * L)
            - F.col("chunk_index") * L,
        )
        .drop("__start", "__end")
    )
    return out


def global_running_total(df: DataFrame, key_column: str, size_column: str,
                         n_shards: int = 256, salt: str = "") -> DataFrame:
    """Exact GLOBAL running total of ``size_column`` in deterministic
    hash-of-key order — the distributed prefix sum a single global-sort
    window cannot give you (one partition = one straggler at 100 TB).

    Two passes: (1) per-shard totals (n_shards rows to the driver —
    bounded, independent of data size) become broadcast cumulative
    offsets; (2) each shard windows its own rows and adds its offset.
    Adds ``running_total`` = sum of sizes of all rows at-or-before this
    row in the global (hash, key) order.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    key = F.col(key_column)
    order = hash_bucket(key, salt)
    # shard by RANGE of the order hash so shard id ascends with the
    # global order (bucket 0's rows all precede bucket 1's)
    shard = F.floor(order * F.lit(n_shards) / F.lit(_BUCKETS)).cast("int")
    tagged = df.withColumn("__ord", order).withColumn("__shard", shard)
    totals = {
        r["__shard"]: r["t"]
        for r in tagged.groupBy("__shard")
        .agg(F.sum(F.col(size_column).cast("long")).alias("t")).collect()
    }
    offsets, acc = {}, 0
    for s in sorted(totals):
        offsets[s] = acc
        acc += totals[s]
    spark = df.sparkSession
    off_df = spark.createDataFrame(
        [(int(s), int(o)) for s, o in offsets.items()],
        "__shard int, __offset long")
    w = (
        Window.partitionBy("__shard")
        .orderBy("__ord", key_column)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.join(F.broadcast(off_df), "__shard")
        .withColumn(
            "running_total",
            F.sum(F.col(size_column).cast("long")).over(w)
            + F.col("__offset"),
        )
        .drop("__ord", "__shard", "__offset")
    )


def take_token_budget(df: DataFrame, key_column: str, size_column: str,
                      budget: int, n_shards: int = 256, salt: str = "",
                      keep_running_total: bool = False) -> DataFrame:
    """Keep documents, in deterministic hash order, until ``budget``
    tokens are filled (the 'give me a 100B-token subset' cut). A row is
    kept iff the tokens BEFORE it leave room to start it, so the subset
    may overrun by at most one document — the same streaming guarantee
    as ``pack_sequences``. Built on the distributed prefix sum, so no
    global sort and the cut is engine-reproducible.
    ``keep_running_total=True`` retains the cumulative column (how much
    of the budget each kept row consumed).
    """
    if budget < 0:
        raise ValueError(f"budget must be non-negative, got {budget}")
    running = global_running_total(df, key_column, size_column,
                                   n_shards=n_shards, salt=salt)
    started_before = (
        F.col("running_total") - F.col(size_column).cast("long"))
    kept = running.filter(started_before < budget)
    return kept if keep_running_total else kept.drop("running_total")


def pack_sequences_ffd(df: DataFrame, group_columns: list[str],
                       key_column: str, size_column: str,
                       budget: int) -> DataFrame:
    """First-fit-decreasing bin packing into ``budget``-token batches —
    the padding-minimizing alternative to ``pack_sequences``' streaming
    running-total cut. FFD guarantees no batch exceeds the budget
    (documents larger than it get a singleton batch) and uses at most
    ~11/9·OPT+1 batches; the streaming cut is cheaper but may overflow
    by one document per batch.

    Within a group the algorithm is inherently sequential (each document
    placement depends on all previous placements), so this is a
    deliberate Arrow slow path: ``applyInPandas`` runs plain Python FFD
    per group, vectorized across groups — parallelism = group count,
    same contract as ``pack_sequences`` (shard a monolithic corpus
    first). Deterministic: sizes descending, ties by key ascending.
    Adds ``batch_index``.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    from pyspark.sql.types import LongType, StructField, StructType

    # fresh StructType: StructType.add mutates the shared schema object
    out_schema = StructType(
        list(df.schema.fields) + [StructField("batch_index", LongType())])
    sz, key = size_column, key_column

    def ffd(pdf):
        order = sorted(range(len(pdf)),
                       key=lambda i: (-int(pdf[sz].iat[i]), pdf[key].iat[i]))
        bins: list[int] = []  # remaining capacity per bin
        assign = [0] * len(pdf)
        for i in order:
            s = int(pdf[sz].iat[i])
            for b, rem in enumerate(bins):
                if s <= rem:
                    bins[b] = rem - s
                    assign[i] = b
                    break
            else:
                bins.append(max(budget - s, 0))
                assign[i] = len(bins) - 1
        return pdf.assign(batch_index=assign)

    return df.groupBy(*group_columns).applyInPandas(ffd, schema=out_schema)


def shuffle_corpus(df: DataFrame, key_column: str, n_shards: int,
                   salt: str = "") -> DataFrame:
    """Deterministic global training-order shuffle: assign every row a
    ``(shard, shard_pos)`` pair so that reading shard 0, 1, ... each in
    ``shard_pos`` order yields a reproducible pseudo-random permutation
    of the corpus — the data-ordering step before writing training
    shards. ``df.orderBy(rand())`` is seed-and-layout dependent and a
    single global sort; this derives the order from md5(key||salt), so
    the same corpus always shuffles the same way, any engine can
    re-derive the order for audit, and changing ``salt`` draws an
    independent permutation (a new data epoch).

    Scale: shard = hash % n_shards spreads rows evenly; the position
    window partitions BY SHARD, so nothing ever funnels through one
    partition — pick n_shards >= cluster parallelism (a few thousand at
    100 TB) and each shard sorts independently. The physical write is
    ``.repartition(n_shards, 'shard').sortWithinPartitions('shard_pos')``
    — one shuffle, no global sort. Position ties are broken by the key
    itself, so the order is total and engine-independent.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    key = F.col(key_column)
    order = hash_bucket(key, salt)
    shard = (hash_bucket(key, salt + "#shard") % n_shards).cast("int")
    w = Window.partitionBy("shard").orderBy("__order", key_column)
    return (
        df.withColumn("shard", shard)
        .withColumn("__order", order)
        .withColumn("shard_pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("__order")
    )


def leakage_safe_split(df: DataFrame, id_column: str,
                       dup_pairs: DataFrame | None,
                       holdout_fraction: float,
                       salt: str = "") -> DataFrame:
    """Train/holdout split that cannot leak near-duplicates across the
    boundary: documents connected by a duplicate pair always land in the
    same split (the eval-set contamination guard applied at split time,
    complementing benchmark_contamination's scan).

    ``dup_pairs`` is an (id_a, id_b) edge list, e.g. the verified pairs
    from the MinHash path; None means no constraint (plain hash split).
    Each duplicate CLUSTER (connected component) is assigned by the
    content hash of its smallest member id, so the decision is
    deterministic and any engine can re-derive it. Adds a ``split``
    column ('train' / 'holdout').

    Scale: component labels come from min-label propagation (bounded
    rounds over id-keyed joins — see connected_components); unpaired
    docs skip the component machinery entirely (anti-join) and hash
    their own id. No corpus shuffle beyond the label join.
    """
    if not 0.0 <= holdout_fraction <= 1.0:
        raise ValueError(
            f"holdout_fraction must be in [0, 1], got {holdout_fraction}")
    threshold = int(holdout_fraction * _BUCKETS)
    split_of = lambda key: F.when(  # noqa: E731
        hash_bucket(key, salt) < threshold, F.lit("holdout")
    ).otherwise(F.lit("train"))
    if dup_pairs is None:
        return df.withColumn("split", split_of(F.col(id_column)))
    from dsgrid_spark.pipeline.dedup import connected_components

    comp = connected_components(dup_pairs).withColumnRenamed("id", id_column)
    in_graph = (
        df.join(comp, id_column)
        .withColumn("split", split_of(F.col("component")))
        .drop("component")
    )
    loose = (
        df.join(comp.select(id_column), id_column, "left_anti")
        .withColumn("split", split_of(F.col(id_column)))
    )
    return in_graph.unionByName(loose)


def pack_sequences(df: DataFrame, group_columns: list[str], key_column: str,
                   size_column: str, budget: int,
                   salt: str = "") -> DataFrame:
    """Assign rows to fixed-budget batches (sequence packing for training
    shards): within each group, order rows deterministically by content
    hash, then cut the running token total every ``budget`` tokens.

    Adds ``batch_index`` (0-based within the group). The running-total
    cut means a batch may overflow by at most one document — the
    standard streaming-packing guarantee; documents larger than the
    budget get a batch of their own. One window per group: groups pack
    in parallel across the cluster, so parallelism = number of groups
    (shard first if packing a monolithic corpus).
    """
    w = (
        Window.partitionBy(*group_columns)
        .orderBy(hash_bucket(F.col(key_column), salt), F.col(key_column))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col(size_column)).over(w)
    # the raw batch is decided by the running total BEFORE the row: a row
    # whose predecessors already filled k whole budgets opens batch k.
    # An oversized document consumes several budget slots, leaving gaps in
    # the raw numbering — dense_rank compacts them to contiguous indices
    # (same partitioning, so no extra shuffle; just a second in-partition
    # sort).
    raw = F.floor((running - F.col(size_column)) / F.lit(budget))
    return (
        df.withColumn("__raw_batch", raw)
        .withColumn(
            "batch_index",
            (F.dense_rank().over(
                Window.partitionBy(*group_columns).orderBy("__raw_batch"))
             - 1).cast("long"),
        )
        .drop("__raw_batch")
    )
