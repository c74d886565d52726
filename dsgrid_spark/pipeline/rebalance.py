"""Centroid retrain + reassign for persisted vector indexes — the
maintenance pass for DRIFTING corpora.

``append_ivf_index`` / ``append_binary_index`` / ``append_pq_index``
assign every new batch against the index's BUILD-TIME centroids — the
correct steady-state choice (a drifted centroid list would desync
probes from partitions), but a corpus whose distribution moves piles
appends into a few clusters: hot partitions, skewed scan tasks, and
probe recall decaying toward the structureless regime (SCALE_R9 §3
measured 0.30 probe recall when cluster structure is absent).
:func:`rebalance_index` closes that lifecycle:

1. retrain centroids on the COMMITTED vectors (k-means, with k-means‖
   init by default — the init built for exactly this distributed
   regime);
2. reassign every committed row to the new centroids;
3. rewrite every payload subtree as ONE replacement batch under the
   compaction id namespace, recorded in the same ``compactions/`` log
   :func:`indexlog.compact` uses;
4. write the new centroid table under ``centroids/batch=<new id>`` —
   a new centroid GENERATION (see
   :func:`similarity.write_centroid_generation`);
5. commit the batch log row LAST — the atomic flip: at that instant
   every reader's committed view switches from {old batches, old
   generation} to {rebalance batch, new generation}; pinned (as_of)
   readers keep resolving the OLD generation from their pinned batch
   set, bit-reproducibly, until vacuum purges it.

Payload semantics per index kind:

- ``ivf``: vectors move to their new cluster directories (values
  unchanged).
- ``binary``: packed sign bits are CENTROID-INDEPENDENT — they are
  joined to the new assignment and moved, never recomputed, so bits
  stay bit-identical to the originals; the re-rank vector payload
  moves alongside (int8 tier preserved as stored).
- ``pq`` (plain): codes are centroid-independent too — moved, not
  re-encoded.
- ``pq`` (residual / IVFADC): codes encode (vector − coarse centroid),
  so they are RE-ENCODED against the new centroids with the index's
  EXISTING codebooks (coarse-only retrain; codebook retrain remains a
  full rebuild decision). Requires ``store_vectors=True``.

Reassignment reads the stored re-rank payload: for ``vectors_dtype=
"int8"`` indexes the dequantized vectors (the same values the exact
re-rank scores), so assignment is consistent with what searches see.
Bits-only / codes-only indexes (``store_vectors=False``) cannot be
rebalanced — there is nothing to re-cluster; rebuild instead.

CONCURRENCY: the run holds the single-compactor lock (shared with
:func:`indexlog.compact`, so a rebalance and a compaction also
serialize against each other). Appends are NOT blocked — but an
append that commits mid-rebalance would be assigned against the OLD
generation while surviving the flip, silently mis-pruning every later
search. The run therefore re-checks the visible set immediately
before its commit and ABORTS (crash-equivalent state: open ``cmp``
intent, invisible data, cleaned by the retry or vacuum) when any
batch committed since its snapshot. The residual check-to-commit
window is one log write; schedule rebalances when appends are
quiescent, and re-run on abort.

Scale shape: one k-means fit (bounded by ``fit_sample_cap``), one
assignment pass over the committed vectors, a (id → new cluster) map
localCheckpointed ONCE (the smallest corpus-scale frame: two columns),
then one id-join + one ``repartition(cluster)`` shuffle per payload
subtree — the same order of work as the original build minus encoding.
No driver-side collect grows with the corpus.

Reference parity: the reference engine has no vector-index surface;
this extends the beyond-reference similarity family (SURVEY.md
pipeline scope) the same way compaction extended indexlog in round 9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dsgrid_spark.pipeline import indexlog

__all__ = ["rebalance_index", "rebalance_if_skewed", "RebalanceAborted",
           "cluster_skew", "maintain_index"]


class RebalanceAborted(RuntimeError):
    """A batch committed while the rebalance was running; the run
    aborted before its commit (nothing became visible). Quiesce
    appends and re-run — the retry adopts the crashed intent and
    cleans up the aborted attempt's directories."""


def _rerank_vectors(spark: SparkSession, path: str, kind: str,
                    visible: set[str]) -> tuple[DataFrame, str]:
    """(stored_vectors_df, vectors_dtype): the committed re-rank
    payload rows with their ORIGINAL stored columns, plus the dtype
    needed to derive float embeddings from them."""
    from dsgrid_spark.pipeline.pq import _read_meta

    dtype = "float64"
    if kind != "ivf":
        meta = _read_meta(spark, path)
        if not meta["store_vectors"]:
            raise ValueError(
                f"cannot rebalance a store_vectors=False {kind} index: "
                f"no vectors to re-cluster; rebuild it instead")
        dtype = meta.get("vectors_dtype") or "float64"
    stored = indexlog.read_committed(spark, path, "vectors", ids=visible)
    return stored, dtype


def rebalance_index(spark: SparkSession, path: str,
                    n_clusters: int | None = None,
                    iterations: int = 5, seed: int = 11,
                    init: str = "parallel",
                    fit_sample_cap: int | None = None,
                    assign_strategy: str = "auto",
                    lock_ttl_seconds: float = 86400.0,
                    _pre_commit_hook=None) -> str:
    """Retrain this index's coarse centroids on its committed vectors
    and rewrite every payload subtree under the new assignment, as one
    atomic compaction-style replacement (module docstring). Returns
    the new batch id (``cmp`` namespace).

    ``n_clusters`` defaults to the current generation's cluster count;
    pass a different value to also re-size the index (a drifted corpus
    often wants more lists). ``init``/``iterations``/``seed``/
    ``fit_sample_cap``/``assign_strategy`` flow to
    :func:`similarity.kmeans_centroids` — ``init="parallel"``
    (k-means‖) by default: a rebalance exists because the corpus grew
    structure the old centroids miss, exactly the regime pool-based
    seeding cannot see. ``_pre_commit_hook`` is a test seam (called
    between the payload writes and the commit re-check).

    Exactly-once: the run claims a ``cmp`` intent; a crashed or
    aborted attempt is retried under the same id (its directories —
    payloads, centroid generation, compaction rows — are deleted
    before the rewrite), or reclaimed by :func:`indexlog.vacuum` after
    the ttl. Equal to a fresh build over the committed corpus with the
    retrained centroids (tested, binary bits bit-identical).
    """
    from dsgrid_spark.pipeline.stream_index import index_kind

    kind = index_kind(spark, path)
    if kind not in ("ivf", "binary", "pq"):
        raise ValueError(
            f"rebalance applies to vector indexes (ivf/binary/pq); "
            f"{path!r} is a {kind!r} index")
    indexlog.acquire_compact_lock(spark, path,
                                  ttl_seconds=lock_ttl_seconds)
    try:
        return _rebalance_locked(spark, path, kind, n_clusters,
                                 iterations, seed, init, fit_sample_cap,
                                 assign_strategy, _pre_commit_hook)
    finally:
        indexlog.release_compact_lock(spark, path)


def _rebalance_locked(spark, path, kind, n_clusters, iterations, seed,
                      init, fit_sample_cap, assign_strategy,
                      _pre_commit_hook) -> str:
    from dsgrid_spark.pipeline.pq import (
        _read_centroids, _read_codebooks, _read_meta, _rerank_embedding,
        _subtract_coarse, pq_encode,
    )
    from dsgrid_spark.pipeline.similarity import (
        assign_nearest_centroid, kmeans_centroids,
        write_centroid_generation,
    )

    visible, ingested = indexlog.batch_sets(spark, path)
    if not visible:
        raise ValueError(f"no committed batches at {path!r}; nothing "
                         "to rebalance")
    gen = indexlog.resolve_generation(spark, path, visible)
    old_centroids = _read_centroids(spark, path, gen)
    k = n_clusters if n_clusters is not None else len(old_centroids)
    if k < 1:
        raise ValueError(f"n_clusters must be positive, got {k}")
    dim = len(old_centroids[0])

    stored, dtype = _rerank_vectors(spark, path, kind, visible)
    emb = _rerank_embedding(stored, dtype)

    # 1. retrain on the committed corpus (k-means|| init by default)
    centroids = kmeans_centroids(emb, k, dim, "embedding",
                                 iterations=iterations, seed=seed,
                                 fit_sample_cap=fit_sample_cap,
                                 assign_strategy=assign_strategy,
                                 init=init)

    # 2. claim the replacement id and clean any previous attempt
    batch_id = indexlog.claim_auto_batch_id(
        spark, path, ingested, prefix=indexlog.COMPACT_PREFIX)
    indexlog.delete_glob(spark, f"{path}/*/*/batch={batch_id}")
    indexlog.delete_glob(
        spark, f"{path}/compactions/by={batch_id}")
    indexlog.delete_glob(spark, f"{path}/centroids/batch={batch_id}")

    # 3. one assignment pass; the (id, cluster) map is the ONLY
    #    corpus-scale state carried across the subtree writes
    newmap = (assign_nearest_centroid(emb, centroids, "embedding",
                                      strategy=assign_strategy)
              .select("id", F.col("__cluster").alias("cluster"))
              .localCheckpoint())

    def _rewrite(sub: str, df: DataFrame) -> None:
        (df.join(newmap, "id")
           .withColumn("batch", F.lit(batch_id))
           .repartition(F.col("cluster"))
           .write.mode("append").partitionBy("cluster", "batch")
           .parquet(f"{path}/{sub}"))

    # 4. rewrite payloads: stored values preserved; only residual PQ
    #    codes are value-dependent on the centroids and re-encode
    _rewrite("vectors", stored.drop("cluster", "batch"))
    if kind == "binary":
        bits = indexlog.read_committed(spark, path, "bits", ids=visible)
        _rewrite("bits", bits.drop("cluster", "batch"))
    elif kind == "pq":
        meta = _read_meta(spark, path)
        if bool(meta.get("residual", False)):
            codebooks = _read_codebooks(spark, path)
            assigned = emb.join(newmap, "id")
            enc_in = (_subtract_coarse(assigned, centroids, "cluster",
                                       "embedding", "__r")
                      .select("id", F.col("__r").alias("embedding")))
            codes = pq_encode(enc_in, codebooks, id_column="id",
                              vector_column="embedding")
            _rewrite("codes", codes)
        else:
            codes = indexlog.read_committed(spark, path, "codes",
                                            ids=visible)
            _rewrite("codes", codes.drop("cluster", "batch"))

    # 5. the new generation's centroid table + replacement rows
    write_centroid_generation(spark, path, centroids, batch_id,
                              mode="append")
    sources = sorted(visible)
    from dsgrid_spark.session import one_slice_df
    (one_slice_df(spark, [(s, batch_id) for s in sources],
                  "replaced string, by string")
       .write.mode("append").partitionBy("by")
       .parquet(f"{path}/compactions"))

    # 6. summed log metrics (indexlog.compact's convention)
    log_rows = (spark.read.parquet(f"{path}/batches")
                .filter(F.col("batch").isin(sources)).collect())
    metrics: dict[str, int] = {}
    for r in log_rows:
        for c, v in r.asDict().items():
            if c in ("batch", "committed", "committed_at_ms") \
                    or v is None:
                continue
            metrics[c] = metrics.get(c, 0) + int(v)

    if _pre_commit_hook is not None:
        _pre_commit_hook()
    # 7. abort if any batch committed since the snapshot: it was
    #    assigned against the OLD generation and would survive the
    #    flip mis-clustered (module docstring, CONCURRENCY)
    now_visible = indexlog.batch_sets(spark, path)[0]
    if now_visible != visible:
        raise RebalanceAborted(
            f"batches committed during the rebalance "
            f"({sorted(now_visible ^ visible)}); nothing was made "
            f"visible — quiesce appends and re-run (the retry reuses "
            f"intent {batch_id!r} and cleans this attempt up)")
    # 8. THE COMMIT: new batch + new generation become visible, the
    #    sources invisible, at this one log write
    indexlog.log_batch(spark, path, batch_id, **metrics)
    indexlog.clear_intent(spark, path, batch_id)
    return batch_id


#: payload subtree whose row counts define skew, per index kind (the
#: scan payload — what probe-pruned searches actually read)
_SKEW_SUBDIR = {"ivf": "vectors", "binary": "bits", "pq": "codes"}


def maintain_index(spark: SparkSession, path: str,
                   ttl_seconds: float = 86400.0,
                   max_batches: int = 32,
                   max_over_mean: float | None = None,
                   **rebalance_kwargs) -> dict:
    """ONE cron entry for an index's whole maintenance lifecycle, in
    the safe order: (1) :func:`indexlog.vacuum` reclaims crash debris
    and expired replaced batches under ``ttl_seconds``; (2)
    :func:`indexlog.compact_if_fragmented` merges small batch dirs
    only past ``max_batches`` visible; (3) for vector indexes, when
    ``max_over_mean`` is given, :func:`rebalance_if_skewed` retrains
    only past the skew threshold. Each gate costs one log read / one
    count-only scan when healthy, so the cron tick is cheap between
    real maintenance events. Returns what happened:
    ``{"vacuum": {...}, "compacted_batch": ..., "rebalanced_batch":
    ...}``."""
    from dsgrid_spark.pipeline.stream_index import index_kind

    kind = index_kind(spark, path)  # refuse non-index dirs up front
    out: dict = {"kind": kind}
    out["vacuum"] = indexlog.vacuum(spark, path,
                                    ttl_seconds=ttl_seconds)
    out["compacted_batch"] = indexlog.compact_if_fragmented(
        spark, path, max_batches=max_batches)
    out["rebalanced_batch"] = None
    if max_over_mean is not None and kind in _SKEW_SUBDIR:
        out["rebalanced_batch"] = rebalance_if_skewed(
            spark, path, max_over_mean=max_over_mean,
            **rebalance_kwargs)
    return out


def rebalance_if_skewed(spark: SparkSession, path: str,
                        max_over_mean: float = 3.0,
                        **rebalance_kwargs) -> str | None:
    """The cron-shaped maintenance entry: measure the scan payload's
    per-cluster skew and run :func:`rebalance_index` only when the
    heaviest cluster exceeds ``max_over_mean`` times the mean — one
    count-only aggregate when healthy, the full retrain only when the
    drift signal says so. Returns the new batch id, or None when no
    rebalance was needed. ``rebalance_kwargs`` forward to
    :func:`rebalance_index` (``n_clusters``, ``init``,
    ``fit_sample_cap``...)."""
    from dsgrid_spark.pipeline.stream_index import index_kind

    kind = index_kind(spark, path)
    sub = _SKEW_SUBDIR.get(kind)
    if sub is None:
        raise ValueError(
            f"rebalance applies to vector indexes (ivf/binary/pq); "
            f"{path!r} is a {kind!r} index")
    if max_over_mean <= 1.0:
        raise ValueError(
            f"max_over_mean must exceed 1.0 (a perfectly balanced "
            f"index sits at 1.0), got {max_over_mean}")
    skew = cluster_skew(spark, path, sub)
    if skew["max_over_mean"] < max_over_mean:
        return None
    return rebalance_index(spark, path, **rebalance_kwargs)


def cluster_skew(spark: SparkSession, path: str, subdir: str,
                 ids: set[str] | None = None,
                 top: int = 5, column: str = "cluster") -> dict:
    """Per-partition-key row-count skew for one payload subtree — the
    number that says WHEN to rebalance (``column="cluster"``) or how
    hot the term/shard hashing runs (``"bucket"``/``"shard"``). One
    count-only aggregate over the committed rows (column-pruned to the
    partition columns). Returns n_clusters (distinct keys), row
    totals, max/mean ratio, and the ``top`` heaviest keys."""
    rows = (indexlog.read_committed(spark, path, subdir, ids=ids)
            .groupBy(column).count().collect())
    counts = sorted(((int(r[column]), int(r["count"]))
                     for r in rows), key=lambda t: (-t[1], t[0]))
    total = sum(c for _, c in counts)
    n = len(counts)
    mean = (total / n) if n else 0.0
    return {
        "n_clusters": n,
        "rows": total,
        "max_rows": counts[0][1] if counts else 0,
        "mean_rows": mean,
        "max_over_mean": (counts[0][1] / mean) if mean else 0.0,
        "top": [{"cluster": c, "rows": r} for c, r in counts[:top]],
    }
