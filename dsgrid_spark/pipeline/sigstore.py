"""Persisted MinHash signature store for cross-run incremental dedup.

``incremental_dedup`` (pipeline/dedup.py) dedups a new batch against an
accumulated corpus using the corpus' signatures — but it takes
``reference_sigs`` as a DataFrame the CALLER must manage. A daily
100 TB ingest wants that table to be a first-class store with the same
guarantees the term/IVF/PQ/binary indexes already have: exactly-once
append of each accepted batch's signatures, committed-batch reads
(a crashed append's rows are invisible), and vacuum. This module
supplies exactly that, on the shared ``pipeline/indexlog.py``
machinery. Layout at ``<path>``:

    meta/    one row: (num_hashes, shingle_k, seed, n_shards)
    sigs/shard=K/batch=B/   (id, minhash array<long>)
    batches/ + intents/     indexlog exactly-once machinery

The signature params ride the META row and every append re-signs its
batch with the STORE'S OWN params — a caller-supplied num_hashes that
drifted from the stored signatures would silently mis-band every
future bucket join (the same failure class as probing an IVF index
with foreign centroids). ``shard = pmod(xxhash64(id), n_shards)`` is a
content-derived intermediate partition level: it bounds per-directory
file counts at corpus scale, parallelizes writes, and keeps the data
dirs on the ``<subtree>/<col>=K/batch=B`` two-level layout that
``indexlog.vacuum`` manages. Reads never prune on it (every dedup run
needs all shards); banding happens at read time from the raw
signatures, so ``num_bands`` stays a per-run knob while the store
stays banding-agnostic.

``ingest_dedup_batch`` is the turnkey continuous-ingest step: dedup
the incoming batch against the committed store (within-batch + versus
corpus), then register the SURVIVORS' signatures exactly-once under
the batch id. Replaying a committed batch recomputes nothing and
changes nothing: the survivor set is recovered from the store itself
(the appended ids ARE the survivors), so a crashed orchestrator can
re-run the step idempotently — the crash/replay contract the
round-9 spec asks for.

Reference parity: the reference engine has no dedup surface; this
extends the dedup family (SURVEY.md "beyond the reference" pipeline
scope) the same way the persisted term/IVF/PQ indexes extend
retrieval/similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dsgrid_spark.pipeline import indexlog
from dsgrid_spark.pipeline.dedup import incremental_dedup, minhash_signatures

__all__ = [
    "write_sig_store",
    "append_sig_store",
    "read_sig_store",
    "sig_store_params",
    "ingest_dedup_batch",
    "read_corpus",
    "ConcurrentBatchError",
]


class ConcurrentBatchError(RuntimeError):
    """Another writer committed this batch id mid-ingest (the batch was
    unregistered when the run started, registered by someone else by
    the time it tried to append). The colliding writers were ingesting
    DIFFERENT content under one id — replaying the same content would
    have no-opped at the top — so the caller must not treat its own
    survivors as registered; re-run under a fresh batch id."""


def _read_params(spark: SparkSession, path: str) -> dict:
    # r13: one meta row — driver-side read (indexlog.read_meta_rows; no
    # Spark job), spark.read on non-local filesystems
    rows = indexlog.read_meta_rows(spark, f"{path}/meta")
    if rows is not None:
        return rows[0]
    return spark.read.parquet(f"{path}/meta").collect()[0].asDict()


def sig_store_params(spark: SparkSession, path: str) -> dict:
    """The store's signature parameters (num_hashes, shingle_k, seed,
    n_shards) — the values every reader and appender must use."""
    return _read_params(spark, path)


def _sig_rows(df: DataFrame, text_column: str, id_column: str,
              params: dict, batch_id: str,
              signatures: DataFrame | None) -> DataFrame:
    """(id, minhash, shard, batch) rows for one batch, signed with the
    store's params unless the caller passes a precomputed ``signatures``
    table (which MUST come from minhash_signatures with those params —
    the usual reuse contract, same as minhash_dedup(signatures=...))."""
    if signatures is None:
        signatures = minhash_signatures(
            df, text_column, num_hashes=int(params["num_hashes"]),
            shingle_k=int(params["shingle_k"]), seed=int(params["seed"]))
    return (signatures.select(F.col(id_column).alias("id"), "minhash")
            .withColumn("shard", F.pmod(F.xxhash64(F.col("id")),
                                        F.lit(int(params["n_shards"])))
                        .cast("int"))
            .withColumn("batch", F.lit(batch_id)))


def _write_corpus_batch(df: DataFrame, corpus_path: str,
                        batch_id: str, mode: str = "append") -> None:
    """One batch's surviving rows (ALL their columns) under
    ``<corpus_path>/batch=<id>`` — the accumulated-corpus side table a
    continuous-ingest loop needs for verification text. Written BEFORE
    the signature-store commit and read filtered to the store's
    committed batches, it inherits the store's atomicity: a batch's
    corpus rows become visible exactly when its signatures do, and a
    crashed attempt's rows are invisible and rewritten by the retry."""
    (df.withColumn("batch", F.lit(batch_id))
       .write.mode(mode).partitionBy("batch").parquet(corpus_path))


def _swap_corpus_batch(spark: SparkSession, path: str, corpus_path: str,
                       survivors: DataFrame, batch_id: str) -> None:
    """Land one batch's corpus rows at ``<corpus_path>/batch=<id>``
    without ever deleting a RACING WRITER'S committed text (see the
    call site in :func:`ingest_dedup_batch`): write to a side dir,
    re-check the committed set, rename in (one FS op), re-check again.
    Raises :class:`ConcurrentBatchError` — with only OUR artifacts
    removed — when the id committed under another writer at any
    check."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    tmp = f"{corpus_path}/_tmp.{batch_id}"
    dst = f"{corpus_path}/batch={batch_id}"
    indexlog.delete_glob(spark, tmp)
    # the files carry no batch column: the partition value comes from
    # the directory name after the rename, exactly as partitionBy
    # writes it
    survivors.drop("batch").write.mode("overwrite").parquet(tmp)

    def _committed_elsewhere() -> bool:
        return batch_id in indexlog.batch_sets(spark, path)[1]

    if _committed_elsewhere():
        indexlog.delete_glob(spark, tmp)
        raise ConcurrentBatchError(
            f"batch {batch_id!r} was committed by another writer "
            f"mid-ingest; these survivors were NOT registered — "
            f"re-run under a fresh batch id")
    # only a CRASHED PRIOR ATTEMPT's orphan can exist here (the id is
    # uncommitted); a live racer's dir appearing after this delete
    # makes the rename nest, which the post-swap check unwinds
    indexlog.delete_glob(spark, dst)
    tp = jvm.org.apache.hadoop.fs.Path(tmp)
    dp = jvm.org.apache.hadoop.fs.Path(dst)
    fs = tp.getFileSystem(conf)
    renamed = fs.rename(tp, dp)
    if _committed_elsewhere() or not renamed:
        # unwind OUR artifacts only: the clean-rename dir is wholly
        # ours; a nested rename (dst existed) left ours inside it
        nested = jvm.org.apache.hadoop.fs.Path(
            f"{dst}/_tmp.{batch_id}")
        if fs.exists(nested):
            fs.delete(nested, True)
        elif renamed:
            indexlog.delete_glob(spark, dst)
        indexlog.delete_glob(spark, tmp)
        raise ConcurrentBatchError(
            f"batch {batch_id!r} was committed by another writer "
            f"mid-ingest (detected at the corpus swap); these "
            f"survivors were NOT registered — re-run under a fresh "
            f"batch id")


def read_corpus(spark: SparkSession, path: str, corpus_path: str,
                as_of=None) -> DataFrame:
    """The accumulated corpus rows of COMMITTED batches — the
    ``reference_df`` a store-managed ingest loop uses (``path`` is the
    signature store whose log governs visibility; ``as_of`` pins as in
    :func:`read_sig_store`)."""
    ids = indexlog.resolve_batches(spark, path, as_of)
    return (spark.read.parquet(corpus_path)
            .filter(F.col("batch").isin(sorted(ids))).drop("batch"))


def write_sig_store(df: DataFrame, path: str, text_column: str = "text",
                    id_column: str = "doc_id", num_hashes: int = 32,
                    shingle_k: int = 5, seed: int = 42,
                    n_shards: int = 16,
                    signatures: DataFrame | None = None,
                    corpus_path: str | None = None) -> None:
    """Build the store from an initial corpus: sign every row ONCE and
    persist (id, minhash) sharded by content hash. Rebuild order
    follows the other indexes: the old log and intents are deleted
    FIRST so a crash mid-rebuild cannot leave committed ids pointing at
    vanished data. ``corpus_path`` additionally seeds the accumulated-
    corpus table (the seed rows under ``batch=base``) so later
    :func:`ingest_dedup_batch` calls can manage reference text
    automatically (see its ``corpus_path``)."""
    if num_hashes <= 0 or shingle_k <= 0 or n_shards <= 0:
        raise ValueError("num_hashes, shingle_k, and n_shards must be "
                         "positive")
    spark = df.sparkSession
    indexlog.reset_log(spark, path)
    params = {"num_hashes": num_hashes, "shingle_k": shingle_k,
              "seed": seed, "n_shards": n_shards}
    rows = _sig_rows(df, text_column, id_column, params,
                     indexlog.BASE_BATCH, signatures)
    (rows.repartition("shard")
       .write.mode("overwrite").partitionBy("shard", "batch")
       .parquet(f"{path}/sigs"))
    if corpus_path is not None:
        _write_corpus_batch(df, corpus_path, indexlog.BASE_BATCH,
                            mode="overwrite")
    meta_ddl = "num_hashes int, shingle_k int, seed int, n_shards int"
    meta_row = [(num_hashes, shingle_k, seed, n_shards)]
    if not indexlog.write_meta_rows(spark, f"{path}/meta", meta_row,
                                    meta_ddl):
        from dsgrid_spark.session import one_slice_df
        (one_slice_df(spark, meta_row, meta_ddl)
           .write.mode("overwrite").parquet(f"{path}/meta"))
    indexlog.log_batch(spark, path, indexlog.BASE_BATCH)


def append_sig_store(df: DataFrame, path: str,
                     text_column: str = "text",
                     id_column: str = "doc_id",
                     batch_id: str | None = None,
                     signatures: DataFrame | None = None) -> bool:
    """Register one batch's signatures, exactly-once per ``batch_id``
    (pipeline/indexlog.py — committed ids no-op, crashed retries clean
    their own orphans first, auto ids claim intent markers, the log
    entry commits LAST so readers see the batch atomically). Signing
    uses the STORE'S OWN params. Returns True when ingested."""
    spark = df.sparkSession
    committed, ingested = indexlog.batch_sets(spark, path)
    if batch_id is None:
        batch_id = indexlog.claim_auto_batch_id(spark, path, ingested)
    indexlog.check_batch_id(batch_id)
    if batch_id == indexlog.BASE_BATCH:
        raise ValueError(f"batch_id {indexlog.BASE_BATCH!r} is reserved "
                         "for the initial build")
    if batch_id in ingested:
        # replayed batch: already fully ingested (possibly since
        # compacted away -- its rows live on in the compacted batch)
        return False
    params = _read_params(spark, path)
    indexlog.delete_glob(spark, f"{path}/sigs/shard=*/batch={batch_id}")
    rows = _sig_rows(df, text_column, id_column, params, batch_id,
                     signatures)
    (rows.repartition("shard")
       .write.mode("append").partitionBy("shard", "batch")
       .parquet(f"{path}/sigs"))
    indexlog.log_batch(spark, path, batch_id)
    indexlog.clear_intent(spark, path, batch_id)
    return True


def read_sig_store(spark: SparkSession, path: str,
                   id_column: str = "doc_id",
                   as_of=None) -> DataFrame:
    """(id_column, minhash) over COMMITTED batches only — the
    ``reference_sigs`` input incremental_dedup expects. The ``batch``
    partition filter prunes crashed-append orphans at planning time
    (indexlog.read_committed), so a racing reader never sees half a
    batch. ``as_of`` pins the read to a captured batch set
    (indexlog.resolve_as_of — the same reproducibility contract the
    searches carry)."""
    ids = indexlog.resolve_batches(spark, path, as_of)
    return (indexlog.read_committed(spark, path, "sigs", ids=ids)
            .select(F.col("id").alias(id_column), "minhash"))


def ingest_dedup_batch(new_df: DataFrame, path: str,
                       reference_df: DataFrame | None = None,
                       text_column: str = "text",
                       id_column: str = "doc_id",
                       batch_id: str | None = None,
                       num_bands: int = 4, threshold: float = 0.8,
                       within_batch: bool = True,
                       max_bucket_size: int | None = None,
                       require_reference_coverage: bool = True,
                       corpus_path: str | None = None) -> DataFrame:
    """Dedup one incoming batch against the persisted store and
    register the survivors' signatures — the crash-safe continuous-
    ingest step.

    Runs :func:`incremental_dedup` with the store's committed
    signatures as the reference side (``reference_df`` supplies the
    corpus TEXT for candidate verification only, semi-join-pruned to
    candidates as usual), appends the SURVIVORS' signatures
    exactly-once under ``batch_id``, and returns the surviving rows of
    ``new_df``.

    ``reference_df`` MUST cover the text of EVERY committed id in the
    store, not just the original seed corpus: the verification join
    looks candidate texts up by id, and a candidate whose reference
    text is absent cannot be verified — the near-duplicate would be
    KEPT. By default (``require_reference_coverage=True``) any
    candidate reference id missing from ``reference_df`` now raises
    (a candidate-bounded count, no extra corpus shuffle) instead of
    degrading silently. In a continuous-ingest loop pass the
    accumulated corpus (or any superset table keyed by id); a
    reference scoped to the seed quietly stops deduping against later
    batches' survivors.

    ``corpus_path`` makes the loop TURNKEY: the store manages the
    accumulated corpus itself. Each batch's surviving rows (all
    columns) are written under ``<corpus_path>/batch=<id>`` BEFORE the
    signature commit — visible exactly when the batch's signatures
    are, rewritten by crashed-attempt retries — and when
    ``reference_df`` is omitted, the reference becomes the committed
    corpus read (:func:`read_corpus`), which by construction covers
    every committed id: the coverage foot-gun is designed out rather
    than guarded. Seed it at build time
    (``write_sig_store(..., corpus_path=...)``).

    Crash/replay contract: if ``batch_id`` already committed, nothing
    is recomputed or re-registered — the survivor set is recovered
    from the store itself (the batch's registered ids ARE the
    survivors) via one batch-pruned id scan, so a re-run returns the
    identical rows. If a previous attempt crashed mid-append, the
    retry recomputes against the UNCHANGED committed state (the
    crashed batch was never visible to readers), deletes its orphan
    directories, and lands the same survivors. Signature params come
    from the store's meta; ``num_bands``/``threshold`` stay per-run
    knobs (banding happens at read time).
    """
    spark = new_df.sparkSession
    if reference_df is None and corpus_path is None:
        raise ValueError("pass reference_df (caller-managed corpus "
                         "text) or corpus_path (store-managed)")
    committed, ingested = indexlog.batch_sets(spark, path)
    if batch_id is None:
        batch_id = indexlog.claim_auto_batch_id(spark, path, ingested)
    indexlog.check_batch_id(batch_id)
    if batch_id in committed:
        # replay: recover the survivor ids from the store (batch
        # pruning makes this a scan of just this batch's directories)
        kept = (spark.read.parquet(f"{path}/sigs")
                .filter(F.col("batch") == batch_id)
                .select(F.col("id").alias(id_column)).distinct())
        return new_df.join(kept, id_column, "left_semi")
    if batch_id in ingested:
        # replay of a batch a compaction absorbed: its directories are
        # gone and its rows ride the compacted batch, so batch pruning
        # can't find them — recover by id against the visible store
        # (id is the store's global key: a row is present iff it
        # survived). Full-store id scan, but only on this rare path.
        kept = (read_sig_store(spark, path, id_column)
                .select(id_column).distinct())
        return new_df.join(kept, id_column, "left_semi")
    params = _read_params(spark, path)
    if reference_df is None:
        reference_df = read_corpus(spark, path, corpus_path)
    ref_sigs = read_sig_store(spark, path, id_column)
    new_sigs = minhash_signatures(
        new_df, text_column, num_hashes=int(params["num_hashes"]),
        shingle_k=int(params["shingle_k"]), seed=int(params["seed"]))
    survivors = incremental_dedup(
        new_df, ref_sigs, reference_df, text_column, id_column,
        num_hashes=int(params["num_hashes"]), num_bands=num_bands,
        shingle_k=int(params["shingle_k"]), threshold=threshold,
        within_batch=within_batch, new_sigs=new_sigs,
        max_bucket_size=max_bucket_size,
        require_reference_coverage=require_reference_coverage)
    # materialize the survivor set once: the append below and the
    # caller's consumption must see the SAME rows, and the append
    # re-reads it
    survivors = survivors.localCheckpoint()
    if corpus_path is not None:
        # corpus rows land BEFORE the commit (retry deletes+rewrites);
        # readers filter to committed batches, so they flip atomically
        # with the signatures at the log write below. The swap runs as
        # TEMP WRITE -> RE-CHECK -> RENAME -> RE-CHECK so a racing
        # writer that committed this id DURING our dedup keeps its
        # corpus text: the expensive Spark write happens off to the
        # side, the committed-set re-check happens immediately before
        # the one-FS-op rename (so a commit during OUR write is seen),
        # and a commit landing inside the rename window itself is
        # caught by the post-swap re-check, which removes only OUR
        # artifacts before failing loudly. The real discipline remains
        # one writer per batch id (checkpoint-derived stream ids give
        # that for free); this closes the r10 advice residue where the
        # loser's delete+rewrite replaced the winner's committed
        # reference texts.
        _swap_corpus_batch(spark, path, corpus_path, survivors, batch_id)
    # ONE signing pass serves dedup and registration: the batch's
    # signature table sliced to the survivor ids (extra signatures of
    # dropped rows never reach the store)
    ok = append_sig_store(
        survivors, path, text_column, id_column, batch_id=batch_id,
        signatures=new_sigs.join(
            survivors.select(id_column), id_column, "left_semi"))
    if not ok:
        # another writer committed this id between our batch_sets
        # snapshot and the append — a REAL exception, not an assert
        # (python -O would otherwise let the caller silently treat its
        # unregistered survivors as registered)
        raise ConcurrentBatchError(
            f"batch {batch_id!r} was committed by another writer "
            f"mid-ingest; these survivors were NOT registered — "
            f"re-run under a fresh batch id")
    return survivors
