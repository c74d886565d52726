"""One-way incremental mirror for persisted indexes — the disaster-
recovery / promotion tool (`index sync` in the CLI).

Every index this package persists (term, IVF, PQ, binary, sigs) is a
tree of IMMUTABLE batch-scoped directories plus a one-row-per-batch
log whose commit makes a batch visible (pipeline/indexlog.py). That
structure makes mirroring exactly-once by construction: copy a
batch's artifacts first, copy its LOG ROW last — the batch appears at
the destination atomically, exactly as an append would have landed
it. The mirror therefore needs no locks, no quiescence at the source,
and no bookkeeping beyond the destination's own log:

1. Static tables (``meta``/``stats``, and the legacy FLAT centroid /
   codebook layouts, which predate generation scoping) are copied
   once, when the destination lacks them.
2. Source batches are mirrored in COMMIT-TIME order (``committed_at_ms``,
   NULL = the unknown past = oldest). For each batch not yet ingested
   at the destination: any previous crashed attempt's artifacts are
   deleted, then its payload dirs (``<sub>/<col>=K/batch=<id>``), its
   generation tables (``centroids/batch=<id>``,
   ``codebooks/batch=<id>``), and its compaction rows
   (``compactions/by=<id>`` — inert until the batch commits) are
   copied, and its ``batches/batch=<id>`` log row LAST. Because the
   order is commit-time and compaction rows land before their
   replacing batch's log row, the destination's visible set after
   EVERY step equals a historical view of the source
   (``indexlog.resolve_timestamp``'s views) — consistent generations,
   no double counting, searches correct mid-sync.
3. A crash anywhere leaves the in-flight batch invisible at the
   destination; the re-run deletes its partial artifacts and
   re-copies. Re-running a completed sync is a no-op. Batches the
   source has retired-and-purged since the last sync are simply never
   copied; batches the destination holds that the source has since
   compacted away retire at the destination the instant the replacing
   batch's log row lands, and the destination's OWN vacuum purges
   them under its own ttl.

Caveats, stated loudly: a REBUILT source (``write_*`` over an
existing path resets the log and reuses the ``base`` id with new
content) cannot be mirrored incrementally onto a destination that
synced the old build — batch ids no longer mean the same bytes; pass
``overwrite=True`` to reset the destination. The sigstore's optional
``corpus_path`` side table lives OUTSIDE the index tree; pass
``src_corpus``/``dst_corpus`` to mirror it batch-atomically alongside
(omitted, it is not copied). Locks and intents are lifecycle state,
never copied. A
purge racing the copy window at the source fails the copy LOUDLY
(re-run); schedule syncs inside the source's vacuum ttl grace, the
same contract its readers carry.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from dsgrid_spark.pipeline import indexlog

__all__ = ["sync_index"]

#: 2-level subtrees copied per batch (generation tables + replacement
#: rows); payloads are discovered from the tree itself
_TWO_LEVEL = (("centroids", "batch"), ("codebooks", "batch"),
              ("compactions", "by"))


def _fs_of(spark, path_str: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path_str)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def _exists(spark, path_str: str) -> bool:
    fs, p = _fs_of(spark, path_str)
    return fs.exists(p)


def _copy_tree(spark, src_path: str, dst_path: str) -> None:
    """Recursive copy of one directory (or file) to an EXACT
    destination path (pre-deleted by the caller, so Hadoop's
    copy-into-existing-dir nesting can never trigger)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    sfs, sp = _fs_of(spark, src_path)
    dfs, dp = _fs_of(spark, dst_path)
    dfs.mkdirs(dp.getParent())
    if not jvm.org.apache.hadoop.fs.FileUtil.copy(sfs, sp, dfs, dp,
                                                  False, conf):
        raise IOError(f"copy failed: {src_path} -> {dst_path}")


def _glob(spark, pattern: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(pattern)
    return list(p.getFileSystem(
        spark._jsc.hadoopConfiguration()).globStatus(p) or [])


def _batch_rels(spark, src: str, batch_id: str) -> list[str]:
    """Every source artifact of one batch, as index-relative paths,
    log row EXCLUDED (the caller copies it last): payload dirs plus
    the 2-level generation/compaction dirs."""
    rels = []
    for st in _glob(spark, f"{src}/*/*/batch={batch_id}"):
        p = st.getPath()
        rels.append(f"{p.getParent().getParent().getName()}/"
                    f"{p.getParent().getName()}/{p.getName()}")
    for sub, col in _TWO_LEVEL:
        if _exists(spark, f"{src}/{sub}/{col}={batch_id}"):
            rels.append(f"{sub}/{col}={batch_id}")
    return rels


def sync_index(spark: SparkSession, src: str, dst: str,
               overwrite: bool = False,
               src_corpus: str | None = None,
               dst_corpus: str | None = None) -> dict:
    """Mirror the source index's committed state onto ``dst``
    (module docstring): incremental, idempotent, crash-safe,
    batch-atomic at the destination. Returns
    ``{"copied_batches": [...], "skipped_batches": n,
    "static_copied": [...]}``.

    ``src_corpus``/``dst_corpus`` extend the mirror to a sigstore's
    store-managed corpus table (``corpus_path`` in
    ``sigstore.ingest_dedup_batch`` — it lives OUTSIDE the index
    tree): each batch's ``batch=<id>`` corpus dir is copied BEFORE the
    batch's log row, so corpus text becomes visible at the destination
    exactly when the batch's signatures do — the same atomicity
    ``read_corpus`` relies on at the source."""
    if src.rstrip("/") == dst.rstrip("/"):
        raise ValueError("src and dst are the same path")
    if (src_corpus is None) != (dst_corpus is None):
        raise ValueError("pass src_corpus and dst_corpus together")
    if not _exists(spark, f"{src}/batches"):
        raise ValueError(f"no batch log at {src!r}: not a persisted "
                         f"index (or nothing committed yet)")
    if overwrite:
        indexlog.delete_glob(spark, dst)
        if dst_corpus is not None:
            # a rebuilt source reuses batch ids: stale corpus text left
            # under a reused id would read back as the NEW batch's text
            indexlog.delete_glob(spark, dst_corpus)
    elif _exists(spark, f"{dst}/batches"):
        # the destination is already an index: refuse to interleave a
        # DIFFERENT one into it (kind or immutable config mismatch —
        # also catches most rebuilt-source cases, whose new build
        # usually changes the config row; identical-config rebuilds
        # remain the documented --overwrite case)
        from dsgrid_spark.pipeline.stream_index import index_kind

        skind, dkind = (index_kind(spark, src), index_kind(spark, dst))
        if skind != dkind:
            raise ValueError(
                f"destination holds a {dkind!r} index; source is "
                f"{skind!r} — pass overwrite=True to replace it")
        for sub in ("meta", "stats"):
            if _exists(spark, f"{src}/{sub}") and \
                    _exists(spark, f"{dst}/{sub}"):
                srow = spark.read.parquet(
                    f"{src}/{sub}").collect()[0].asDict()
                drow = spark.read.parquet(
                    f"{dst}/{sub}").collect()[0].asDict()
                # corpus-size fields drift with appends; only the
                # immutable CONFIG keys must agree
                informational = {"n_docs", "total_tokens"}
                s_cfg = {k: v for k, v in srow.items()
                         if k not in informational}
                d_cfg = {k: v for k, v in drow.items()
                         if k not in informational}
                if s_cfg != d_cfg:
                    raise ValueError(
                        f"destination's {sub}/ config {d_cfg} != "
                        f"source's {s_cfg}: a different index (or a "
                        f"rebuilt source) — pass overwrite=True")

    # source snapshot: visible batches in commit-time order (NULL
    # commit time = the unknown past = first), so every intermediate
    # destination state is a historical source view
    try:
        rows = (spark.read.option("mergeSchema", "true")
                .parquet(f"{src}/batches")
                .select("batch", "committed_at_ms").collect())
        at = {r["batch"]: r["committed_at_ms"] for r in rows}
    except Exception:
        at = {}
    visible = indexlog.committed_batches(spark, src)
    order = sorted(visible, key=lambda b: (
        0 if at.get(b) is None else 1,
        at.get(b) if at.get(b) is not None else 0, b))

    # static tables: meta/stats once; the legacy FLAT centroid /
    # codebook layouts (root-level files, shared by every batch) are
    # copied as whole files when the destination has no such table yet
    static_copied = []
    for sub in ("meta", "stats"):
        if _exists(spark, f"{src}/{sub}") and \
                not _exists(spark, f"{dst}/{sub}"):
            _copy_tree(spark, f"{src}/{sub}", f"{dst}/{sub}")
            static_copied.append(sub)
    for sub in ("centroids", "codebooks"):
        flat = [st for st in _glob(spark, f"{src}/{sub}/*")
                if not st.getPath().getName().startswith(
                    ("batch=", "_", "."))]
        if flat and not _exists(spark, f"{dst}/{sub}"):
            for st in flat:
                name = st.getPath().getName()
                _copy_tree(spark, f"{src}/{sub}/{name}",
                           f"{dst}/{sub}/{name}")
            static_copied.append(f"{sub} (flat)")

    # ALL compaction rows mirror, not just visible batches': the
    # ``by=`` dirs of already-purged intermediates are the PERMANENT
    # replay/id-reuse guard (indexlog._retired resolves retirement
    # transitively through them) — without them, a destination
    # promoted to primary could re-ingest a batch whose rows live on
    # inside a compacted successor. Rows are inert until their ``by``
    # commits; ones whose ``by`` is already committed at dst activate
    # retirements the source has already made — both safe at every
    # intermediate state. The batch loop below re-copies its own.
    for st in _glob(spark, f"{src}/compactions/by=*"):
        name = st.getPath().getName()
        if not _exists(spark, f"{dst}/compactions/{name}"):
            _copy_tree(spark, f"{src}/compactions/{name}",
                       f"{dst}/compactions/{name}")

    ingested_dst = indexlog.batch_sets(spark, dst)[1] \
        if _exists(spark, f"{dst}/batches") else set()
    copied, skipped = [], 0
    for b in order:
        if b in ingested_dst:
            skipped += 1
            continue
        # clean a previous crashed attempt's partial artifacts (the
        # batch is uncommitted at dst, so nothing reads them)
        indexlog.delete_glob(spark, f"{dst}/*/*/batch={b}")
        for sub, col in _TWO_LEVEL:
            indexlog.delete_glob(spark, f"{dst}/{sub}/{col}={b}")
        rels = _batch_rels(spark, src, b)
        for rel in rels:
            _copy_tree(spark, f"{src}/{rel}", f"{dst}/{rel}")
        if src_corpus is not None and \
                _exists(spark, f"{src_corpus}/batch={b}"):
            # corpus rows land before the commit, like every artifact
            indexlog.delete_glob(spark, f"{dst_corpus}/batch={b}")
            _copy_tree(spark, f"{src_corpus}/batch={b}",
                       f"{dst_corpus}/batch={b}")
        # THE COMMIT at dst: the batch (and, with it, any compaction
        # retirements and generation flips it carries) becomes visible
        indexlog.delete_glob(spark, f"{dst}/batches/batch={b}")
        _copy_tree(spark, f"{src}/batches/batch={b}",
                   f"{dst}/batches/batch={b}")
        copied.append(b)
        # a batch carrying a generation marker makes any FLAT table the
        # destination still holds redundant — sweep it (the source did
        # the same at its migration), or root-level partition discovery
        # at dst would hit the mixed layout the source already escaped
        for sub in ("centroids", "codebooks"):
            if any(r.startswith(f"{sub}/") for r in rels):
                for st in _glob(spark, f"{dst}/{sub}/*"):
                    name = st.getPath().getName()
                    if not name.startswith(("batch=", "_", ".")):
                        fs, p = _fs_of(spark, f"{dst}/{sub}/{name}")
                        fs.delete(p, True)
    return {"copied_batches": copied, "skipped_batches": skipped,
            "static_copied": static_copied}
