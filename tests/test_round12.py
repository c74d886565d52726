"""Round-12 additions (r11 VERDICT next-round items + ADVICE): PQ
append pre-commit guards, duplicate-query-id validation, crash-safe
codebook retrain migration (flat-first reads, unconditional old-gen
rewrite, verified deletion), atomic generation-table landings, the
parallel (DistCp-shaped) sync copy with atomic compaction-row mirror
and post-sync fsck verify, the self-calibrating drift gate, and
maintain_index(fsck=True)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from tests.test_round11 import (_clustered_vectors, _ivf_fixture,
                                _pq_fixture, _term_index, DOCS, QUERIES)


# ---------------------------------------------------------------------------
# PQ append pre-commit guards (ADVICE high)
# ---------------------------------------------------------------------------

def test_pq_append_aborts_on_generation_flip(spark, tmp_path, monkeypatch):
    """append_pq_index racing a rebalance loses LOUDLY like the
    ivf/binary appends (r11 ADVICE: it was the one vector append
    missing the pre-commit guards): the generation re-check aborts it
    before the commit, nothing becomes visible, and the retry
    re-assigns (and re-encodes) against the live generation."""
    from dsgrid_spark.pipeline import indexlog
    from dsgrid_spark.pipeline.pq import append_pq_index, pq_search
    from dsgrid_spark.pipeline.rebalance import rebalance_index

    path, rows, _ = _pq_fixture(spark, tmp_path, residual=False)
    extra = (spark.createDataFrame(
        _clustered_vectors(6, seed=9, dim=8),
        "vec_id long, embedding array<double>")
        .withColumn("vec_id", F.col("vec_id") + 1000))

    orig = indexlog.check_generation_unchanged
    state = {"fired": False}

    def hook(sp, p, gen):
        if not state["fired"]:
            state["fired"] = True
            rebalance_index(sp, p, calibrate_drift=False)
        return orig(sp, p, gen)

    monkeypatch.setattr(indexlog, "check_generation_unchanged", hook)
    with pytest.raises(indexlog.StaleGenerationError, match="flipped"):
        append_pq_index(extra, path, batch_id="race1")
    monkeypatch.setattr(indexlog, "check_generation_unchanged", orig)

    assert "race1" not in indexlog.committed_batches(spark, path)
    got = pq_search(spark, path, [(0, rows[0][1])], k=3, n_probe=2,
                    rerank=False).collect()
    assert all(r["id"] < 1000 for r in got)

    # retry under the same id lands against the live generation
    assert append_pq_index(extra, path, batch_id="race1") is True
    committed = indexlog.committed_batches(spark, path)
    assert "race1" in committed
    assert indexlog.resolve_generation(spark, path, committed) is not None

    # blocked-append mode covers PQ too (start AND pre-commit checks)
    indexlog.block_appends(spark, path)
    try:
        with pytest.raises(indexlog.AppendsBlockedError):
            append_pq_index(extra, path, batch_id="blocked1")
    finally:
        indexlog.unblock_appends(spark, path)
    assert "blocked1" not in indexlog.batch_sets(spark, path)[1]


# ---------------------------------------------------------------------------
# Duplicate query ids fail loudly (VERDICT item 2)
# ---------------------------------------------------------------------------

def test_duplicate_query_ids_raise(spark, tmp_path):
    """A list-form batch with a repeated query id raises ValueError
    naming the id — the forms key per-query state by id, so a
    duplicate used to silently apply ONE entry's terms to both
    (r11 What's-wrong #1)."""
    from dsgrid_spark.pipeline.retrieval import (bm25_search,
                                                 hybrid_search_batch,
                                                 phrase_search_batch)

    path = _term_index(spark, tmp_path, positions=True)
    dup = [(7, ["spark", "shuffle"]), (7, ["catalyst"])]
    with pytest.raises(ValueError, match="duplicate query ids.*7"):
        bm25_search(spark, path, dup, k=3)
    with pytest.raises(ValueError, match="duplicate query ids.*7"):
        phrase_search_batch(spark, path,
                            [(7, "spark shuffle"), (7, "catalyst")])
    with pytest.raises(ValueError, match="duplicate query ids.*7"):
        hybrid_search_batch(spark, path, path,
                            [(7, ["spark"], [1.0]), (7, ["join"], [0.5])])
    # unique ids keep working
    assert bm25_search(spark, path, QUERIES, k=3).count() > 0


def test_duplicate_query_ids_raise_in_ann_list_forms(spark, tmp_path):
    """The ANN list forms share the same per-query-id keying (probe
    rows, rank windows), so query_id_type rejects duplicates for every
    list-based search in one place."""
    from dsgrid_spark.pipeline.pq import pq_search
    from dsgrid_spark.pipeline.similarity import ivf_search

    path, rows = _ivf_fixture(spark, tmp_path)
    with pytest.raises(ValueError, match="duplicate query ids"):
        ivf_search(spark, path,
                   [(0, rows[0][1]), (0, rows[1][1])], k=3)
    ppath, prows, _ = _pq_fixture(spark, tmp_path, residual=False)
    with pytest.raises(ValueError, match="duplicate query ids"):
        pq_search(spark, ppath,
                  [(1, prows[0][1]), (1, prows[1][1])], k=3,
                  rerank=False)


# ---------------------------------------------------------------------------
# Crash-safe codebook retrain migration (ADVICE medium #1)
# ---------------------------------------------------------------------------

def test_retrain_retry_heals_partial_codebook_migration(spark, tmp_path):
    """Directory existence is NOT a completion marker: a crashed first
    retrain's PARTIAL codebooks/batch=<gen> dir must not cause the
    retry to skip the old-generation copy and delete the flat files
    (permanent codebook loss for pinned readers). The retry rewrites
    the copy from the still-present flat files and only then removes
    them, after verifying both gen-scoped tables hold m*k rows."""
    from dsgrid_spark.pipeline import indexlog
    from dsgrid_spark.pipeline.pq import (_read_codebooks, pq_search,
                                          _flat_codebook_files)
    from dsgrid_spark.pipeline.rebalance import rebalance_index
    from dsgrid_spark.session import one_slice_df

    path, rows, _ = _pq_fixture(spark, tmp_path, residual=False)
    pin = indexlog.committed_batches(spark, path)
    pre = sorted(map(tuple, pq_search(
        spark, path, [(0, rows[0][1])], k=4, n_probe=2,
        rerank=False).collect()))
    true_books = _read_codebooks(spark, path, "base")

    # plant the crash debris: a partial (1-row, wrong) batch=base dir
    # next to the still-authoritative flat files
    (one_slice_df(spark, [(0, 0, [9.9] * 4)],
                  "j int, i int, centroid array<double>")
       .write.mode("overwrite").parquet(f"{path}/codebooks/batch=base"))
    assert _flat_codebook_files(spark, path)  # flat files still there

    # flat-first read: the partial dir is never authoritative
    assert _read_codebooks(spark, path, "base") == true_books
    # fsck classifies the state as a WARNING (reads stay correct), not
    # an error
    report = indexlog.fsck(spark, path)
    assert report["ok"]
    assert any("MIXED codebook layout" in w for w in report["warnings"])

    # the retry completes the migration from the flat files
    new_id = rebalance_index(spark, path, iterations=3, seed=1,
                             retrain_codebooks=True,
                             calibrate_drift=False)
    assert not _flat_codebook_files(spark, path)  # migration finished
    # the old generation's copy is the TRUE flat books, not the debris
    assert _read_codebooks(spark, path, "base") == true_books
    m, k = len(true_books), len(true_books[0])
    assert len(_read_codebooks(spark, path, new_id)) == m
    # pinned pre-retrain reader reproduces bit-for-bit
    pinned = sorted(map(tuple, pq_search(
        spark, path, [(0, rows[0][1])], k=4, n_probe=2, rerank=False,
        as_of=pin).collect()))
    assert pinned == pre
    assert indexlog.fsck(spark, path)["ok"]


def test_gen_table_writes_land_atomically(spark, tmp_path):
    """Generation tables for COMMITTED ids land via side-dir + one
    rename (no empty-marker window for concurrent readers), and a
    crashed side dir is invisible to every discovery path and simply
    replaced on retry."""
    from dsgrid_spark.pipeline import indexlog
    from dsgrid_spark.pipeline.pq import (_read_codebooks,
                                          codebook_generations)
    from dsgrid_spark.pipeline.rebalance import _write_codebooks_gen

    path, _, _ = _pq_fixture(spark, tmp_path, residual=False)
    books = _read_codebooks(spark, path, "base")
    # a crashed attempt's side dir: invisible to generation globs
    os.makedirs(f"{path}/codebooks/_tmp_gen_zz")
    assert "zz" not in codebook_generations(spark, path)
    assert indexlog.fsck(spark, path)["ok"]
    # the (re)write replaces it and lands complete
    _write_codebooks_gen(spark, path, books, "zz")
    assert not os.path.exists(f"{path}/codebooks/_tmp_gen_zz")
    assert "zz" in codebook_generations(spark, path)
    rows = spark.read.parquet(f"{path}/codebooks/batch=zz").count()
    assert rows == len(books) * len(books[0])


def test_flat_centroid_migration_atomic_and_readable(spark, tmp_path):
    """The legacy flat-centroid migration writes the carrier dir via
    side-dir + rename (r11 ADVICE: the partitionBy append exposed an
    empty marker to concurrent readers); post-migration the index is
    fully readable and a leftover migration temp dir is invisible."""
    from dsgrid_spark.pipeline import indexlog
    from dsgrid_spark.pipeline.pq import _read_centroids
    from dsgrid_spark.pipeline.rebalance import _migrate_flat_centroids
    from dsgrid_spark.pipeline.similarity import ivf_search

    path, rows = _ivf_fixture(spark, tmp_path)
    # strip the generation layout back to legacy flat (the r10 test's
    # planting recipe): move batch=base rows to root-level files
    flat = spark.read.parquet(f"{path}/centroids/batch=base").collect()
    cents = [list(r["centroid"]) for r in
             sorted(flat, key=lambda r: r["cluster"])]
    import shutil
    shutil.rmtree(f"{path}/centroids")
    (spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        "cluster int, centroid array<double>")
       .coalesce(1).write.mode("overwrite")
       .parquet(f"{path}/centroids"))
    assert indexlog.centroid_generations(spark, path) == set()

    visible = indexlog.committed_batches(spark, path)
    carrier = _migrate_flat_centroids(spark, path, visible)
    assert carrier == "base"
    # no temp debris, flat files swept, marker complete
    names = os.listdir(f"{path}/centroids")
    assert names == ["batch=base"]
    assert _read_centroids(spark, path, "base") == cents
    got = ivf_search(spark, path, [(0, rows[0][1])], k=3,
                     n_probe=2).collect()
    assert len(got) == 3


# ---------------------------------------------------------------------------
# Parallel sync copy + atomic compaction mirror + verify (VERDICT #1, #5;
# ADVICE medium #2)
# ---------------------------------------------------------------------------

def test_sync_parallel_copy_equals_serial_and_verifies(spark, tmp_path):
    """The parallel (DistCp-shaped) staging path mirrors a multi-batch
    index identically to the r11 serial loop: same batches, same
    search results, fsck-clean — and verify=True returns the fsck
    report inline."""
    from dsgrid_spark.pipeline import indexlog
    from dsgrid_spark.pipeline.indexsync import sync_index
    from dsgrid_spark.pipeline.retrieval import (append_term_index,
                                                 bm25_search,
                                                 write_term_index)

    src = str(tmp_path / "psrc")
    dst = str(tmp_path / "pdst")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    write_term_index(docs, src, n_buckets=4)
    for i in range(3):
        append_term_index(
            spark.createDataFrame([(100 + i, f"spark shuffle round {i}")],
                                  "doc_id long, text string"),
            src, batch_id=f"b{i}")

    out = sync_index(spark, src, dst, copy_parallelism=4, verify=True)
    assert len(out["copied_batches"]) == 4
    assert out["copied_files"] > 0 and out["copied_bytes"] > 0
    assert out["fsck"]["ok"]
    q = ["spark", "shuffle"]
    want = sorted(map(tuple, bm25_search(spark, src, q, k=8).collect()))
    got = sorted(map(tuple, bm25_search(spark, dst, q, k=8).collect()))
    assert got == want
    assert indexlog.committed_batches(spark, dst) == \
        indexlog.committed_batches(spark, src)
    # idempotent re-run under the parallel path
    out = sync_index(spark, src, dst, copy_parallelism=4)
    assert out["copied_batches"] == [] and out["skipped_batches"] == 4


def test_sync_crash_mid_parallel_copy_converges(spark, tmp_path):
    """A crash inside the bulk copy job leaves every staged batch
    INVISIBLE at the destination (no log rows landed); the re-run
    re-cleans and converges to the same mirror."""
    from dsgrid_spark.pipeline import indexlog
    from dsgrid_spark.pipeline import indexsync
    from dsgrid_spark.pipeline.indexsync import sync_index
    from dsgrid_spark.pipeline.retrieval import (append_term_index,
                                                 bm25_search,
                                                 write_term_index)

    src = str(tmp_path / "csrc")
    dst = str(tmp_path / "cdst")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    write_term_index(docs, src, n_buckets=4)
    append_term_index(
        spark.createDataFrame([(50, "spark shuffle spark")],
                              "doc_id long, text string"),
        src, batch_id="b2")

    real = indexsync._parallel_copy

    def crashing(sp, specs, parallelism=None):
        real(sp, specs[: len(specs) // 2], parallelism)
        raise IOError("simulated crash mid-copy")

    orig = indexsync._parallel_copy
    indexsync._parallel_copy = crashing
    try:
        with pytest.raises(IOError, match="simulated"):
            sync_index(spark, src, dst, copy_parallelism=2)
    finally:
        indexsync._parallel_copy = orig

    # nothing committed at dst: the crash is invisible to readers
    assert not os.path.exists(f"{dst}/batches") or \
        indexlog.committed_batches(spark, dst) == set()
    # re-run converges
    out = sync_index(spark, src, dst, copy_parallelism=2, verify=True)
    assert sorted(out["copied_batches"]) == ["b2", "base"]
    q = ["spark", "shuffle"]
    assert sorted(map(tuple, bm25_search(spark, dst, q, k=8).collect())) \
        == sorted(map(tuple, bm25_search(spark, src, q, k=8).collect()))


def test_sync_compaction_rows_land_atomically(spark, tmp_path):
    """The pre-pass mirror of historical compaction rows goes through
    temp+rename (r11 ADVICE: a crashed partial by= dir was skipped as
    done forever): a crashed temp leaves NO final dir, the re-run
    lands it complete, and leftover temps are invisible."""
    from dsgrid_spark.pipeline import indexlog
    from dsgrid_spark.pipeline.indexsync import sync_index
    from dsgrid_spark.pipeline.retrieval import (append_term_index,
                                                 write_term_index)

    src = str(tmp_path / "asrc")
    dst = str(tmp_path / "adst")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    write_term_index(docs, src, n_buckets=4)
    append_term_index(
        spark.createDataFrame([(60, "spark catalyst")],
                              "doc_id long, text string"),
        src, batch_id="b2")
    cmp1 = indexlog.compact(spark, src, purge=True)

    # plant a crashed temp from a previous attempt
    os.makedirs(f"{dst}/compactions/_sync_tmp_by={cmp1}")
    sync_index(spark, src, dst)
    # the final dir landed complete and equals the source's rows
    s_rows = sorted(map(tuple, spark.read.parquet(
        f"{src}/compactions/by={cmp1}").collect()))
    d_rows = sorted(map(tuple, spark.read.parquet(
        f"{dst}/compactions/by={cmp1}").collect()))
    assert d_rows == s_rows
    assert indexlog.fsck(spark, dst)["ok"]


def test_sync_verify_fails_on_corrupted_destination(spark, tmp_path):
    """verify=True is the promotion gate: a destination whose tree was
    corrupted out-of-band fails the sync LOUDLY instead of being
    promoted."""
    from dsgrid_spark.pipeline.indexsync import sync_index
    from dsgrid_spark.pipeline.similarity import write_ivf_index

    rows = _clustered_vectors(20)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    src = str(tmp_path / "vsrc")
    write_ivf_index(df, src, [rows[0][1], rows[1][1]])
    dst = str(tmp_path / "vdst")
    sync_index(spark, src, dst, verify=True)

    # corrupt dst: flat centroid files next to the generation dir (the
    # mixed layout fsck flags as an ERROR)
    (spark.createDataFrame([(0, rows[0][1])],
                           "cluster int, centroid array<double>")
       .coalesce(1).write.mode("append").parquet(f"{dst}/centroids"))
    with pytest.raises(IOError, match="not safe to promote"):
        sync_index(spark, src, dst, verify=True)


def test_sync_as_of_clones_pinned_view(spark, tmp_path):
    """sync_index(as_of=...) clones a PINNED historical view — the
    reproducible-eval snapshot: the clone's visible set equals the
    pin, searches equal the source's pinned reads, compaction rows
    beyond the pin stay inert, a later un-pinned sync fast-forwards
    to live, and a destination already ahead of the pin is refused."""
    from dsgrid_spark.pipeline import indexlog
    from dsgrid_spark.pipeline.indexsync import sync_index
    from dsgrid_spark.pipeline.retrieval import (append_term_index,
                                                 bm25_search,
                                                 write_term_index)

    src = str(tmp_path / "tsrc")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    write_term_index(docs, src, n_buckets=4)
    append_term_index(
        spark.createDataFrame([(50, "spark shuffle spark")],
                              "doc_id long, text string"),
        src, batch_id="b2")
    pin = indexlog.committed_batches(spark, src)
    q = ["spark", "shuffle"]
    want_pinned = sorted(map(tuple, bm25_search(spark, src, q, k=8,
                                                as_of=pin).collect()))
    # the source moves on: another append AND a compaction retiring
    # the pinned batches (their dirs stay readable — the pin contract)
    append_term_index(
        spark.createDataFrame([(60, "spark spark shuffle shuffle")],
                              "doc_id long, text string"),
        src, batch_id="b3")
    cmp1 = indexlog.compact(spark, src)

    dst = str(tmp_path / "tdst")
    out = sync_index(spark, src, dst, as_of=pin, verify=True)
    assert sorted(out["copied_batches"]) == sorted(pin)
    assert indexlog.committed_batches(spark, dst) == pin
    got = sorted(map(tuple, bm25_search(spark, dst, q, k=8).collect()))
    assert got == want_pinned
    # the beyond-pin compaction rows mirrored but stay inert
    assert os.path.exists(f"{dst}/compactions/by={cmp1}")

    # a live source cannot be pin-synced ONTO a destination that is
    # already ahead (here: fast-forward first, then try to rewind)
    out = sync_index(spark, src, dst)  # fast-forward to live
    assert indexlog.committed_batches(spark, dst) == \
        indexlog.committed_batches(spark, src)
    want_live = sorted(map(tuple, bm25_search(spark, src, q,
                                              k=8).collect()))
    assert sorted(map(tuple,
                      bm25_search(spark, dst, q, k=8).collect())) \
        == want_live
    with pytest.raises(ValueError, match="outside the pin"):
        sync_index(spark, src, str(tmp_path / "tdst"), as_of=pin)

    # timestamp-form pin: the view at "now" equals the live clone
    import datetime
    t_now = datetime.datetime.now(datetime.timezone.utc).isoformat()
    dst2 = str(tmp_path / "tdst2")
    sync_index(spark, src, dst2, as_of=t_now)
    assert indexlog.committed_batches(spark, dst2) == \
        indexlog.committed_batches(spark, src)


# ---------------------------------------------------------------------------
# Self-calibrating drift gate (VERDICT item 3)
# ---------------------------------------------------------------------------

def test_rebalance_records_drift_baseline(spark, tmp_path):
    """Every rebalance (default calibrate_drift=True) persists the new
    generation's healthy ratio; the record rides the generation and is
    purged with it."""
    from dsgrid_spark.pipeline import indexlog
    from dsgrid_spark.pipeline.rebalance import (calibrate_drift_baseline,
                                                 read_drift_baseline,
                                                 rebalance_index)

    path, _ = _ivf_fixture(spark, tmp_path)
    calibrate_drift_baseline(spark, path, sample=64)
    assert read_drift_baseline(spark, path, "base") is not None
    new_id = rebalance_index(spark, path, iterations=3, seed=1,
                             drift_sample=64)
    base = read_drift_baseline(spark, path, new_id)
    assert base is not None
    assert base["n_clusters"] == 2 and base["dim"] == 6
    assert 0.0 < base["ratio"] < 1.5  # freshly fitted ≈ 1.0
    # the retired generation's record is purged with its marker
    indexlog.purge_replaced(spark, path)
    assert read_drift_baseline(spark, path, "base") is None


def test_auto_drift_gate_calibrates_then_fires(spark, tmp_path):
    """max_distortion_ratio='auto': the first tick over an
    uncalibrated generation records the baseline WITHOUT firing; a
    drifted corpus then fires on the RELATIVE rise (no hand-tuned
    absolute — the r11 verdict's regime-dependence fix); after the
    rebalance recalibrates, the gate is quiet again."""
    from dsgrid_spark.pipeline import indexlog
    from dsgrid_spark.pipeline.rebalance import (maintain_index,
                                                 read_drift_baseline,
                                                 rebalance_if_drifted)
    from dsgrid_spark.pipeline.similarity import (append_ivf_index,
                                                  write_ivf_index)

    rows = _clustered_vectors(40, seed=3, dim=6)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "auto")
    write_ivf_index(df, path, [rows[0][1], rows[1][1]])

    # tick 1: calibration, not a fire
    assert rebalance_if_drifted(spark, path, sample=128,
                                calibrate_drift=False) is None
    assert read_drift_baseline(spark, path, "base") is not None

    # tick 2 on the unchanged corpus: quiet
    assert rebalance_if_drifted(spark, path, sample=128,
                                calibrate_drift=False) is None

    # plant drift: a third cluster on unseen axes (the r11 recipe —
    # skew stays flat, distortion rises)
    drift_rows = [(1000 + i, v) for i, v in enumerate(
        r[1] for r in _clustered_vectors(40, seed=7, dim=6,
                                         centers=((0.0, 0.0),
                                                  (0.0, 0.0))))]
    for i, (vid, v) in enumerate(drift_rows):
        v[4] = 5.0 + 0.1 * (i % 5)
        v[5] = -5.0 + 0.1 * (i % 7)
    append_ivf_index(
        spark.createDataFrame(drift_rows,
                              "vec_id long, embedding array<double>"),
        path, batch_id="drifted")

    # the auto gate fires through maintain_index with NO threshold
    out = maintain_index(spark, path, max_distortion_ratio="auto",
                         drift_sample=128, iterations=3, seed=1)
    new_id = out["rebalanced_batch"]
    assert new_id is not None
    assert out["drift"]["ratio"] > out["drift"]["threshold"]
    # the rebalance recalibrated the new generation
    assert read_drift_baseline(spark, path, new_id) is not None
    # and the gate is quiet again
    out2 = maintain_index(spark, path, max_distortion_ratio="auto",
                          drift_sample=128, iterations=3, seed=1)
    assert out2["rebalanced_batch"] is None
    assert out2["drift"]["calibrated"] is False


def test_auto_drift_gate_recalibrates_on_regime_change(spark, tmp_path):
    """A REBUILD that changes the cluster count under a stale baseline
    row recalibrates instead of firing or comparing across regimes."""
    from dsgrid_spark.pipeline.rebalance import (read_drift_baseline,
                                                 rebalance_if_drifted)
    from dsgrid_spark.pipeline.similarity import write_ivf_index

    rows = _clustered_vectors(30, seed=3, dim=6)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "regime")
    write_ivf_index(df, path, [rows[0][1], rows[1][1]])
    assert rebalance_if_drifted(spark, path, sample=64,
                                calibrate_drift=False) is None
    old = read_drift_baseline(spark, path, "base")
    assert old["n_clusters"] == 2

    # rebuild at k=3 over the same path: the stale k=2 baseline row
    # survives under batch=base — the gate must treat it as invalid
    write_ivf_index(df, path, [rows[0][1], rows[1][1], rows[2][1]])
    assert read_drift_baseline(spark, path, "base")["n_clusters"] == 2
    assert rebalance_if_drifted(spark, path, sample=64,
                                calibrate_drift=False) is None  # recal
    assert read_drift_baseline(spark, path, "base")["n_clusters"] == 3


def test_drift_gate_validation_and_explicit_threshold(spark, tmp_path):
    """Numeric thresholds keep the r11 contract (must exceed 1.0);
    margins must exceed 1.0; explicit numbers bypass calibration."""
    from dsgrid_spark.pipeline.rebalance import (read_drift_baseline,
                                                 rebalance_if_drifted)

    path, _ = _ivf_fixture(spark, tmp_path)
    with pytest.raises(ValueError, match="exceed 1.0"):
        rebalance_if_drifted(spark, path, max_distortion_ratio=1.0)
    with pytest.raises(ValueError, match="margin"):
        rebalance_if_drifted(spark, path, margin=0.9)
    # explicit threshold: no baseline is written
    assert rebalance_if_drifted(spark, path, max_distortion_ratio=5.0,
                                sample=64) is None
    assert read_drift_baseline(spark, path, "base") is None


# ---------------------------------------------------------------------------
# Adaptive partition pruning for DF-form ANN (VERDICT item 6)
# ---------------------------------------------------------------------------

def test_df_form_ann_prunes_cluster_partitions(spark, tmp_path):
    """A small DataFrame query sweep's probed-cluster union is pushed
    into the payload read as a PartitionFilter (the list form's pruned
    scan), results stay equal to the list form, and a sweep whose
    union saturates still returns identical rows (filter skipped as a
    no-op)."""
    from dsgrid_spark.pipeline.similarity import ivf_search

    # 3 well-separated clusters so a 1-probe sweep leaves one unprobed
    rows = _clustered_vectors(30, dim=6,
                              centers=((3.0, 4.0), (4.0, -3.0),
                                       (-5.0, 2.0)))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "prune")
    from dsgrid_spark.pipeline.similarity import write_ivf_index
    write_ivf_index(df, path, [rows[0][1], rows[1][1], rows[2][1]])

    queries = [(i, rows[i][1]) for i in range(2)]  # probe union ⊂ all
    qdf = spark.createDataFrame(queries,
                                "query_id long, embedding array<double>")
    out = ivf_search(spark, path, qdf, k=3, n_probe=1)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    pf_lines = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert any("cluster" in l and " IN " in l for l in pf_lines), plan
    want = sorted(map(tuple,
                      ivf_search(spark, path, queries, k=3,
                                 n_probe=1).collect()))
    assert sorted(map(tuple, out.collect())) == want

    # saturated union (probe every list): identical rows, no filter
    full = ivf_search(spark, path, qdf, k=3, n_probe=3)
    wantf = sorted(map(tuple,
                       ivf_search(spark, path, queries, k=3,
                                  n_probe=3).collect()))
    assert sorted(map(tuple, full.collect())) == wantf


def test_df_form_pq_and_binary_prune_and_match(spark, tmp_path):
    """The PQ and binary DF forms keep list-form parity under the new
    adaptive pruning (the r10 parity contract, re-pinned on the
    changed code path)."""
    from dsgrid_spark.pipeline.pq import pq_search
    from dsgrid_spark.pipeline.similarity import hamming_search

    path, rows, _ = _pq_fixture(spark, tmp_path, residual=False)
    queries = [(0, rows[0][1]), (1, rows[1][1])]
    qdf = spark.createDataFrame(queries,
                                "query_id long, embedding array<double>")
    want = sorted(map(tuple, pq_search(
        spark, path, queries, k=4, n_probe=1, rerank=False).collect()))
    got = sorted(map(tuple, pq_search(
        spark, path, qdf, k=4, n_probe=1, rerank=False).collect()))
    assert got == want

    from dsgrid_spark.pipeline.similarity import write_binary_index
    brows = _clustered_vectors(30, dim=6)
    bdf = spark.createDataFrame(brows,
                                "vec_id long, embedding array<double>")
    bpath = str(tmp_path / "bin")
    write_binary_index(bdf, bpath, [brows[0][1], brows[1][1]])
    bq = [(0, brows[0][1]), (1, brows[1][1])]
    bqdf = spark.createDataFrame(bq,
                                 "query_id long, embedding array<double>")
    wantb = sorted(map(tuple, hamming_search(
        spark, bpath, bq, k=3, n_probe=1).collect()))
    gotb = sorted(map(tuple, hamming_search(
        spark, bpath, bqdf, k=3, n_probe=1).collect()))
    assert gotb == wantb


def test_cli_round12_flags(spark, tmp_path, capsys):
    """The round-12 CLI surface end-to-end: `index sync
    --copy-parallelism/--verify/--as-of`, `index maintain --fsck
    --max-distortion-ratio auto`, `index rebalance --if-drifted
    auto`."""
    import json as _json

    from dsgrid_spark.cli import main as cli_main
    from dsgrid_spark.pipeline import indexlog
    from dsgrid_spark.pipeline.retrieval import (append_term_index,
                                                 write_term_index)
    from dsgrid_spark.pipeline.similarity import (kmeans_centroids,
                                                  write_ivf_index)

    src = str(tmp_path / "clisrc")
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    write_term_index(docs, src, n_buckets=4)
    pin = sorted(indexlog.committed_batches(spark, src))
    append_term_index(
        spark.createDataFrame([(50, "spark shuffle")],
                              "doc_id long, text string"),
        src, batch_id="b2")

    dst = str(tmp_path / "clidst")
    assert cli_main(["index", "sync", src, dst,
                     "--copy-parallelism", "2", "--verify"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sorted(out["copied_batches"]) == ["b2", "base"]
    assert out["fsck"]["ok"] is True

    # timestamp clone via --as-of (now == live view)
    import datetime
    t_now = datetime.datetime.now(datetime.timezone.utc).isoformat()
    dst2 = str(tmp_path / "clidst2")
    assert cli_main(["index", "sync", src, dst2, "--as-of", t_now]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sorted(out["copied_batches"]) == ["b2", "base"]
    assert pin  # (pin captured pre-append; set-form is API-only)

    # vector index: auto drift gate through the CLI (first call
    # calibrates, second is quiet), maintain --fsck passes
    rows = _clustered_vectors(30, seed=3, dim=6)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    vpath = str(tmp_path / "clividx")
    write_ivf_index(df, vpath, kmeans_centroids(df, 2, 6, iterations=3,
                                                seed=1))
    for _ in range(2):  # calibrate tick, then quiet tick
        assert cli_main(["index", "rebalance", vpath, "--if-drifted",
                         "auto", "--drift-sample", "64",
                         "--iterations", "3"]) == 0
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["rebalanced_batch"] is None
    from dsgrid_spark.pipeline.rebalance import read_drift_baseline
    assert read_drift_baseline(spark, vpath, "base") is not None

    assert cli_main(["index", "maintain", vpath,
                     "--max-distortion-ratio", "auto",
                     "--drift-sample", "64", "--fsck"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rebalanced_batch"] is None  # calibrated + healthy
    assert out["fsck"]["ok"] is True


def test_drift_baseline_rides_compact_and_sync(spark, tmp_path):
    """The generation's drift-calibration record follows the
    generation everywhere its centroid marker goes: compact's marker
    transfer copies it onto the absorbing batch, and the mirror
    carries it so a promoted destination's auto gate stays armed
    (no recalibration tick needed)."""
    from dsgrid_spark.pipeline import indexlog
    from dsgrid_spark.pipeline.indexsync import sync_index
    from dsgrid_spark.pipeline.rebalance import (read_drift_baseline,
                                                 rebalance_index)
    from dsgrid_spark.pipeline.similarity import append_ivf_index

    path, rows = _ivf_fixture(spark, tmp_path)
    gen1 = rebalance_index(spark, path, iterations=3, seed=1,
                           drift_sample=64)
    base = read_drift_baseline(spark, path, gen1)
    assert base is not None

    # another append, then a compaction absorbing the establisher:
    # the baseline transfers with the generation marker
    append_ivf_index(
        spark.createDataFrame([(900, rows[0][1])],
                              "vec_id long, embedding array<double>"),
        path, batch_id="b9")
    cmp_id = indexlog.compact(spark, path)
    committed = indexlog.committed_batches(spark, path)
    gen2 = indexlog.resolve_generation(spark, path, committed)
    assert gen2 == cmp_id
    moved = read_drift_baseline(spark, path, cmp_id)
    assert moved is not None
    assert moved["ratio"] == base["ratio"]  # same record, new carrier

    # the mirror carries it: the clone's auto gate is already armed
    dst = str(tmp_path / "bdst")
    sync_index(spark, path, dst, verify=True)
    dgen = indexlog.resolve_generation(
        spark, dst, indexlog.committed_batches(spark, dst))
    assert read_drift_baseline(spark, dst, dgen)["ratio"] == \
        base["ratio"]


# ---------------------------------------------------------------------------
# maintain_index(fsck=True) (VERDICT item 5)
# ---------------------------------------------------------------------------

def test_maintain_index_fsck_gate(spark, tmp_path):
    """fsck=True finishes the maintenance tick with the integrity
    check: healthy trees pass (report returned inline), a corrupted
    tree raises."""
    from dsgrid_spark.pipeline.rebalance import maintain_index

    path, rows = _ivf_fixture(spark, tmp_path)
    out = maintain_index(spark, path, fsck=True)
    assert out["fsck"]["ok"]

    # corrupt: mixed flat+generation centroid layout
    (spark.createDataFrame([(0, rows[0][1])],
                           "cluster int, centroid array<double>")
       .coalesce(1).write.mode("append").parquet(f"{path}/centroids"))
    with pytest.raises(IOError, match="fsck"):
        maintain_index(spark, path, fsck=True)
