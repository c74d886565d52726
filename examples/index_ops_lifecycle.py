"""The OPERATOR'S day-2 lifecycle for a persisted index, end to end —
at toy size, but every step is the 100 TB deployment recipe:

    build -> appends -> cron maintenance tick (vacuum + compact +
    SELF-CALIBRATING drift gate + fsck) -> disaster-recovery mirror
    (parallel bulk copy, fsck-verified before promotion) -> pinned
    point-in-time clone for a reproducible eval.

The same flow from the CLI:

    python -m dsgrid_spark index maintain /idx \\
        --max-distortion-ratio auto --fsck
    python -m dsgrid_spark index sync /idx /mirror \\
        --copy-parallelism 16 --verify
    python -m dsgrid_spark index sync /idx /eval-snap \\
        --as-of 2026-08-17T00:00:00+00:00
    python -m dsgrid_spark index fsck /mirror

Why each piece exists at scale:

- the drift gate's "auto" mode compares the live/refit distortion
  ratio against THIS index's recorded healthy baseline
  (`drift_baseline/batch=<gen>`, written by every rebalance), so the
  cron entry needs no hand-tuned threshold — the probe's magnitude
  varies by an order of magnitude across corpora;
- the mirror stages all missing batches' bytes as ONE Spark copy job
  and lands log rows last, in commit order: the initial copy of a
  100 TB index is cluster-bandwidth-bound, not driver-bound, and
  every intermediate destination state is a historical source view
  (searchable mid-sync, crash-converging);
- `verify=True` is the promotion gate: never point traffic at a
  mirror fsck hasn't passed;
- `as_of=` clones the view a pinned search reads — run an eval
  against the snapshot weeks later, bit-identically.

Run: PYTHONPATH=/root/repo python examples/index_ops_lifecycle.py
"""
import tempfile

from pyspark.sql import SparkSession

from dsgrid_spark.pipeline import indexlog
from dsgrid_spark.pipeline.indexsync import sync_index
from dsgrid_spark.pipeline.rebalance import (maintain_index,
                                             read_drift_baseline)
from dsgrid_spark.pipeline.similarity import (append_ivf_index,
                                              ivf_search,
                                              kmeans_centroids,
                                              write_ivf_index)


def main():
    spark = (SparkSession.builder.master("local[8]")
             .appName("index-ops-lifecycle")
             .config("spark.sql.shuffle.partitions", "8")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="index_ops_")
    idx = f"{work}/idx"

    # 1. build + appends (the ingest steady state)
    import random
    rnd = random.Random(7)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(16)]) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    write_ivf_index(df, idx, kmeans_centroids(df, 4, 16, iterations=3,
                                              seed=1))
    for b in range(2):
        extra = spark.createDataFrame(
            [(1000 + 100 * b + i, [rnd.gauss(0, 1) for _ in range(16)])
             for i in range(50)],
            "vec_id long, embedding array<double>")
        append_ivf_index(extra, idx, batch_id=f"b{b}")
    print("built:", sorted(indexlog.committed_batches(spark, idx)))

    # 2. the cron tick: vacuum + compact gate + auto drift gate + fsck.
    #    First tick CALIBRATES the drift baseline instead of firing.
    tick = maintain_index(spark, idx, max_distortion_ratio="auto",
                          drift_sample=256, fsck=True)
    print("tick 1: rebalanced =", tick["rebalanced_batch"],
          "calibrated =", tick["drift"]["calibrated"],
          "fsck ok =", tick["fsck"]["ok"])
    gen = indexlog.resolve_generation(
        spark, idx, indexlog.committed_batches(spark, idx))
    print("baseline:", read_drift_baseline(spark, idx,
                                           gen or indexlog.BASE_BATCH))

    # 3. disaster-recovery mirror: parallel bulk copy, fsck-verified
    pin = indexlog.committed_batches(spark, idx)  # capture for step 4
    mirror = f"{work}/mirror"
    out = sync_index(spark, idx, mirror, copy_parallelism=4,
                     verify=True)
    print("mirror:", out["copied_batches"],
          f"({out['copied_files']} files, {out['copied_bytes']} B),",
          "fsck ok =", out["fsck"]["ok"])

    # 4. the source moves on; the PINNED clone still reproduces the
    #    captured view exactly — the reproducible-eval snapshot
    append_ivf_index(
        spark.createDataFrame([(9999, rows[0][1])],
                              "vec_id long, embedding array<double>"),
        idx, batch_id="later")
    snap = f"{work}/eval_snap"
    sync_index(spark, idx, snap, as_of=pin)
    q = [(0, rows[0][1])]
    pinned_src = sorted(map(tuple, ivf_search(spark, idx, q, k=3,
                                              as_of=pin).collect()))
    snap_live = sorted(map(tuple, ivf_search(spark, snap, q,
                                             k=3).collect()))
    assert snap_live == pinned_src
    print("pinned clone reproduces the captured view:", snap_live)
    spark.stop()


if __name__ == "__main__":
    main()
