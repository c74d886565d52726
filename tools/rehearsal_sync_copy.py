"""Round-12 rehearsal: sync_index bulk-copy throughput vs parallelism
(VERDICT r11 next-#1 — the initial mirror of a large index must not
funnel through a driver-serial copy loop).

Setup: build an sf10-class IVF index (N vectors x DIM float64, ~GBs of
parquet across n_lists cluster partitions plus a handful of append
batches so the mirror has real batch structure), then time a FRESH
``sync_index`` of it at copy_parallelism = 1 (the r11 driver-serial
shape) and at increasing slice counts. The protocol is identical at
every parallelism (artifacts staged first — one Spark job —, log rows
last, alone, in commit order); only the byte-streaming fan-out
changes. Afterward re-run the winning sync once more to confirm the
incremental no-op path, and verify the mirror (fsck + search parity).

Usage: PYTHONPATH=/root/repo python tools/rehearsal_sync_copy.py \
          [n_rows dim n_lists]
Prints one JSON line for SCALE_R12.md; stage timings to stderr.
"""
import json
import shutil
import sys
import tempfile
import time

import numpy as np
from pyspark.sql import SparkSession

from dsgrid_spark.pipeline import indexlog
from dsgrid_spark.pipeline.indexsync import sync_index
from dsgrid_spark.pipeline.similarity import (append_ivf_index,
                                              ivf_search,
                                              kmeans_centroids,
                                              write_ivf_index)

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 256
N_LISTS = int(sys.argv[3]) if len(sys.argv) > 3 else 32
PARALLELISMS = [1, 4, 16, 32]


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    spark = (SparkSession.builder.master("local[32]")
             .appName("rehearsal-sync-copy")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "48g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="sync_rehearsal_")
    src = f"{work}/src"

    rng = np.random.default_rng(11)
    rows = [(int(i), [float(x) for x in v])
            for i, v in enumerate(rng.standard_normal((N_ROWS, DIM)))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    t0 = time.time()
    cents = kmeans_centroids(df, N_LISTS, DIM, iterations=3, seed=1,
                             fit_sample_cap=20_000)
    write_ivf_index(df, src, cents)
    # real batch structure: 4 appends on top of base
    for b in range(4):
        extra = spark.createDataFrame(
            [(int(N_ROWS + b * 1000 + i), [float(x) for x in v])
             for i, v in enumerate(
                 rng.standard_normal((1000, DIM)))],
            "vec_id long, embedding array<double>")
        append_ivf_index(extra, src, batch_id=f"b{b}")
    _log(f"build+appends: {time.time() - t0:.1f}s")

    import subprocess
    du = subprocess.run(["du", "-sb", src], capture_output=True,
                        text=True)
    src_bytes = int(du.stdout.split()[0]) if du.returncode == 0 else -1

    copies = {}
    out = None
    for p in PARALLELISMS:
        dst = f"{work}/dst_p{p}"
        t0 = time.time()
        out = sync_index(spark, src, dst, copy_parallelism=p)
        copies[str(p)] = round(time.time() - t0, 2)
        _log(f"parallelism {p}: {copies[str(p)]}s "
             f"({out['copied_files']} files, "
             f"{out['copied_bytes'] >> 20} MiB)")

    # incremental no-op + verified mirror on the last destination
    dst = f"{work}/dst_p{PARALLELISMS[-1]}"
    t0 = time.time()
    noop = sync_index(spark, src, dst, copy_parallelism=PARALLELISMS[-1],
                      verify=True)
    t_noop = round(time.time() - t0, 2)
    assert noop["copied_batches"] == []
    assert noop["fsck"]["ok"]
    q = [(0, rows[0][1]), (1, rows[1][1])]
    want = sorted(map(tuple, ivf_search(spark, src, q, k=5,
                                        n_probe=4).collect()))
    got = sorted(map(tuple, ivf_search(spark, dst, q, k=5,
                                       n_probe=4).collect()))
    assert got == want, "mirror search parity failed"
    assert indexlog.committed_batches(spark, dst) == \
        indexlog.committed_batches(spark, src)

    print(json.dumps({
        "rehearsal": "sync_copy_parallelism",
        "n_rows": N_ROWS, "dim": DIM, "n_lists": N_LISTS,
        "src_bytes": src_bytes,
        "copied_files": out["copied_files"],
        "copied_bytes": out["copied_bytes"],
        "sync_seconds_by_parallelism": copies,
        "noop_resync_seconds": t_noop,
        "mirror_verified": True,
    }))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
