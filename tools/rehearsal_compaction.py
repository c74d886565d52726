"""Round-9 compaction rehearsal at sf10: a term index grown by many
small appends (the daily-ingest shape) vs the same index after
``indexlog.compact`` — batch-directory count, parquet file count,
search wall, and a result-equality check. The claim under test is the
small-files argument: scan-task scheduling and file listing degrade
with file count long before bytes do, and compaction restores the
fresh-build file shape without touching results.

Usage: PYTHONPATH=/root/repo python tools/rehearsal_compaction.py [sf_dir]
Prints one JSON line for SCALE_R9.md.
"""
import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession, functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"
N_APPENDS = 40


def tree_stats(path):
    files = dirs = 0
    for root, dnames, fnames in os.walk(path):
        files += sum(1 for f in fnames if f.endswith(".parquet"))
        dirs += sum(1 for d in dnames if d.startswith("batch="))
    return files, dirs


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("rehearsal-compaction")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from dsgrid_spark.pipeline import indexlog
    from dsgrid_spark.pipeline.retrieval import (
        append_term_index, bm25_search, write_term_index,
    )

    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").localCheckpoint())
    n = docs.count()
    # seed with half the corpus, then drip the rest in N_APPENDS slices
    # (pmod slicing is deterministic and partition-independent)
    seed = docs.filter(F.pmod(F.col("doc_id"), 2) == 0)
    rest = docs.filter(F.pmod(F.col("doc_id"), 2) == 1)
    tmp = tempfile.mkdtemp(prefix="rehearsal_compact_")
    path = f"{tmp}/idx"
    write_term_index(seed, path, n_buckets=64)
    t0 = time.time()
    for i in range(N_APPENDS):
        batch = rest.filter(
            F.pmod(F.col("doc_id"), 2 * N_APPENDS) == 2 * i + 1)
        append_term_index(batch, path, batch_id=f"day{i:03d}")
    t_appends = time.time() - t0

    def timed_search():
        t = time.time()
        rows = bm25_search(spark, path,
                           ["data", "model", "training"], k=10).collect()
        return time.time() - t, sorted(map(tuple, rows))

    files_pre, dirs_pre = tree_stats(f"{path}/postings")
    timed_search()  # warm
    w_pre, res_pre = timed_search()
    totals_pre = indexlog.logged_totals(spark, path, "n_docs",
                                        "total_tokens")

    t0 = time.time()
    new_id = indexlog.compact(spark, path)
    t_compact = time.time() - t0
    t0 = time.time()
    purged = indexlog.purge_replaced(spark, path)
    t_purge = time.time() - t0

    files_post, dirs_post = tree_stats(f"{path}/postings")
    timed_search()  # warm
    w_post, res_post = timed_search()
    totals_post = indexlog.logged_totals(spark, path, "n_docs",
                                         "total_tokens")

    out = {
        "sf_dir": SF_DIR, "n_docs": n, "n_appends": N_APPENDS,
        "append_wall_s": round(t_appends, 1),
        "files_pre": files_pre, "batch_dirs_pre": dirs_pre,
        "files_post": files_post, "batch_dirs_post": dirs_post,
        "search_wall_pre_s": round(w_pre, 3),
        "search_wall_post_s": round(w_post, 3),
        "compact_wall_s": round(t_compact, 1),
        "purge_wall_s": round(t_purge, 1),
        "compacted_batch": new_id,
        "purged": purged,
        "results_identical": res_pre == res_post,
        "totals_invariant": totals_pre == totals_post,
        "visible_batches_post": sorted(
            indexlog.committed_batches(spark, path)),
    }
    print(json.dumps(out))
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
