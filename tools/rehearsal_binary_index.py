"""Round-9 persisted-binary-index rehearsal at sf10 (200k x 64-dim):
on-disk payload of the bits/ subtree vs the vectors/ subtree (the scan
replica argument), plus search wall — probe-pruned disk search vs the
in-memory full-scan hamming_topk, bits-only and re-ranked — and a
result-equality check under a full probe.

Usage: PYTHONPATH=/root/repo python tools/rehearsal_binary_index.py [sf_dir]
Prints one JSON line for SCALE_R9.md.
"""
import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession, functions as F

from dsgrid_spark.pipeline.similarity import (
    hamming_search, hamming_topk, kmeans_centroids, write_binary_index,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"
N_QUERIES, TOPK, N_LISTS = 20, 10, 64


def tree_bytes(path):
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f))
                     for f in files if f.endswith(".parquet"))
    return total


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("rehearsal-binary-index")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("embedding"))
           .localCheckpoint())
    n = emb.count()
    dim = len(emb.first()["embedding"])
    qdf = (emb.orderBy("vec_id").limit(N_QUERIES)
           .select(F.col("vec_id").alias("query_id"), "embedding")
           .localCheckpoint())
    queries = [(r["query_id"], list(r["embedding"]))
               for r in qdf.collect()]

    cents = kmeans_centroids(emb, N_LISTS, dim, iterations=2,
                             fit_sample_cap=50_000,
                             assign_strategy="arrow")
    tmp = tempfile.mkdtemp(prefix="rehearsal_bidx_")
    path = f"{tmp}/idx"
    try:
        t0 = time.time()
        write_binary_index(emb, path, cents)
        t_build = time.time() - t0
        bits_b = tree_bytes(f"{path}/bits")
        vecs_b = tree_bytes(f"{path}/vectors")

        t0 = time.time()
        mem = sorted((r["query_id"], r["vec_id"], r["hamming"]) for r in
                     hamming_topk(emb, qdf, k=TOPK).collect())
        t_mem = time.time() - t0
        t0 = time.time()
        full = sorted((r["query_id"], r["id"], r["hamming"]) for r in
                      hamming_search(spark, path, queries, k=TOPK,
                                     n_probe=N_LISTS,
                                     rerank=False).collect())
        t_full = time.time() - t0
        t0 = time.time()
        pruned = hamming_search(spark, path, queries, k=TOPK,
                                n_probe=4, rerank=False).collect()
        t_pruned = time.time() - t0
        t0 = time.time()
        rr = hamming_search(spark, path, queries, k=TOPK, n_probe=4,
                            shortlist=100).collect()
        t_rr = time.time() - t0

        # pruned recall vs the exact-Hamming full scan (IVF pruning is
        # the approximation; Hamming agreement itself is exact)
        want = {}
        for q, i, _ in mem:
            want.setdefault(q, set()).add(i)
        got = {}
        for r in pruned:
            got.setdefault(r["query_id"], set()).add(r["id"])
        pr_recall = round(sum(len(got.get(q, set()) & want[q])
                              for q in want) / (len(want) * TOPK), 3)

        print(json.dumps({
            "corpus": n, "dim": dim, "n_lists": N_LISTS,
            "queries": N_QUERIES, "topk": TOPK,
            "build_sec": round(t_build, 1),
            "bits_bytes": bits_b, "vectors_bytes": vecs_b,
            "payload_ratio": round(vecs_b / bits_b, 1),
            "mem_scan_sec": round(t_mem, 1),
            "disk_full_probe_sec": round(t_full, 1),
            "disk_probe4_sec": round(t_pruned, 1),
            "disk_probe4_rerank_sec": round(t_rr, 1),
            "full_probe_equals_mem": full == mem,
            "probe4_recall_vs_full_hamming": pr_recall,
            "rerank_rows": len(rr),
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
