"""Round-9 int8 re-rank tier rehearsal on the planted-cluster fixture
(100k x 256-dim, 256 true clusters): the binary (Hamming) index built
with vectors_dtype='float64' vs 'int8' — re-rank payload bytes, search
wall, and recall@R/top-10 overlap vs the exact brute-force truth (the
SCALE_R9 §2 metrics, so the int8 row slots straight into that table).
The claim under test: the int8 tier cuts the re-rank payload ~8x per
dimension while leaving the two-phase recipe's recall intact, because
cosine is per-vector-scale invariant and planted margins exceed the
1/254 rounding.

Usage: PYTHONPATH=/root/repo python tools/rehearsal_int8_tier.py [fixture_dir]
Prints one JSON line for SCALE_R9.md.
"""
import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession, functions as F

FIX = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/planted"
N_QUERIES, TOPK, N_LISTS, SHORTLIST = 20, 10, 64, 100


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
        .appName("rehearsal-int8-tier")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from dsgrid_spark.pipeline.similarity import (
        brute_force_topk, hamming_search, kmeans_centroids,
        write_binary_index,
    )

    emb = (spark.read.parquet(f"{FIX}/embeddings.parquet")
           .select("vec_id", "embedding").localCheckpoint())
    n = emb.count()
    dim = len(emb.first()["embedding"])
    qdf = (emb.orderBy("vec_id").limit(N_QUERIES)
           .select(F.col("vec_id").alias("query_id"), "embedding")
           .localCheckpoint())
    queries = [(r["query_id"], list(r["embedding"]))
               for r in qdf.collect()]

    # exact truth: brute-force cosine top-k (excluding self)
    truth = {}
    trows = brute_force_topk(emb, qdf, k=TOPK + 1).collect()
    for r in sorted(trows, key=lambda r: (-r["score"], r["vec_id"])):
        if r["vec_id"] != r["query_id"]:
            truth.setdefault(r["query_id"], []).append(r["vec_id"])
    truth = {q: v[:TOPK] for q, v in truth.items()}

    cents = kmeans_centroids(emb, N_LISTS, dim, iterations=2,
                             fit_sample_cap=50_000,
                             assign_strategy="arrow")
    tmp = tempfile.mkdtemp(prefix="rehearsal_int8_")
    out = {"fixture": FIX, "n": n, "dim": dim, "n_lists": N_LISTS,
           "shortlist": SHORTLIST, "tiers": {}}
    for dtype in ("float64", "int8"):
        path = f"{tmp}/{dtype}"
        t0 = time.time()
        write_binary_index(emb, path, cents, vectors_dtype=dtype)
        t_build = time.time() - t0

        def run():
            t = time.time()
            rows = hamming_search(spark, path, queries, k=TOPK,
                                  n_probe=N_LISTS,  # full probe
                                  shortlist=SHORTLIST).collect()
            got = {}
            for r in sorted(rows, key=lambda r: (-r["score"], r["id"])):
                if r["id"] != r["query_id"]:
                    got.setdefault(r["query_id"], []).append(r["id"])
            return time.time() - t, got

        run()  # warm
        wall, got = run()
        r1 = sum(truth[q][0] in got.get(q, [])[:TOPK]
                 for q in truth) / len(truth)
        overlap = sum(
            len(set(truth[q]) & set(got.get(q, [])[:TOPK])) / TOPK
            for q in truth) / len(truth)
        out["tiers"][dtype] = {
            "build_wall_s": round(t_build, 1),
            "bits_mb": round(tree_bytes(f"{path}/bits") / 1e6, 1),
            "vectors_mb": round(tree_bytes(f"{path}/vectors") / 1e6, 1),
            "search_wall_s": round(wall, 2),
            "recall_at_1": round(r1, 3),
            "top10_overlap": round(overlap, 3),
        }
    f64, i8 = out["tiers"]["float64"], out["tiers"]["int8"]
    out["vectors_payload_ratio"] = round(
        f64["vectors_mb"] / max(i8["vectors_mb"], 1e-9), 1)
    print(json.dumps(out))
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
