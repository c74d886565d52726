"""Round-8 binary-quantization rehearsal at sf10 (200k x 64-dim):
wall + recall of the 1-bit sign Hamming scan vs the exact float
brute-force scan, with and without the two-phase cosine re-rank —
the operator's scale claim is the cheapest-possible candidate scan
(~1 bit/dim, XOR+popcount), traded against sign-only resolution.

Usage: PYTHONPATH=/root/repo python tools/rehearsal_binary_hamming.py [sf_dir]
Prints one JSON line for SCALE_R8.md.
"""
import json
import sys
import time

from pyspark.sql import SparkSession, Window, functions as F

from dsgrid_spark.pipeline.similarity import (
    brute_force_topk,
    hamming_topk,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"
N_QUERIES, TOPK = 20, 10


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("rehearsal-binary-hamming")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("embedding"))
           .localCheckpoint())
    n = emb.count()
    queries = (emb.orderBy("vec_id").limit(N_QUERIES)
               .select(F.col("vec_id").alias("query_id"), "embedding")
               .localCheckpoint())

    t0 = time.time()
    truth_rows = brute_force_topk(emb, queries, k=TOPK).collect()
    t_brute = time.time() - t0
    want = {}
    for r in truth_rows:
        want.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall_of(rows):
        got = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return round(sum(len(got.get(q, set()) & want[q])
                         for q in want) / (len(want) * TOPK), 3)

    t0 = time.time()
    ham = hamming_topk(emb, queries, k=TOPK).collect()
    t_ham = time.time() - t0
    t0 = time.time()
    rr = hamming_topk(emb, queries, k=TOPK, rerank=10 * TOPK).collect()
    t_rr = time.time() - t0

    print(json.dumps({
        "corpus": n, "queries": N_QUERIES, "topk": TOPK,
        "brute_force_sec": round(t_brute, 1),
        "hamming_sec": round(t_ham, 1),
        "hamming_recall": recall_of(ham),
        "rerank_sec": round(t_rr, 1),
        "rerank_recall": recall_of(rr),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
