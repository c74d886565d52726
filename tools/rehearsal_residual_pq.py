"""Round-8 residual-PQ (IVFADC) rehearsal at sf10 (200k x 64-dim):
recall@10 of residual vs flat (non-residual) IVF-PQ at the SAME m*k
codebook budget, across probe widths — the paper's claim is that
quantizing (vector − coarse centroid) concentrates the distribution
and buys recall at fixed code size.

Usage: PYTHONPATH=/root/repo python tools/rehearsal_residual_pq.py [n_probe ...]
(sf dir is pinned to .scale/sf10; args are integer probe widths, default 4 16)
Prints one JSON line for SCALE_R8.md.
"""
import json
import sys
import time

from pyspark.sql import SparkSession, Window, functions as F

from dsgrid_spark.pipeline.pq import coarse_residuals, ivf_pq_topk, pq_fit
from dsgrid_spark.pipeline.similarity import dot, kmeans_centroids

SF_DIR = "/root/repo/.scale/sf10"
PROBES = [int(x) for x in (sys.argv[1:] or ["4", "16"])]
M, K = 8, 256          # 8 codes for 64 doubles: the aggressive setting
N_LISTS = 64
N_QUERIES, TOPK = 20, 10


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("rehearsal-residual-pq")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("embedding"))
           .localCheckpoint())
    n = emb.count()
    qrows = (emb.orderBy("vec_id").limit(N_QUERIES)
             .select(F.col("vec_id").alias("query_id"), "embedding")
             .localCheckpoint())

    scored = emb.crossJoin(
        F.broadcast(qrows.withColumnRenamed("embedding", "__q"))).select(
        "query_id", "vec_id",
        dot(F.col("embedding"), F.col("__q")).alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.col("vec_id"))
    truth = (scored.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") <= TOPK).collect())
    want = {}
    for r in truth:
        want.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall_of(rows):
        got = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return round(sum(len(got.get(q, set()) & want[q])
                         for q in want) / (len(want) * TOPK), 3)

    coarse = kmeans_centroids(emb, N_LISTS, 64, iterations=3,
                              fit_sample_cap=50_000)
    flat_books = pq_fit(emb, dim=64, n_subvectors=M, n_centroids=K,
                        iterations=3, fit_sample_cap=50_000)
    resid = coarse_residuals(emb, coarse).localCheckpoint()
    res_books = pq_fit(resid, dim=64, n_subvectors=M, n_centroids=K,
                       vector_column="residual", iterations=3,
                       fit_sample_cap=50_000)

    table = []
    for n_probe in PROBES:
        t0 = time.time()
        flat = ivf_pq_topk(emb, qrows, coarse, flat_books, k=TOPK,
                           n_probe=n_probe, method="arrow").collect()
        t_flat = time.time() - t0
        t0 = time.time()
        res = ivf_pq_topk(emb, qrows, coarse, res_books, k=TOPK,
                          n_probe=n_probe, residual=True,
                          method="arrow").collect()
        t_res = time.time() - t0
        table.append({"n_probe": n_probe,
                      "flat_recall": recall_of(flat),
                      "residual_recall": recall_of(res),
                      "flat_sec": round(t_flat, 1),
                      "residual_sec": round(t_res, 1)})

    print(json.dumps({"corpus": n, "m": M, "k": K, "n_lists": N_LISTS,
                      "queries": N_QUERIES, "topk": TOPK,
                      "table": table}))
    spark.stop()


if __name__ == "__main__":
    main()
