"""Round-8 PQ rehearsal at sf10 (200k x 64-dim): (a) the opt-in Arrow
ADC scorer vs the interpreted-HOF fold on the full-corpus scan (the r7
verdict's `weak` item: ~17.6 us per (candidate, query) interpreted),
and (b) the persisted PQ index — on-disk payload of codes/ vs vectors/
(the storage claim, now measurable as bytes), pq_search wall with and
without re-rank, and result equality between the disk path and the
in-memory scan.

Usage: PYTHONPATH=/root/repo python tools/rehearsal_pq_index.py [sf_dir]
Prints one JSON line for SCALE_R8.md.
"""
import json
import os
import sys
import time

from pyspark.sql import SparkSession, functions as F

from dsgrid_spark.pipeline.pq import (
    pq_encode,
    pq_fit,
    pq_search,
    pq_topk,
    write_pq_index,
)
from dsgrid_spark.pipeline.similarity import (
    ivf_search,
    kmeans_centroids,
    write_ivf_index,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"
M, K = 16, 256
N_QUERIES, TOPK = 20, 10


def tree_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("rehearsal-pq-index")
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
    queries = [(r["query_id"], list(r["embedding"]))
               for r in qrows.collect()]

    books = pq_fit(emb, dim=64, n_subvectors=M, n_centroids=K,
                   iterations=4, fit_sample_cap=50_000)
    codes = pq_encode(emb, books).localCheckpoint()
    codes.count()

    # (a) full-scan ADC: interpreted HOF vs numpy gather, same codes
    t0 = time.time()
    hof = pq_topk(codes, books, qrows, k=TOPK).collect()
    t_hof = time.time() - t0
    t0 = time.time()
    arrow = pq_topk(codes, books, qrows, k=TOPK, method="arrow").collect()
    t_arrow = time.time() - t0
    same_ids = ({(r["query_id"], r["vec_id"]) for r in hof}
                == {(r["query_id"], r["vec_id"]) for r in arrow})

    # (b) persisted index: 64 coarse lists, probe 8 (the rehearsal_pq
    # IVF-PQ setting), vs the float-vector IVF index on the same layout
    coarse = kmeans_centroids(emb, 64, 64, iterations=3,
                              fit_sample_cap=50_000)
    pq_path = "/tmp/r8_pq_index"
    ivf_path = "/tmp/r8_ivf_index"
    t0 = time.time()
    write_pq_index(emb, pq_path, coarse, books)
    t_build = time.time() - t0
    write_ivf_index(emb, ivf_path, coarse)

    t0 = time.time()
    adc_only = pq_search(spark, pq_path, queries, k=TOPK, n_probe=8,
                         rerank=False, method="arrow").collect()
    t_adc_disk = time.time() - t0
    t0 = time.time()
    rerank = pq_search(spark, pq_path, queries, k=TOPK, n_probe=8,
                       shortlist=10 * TOPK, method="arrow").collect()
    t_rerank_disk = time.time() - t0
    t0 = time.time()
    ivf_rows = ivf_search(spark, ivf_path, queries, k=TOPK,
                          n_probe=8).collect()
    t_ivf_disk = time.time() - t0

    # recall of each disk path against the exact brute-force ip truth
    from pyspark.sql import Window
    from dsgrid_spark.pipeline.similarity import dot
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

    def recall_of(rows, idc):
        got = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r[idc])
        return round(sum(len(got.get(q, set()) & want[q])
                         for q in want) / (len(want) * TOPK), 3)

    print(json.dumps({
        "corpus": n, "queries": N_QUERIES, "topk": TOPK, "m": M, "k": K,
        "adc_full_scan_hof_sec": round(t_hof, 1),
        "adc_full_scan_arrow_sec": round(t_arrow, 1),
        "adc_methods_same_ids": same_ids,
        "pq_index_build_sec": round(t_build, 1),
        "codes_tree_bytes": tree_bytes(f"{pq_path}/codes"),
        "vectors_tree_bytes": tree_bytes(f"{pq_path}/vectors"),
        "ivf_vectors_tree_bytes": tree_bytes(f"{ivf_path}/vectors"),
        "pq_search_adc_only_sec": round(t_adc_disk, 1),
        "pq_search_rerank_sec": round(t_rerank_disk, 1),
        "ivf_search_sec": round(t_ivf_disk, 1),
        "pq_adc_only_recall": recall_of(adc_only, "id"),
        "pq_rerank_recall": recall_of(rerank, "id"),
        "ivf_recall": recall_of(ivf_rows, "id"),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
