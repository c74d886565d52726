"""PQ/ADC rehearsal at sf10 (200k x 64-dim embeddings): fit real
(lossy) codebooks, encode the corpus, and measure ADC top-k recall and
wall against the exact brute-force scan — the evidence that the scan
path PQ sells (m int lookups per candidate instead of dim float
multiplies, corpus vectors never read at query time) holds off the
constructed test fixtures.

Usage: PYTHONPATH=/root/repo python tools/rehearsal_pq.py [sf_dir]
Prints one JSON line for SCALE_R7.md.
"""
import json
import sys
import time

from pyspark.sql import SparkSession, Window, functions as F

from dsgrid_spark.pipeline.pq import ivf_pq_topk, pq_encode, pq_fit, pq_topk
from dsgrid_spark.pipeline.similarity import kmeans_centroids

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"
# two quantization budgets: 8 codes (24x compression of 64 doubles,
# coarse) and 16 codes (12x, the recall-oriented setting)
CONFIGS = [(8, 256), (16, 256)]
N_QUERIES, TOPK = 20, 10


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("rehearsal-pq")
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

    # exact truth under the ip metric, shared by every config
    from dsgrid_spark.pipeline.similarity import dot
    t0 = time.time()
    scored = emb.crossJoin(
        F.broadcast(queries.withColumnRenamed("embedding", "__q"))).select(
        "query_id", "vec_id", dot(F.col("embedding"), F.col("__q"))
        .alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.col("vec_id"))
    truth = (scored.withColumn("rn", F.row_number().over(w))
             .filter(F.col("rn") <= TOPK).collect())
    t_brute = time.time() - t0
    want = {}
    for r in truth:
        want.setdefault(r["query_id"], set()).add(r["vec_id"])

    def recall_of(rows):
        got = {}
        for r in rows:
            got.setdefault(r["query_id"], set()).add(r["vec_id"])
        return sum(len(got.get(q, set()) & want[q]) for q in want) / (
            len(want) * TOPK)

    results = []
    for M, K in CONFIGS:
        t0 = time.time()
        books = pq_fit(emb, dim=64, n_subvectors=M, n_centroids=K,
                       iterations=4, fit_sample_cap=50_000)
        t_fit = time.time() - t0

        t0 = time.time()
        codes = pq_encode(emb, books).localCheckpoint()
        codes.count()
        t_encode = time.time() - t0

        t0 = time.time()
        adc = pq_topk(codes, books, queries, k=TOPK).collect()
        t_adc = time.time() - t0

        # production composition: ADC shortlist (10x) -> exact re-rank
        # of only the shortlisted vectors (the PQ paper's ADC+R)
        t0 = time.time()
        short = pq_topk(codes, books, queries, k=10 * TOPK)
        rr = (short.join(emb, "vec_id")
              .join(F.broadcast(
                  queries.withColumnRenamed("embedding", "__q")),
                  "query_id")
              .select("query_id", "vec_id",
                      dot(F.col("embedding"), F.col("__q")).alias("s")))
        rr_rows = (rr.withColumn(
            "rn", F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("s"),
                                                       F.col("vec_id"))))
            .filter(F.col("rn") <= TOPK).collect())
        t_rerank = time.time() - t0
        results.append({
            "m": M, "k": K,
            "fit_sec": round(t_fit, 1),
            "encode_sec": round(t_encode, 1),
            "adc_search_sec": round(t_adc, 1),
            "adc_recall_at_10": round(recall_of(adc), 3),
            "rerank_search_sec": round(t_rerank, 1),
            "shortlist_rerank_recall_at_10": round(recall_of(rr_rows), 3),
        })

    # IVF-PQ on the finer codebook: prune to 8 of 64 coarse lists
    t0 = time.time()
    coarse = kmeans_centroids(emb, 64, 64, iterations=3,
                              fit_sample_cap=50_000)
    t_coarse = time.time() - t0
    t0 = time.time()
    ivf_rows = ivf_pq_topk(emb, queries, coarse, books, k=TOPK,
                           n_probe=8).collect()
    t_ivfpq = time.time() - t0

    print(json.dumps({
        "corpus": n, "queries": N_QUERIES, "topk": TOPK,
        "brute_force_sec": round(t_brute, 1),
        "configs": results,
        "coarse_fit_sec": round(t_coarse, 1),
        "ivfpq_search_sec": round(t_ivfpq, 1),
        "ivfpq_recall_at_10": round(recall_of(ivf_rows), 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
