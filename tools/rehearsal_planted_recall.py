"""Round-9 recall rehearsal on the PLANTED-cluster fixture
(tools/make_planted_fixture.py — 100k x 256-dim, 256 tight Gaussian
clusters on the sphere, ~0.95 within-cluster cosine): the regime real
embedding corpora live in, vs the quasi-random sf10 table both r8
recall rehearsals had to caveat ("the fixture is quasi-random, the
claim is pinned by a constructed unit test").

Measures, against exact brute-force ip truth:
  1. flat vs RESIDUAL IVF-PQ at the same m*k budget across probe
     widths, by the PQ paper's metric — recall@R (Jegou TPAMI'11
     Fig. 5: fraction of queries whose TRUE nearest neighbor appears
     in the first R results), R in {1, 10, 100} — plus top-10 overlap;
     IVFADC's claim is residual codebooks buy recall at fixed code
     size, visible only when vectors concentrate near their coarse
     centroid (here) and invisible in noise (r8's table);
  2. binary sign-bit Hamming by the same metrics, raw and with the
     exact-cosine re-rank behind a 10x shortlist — sign agreement
     carries signal exactly when neighbors share orientation.

Usage: PYTHONPATH=/root/repo python tools/rehearsal_planted_recall.py \
          [pq|binary|all] [n_probe ...]
(two parts so each fits the 600 s background-run cap; 'all' runs both)
Prints one JSON line for SCALE_R9.md; stage timings go to stderr.
"""
import json
import sys
import time


def _log(msg):
    print(f"[planted] {msg}", file=sys.stderr, flush=True)

import numpy as np
from pyspark.sql import SparkSession, Window, functions as F
from pyspark.sql.types import (DoubleType, LongType, StructField,
                               StructType)

from dsgrid_spark.pipeline.pq import coarse_residuals, ivf_pq_topk, pq_fit
from dsgrid_spark.pipeline.similarity import hamming_topk, kmeans_centroids

FIXTURE = "/root/repo/.scale/planted"
PART = sys.argv[1] if len(sys.argv) > 1 else "all"
PROBES = [int(x) for x in (sys.argv[2:] or ["4", "16"])]
DIM, M, K = 256, 16, 256       # 16 bytes/vec for 2 KB of floats
N_LISTS = 64
N_QUERIES, TOPK = 20, 10


def exact_truth(emb, queries, k):
    """Exact ip top-k via one numpy matmul per Arrow batch + per-batch
    local top-k (the _adc_scan_arrow shape) — the HOF fold would cost
    minutes at 256-dim."""
    q = sorted((r["query_id"], list(r["embedding"]))
               for r in queries.collect())
    qm = np.asarray([v for _, v in q])                  # (Q, dim)
    qids = [i for i, _ in q]
    out_schema = StructType([
        StructField("query_id", LongType()),
        StructField("vec_id", LongType()),
        StructField("score", DoubleType()),
    ])

    def kern(batches):
        import pandas as pd
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray([np.asarray(r) for r in pdf["embedding"]])
            ids = pdf["vec_id"].to_numpy()
            s = x @ qm.T                                # (n, Q)
            kk = min(k, len(x))
            oq, oi, os_ = [], [], []
            for qi in range(len(qids)):
                top = np.lexsort((ids, -s[:, qi]))[:kk]
                oq.extend([qids[qi]] * kk)
                oi.extend(ids[top])
                os_.extend(s[top, qi])
            yield pd.DataFrame({"query_id": oq, "vec_id": oi,
                                "score": os_})

    scored = emb.select("vec_id", "embedding").mapInPandas(kern,
                                                           out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.col("vec_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k).collect())


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("rehearsal-planted-recall")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = (spark.read.parquet(f"{FIXTURE}/embeddings.parquet")
           .select("vec_id", "embedding").localCheckpoint())
    n = emb.count()
    # queries from 20 DISTINCT planted clusters (vec_id % 256)
    queries = (emb.filter(F.col("vec_id") < N_QUERIES)
               .select(F.col("vec_id").alias("query_id"), "embedding")
               .localCheckpoint())

    t0 = time.time()
    truth = exact_truth(emb, queries, TOPK)
    t_truth = time.time() - t0
    _log(f"truth {t_truth:.1f}s")
    want10: dict = {}
    for r in sorted(truth, key=lambda r: (r["query_id"], -r["score"],
                                          r["vec_id"])):
        want10.setdefault(r["query_id"], []).append(r["vec_id"])
    # the paper's target: each query's TRUE nearest neighbor — the
    # query row itself is excluded (it is trivially rank 1: queries
    # are corpus members), so truth is the closest OTHER vector
    nn1 = {q: next(v for v in ids if v != q)
           for q, ids in want10.items()}

    def metrics(rows, id_col="vec_id", score_col="score",
                asc=False):
        ranked: dict = {}
        for r in sorted(rows, key=lambda r: (
                r["query_id"],
                r[score_col] if asc else -r[score_col], r[id_col])):
            ranked.setdefault(r["query_id"], []).append(r[id_col])
        rat = {}
        for rr in (1, 10, 100):
            hits = 0
            for q, tgt in nn1.items():
                got = [v for v in ranked.get(q, []) if v != q][:rr]
                hits += tgt in got
            rat[f"r_at_{rr}"] = round(hits / len(nn1), 3)
        overlap = sum(
            len(set(ranked.get(q, [])[:TOPK]) & set(want10[q]))
            for q in want10) / (len(want10) * TOPK)
        rat["top10_overlap"] = round(overlap, 3)
        return rat

    out = {"fixture": "planted", "corpus": n, "dim": DIM,
           "clusters": 256, "queries": N_QUERIES,
           "truth_sec": round(t_truth, 1)}
    K_RET = 100  # rank depth retrieved so recall@100 is measurable
    if PART in ("pq", "all"):
        t0 = time.time()
        coarse = kmeans_centroids(emb, N_LISTS, DIM, iterations=3,
                                  fit_sample_cap=20_000,
                                  assign_strategy="arrow")
        _log(f"coarse fit {time.time() - t0:.1f}s")
        t0 = time.time()
        flat_books = pq_fit(emb, dim=DIM, n_subvectors=M, n_centroids=K,
                            iterations=2, fit_sample_cap=20_000)
        _log(f"flat pq_fit {time.time() - t0:.1f}s")
        t0 = time.time()
        resid = coarse_residuals(emb, coarse,
                                 assign_strategy="arrow").localCheckpoint()
        res_books = pq_fit(resid, dim=DIM, n_subvectors=M,
                           n_centroids=K, vector_column="residual",
                           iterations=2, fit_sample_cap=20_000)
        _log(f"residual pq_fit {time.time() - t0:.1f}s")

        pq_table = []
        for n_probe in PROBES:
            t0 = time.time()
            flat = ivf_pq_topk(emb, queries, coarse, flat_books,
                               k=K_RET, n_probe=n_probe, method="arrow",
                               assign_strategy="arrow").collect()
            t_flat = time.time() - t0
            t0 = time.time()
            res = ivf_pq_topk(emb, queries, coarse, res_books, k=K_RET,
                              n_probe=n_probe, residual=True,
                              method="arrow",
                              assign_strategy="arrow").collect()
            t_res = time.time() - t0
            _log(f"probe {n_probe}: flat {t_flat:.1f}s res {t_res:.1f}s")
            pq_table.append({"n_probe": n_probe,
                             "flat": metrics(flat),
                             "residual": metrics(res),
                             "flat_sec": round(t_flat, 1),
                             "residual_sec": round(t_res, 1)})
        out.update({"m": M, "k": K, "n_lists": N_LISTS,
                    "ivf_pq": pq_table})

    if PART in ("binary", "all"):
        t0 = time.time()
        raw = hamming_topk(emb, queries, k=K_RET).collect()
        t_raw = time.time() - t0
        t0 = time.time()
        rr = hamming_topk(emb, queries, k=K_RET,
                          rerank=10 * TOPK).collect()
        t_rr = time.time() - t0
        _log(f"binary raw {t_raw:.1f}s rerank {t_rr:.1f}s")
        out["binary"] = {"raw": metrics(raw, score_col="hamming",
                                        asc=True),
                         "rerank": metrics(rr),
                         "raw_sec": round(t_raw, 1),
                         "rerank_sec": round(t_rr, 1)}

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
