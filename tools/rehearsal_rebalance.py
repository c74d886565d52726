"""Round-10 planted-DRIFT rehearsal: show probe recall decay under
appends from an unseen region, and its recovery after
``rebalance_index`` (VERDICT r9 next-#1's "planted drift rehearsal").

Setup, on the planted-cluster fixture (tools/make_planted_fixture.py,
100k x 256-dim unit vectors in 256 tight Gaussian clusters):

1. OLD corpus = the rows of the first 75% of clusters; build a binary
   (sign-bit) index with coarse centroids fitted on OLD ONLY.
2. DRIFT batch = the remaining 25% of clusters' rows, appended — every
   drifted row is assigned against centroids that never saw its
   region, so the drift piles into whichever old lists are nearest:
   measured as per-cluster row skew and as probe recall for QUERIES
   FROM THE DRIFTED REGION (self-recall@1: can a probe-pruned search
   even find the query row itself? — the purest probe-routing metric)
   plus recall@10 vs exact cosine truth over the full corpus.
3. ``rebalance_index`` (k-means|| init) retrains on the committed
   corpus and reassigns; re-measure both.

Expectation: post-rebalance skew drops toward the balanced fixture
ratio and drifted-query probe recall at small n_probe recovers toward
the old-region level, because the drifted clusters now own centroids.

Usage: PYTHONPATH=/root/repo python tools/rehearsal_rebalance.py \
          [n_lists n_probe ...]
Prints one JSON line for SCALE_R10.md; stage timings to stderr.
"""
import json
import sys
import tempfile
import time

import numpy as np
from pyspark.sql import SparkSession, functions as F

from dsgrid_spark.pipeline import indexlog
from dsgrid_spark.pipeline.rebalance import cluster_skew, rebalance_index
from dsgrid_spark.pipeline.similarity import (
    hamming_search, kmeans_centroids, write_binary_index,
    append_binary_index,
)

FIXTURE = "/root/repo/.scale/planted"
N_LISTS = int(sys.argv[1]) if len(sys.argv) > 1 else 64
PROBES = [int(x) for x in (sys.argv[2:] or ["4", "8"])]
N_QUERIES, TOPK, DIM = 24, 10, 256
DRIFT_FRAC = 0.25


def _log(msg):
    print(f"[rebalance] {msg}", file=sys.stderr, flush=True)


def truth_topk(emb_pdf, queries, k):
    """Exact cosine top-k via one numpy matmul (fixture fits in one
    driver array at 100k x 256 float64 = ~200 MB; rehearsal-only)."""
    ids = emb_pdf["vec_id"].to_numpy()
    x = np.asarray([np.asarray(v) for v in emb_pdf["embedding"]])
    x = x / np.sqrt((x * x).sum(axis=1))[:, None]
    out = {}
    for qid, qv in queries:
        q = np.asarray(qv)
        q = q / np.sqrt((q * q).sum())
        s = x @ q
        top = np.lexsort((ids, -s))[:k]
        out[qid] = [int(ids[i]) for i in top]
    return out


def recalls(spark, path, queries, truth, n_probe):
    got = hamming_search(spark, path, queries, k=TOPK, n_probe=n_probe)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append(r["id"])
    r1 = np.mean([1.0 if truth[q] and by_q.get(q, [None])[0] == truth[q][0]
                  else 0.0 for q, _ in queries])
    r10 = np.mean([len(set(by_q.get(q, [])) & set(truth[q])) / TOPK
                   for q, _ in queries])
    return round(float(r1), 3), round(float(r10), 3)


def main():
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "32g")
             .appName("rehearsal-rebalance").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{FIXTURE}/embeddings.parquet")
    n_clusters_true = emb.agg(F.max("cluster")).first()[0] + 1
    split = int(n_clusters_true * (1 - DRIFT_FRAC))
    old = emb.filter(F.col("cluster") < split).select("vec_id", "embedding")
    drift = emb.filter(F.col("cluster") >= split).select("vec_id",
                                                         "embedding")
    emb_pdf = emb.select("vec_id", "embedding").toPandas()
    _log(f"old={old.count()} drift={drift.count()} lists={N_LISTS}")

    # queries from both regimes; truth = exact cosine over FULL corpus
    rng = np.random.default_rng(11)
    drift_ids = [int(r["vec_id"]) for r in
                 drift.select("vec_id").limit(4 * N_QUERIES).collect()]
    old_ids = [int(r["vec_id"]) for r in
               old.select("vec_id").limit(4 * N_QUERIES).collect()]
    pick_d = sorted(rng.choice(drift_ids, N_QUERIES, replace=False))
    pick_o = sorted(rng.choice(old_ids, N_QUERIES, replace=False))
    vec_of = dict(zip(emb_pdf["vec_id"], emb_pdf["embedding"]))
    q_drift = [(int(i), list(vec_of[i])) for i in pick_d]
    q_old = [(int(i), list(vec_of[i])) for i in pick_o]
    truth = truth_topk(emb_pdf, q_drift + q_old, TOPK)

    path = tempfile.mkdtemp(prefix="rehearsal_rebal_") + "/bidx"
    t0 = time.time()
    cents = kmeans_centroids(old, N_LISTS, DIM, iterations=4,
                             fit_sample_cap=20_000, init="parallel",
                             assign_strategy="arrow")
    write_binary_index(old, path, cents, assign_strategy="arrow")
    _log(f"build on old region: {time.time() - t0:.1f}s")
    t0 = time.time()
    append_binary_index(drift, path, batch_id="drift",
                        assign_strategy="arrow")
    _log(f"drift append: {time.time() - t0:.1f}s")

    out = {"n_lists": N_LISTS, "n_queries": N_QUERIES, "topk": TOPK,
           "phases": {}}

    def scanned_rows(queries, n_probe):
        """Mean rows a query's probed lists hold — the per-query scan
        cost drift bloats (mixed lists) and rebalance restores."""
        from dsgrid_spark.pipeline.pq import _read_centroids
        from dsgrid_spark.pipeline.similarity import rank_probes

        vis = indexlog.committed_batches(spark, path)
        gen = indexlog.resolve_generation(spark, path, vis)
        cents = _read_centroids(spark, path, gen)
        sizes = {int(r["cluster"]): int(r["count"]) for r in
                 indexlog.read_committed(spark, path, "bits", ids=vis)
                 .groupBy("cluster").count().collect()}
        per_q = [sum(sizes.get(c, 0)
                     for c in rank_probes(cents, qv, n_probe))
                 for _, qv in queries]
        return int(np.mean(per_q))

    def measure(tag):
        from dsgrid_spark.pipeline.rebalance import assignment_drift

        sk = cluster_skew(spark, path, "bits")
        t_dr = time.time()
        dr = assignment_drift(spark, path, sample=4096, iterations=3,
                              assign_strategy="arrow")
        ph = {"skew_max_over_mean": round(sk["max_over_mean"], 2),
              "max_rows": sk["max_rows"],
              # the r11 recall-proxy gate: live/refit distortion ratio
              # (fires on uniform-mass drift where skew stays flat)
              "drift_ratio": round(dr["ratio"], 3),
              "distortion_live": round(dr["distortion_live"], 4),
              "distortion_refit": round(dr["distortion_refit"], 4),
              "drift_probe_seconds": round(time.time() - t_dr, 1)}
        for np_ in PROBES:
            r1d, r10d = recalls(spark, path, q_drift, truth, np_)
            r1o, r10o = recalls(spark, path, q_old, truth, np_)
            ph[f"probe{np_}"] = {"drift_r1": r1d, "drift_r10": r10d,
                                 "old_r1": r1o, "old_r10": r10o,
                                 "drift_scan_rows":
                                     scanned_rows(q_drift, np_),
                                 "old_scan_rows":
                                     scanned_rows(q_old, np_)}
        out["phases"][tag] = ph
        _log(f"{tag}: {ph}")

    measure("after_drift_append")
    t0 = time.time()
    new_id = rebalance_index(spark, path, iterations=4,
                             fit_sample_cap=20_000, init="parallel",
                             assign_strategy="arrow")
    out["rebalance_seconds"] = round(time.time() - t0, 1)
    out["rebalanced_batch"] = new_id
    _log(f"rebalance: {out['rebalance_seconds']}s -> {new_id}")
    measure("after_rebalance")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
