"""Round-9 k-means|| rehearsal at high k: init quality + wall of
init='parallel' vs the pool-based inits ('sample', 'kmeanspp') on

  1. the sf10 embeddings (200k x 64-dim, quasi-random) at k=256 —
     the wall-clock cost profile at the k SemDeDup derives for
     production corpora (pool inits see max(20k, 200) = 5120 rows;
     parallel sees everything in rounds+1 passes);
  2. the PLANTED fixture (100k x 256-dim, 256 tight clusters) at
     k=256 — cluster COVERAGE: how many of the 256 true centers have
     a fitted centroid within cosine 0.9 after the same 2 Lloyd
     iterations. This is the metric the pool cap binds: a uniform
     5120-row pool sees ~20 rows per cluster so most clusters DO get
     pool members at this scale — the planted table also carries 32
     RARE clusters (ids 224..255 hold ~390 rows each here; rarity is
     relative at sf10 scale) and the quality gap shows in the
     potential (mean 1 - cos to nearest centroid).

Usage: PYTHONPATH=/root/repo python tools/rehearsal_kmeans_parallel.py
Prints one JSON line for SCALE_R9.md.
"""
import json
import time

import numpy as np
from pyspark.sql import SparkSession, functions as F

from dsgrid_spark.pipeline.similarity import (
    _max_cosine_arrow, kmeans_centroids,
)

SF10 = "/root/repo/.scale/sf10"
PLANTED = "/root/repo/.scale/planted"
K = 256


def potential(df, cents, vector_column="embedding"):
    out = _max_cosine_arrow(df.select(vector_column), cents,
                            vector_column, "__best")
    return float(out.agg(F.avg(F.lit(1.0) - F.col("__best")))
                 .collect()[0][0])


def coverage(cents, centers_true):
    cm = np.asarray(cents)
    cm = cm / np.maximum(np.sqrt((cm * cm).sum(axis=1))[:, None], 1e-12)
    ct = np.asarray(centers_true)
    ct = ct / np.maximum(np.sqrt((ct * ct).sum(axis=1))[:, None], 1e-12)
    best = (ct @ cm.T).max(axis=1)
    return int((best >= 0.9).sum())


def fit_all(df, dim, label, centers_true=None):
    rows = {}
    for init in ("sample", "kmeanspp", "parallel"):
        t0 = time.time()
        cents = kmeans_centroids(df, K, dim, iterations=2, init=init,
                                 fit_sample_cap=50_000,
                                 assign_strategy="arrow")
        wall = time.time() - t0
        entry = {"wall_sec": round(wall, 1),
                 "potential": round(potential(df, cents), 5)}
        if centers_true is not None:
            entry["true_clusters_covered"] = coverage(cents, centers_true)
        rows[init] = entry
    return {label: rows}


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("rehearsal-kmeans-parallel")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {"k": K, "iterations": 2}

    sf10 = (spark.read.parquet(f"{SF10}/embeddings.parquet")
            .select("vec_id", F.col("embedding").cast("array<double>")
                    .alias("embedding")).localCheckpoint())
    out["sf10_n"] = sf10.count()
    out.update(fit_all(sf10, 64, "sf10_64d"))

    planted = (spark.read.parquet(f"{PLANTED}/embeddings.parquet")
               .select("vec_id", "embedding").localCheckpoint())
    out["planted_n"] = planted.count()
    # regenerate the true centers exactly as make_planted_fixture.py
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((256, 256))
    centers /= np.sqrt((centers * centers).sum(axis=1))[:, None]
    out.update(fit_all(planted, 256, "planted_256d",
                       centers_true=centers))

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
