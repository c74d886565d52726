"""Round-8 SemDeDup multi-clustering rehearsal at sf10: plant known
near-duplicate pairs into the embeddings table (vec_id < 100k = 20k
rows — the table's ids are sparse; each
planted copy is a deterministic small perturbation, cosine ~0.999),
then measure how many planted pairs semantic_dedup catches under 1 vs
2 independent clusterings, and what the second clustering costs. The
paper's documented miss is exactly a planted pair whose two members
straddle a cluster boundary — the second clustering's boundaries fall
elsewhere.

Usage: PYTHONPATH=/root/repo python tools/rehearsal_semdedup_multiclustering.py
Prints one JSON line for SCALE_R8.md.
"""
import json
import time

from pyspark.sql import SparkSession, functions as F

from dsgrid_spark.pipeline.similarity import (
    normalize_embeddings,
    semantic_dedup,
)

SF_DIR = "/root/repo/.scale/sf10"
N_BASE = 100_000
N_PLANT = 2_000
THRESHOLD = 0.98


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("rehearsal-semdedup-multi")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .filter(F.col("vec_id") < N_BASE)
            .select("vec_id", F.col("embedding").cast("array<double>")
                    .alias("embedding")))
    base = normalize_embeddings(base)
    dim = len(base.select("embedding").first()[0])
    # planted near-dups: id+1e6, each element nudged toward its cyclic
    # neighbor — deterministic, cosine ~0.999 after re-normalization
    v = F.col("embedding")
    nudged = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.get(v, i) + 0.02 * F.get(v, (i + 1) % dim))
    planted = normalize_embeddings(
        base.filter(F.col("vec_id") % (N_BASE // N_PLANT) == 0)
        .select((F.col("vec_id") + 1_000_000).alias("vec_id"),
                nudged.alias("embedding")), "embedding")
    corpus = base.unionByName(planted).localCheckpoint()
    n = corpus.count()
    planted_ids = [r["vec_id"] for r in planted.select("vec_id").collect()]

    results = {}
    for n_clusterings in (1, 2):
        t0 = time.time()
        survivors = {r["id"] for r in semantic_dedup(
            corpus, threshold=THRESHOLD, target_cluster_size=512,
            kmeans_iterations=3, fit_sample_cap=30_000,
            n_clusterings=n_clusterings).collect()}
        wall = time.time() - t0
        # a planted pair is CAUGHT when the copy and its original were
        # joined into one component (only one of the two survives)
        caught = sum(1 for pid in planted_ids
                     if not (pid in survivors and
                             pid - 1_000_000 in survivors))
        results[n_clusterings] = {
            "wall_sec": round(wall, 1),
            "survivors": len(survivors),
            "planted_pairs_caught": caught,
            "recall": round(caught / len(planted_ids), 3),
        }

    print(json.dumps({
        "corpus": n, "planted_pairs": len(planted_ids),
        "threshold": THRESHOLD,
        "one_clustering": results[1],
        "two_clusterings": results[2],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
