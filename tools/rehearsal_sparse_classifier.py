"""Sparse hashed-n-gram classifier rehearsal at sf10 (500k docs):
train the fastText-style quality model on weak labels over the full
corpus and verify the scale claims the operator sells —

  - the per-iteration gradient collect is bounded by n_buckets (the
    hashing trick), never by vocabulary or corpus size;
  - inference is one broadcast-weight pass, corpus-rate throughput;
  - the trained model actually recovers the labeling signal (AUC-ish
    separation check on a held-out hash split).

Usage: PYTHONPATH=/root/repo python tools/rehearsal_sparse_classifier.py [sf_dir]
Prints one JSON line for SCALE_R7.md.
"""
import json
import sys
import time

from pyspark.sql import SparkSession, functions as F

from dsgrid_spark.pipeline.text import (hashed_ngram_features,
                                        sparse_logistic_regression,
                                        sparse_predict_proba)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"
N_BUCKETS = 1 << 18
ITERATIONS = 10


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("rehearsal-sparse-classifier")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    # weak label: "high-quality" = longer documents (recoverable from
    # n-grams only via length-correlated token counts — a real signal,
    # not a tautology over the features)
    labeled = docs.withColumn("y", (F.col("n_chars") >= 150).cast("int"))
    # deterministic 90/10 hash split
    train = labeled.filter(F.pmod(F.xxhash64("doc_id"), F.lit(10)) != 0)
    test = labeled.filter(F.pmod(F.xxhash64("doc_id"), F.lit(10)) == 0)

    t0 = time.time()
    feats = hashed_ngram_features(train, n_buckets=N_BUCKETS, max_n=2,
                                  keep_columns=("y",)).localCheckpoint()
    n_train = feats.count()
    t_feats = time.time() - t0

    # distinct observed buckets — the provable ceiling on what each
    # gradient iteration shuffles and collects
    observed = (feats.select(F.explode("features").alias("i"))
                .distinct().count())

    t0 = time.time()
    bias, w = sparse_logistic_regression(feats, "y", n_buckets=N_BUCKETS,
                                         iterations=ITERATIONS, lr=0.5)
    t_train = time.time() - t0

    t0 = time.time()
    test_feats = hashed_ngram_features(test, n_buckets=N_BUCKETS, max_n=2,
                                       keep_columns=("y",))
    scored = sparse_predict_proba(test_feats, bias, w).select("y", "proba")
    agg = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(((F.col("proba") > 0.5).cast("int") == F.col("y"))
              .cast("int")).alias("correct"),
        F.avg(F.when(F.col("y") == 1, F.col("proba"))).alias("p_pos"),
        F.avg(F.when(F.col("y") == 0, F.col("proba"))).alias("p_neg"),
    ).first()
    t_score = time.time() - t0

    acc = agg["correct"] / agg["n"]
    print(json.dumps({
        "docs": n, "train_docs": n_train, "test_docs": int(agg["n"]),
        "n_buckets": N_BUCKETS, "observed_buckets": observed,
        "iterations": ITERATIONS,
        "featurize_sec": round(t_feats, 1),
        "train_sec": round(t_train, 1),
        "sec_per_iteration": round(t_train / ITERATIONS, 1),
        "score_sec": round(t_score, 1),
        "test_accuracy": round(acc, 3),
        "mean_p_pos": round(float(agg["p_pos"]), 3),
        "mean_p_neg": round(float(agg["p_neg"]), 3),
    }))
    assert acc > 0.8, acc
    assert observed <= N_BUCKETS
    spark.stop()


if __name__ == "__main__":
    main()
