"""Sharded-Bloom rehearsal at 1e8 corpus keys (ROADMAP 8 close-out).

Builds a 10-shard filter over 100M synthetic long keys, probes a 20M-key
batch (half overlapping), and PROVES the prefilter contract against the
exact join:

  - zero false negatives: every true duplicate of the batch lands in
    `maybe_present`;
  - ingest equality: definitely_new UNION (maybe_present ANTI corpus)
    == batch ANTI corpus (checked by count + xor-checksum of keys);
  - measured build / probe wall-clock and observed fp rate.

Usage: PYTHONPATH=/root/repo python tools/rehearsal_sharded_bloom.py
Prints one JSON line for SCALE_R7.md.
"""
import json
import time

from pyspark.sql import SparkSession, functions as F

from dsgrid_spark.pipeline.bloom import (build_sharded_bloom,
                                         sharded_bloom_prefilter)

N_CORPUS = 100_000_000
N_BATCH = 20_000_000


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "96g")
        .appName("rehearsal-sharded-bloom")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.range(0, N_CORPUS).select(F.col("id").alias("k"))
    # batch: second half overlaps the corpus tail, first half is new
    batch = spark.range(N_CORPUS - N_BATCH // 2,
                        N_CORPUS + N_BATCH // 2).select(F.col("id").alias("k"))

    t0 = time.time()
    bloom = build_sharded_bloom(corpus, "k", expected_items=N_CORPUS,
                                fpp=0.01)
    bloom.words_df.persist().count()  # materialize the build
    t_build = time.time() - t0

    t0 = time.time()
    maybe, fresh = sharded_bloom_prefilter(batch, bloom, "k")
    n_maybe = maybe.count()
    n_fresh = fresh.count()
    t_probe = time.time() - t0

    # contract checks against the exact join
    missed_dups = (batch.join(corpus, "k", "left_semi")
                   .join(maybe, "k", "left_anti").count())
    survivors = fresh.unionByName(maybe.join(corpus, "k", "left_anti"))
    expected = batch.join(corpus, "k", "left_anti")
    chk = lambda d: d.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64("k")).alias("x")).first()
    got, want = chk(survivors), chk(expected)
    # observed fp rate: non-duplicate batch keys that still hit
    true_new = N_BATCH // 2
    fp_rate = (true_new - n_fresh) / true_new

    print(json.dumps({
        "corpus_keys": N_CORPUS,
        "batch_keys": N_BATCH,
        "num_shards": bloom.num_shards,
        "filter_mb": round(bloom.size_bytes / 1e6, 1),
        "build_sec": round(t_build, 1),
        "probe_split_sec": round(t_probe, 1),
        "maybe": n_maybe,
        "fresh": n_fresh,
        "missed_duplicates": missed_dups,
        "survivors_match": [got["n"], want["n"], got["x"] == want["x"]],
        "observed_fp_rate": round(fp_rate, 5),
    }))
    assert missed_dups == 0
    assert got["n"] == want["n"] and got["x"] == want["x"]
    spark.stop()


if __name__ == "__main__":
    main()
