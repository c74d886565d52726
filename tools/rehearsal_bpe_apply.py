"""Round-8 BPE segmentation-apply rehearsal at sf10 (500k docs): the
apply path (bpe_segment, the one honest-Arrow surface without a scale
measurement before r8) replays the merge table greedily per word in
Python — O(num_merges x word_len) per word. Natural text is Zipf
distributed, so memoizing per DISTINCT word per executor task removes
almost all of that work. This measures wall + per-token cost for the
uncached baseline (cache_size=0) vs the cached default, and asserts
the two paths produce the identical total token count.

Usage: PYTHONPATH=/root/repo python tools/rehearsal_bpe_apply.py [sf_dir]
Prints one JSON line for SCALE_R8.md.
"""
import json
import sys
import time

from pyspark.sql import SparkSession, functions as F

from dsgrid_spark.pipeline.bpe import bpe_segment, train_bpe

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf10"
NUM_MERGES = 64


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("rehearsal-bpe-apply")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").localCheckpoint())
    n_docs = docs.count()

    t0 = time.time()
    merges = train_bpe(docs.limit(50_000), num_merges=NUM_MERGES)
    t_train = time.time() - t0

    results = {}
    for label, cache in (("uncached", 0), ("cached", 1 << 20)):
        t0 = time.time()
        total = (docs.select(
            F.size(bpe_segment(F.col("text"), merges,
                               cache_size=cache)).alias("n"))
            .agg(F.sum("n").alias("t")).collect()[0]["t"])
        results[label] = {"wall_sec": round(time.time() - t0, 1),
                          "total_tokens": int(total)}

    assert results["uncached"]["total_tokens"] == \
        results["cached"]["total_tokens"]
    per_tok = {k: round(v["wall_sec"] * 1e6 / v["total_tokens"], 3)
               for k, v in results.items()}
    print(json.dumps({
        "docs": n_docs, "num_merges": len(merges),
        "train_sec": round(t_train, 1),
        "uncached_apply_sec": results["uncached"]["wall_sec"],
        "cached_apply_sec": results["cached"]["wall_sec"],
        "total_tokens": results["cached"]["total_tokens"],
        "us_per_token": per_tok,
        "speedup": round(results["uncached"]["wall_sec"]
                         / max(results["cached"]["wall_sec"], 1e-9), 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
