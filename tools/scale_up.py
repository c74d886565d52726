"""Derive a larger scale factor from the driver's sf0.1 tables,
deterministically, for scale rehearsal (VERDICT r4 item 1).

    python tools/scale_up.py [--replicas 10] [--src /root/testdata/sf0.1] \
                             [--dst /root/repo/.scale/sf1]

Scheme: each fact table is replicated R times; replica 0 is the identity
(original rows bit-for-bit), replicas 1..R-1 remap every key domain by
``key + r * OFFSET`` with one offset per domain (so foreign keys stay
consistent across tables), leaving the small dimension tables (region,
nation) fixed — TPC-H-style scaling.

Content columns are perturbed so the scaled corpus has realistic
*structure*, not R identical copies (which would explode every
near-dup/similarity query quadratically and tell us nothing about scale):

- ``documents.text``: every token gets a replica prefix (``r3the``), so
  replicas share no shingles — the corpus becomes R independent shards,
  each preserving the original's internal duplicate structure.
  ``n_chars`` is recomputed to stay consistent with the text.
- ``embeddings.embedding``: per-replica deterministic sign flips per
  dimension (an orthogonal transform: intra-replica cosine structure is
  EXACTLY preserved — same neighbors, same near-dup pairs per shard —
  while cross-replica similarity collapses to noise).
- timestamps, amounts, categories: unchanged (R× density per time
  bucket, the realistic way event volume grows).

Everything is a pure column expression over a replica-id explode — one
Spark write per table, no driver-side loops.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

# one offset per key domain, > the sf0.1 max of every column in the domain
OFFSETS = {
    "custkey": 100_000,       # max c_custkey 14,999
    "orderkey": 1_000_000,    # max o_orderkey 149,999
    "partkey": 100_000,       # max p_partkey 19,999
    "suppkey": 10_000,        # max s_suppkey 999
    "event_id": 1_000_000,    # max 99,999
    "user_id": 10_000,        # max 1,499
    "doc_id": 10_000,         # max 4,999 (harness copy ids sit at +1e8,
    #                           clear of scaled ids up to replicas=10,000)
    "vec_id": 10_000,         # max 1,999
}

# table -> {column: key domain}
KEYED = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {"l_orderkey": "orderkey", "l_partkey": "partkey",
                 "l_suppkey": "suppkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

FIXED = ["region", "nation"]

FILES = {"lineitem": 16, "orders": 8, "events": 8, "documents": 4,
         "embeddings": 4, "customer": 2, "part": 2, "supplier": 1}


def scale_table(df: DataFrame, name: str, replicas: int,
                cpus: int = 32) -> DataFrame:
    # widen BEFORE the explode: the sf0.1 source is 1-3 parquet splits, so
    # without this the R× row generation runs on 1-3 of the cores (the
    # same single-split serialization ensure_min_partitions fixes in the
    # engine — at replicas=1000 one straggler produced 500M+ rows alone)
    if df.rdd.getNumPartitions() < cpus:
        df = df.repartition(cpus)
    rep = df.withColumn("__r", F.explode(F.sequence(F.lit(0),
                                                    F.lit(replicas - 1))))
    r = F.col("__r")
    cols = []
    for c in df.columns:
        domain = KEYED.get(name, {}).get(c)
        if domain is not None:
            cols.append((F.col(c) + r * F.lit(OFFSETS[domain])).alias(c))
        elif name == "documents" and c == "text":
            # prefix every token with the replica tag; replica 0 identity
            cols.append(F.when(r == 0, F.col(c)).otherwise(
                F.regexp_replace(
                    F.col(c), r"(\S+)",
                    F.concat(F.lit("r"), r.cast("string"), F.lit("$1")))
            ).alias(c))
        elif name == "documents" and c == "n_chars":
            cols.append(F.lit(None).alias("__defer_n_chars"))
        elif name == "embeddings" and c == "embedding":
            # orthogonal per-replica sign flips; replica 0 identity
            cols.append(F.when(r == 0, F.col(c)).otherwise(
                F.transform(
                    F.col(c),
                    lambda x, i: (x * F.when(
                        F.pmod(F.xxhash64(r, i), F.lit(2)) == 0,
                        F.lit(1.0)).otherwise(F.lit(-1.0))).cast("float"))
            ).alias(c))
        else:
            cols.append(F.col(c))
    out = rep.select(*cols)
    if "__defer_n_chars" in out.columns:
        # recompute AFTER the text transform so it stays consistent
        out = out.withColumn("n_chars", F.length("text").cast("long"))
        out = out.select(*[c for c in df.columns])
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/repo/.scale/sf1")
    args = ap.parse_args()

    from dsgrid_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("scale-up", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.dst, exist_ok=True)

    for name in FIXED:
        df = spark.read.parquet(f"{args.src}/{name}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(
            f"{args.dst}/{name}.parquet")
        print(f"{name}: fixed, {df.count()} rows")

    for name in KEYED:
        dst = f"{args.dst}/{name}.parquet"
        if os.path.exists(f"{dst}/_SUCCESS"):
            print(f"{name}: exists, skipped", flush=True)
            continue
        df = spark.read.parquet(f"{args.src}/{name}.parquet")
        out = scale_table(df, name, args.replicas, cpus=int(cpus))
        # file count scales with replicas so single files never exceed a
        # few hundred MB (they stay splittable for reads either way)
        n_files = max(FILES.get(name, 4), FILES.get(name, 4)
                      * args.replicas // 100 or 1)
        out.repartition(n_files).write.mode("overwrite").parquet(dst)
        n = spark.read.parquet(dst).count()
        print(f"{name}: {df.count()} -> {n} rows ({args.replicas}x)",
              flush=True)


if __name__ == "__main__":
    main()
