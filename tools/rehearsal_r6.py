"""Round-6 operator scale rehearsal: DSIR selection, corpus heavy
hitters, SemDeDup with learned centroids, and the connected-components
large-graph path, measured at sf0.1 / sf1 / sf10 on the same local[32]
harness as the earlier rehearsals (SCALE_SF1.md / SCALE_SF10.md).

    python tools/rehearsal_r6.py <sf_dir> [<sf_dir> ...]

Prints one JSON line per (sf_dir, op) with wall seconds and the result
cardinality, plus cross-scale invariants where the scaled corpus's
construction makes them provable (scale_up.py's replica scheme: token
prefixes make document replicas shingle-disjoint; sign-flip embedding
replicas preserve intra-replica cosine structure).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dsgrid_spark.session import get_spark


def run(spark, sf_dir: str) -> None:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_docs = docs.count()
    n_vecs = emb.count()
    print(json.dumps({"sf_dir": sf_dir, "n_docs": n_docs,
                      "n_vecs": n_vecs}), flush=True)

    # --- DSIR: select toward the 'de' slice out of the full corpus ---
    from dsgrid_spark.pipeline.selection import dsir_select

    t0 = time.time()
    picked = dsir_select(docs, docs.filter(F.col("lang") == "de"),
                         k=1000, buckets=10_000, salt="r6")
    rows = picked.select("lang").groupBy("lang").count().collect()
    wall = time.time() - t0
    by_lang = {r["lang"]: r["count"] for r in rows}
    print(json.dumps({"sf_dir": sf_dir, "op": "dsir_select_k1000",
                      "wall_s": round(wall, 2),
                      "selected_by_lang": by_lang}), flush=True)

    # --- corpus heavy hitters (q47 'hh' shape) ---
    from dsgrid_spark.pipeline.text import top_ngrams

    t0 = time.time()
    hh = top_ngrams(docs, "text", n=3, k=20).collect()
    wall = time.time() - t0
    print(json.dumps({"sf_dir": sf_dir, "op": "top_ngrams_3_20",
                      "wall_s": round(wall, 2),
                      "top1_count": hh[0]["count"] if hh else 0}),
          flush=True)

    # --- SemDeDup with LEARNED centroids over the real embeddings ---
    from dsgrid_spark.pipeline.similarity import (
        kmeans_centroids, semantic_dedup)

    t0 = time.time()
    cents = kmeans_centroids(emb, n_clusters=32, dim=64, iterations=5)
    t_kmeans = time.time() - t0
    t0 = time.time()
    surv = semantic_dedup(emb, cents, threshold=0.99)
    n_surv = surv.count()
    wall = time.time() - t0
    print(json.dumps({"sf_dir": sf_dir, "op": "semantic_dedup_t0.99",
                      "kmeans_wall_s": round(t_kmeans, 2),
                      "dedup_wall_s": round(wall, 2),
                      "survivors": n_surv, "dropped": n_vecs - n_surv}),
          flush=True)

    spark.catalog.clearCache()


def cc_large(spark) -> None:
    """Exercise the DISTRIBUTED connected-components path well past the
    100k-edge driver threshold: 2M-edge star-cluster graph (400k
    5-cliques), diameter 2 — the duplicate-graph regime."""
    from dsgrid_spark.pipeline.dedup import connected_components

    edges = spark.range(2_000_000).select(
        F.col("id").alias("id_a"),
        (F.col("id") - F.pmod(F.col("id"), F.lit(5))).alias("id_b"),
    ).filter(F.col("id_a") != F.col("id_b"))
    t0 = time.time()
    comp = connected_components(edges)
    n_comp = comp.select("component").distinct().count()
    wall = time.time() - t0
    print(json.dumps({"op": "connected_components_2M_edges",
                      "wall_s": round(wall, 2),
                      "n_components": n_comp}), flush=True)


def main() -> None:
    spark = get_spark("rehearsal-r6", master="local[32]")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    for sf_dir in sys.argv[1:]:
        run(spark, sf_dir)
    cc_large(spark)


if __name__ == "__main__":
    main()
