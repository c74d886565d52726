"""Rehearsal: DataFrame-query BM25 / hybrid sweep throughput
(r10 VERDICT next-round item 1's done-criterion — measure the DF form
against the 27 ms/query DF-ANN benchmark, and show the one-job batch
analyzer killing the per-query launch tax).

Builds a term index over sf0.1 documents (or $SPARK_GRAFT_SF_DIR),
then times:

  A. list-form batch bm25_search at Q queries (one scoring job, ONE
     analyzer job since r11 — pre-r11 this paid Q 1-row jobs first);
  B. DataFrame-form bm25_search at the same Q (analyzer as a column
     expression inside the plan, nothing query-scale on the driver);
  C. DataFrame-form hybrid_search_batch (BM25 + IVF, RRF-fused).

Run: python tools/rehearsal_bm25_sweep.py [Q]
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dsgrid_spark.session import get_spark  # noqa: E402


def main():
    q_n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bm25-sweep", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    from dsgrid_spark.pipeline.retrieval import (bm25_search,
                                                 hybrid_search_batch,
                                                 write_term_index)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    import tempfile

    root = tempfile.mkdtemp(prefix="bm25sweep_")
    tpath = f"{root}/terms"
    t0 = time.time()
    write_term_index(docs, tpath, id_column="doc_id",
                     text_column="text", n_buckets=64)
    print(f"index build: {time.time() - t0:.1f} s over "
          f"{docs.count()} docs")

    # query set: word pairs drawn from the corpus vocabulary
    vocab = [r["w"] for r in
             (docs.select(F.explode(F.split(F.lower("text"), r"\s+"))
                          .alias("w"))
              .filter(F.length("w") > 3)
              .groupBy("w").count()
              .orderBy(F.desc("count")).limit(500).collect())]
    rnd = random.Random(11)
    queries = [(i, rnd.sample(vocab, 3)) for i in range(q_n)]

    t0 = time.time()
    n_list = bm25_search(spark, tpath, queries, k=10).count()
    t_list = time.time() - t0
    print(f"A list-form  batch: {q_n} queries -> {n_list} rows in "
          f"{t_list:.1f} s = {1000 * t_list / q_n:.1f} ms/query")

    qdf = spark.createDataFrame(queries,
                                "query_id long, terms array<string>")
    t0 = time.time()
    n_df = bm25_search(spark, tpath, qdf, k=10).count()
    t_df = time.time() - t0
    print(f"B DF-form    batch: {q_n} queries -> {n_df} rows in "
          f"{t_df:.1f} s = {1000 * t_df / q_n:.1f} ms/query")

    # hybrid: needs a vector index over the embeddings table
    from dsgrid_spark.pipeline.similarity import (kmeans_centroids,
                                                  write_ivf_index)

    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .withColumn("embedding",
                       F.col("embedding").cast("array<double>")))
    dim = len(emb.select("embedding").first()[0])
    cents = kmeans_centroids(emb, 16, dim, iterations=3, seed=1,
                             fit_sample_cap=20_000)
    vpath = f"{root}/ivf"
    write_ivf_index(emb, vpath, cents)
    vec_ids = [r["vec_id"] for r in emb.select("vec_id")
               .orderBy("vec_id").limit(q_n).collect()]
    vmap = {r["vec_id"]: list(r["embedding"]) for r in
            emb.filter(F.col("vec_id").isin(vec_ids[:q_n]))
            .select("vec_id", "embedding").collect()}
    hq = [(qid, terms, vmap[vec_ids[qid % len(vec_ids)]])
          for qid, terms in queries]
    hdf = spark.createDataFrame(
        hq, "query_id long, terms array<string>, embedding array<double>")
    t0 = time.time()
    n_h = hybrid_search_batch(spark, tpath, vpath, hdf, k=10,
                              k_each=30, n_probe=4).count()
    t_h = time.time() - t0
    print(f"C DF hybrid  batch: {q_n} queries -> {n_h} rows in "
          f"{t_h:.1f} s = {1000 * t_h / q_n:.1f} ms/query")

    # D: batch phrase search over a positions-enabled index (r11)
    from dsgrid_spark.pipeline.retrieval import phrase_search_batch

    ppath = f"{root}/pterms"
    t0 = time.time()
    write_term_index(docs, ppath, id_column="doc_id",
                     text_column="text", n_buckets=64, positions=True)
    print(f"positions index build: {time.time() - t0:.1f} s")
    pq_list = [(i, " ".join(rnd.sample(vocab, 2))) for i in range(q_n)]
    pdf = spark.createDataFrame(pq_list, "query_id long, phrase string")
    t0 = time.time()
    n_p = phrase_search_batch(spark, ppath, pdf).count()
    t_p = time.time() - t0
    print(f"D DF phrase  batch: {q_n} phrases -> {n_p} rows in "
          f"{t_p:.1f} s = {1000 * t_p / q_n:.1f} ms/query")


if __name__ == "__main__":
    main()
