"""Continuous corpus ingest, end to end — the round-9 pieces composed:

  1. seed a MinHash SIGNATURE STORE and a persisted TERM INDEX from an
     initial corpus;
  2. drain a STREAMING source of new documents: each micro-batch dedups
     against the committed store (``ingest_dedup_batch``) and the
     SURVIVORS append to the term index — both exactly-once under
     micro-batch-derived batch ids, so a crashed/restarted stream
     re-delivers without double-ingesting;
  3. run a HYBRID (BM25 + vector RRF) search over the results;
  4. housekeeping: COMPACT the accumulated batch directories (results
     invariant) and VACUUM the replaced data.

Every step is idempotent: rerun the script and the stream commits
nothing new, the store registers nothing twice, and the index answers
identically.

Usage: PYTHONPATH=/root/repo python examples/continuous_ingest.py [sf_dir]
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dsgrid_spark.pipeline import indexlog
from dsgrid_spark.pipeline.retrieval import (
    bm25_search, hybrid_search, write_term_index,
)
from dsgrid_spark.pipeline.sigstore import write_sig_store
from dsgrid_spark.pipeline.similarity import kmeans_centroids, write_ivf_index
from dsgrid_spark.pipeline.stream_index import streaming_dedup_index
from dsgrid_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("continuous-ingest-example", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    half = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    seed, incoming = (docs.filter(F.col("doc_id") <= half),
                      docs.filter(F.col("doc_id") > half))

    root = tempfile.mkdtemp(prefix="continuous_ingest_")
    sig_path, term_path = f"{root}/sigs", f"{root}/term"
    corpus_path = f"{root}/corpus"

    # 1. seed the stores from the initial corpus — corpus_path makes
    #    the store manage its own accumulated reference text, so the
    #    verification reference ALWAYS covers every committed id
    write_sig_store(seed, sig_path, num_hashes=16, shingle_k=4,
                    n_shards=4, corpus_path=corpus_path)
    write_term_index(seed, term_path, n_buckets=16)
    print(f"seeded {seed.count()} docs")

    # 2. the streaming leg, ONE call: each micro-batch dedups against
    #    the committed store, survivors register + append to the term
    #    index under one lineage-derived batch id, exactly-once end to
    #    end (crash between the two sinks resumes at the index append)
    inc_dir, ckpt = f"{root}/incoming", f"{root}/ckpt"
    incoming.coalesce(2).write.parquet(inc_dir)
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(inc_dir))
    q = streaming_dedup_index(stream, sig_path, ckpt,
                              index_path=term_path,
                              corpus_path=corpus_path)
    q.awaitTermination(300)
    visible = sorted(indexlog.committed_batches(spark, term_path))
    print(f"streamed in; index batches: {visible}")

    # rerun the same stream: offsets committed -> nothing re-fires
    q2 = streaming_dedup_index(stream, sig_path, ckpt,
                               index_path=term_path,
                               corpus_path=corpus_path)
    q2.awaitTermination(300)
    assert sorted(indexlog.committed_batches(spark, term_path)) == visible
    print("replayed stream: no new commits (exactly-once)")

    # 3. hybrid search: BM25 + vector ANN fused (vector side = an IVF
    #    index over the embeddings table, ids aligned with doc ids)
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    cents = kmeans_centroids(emb, 4, len(emb.first()["embedding"]),
                             iterations=2)
    vec_path = f"{root}/ivf"
    write_ivf_index(emb, vec_path, cents)
    qvec = list(emb.first()["embedding"])
    hits = hybrid_search(spark, term_path, vec_path,
                         ["data", "model", "training"], qvec, k=5)
    print("hybrid top-5:", [(r["id"], round(r["rrf"], 4))
                            for r in hits.collect()])

    # 4. housekeeping: merge the accumulated batch dirs, reclaim the
    #    replaced data — search results are invariant
    before = sorted(map(tuple, bm25_search(
        spark, term_path, ["data", "model"]).collect()))
    # purge=True reclaims the replaced dirs immediately (offline
    # semantics — a scheduled vacuum would instead wait out the ttl
    # grace measured from the compaction commit)
    new_id = indexlog.compact(spark, term_path, purge=True)
    print("compacted term index into:", new_id)
    print("vacuum:", indexlog.vacuum(spark, term_path, ttl_seconds=3600))
    after = sorted(map(tuple, bm25_search(
        spark, term_path, ["data", "model"]).collect()))
    assert after == before
    print("post-compaction search identical: True")
    spark.stop()


if __name__ == "__main__":
    main()
