"""End-to-end billion-scale-shaped ANN lifecycle over the synthetic
embeddings table — at toy size, but every step is the 1e9-vector
recipe:

    coarse k-means lists -> residual (IVFADC) codebooks
    -> persisted PQ index (codes + re-rank vectors, partition-pruned)
    -> exactly-once batch append -> two-phase search
       (pruned code scan -> ADC shortlist -> exact re-rank of ONLY the
        shortlist's vectors) -> crash-debris vacuum

The same flow is scriptable from the CLI:

    python -m dsgrid_spark index build pq emb.parquet /idx \\
        --id-column vec_id --residual
    python -m dsgrid_spark index search /idx --vector "[...]" -k 10 \\
        --shortlist 50 --method hof
    python -m dsgrid_spark index append /idx batch.parquet
    python -m dsgrid_spark index vacuum /idx --ttl 86400

Choosing the ADC scorer (``method=`` here and ``--method`` on the
CLI): ``hof`` (the default) folds the LUT lookups in pure-JVM column
expressions — zero Python, bit-reproducible, the right choice for
audited/oracled paths and probe-pruned searches whose candidate count
is modest. ``arrow`` (opt-in, never auto-selected) swaps the fold for
a numpy gather kernel — Spark's higher-order functions are interpreted
per element, measured ~17.6 µs per (candidate, query) at sf10, so a
FULL-corpus ADC scan of 1e9 codes is hours under hof and minutes under
arrow (20x measured at sf10); scores agree to last-ULP rounding
(bit-equal in the integer exact-codebook regime). Rule of thumb:
hof for pruned searches and anything an oracle compares, arrow for
full scans and rehearsal-scale sweeps.

``--shortlist`` sizes the ADC candidate list per query fed to the
exact re-rank (default 4k): deeper shortlists buy recall at the cost
of re-rank reads — the knob to raise when ADC approximation error
reorders near-ties.

The cheapest rung of the same ladder is the BINARY (sign-bit) index —
~1 bit per dimension, XOR+popcount scans, same layout/append/vacuum
machinery, exact-cosine re-rank behind a Hamming shortlist:

    python -m dsgrid_spark index build binary emb.parquet /bidx \\
        --id-column vec_id --n-clusters 64
    python -m dsgrid_spark index search /bidx --vector "[...]" -k 10 \\
        --shortlist 100          # or --no-rerank for raw Hamming

Run:  python examples/vector_index.py [sf_dir]      # default sf0.001
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dsgrid_spark.pipeline import indexlog  # noqa: E402
from dsgrid_spark.pipeline.pq import (  # noqa: E402
    append_pq_index,
    coarse_residuals,
    pq_fit,
    pq_search,
    write_pq_index,
)
from dsgrid_spark.pipeline.similarity import kmeans_centroids  # noqa: E402
from dsgrid_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("vector-index-example", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    dim = len(emb.select("embedding").first()[0])

    # 1. coarse inverted lists + residual codebooks (IVFADC)
    cents = kmeans_centroids(emb, n_clusters=8, dim=dim, iterations=3)
    books = pq_fit(coarse_residuals(emb, cents), dim=dim, n_subvectors=8,
                   n_centroids=16, vector_column="residual")

    # 2. build the persisted index from the first half, append the rest
    half = emb.agg(F.expr("percentile(vec_id, 0.5)")).first()[0]
    path = tempfile.mkdtemp(prefix="vector_index_") + "/idx"
    write_pq_index(emb.filter(F.col("vec_id") <= half), path, cents,
                   books, residual=True)
    appended = append_pq_index(emb.filter(F.col("vec_id") > half), path,
                               batch_id="batch2")
    replay = append_pq_index(emb.filter(F.col("vec_id") > half), path,
                             batch_id="batch2")
    print(f"index at {path}: appended={appended}, replay no-op={not replay}")

    # 3. two-phase search: ADC shortlist over pruned code partitions,
    #    exact re-rank reading only the shortlist's vectors
    queries = [(int(r["vec_id"]), list(r["embedding"]))
               for r in emb.orderBy("vec_id").limit(3).collect()]
    hits = pq_search(spark, path, queries, k=5, n_probe=4,
                     shortlist=50).collect()
    for qid in sorted({r["query_id"] for r in hits}):
        top = [(r["id"], round(r["score"], 3))
               for r in hits if r["query_id"] == qid]
        print(f"query {qid}: top-5 {top}")

    # 4. lifecycle hygiene: merge the accumulated batch dirs into one
    #    (results invariant; a daily-append index would do this weekly)
    #    and reclaim the replaced directories immediately (purge=True:
    #    offline semantics — a scheduled vacuum would wait out the ttl
    #    grace measured from the compaction commit) plus any
    #    crashed-append debris
    print("compacted into:", indexlog.compact(spark, path, purge=True))
    print("vacuum:", indexlog.vacuum(spark, path, ttl_seconds=3600))

    # 5. the binary (sign-bit) tier: ~62x smaller scan payload, Hamming
    #    shortlist -> exact cosine re-rank, same index machinery
    from dsgrid_spark.pipeline.similarity import (
        hamming_search, write_binary_index,
    )

    bpath = tempfile.mkdtemp(prefix="vector_index_bin_") + "/idx"
    # vectors_dtype="int8" stores the re-rank payload per-vector
    # quantized (8x fewer bytes/dim; cosine is scale-invariant, so
    # scores differ only by the rounding) — same API either way
    write_binary_index(emb, bpath, cents, vectors_dtype="int8")
    bhits = hamming_search(spark, bpath, queries, k=5, n_probe=4,
                           shortlist=50).collect()
    for qid in sorted({r["query_id"] for r in bhits}):
        top = [(r["id"], round(r["score"], 3))
               for r in bhits if r["query_id"] == qid]
        print(f"binary query {qid}: top-5 {top}")

    # 6. the ONE cron entry (r11): vacuum + fragmentation-gated compact
    #    + BOTH rebalance gates — row-count skew (cheap, catches pile-up
    #    drift) and the recall-proxy distortion ratio (catches
    #    uniform-mass drift skew is blind to). Each gate is a no-op on
    #    this healthy index; a real deployment runs exactly this line
    #    on a schedule. Heavier remedies when the gates fire: a busy
    #    index passes block_appends=True (appends fail loudly instead
    #    of racing the flip), and a drifted-codebook PQ index passes
    #    retrain_codebooks=True (codebook identity rides the
    #    generation, pinned readers keep their old books).
    from dsgrid_spark.pipeline.rebalance import maintain_index

    print("maintain:", maintain_index(
        spark, bpath, ttl_seconds=3600, max_batches=32,
        max_over_mean=3.0, max_distortion_ratio=1.05,
        drift_sample=2048))
    spark.stop()


if __name__ == "__main__":
    main()
