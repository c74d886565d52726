"""Generate the planted-cluster embeddings fixture for recall
rehearsals (round 9, VERDICT r8 What's-missing #4).

The sf10 embeddings table is quasi-random: nearest-neighbor structure
is noise, so ANN recall tables measured on it say little about the
regime IVF/PQ/binary quantization target (real embedding corpora are
strongly clustered). This fixture is a mixture of Gaussians on the
unit sphere: K unit-norm centers ~ N(0, I) normalized, each point =
normalize(center + sigma * N(0, I)) with sigma set for a ~0.95 mean
cosine to its center — the "tight topical clusters" regime the
operators' docstrings cite. Deterministic end-to-end: centers from one
seeded RNG, per-row noise from a vec_id-seeded RNG, so the fixture
regenerates bit-identically anywhere.

Within-cluster tightness is a parameter (``center_cos``): the first
cut used ~0.95 and found BOTH quantized scans at near-chance recall —
within a ball of ~390 near-identical points the exact top-10 margins
sit below any quantizer's resolution, which is a true but degenerate
regime (no ANN method distinguishes near-ties). The default 0.75
leaves clusters clearly separated (cross-cluster cosine ~0.1-0.2 at
256-dim) while giving the true neighbors real margins — the regime
recall claims are about.

Usage: PYTHONPATH=/root/repo python tools/make_planted_fixture.py \
          [n_rows dim n_clusters center_cos out_dir]
Writes <out_dir>/embeddings.parquet with (vec_id, cluster, embedding);
defaults 100000 x 256-dim, 256 clusters, 0.75,
/root/repo/.scale/planted.
"""
import json
import sys

import numpy as np
from pyspark.sql import SparkSession
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType,
                               LongType, StructField, StructType)

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 256
N_CLUSTERS = int(sys.argv[3]) if len(sys.argv) > 3 else 256
CENTER_COS = float(sys.argv[4]) if len(sys.argv) > 4 else 0.75
OUT = sys.argv[5] if len(sys.argv) > 5 else "/root/repo/.scale/planted"
# cos(point, center) ~ 1/sqrt(1 + sigma^2 * DIM) = CENTER_COS
SIGMA = ((1.0 / CENTER_COS ** 2 - 1.0) / DIM) ** 0.5


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("make-planted-fixture")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((N_CLUSTERS, DIM))
    centers /= np.sqrt((centers * centers).sum(axis=1))[:, None]

    out_schema = StructType([
        StructField("vec_id", LongType()),
        StructField("cluster", IntegerType()),
        StructField("embedding", ArrayType(DoubleType())),
    ])

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                cl = int(i) % N_CLUSTERS
                noise = np.random.default_rng(int(i)).standard_normal(DIM)
                v = centers[cl] + SIGMA * noise
                v /= np.sqrt((v * v).sum())
                rows.append(list(map(float, v)))
            yield pd.DataFrame({"vec_id": ids,
                                "cluster": [int(i) % N_CLUSTERS
                                            for i in ids],
                                "embedding": rows})

    (spark.range(N_ROWS).repartition(32)
       .mapInPandas(gen, out_schema)
       .write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet"))
    df = spark.read.parquet(f"{OUT}/embeddings.parquet")
    print(json.dumps({"rows": df.count(), "dim": DIM,
                      "clusters": N_CLUSTERS, "center_cos": CENTER_COS,
                      "sigma": round(SIGMA, 5), "out": OUT}))
    spark.stop()


if __name__ == "__main__":
    main()
