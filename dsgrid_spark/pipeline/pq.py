"""Product quantization (PQ) for billion-scale ANN.

IVF alone (pipeline/similarity.py) prunes WHICH vectors a query scores
but still stores and reads full float vectors — at 1e9 x 768-dim that
is ~3 TB of vector payload per scan replica. PQ (Jegou/Douze/Schmid,
TPAMI 2011) is the standard next step: split each vector into ``m``
subvectors, k-means each subspace to a tiny codebook, and store each
vector as ``m`` small integers (codes). Search scores candidates with
an Asymmetric Distance Computation (ADC) lookup table — the query stays
full precision, each candidate costs ``m`` table lookups instead of
``dim`` multiplies, and the corpus payload shrinks from ``dim`` floats
to ``m`` bytes-ish per vector (768 floats -> 16 ints is a ~190x read
reduction at scan time).

Spark-first design decisions:

- **Codebooks are DATA, never plan literals** — the full nested
  codebook rides ONE broadcast row of ``array<array<array<double>>>``
  (m x k x dsub), consumed by nested HOF lambdas. Same lesson as
  ``assign_nearest_centroid``'s ``data`` strategy
  (tools/scale_centroid_assign.py: Catalyst analysis is superlinear in
  literal count; data-path analysis is flat): a production m=16, k=256,
  dsub=48 codebook is 196k doubles — inlining it would be an
  analysis-time scale-killer on every downstream job.
- **Encoding is one narrow projection** — no join, no shuffle: each row
  computes its m argmins inside whole-stage codegen (O(k*dim) fused
  multiply-adds per row, embarrassingly parallel). The (id, code) table
  is the only thing wide plans ever touch again.
- **ADC LUTs are per-query rows** — (query_id, m x k table) built
  driver-side from the (small, by construction) query set, broadcast,
  and applied with ``aggregate(transform(code, (c, j) -> lut[j][c]))``.
  Scoring never touches the original vectors.
- **IVF-PQ composes** existing pieces: coarse-assign with
  ``assign_nearest_centroid`` (auto literal/data strategy), PQ-encode
  once, probe clusters per query, ADC-score only the probed candidates.

Exactness escape hatch for cross-engine audits: when every corpus
subvector appears verbatim in its subspace codebook
(:func:`exact_codebooks`), encoding is lossless and the ``ip`` ADC
score equals the true dot product — PQ top-k == brute-force top-k,
bit-for-bit, which is how the driver oracle pins this operator.

Reference parity: the reference engine has no ANN/PQ surface; this
extends the similarity family (SURVEY.md "beyond the reference"
pipeline scope) the same way ivf_topk/lsh_topk do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.types import (ArrayType, DoubleType, IntegerType,
                               StructField, StructType)

__all__ = [
    "pq_fit",
    "exact_codebooks",
    "pq_encode",
    "pq_topk",
    "ivf_pq_topk",
]


def _check_geometry(dim: int, n_subvectors: int) -> int:
    if n_subvectors <= 0 or dim <= 0:
        raise ValueError(f"dim and n_subvectors must be positive, got "
                         f"dim={dim}, n_subvectors={n_subvectors}")
    if dim % n_subvectors != 0:
        raise ValueError(f"dim must divide evenly into subvectors, got "
                         f"dim={dim}, n_subvectors={n_subvectors}")
    return dim // n_subvectors


def _check_codebooks(codebooks: list[list[list[float]]]) -> tuple[int, int, int]:
    """Validate shape; returns (m, k, dsub)."""
    if not codebooks or not codebooks[0] or not codebooks[0][0]:
        raise ValueError("codebooks must be a non-empty m x k x dsub list")
    m, k, dsub = len(codebooks), len(codebooks[0]), len(codebooks[0][0])
    for j, cb in enumerate(codebooks):
        if len(cb) != k or any(len(c) != dsub for c in cb):
            raise ValueError(f"codebook {j} is ragged: every subspace "
                             f"needs the same k x dsub shape")
    return m, k, dsub


def pq_fit(df: DataFrame, dim: int, n_subvectors: int, n_centroids: int,
           vector_column: str = "embedding", iterations: int = 5,
           seed: int = 11,
           fit_sample_cap: int | None = None) -> list[list[list[float]]]:
    """Fit per-subspace L2 k-means codebooks — all ``m`` subspaces in
    the SAME Spark jobs, not m sequential fits.

    The first cut fit each subspace with its own k-means loop: m ×
    iterations driver-synchronized mini-jobs, measured 1068 s at
    m=8/k=256 over a 50k sample (tools/rehearsal_pq.py) — the latency
    was job count, not row work. A second cut ran one JVM-HOF
    assignment job per iteration across all subspaces (160 s — HOFs
    are interpreted per element). This version assigns with the SAME
    numpy Arrow kernel ``pq_encode`` uses (one matmul per subspace per
    batch) and aggregates means in one shuffle whose rows are bounded
    by m*k*dsub — never by corpus size; the codebook ships per
    iteration via closure, the driver collects k*dim doubles back.

    Distances are L2 (the PQ objective is reconstruction error — Jegou
    TPAMI'11 §III), ties to the lowest centroid index.
    ``fit_sample_cap`` bounds what the iterations scan, as in
    ``kmeans_centroids``. Returns ``codebooks[m][k][dsub]``; subspace
    ``j`` covers vector positions ``[j*dsub, (j+1)*dsub)``.
    """
    import math
    import random

    dsub = _check_geometry(dim, n_subvectors)
    m = n_subvectors
    rnd = random.Random(seed)
    total = df.count()
    fit_df = df.select(F.col(vector_column).alias("__v"))
    if fit_sample_cap is not None and total > fit_sample_cap:
        denom = math.ceil(total / fit_sample_cap)
        fit_df = fit_df.filter(
            F.pmod(F.xxhash64(F.col("__v")), F.lit(denom)) == 0)
    # ONE materialization; every iteration rereads these rows
    fit_df = fit_df.localCheckpoint()
    n_fit = fit_df.count()
    # seed pool: full vectors sampled across partitions, sliced per
    # subspace driver-side — one collect seeds all m codebooks
    n_pool = max(n_centroids * 20, 200)
    fraction = min(1.0, (n_pool * 2.0) / max(n_fit, 1))
    pool = [list(r["__v"]) for r in
            fit_df.sample(fraction=fraction, seed=seed)
            .limit(n_pool).collect()]
    if len(pool) < n_centroids:
        pool = [list(r["__v"]) for r in fit_df.limit(n_pool).collect()]
    books = []
    for j in range(m):
        rows = [v[j * dsub:(j + 1) * dsub] for v in pool]
        books.append(rnd.sample(rows, min(n_centroids, len(rows))))

    for _ in range(iterations):
        coded = _encode_rows(fit_df, books, "__v", keep_vector=True)
        # (j, cluster, pos, x) exploded from each (vector, code) row;
        # the groupBy shuffle carries map-side partial means only
        parts = coded.select(F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: F.struct(
                j.cast("int").alias("j"),
                F.get(F.col("__code"), j).alias("cl"),
                F.slice(F.col("__v"), j * dsub + 1, dsub).alias("sub")),
        )).alias("e")).select("e.j", "e.cl", "e.sub")
        means = (
            parts.select("j", "cl", F.posexplode("sub").alias("pos", "x"))
            .groupBy("j", "cl", "pos").agg(F.avg("x").alias("mu"))
            .groupBy("j", "cl")
            .agg(F.array_sort(
                F.collect_list(F.struct("pos", "mu"))).alias("ps"))
            .select("j", "cl",
                    F.transform("ps", lambda s: s["mu"]).alias("c"))
            .collect()
        )
        got = {(r["j"], r["cl"]): list(r["c"]) for r in means}
        books = [[got.get((j, i), books[j][i])
                  for i in range(len(books[j]))] for j in range(m)]
    return books


def exact_codebooks(df: DataFrame, dim: int, n_subvectors: int,
                    vector_column: str = "embedding",
                    max_distinct: int = 100_000) -> list[list[list[float]]]:
    """Codebooks holding every DISTINCT subvector of the corpus, sorted
    — encoding under these is lossless (each subvector's own entry is
    at L2 distance 0), so ``ip`` ADC scores equal true dot products and
    PQ top-k equals brute force. The audit/oracle construction; raises
    if any subspace exceeds ``max_distinct`` entries (the point of real
    PQ is precisely that k stays small — this helper is for bounded
    test corpora, not production fitting).

    Subspace codebooks are padded to a common k by repeating their last
    entry (codebook shape must be rectangular); padding entries are
    duplicates at strictly greater index, so the lowest-index tie-break
    never selects them and losslessness is unaffected.
    """
    dsub = _check_geometry(dim, n_subvectors)
    books = []
    for j in range(n_subvectors):
        rows = (df.select(
            F.slice(F.col(vector_column), j * dsub + 1, dsub).alias("__sub"))
            .distinct().limit(max_distinct + 1).collect())
        if len(rows) > max_distinct:
            raise ValueError(f"subspace {j} has more than {max_distinct} "
                             f"distinct subvectors; use pq_fit for real "
                             f"corpora")
        if not rows:
            raise ValueError("corpus is empty: exact_codebooks needs at "
                             "least one vector per subspace")
        books.append(sorted([list(r["__sub"]) for r in rows]))
    k = max(len(b) for b in books)
    for b in books:
        b.extend([b[-1]] * (k - len(b)))
    return books


def _codebook_row(spark, codebooks: list[list[list[float]]]):
    """The m x k x dsub codebook as ONE broadcast row (column
    ``__cbs``) — data, not plan literals."""
    payload = [[[float(x) for x in c] for c in cb] for cb in codebooks]
    return F.broadcast(spark.createDataFrame(
        [(payload,)], "__cbs: array<array<array<double>>>"))


def _l2sq(a: Column, b: Column) -> Column:
    d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


def pq_encode(df: DataFrame, codebooks: list[list[list[float]]],
              id_column: str = "vec_id",
              vector_column: str = "embedding",
              code_column: str = "code",
              method: str = "arrow") -> DataFrame:
    """Encode each vector as ``m`` codebook indices (``array<int>``):
    code[j] = argmin over subspace j's centroids of L2 distance to the
    j-th subvector; ties break to the lowest centroid index.

    Two methods, same results:

    - ``arrow`` (default) — a ``mapInPandas`` numpy kernel: per Arrow
      batch, distances for ALL rows × subspaces × centroids come from
      one ``||x||² − 2·x·Cᵀ + ||c||²`` matmul per subspace and the
      argmin is vectorized. The library's honest-Arrow convention for
      inherently numeric kernels (the rolling-hash precedent): Spark's
      higher-order functions are interpreted per element, not
      codegen'd, and the measured HOF encode was ~36 µs/row·(m·k
      =2048) at sf10 — the numpy kernel removes that constant. Only
      (id, code) crosses Arrow back.
    - ``hof`` — pure JVM column expressions (nested
      transform/aggregate over one broadcast codebook row): zero
      Python anywhere, the audit/fallback path and the independent
      implementation the equality test checks against.

    Tie-break parity: the numpy path computes ``-2·x·c + ||c||²`` per
    centroid (same winner as full L2; the row term is constant) and
    takes the FIRST minimum — on exact ties both paths pick the lowest
    index. Near-ties within float error can differ between the paths
    by an ULP-order rounding flip; the lossless exact-codebook regime
    has true zero distances, so audits are unaffected.

    One narrow projection either way — no join, no shuffle. Output is
    (id, code) only: the corpus' scan-time footprint from here on.
    """
    if method not in ("arrow", "hof"):
        raise ValueError(f"method must be arrow|hof, got {method!r}")
    m, k, dsub = _check_codebooks(codebooks)
    if method == "hof":
        spark = df.sparkSession
        v = F.col(vector_column)
        # per subspace j: max over (−dist², −index) structs == min
        # dist, tie -> lowest index (assign_nearest_centroid's idiom)
        code = F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: -F.array_max(F.transform(
                F.get(F.col("__cbs"), j),
                lambda c, i: F.struct(
                    (-_l2sq(F.slice(v, j * dsub + 1, dsub), c)).alias("nd"),
                    (-i).alias("ni"),
                ),
            ))["ni"].cast("int"),
        )
        return (
            df.crossJoin(_codebook_row(spark, codebooks))
            .select(F.col(id_column), code.alias(code_column))
        )
    return _encode_rows(df, codebooks, vector_column,
                        id_column=id_column, code_column=code_column)


def _encode_rows(df: DataFrame, codebooks: list[list[list[float]]],
                 vector_column: str, id_column: str | None = None,
                 code_column: str = "__code",
                 keep_vector: bool = False) -> DataFrame:
    """The shared numpy ``mapInPandas`` encode kernel: per Arrow batch,
    one ``−2·x·Cᵀ + ||c||²`` matmul per subspace and a vectorized
    first-minimum argmin. ``keep_vector=True`` passes the vector
    through as ``__v`` (the fit loop needs (vector, code) pairs without
    a join); ``id_column`` passes an id through for the public encode.
    """
    import numpy as np
    from pyspark.sql.types import (ArrayType, IntegerType, StructField,
                                   StructType)

    m, k, dsub = _check_codebooks(codebooks)
    cols = [F.col(id_column)] if id_column else []
    in_df = df.select(*cols, F.col(vector_column).alias("__v"))
    fields = [StructField(f.name, f.dataType)
              for f in in_df.schema if f.name != "__v"]
    if keep_vector:
        fields.append(in_df.schema["__v"])
    out_schema = StructType(
        fields + [StructField(code_column, ArrayType(IntegerType()))])
    # the codebook tensor ships once per task via closure serialization
    # (m*k*dsub doubles — 2 MB at 16x256x64), not per batch
    cb = np.asarray(codebooks, dtype=np.float64)          # (m, k, dsub)
    cb_sq = (cb * cb).sum(axis=2)                         # (m, k)

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                out = pdf.assign(**{code_column: []})
                yield out if keep_vector else out.drop(columns="__v")
                continue
            x = np.asarray(
                [np.asarray(r, dtype=np.float64) for r in pdf["__v"]])
            codes = np.empty((len(x), m), dtype=np.int32)
            for j in range(m):
                xj = x[:, j * dsub:(j + 1) * dsub]        # (n, dsub)
                # argmin ||x-c||² == argmin (−2xc + ||c||²); first min
                scores = -2.0 * (xj @ cb[j].T) + cb_sq[j]  # (n, k)
                codes[:, j] = np.argmin(scores, axis=1)
            out = pdf.assign(**{code_column: list(codes)})
            yield out if keep_vector else out.drop(columns="__v")

    return in_df.mapInPandas(encode, out_schema)


def _adc_luts(spark, codebooks, queries, query_id_column, vector_column,
              metric):
    """(query_id, __lut array<array<double>>) — one m x k ADC table per
    query, built driver-side from the small-by-construction query set
    and broadcast. ``ip``: lut[j][i] = dot(q_j, c_{j,i}), so the summed
    score approximates dot(q, v). ``l2``: lut[j][i] = −‖q_j − c_{j,i}‖²,
    so the summed score is −(approximate squared distance) — larger is
    closer for both, and top-k ordering code is shared.
    """
    m, k, dsub = _check_codebooks(codebooks)
    rows = []
    for r in queries.collect():
        qv = [float(x) for x in r[vector_column]]
        if len(qv) != m * dsub:
            raise ValueError(f"query dim {len(qv)} != m*dsub {m * dsub}")
        lut = []
        for j, cb in enumerate(codebooks):
            qj = qv[j * dsub:(j + 1) * dsub]
            if metric == "ip":
                lut.append([sum(a * b for a, b in zip(qj, c)) for c in cb])
            else:
                lut.append([-sum((a - b) ** 2 for a, b in zip(qj, c))
                            for c in cb])
        rows.append((r[query_id_column], lut))
    # query-id dtype follows the caller's frame (string / int / long
    # ids all join correctly) instead of a hardcoded long
    schema = StructType([
        queries.schema[query_id_column],
        StructField("__lut", ArrayType(ArrayType(DoubleType()))),
    ])
    return F.broadcast(spark.createDataFrame(rows, schema))


def _adc_score(code_column: str) -> Column:
    return F.aggregate(
        F.transform(F.col(code_column),
                    lambda c, j: F.get(F.get(F.col("__lut"), j), c)),
        F.lit(0.0), lambda acc, x: acc + x)


def pq_topk(codes: DataFrame, codebooks: list[list[list[float]]],
            queries: DataFrame, k: int = 10,
            id_column: str = "vec_id", code_column: str = "code",
            query_id_column: str = "query_id",
            vector_column: str = "embedding",
            metric: str = "ip") -> DataFrame:
    """ADC top-k over a PQ-encoded corpus: per candidate, ``m`` lookups
    into the query's broadcast LUT — the corpus' float vectors are
    never read. Returns (query_id, id, score) with score descending,
    ties to the lowest id; ``ip`` scores approximate dot(q, v), ``l2``
    scores are negated approximate squared distances.

    The scan is codes ⨯ broadcast-LUTs (a broadcast nested-loop over
    the tiny query set) followed by one per-query TakeOrdered-shaped
    window — the same shape as brute_force_topk but reading m ints per
    row instead of dim floats.
    """
    if metric not in ("ip", "l2"):
        raise ValueError(f"metric must be ip|l2, got {metric!r}")
    spark = codes.sparkSession
    luts = _adc_luts(spark, codebooks, queries, query_id_column,
                     vector_column, metric)
    scored = codes.crossJoin(luts).select(
        query_id_column, id_column, _adc_score(code_column).alias("score"))
    w = Window.partitionBy(query_id_column).orderBy(
        F.desc("score"), F.col(id_column))
    return (scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k).drop("__rn"))


def ivf_pq_topk(corpus: DataFrame, queries: DataFrame,
                coarse_centroids: list[list[float]],
                codebooks: list[list[list[float]]],
                k: int = 10, n_probe: int = 2,
                id_column: str = "vec_id",
                vector_column: str = "embedding",
                query_id_column: str = "query_id",
                metric: str = "ip",
                assign_strategy: str = "auto") -> DataFrame:
    """IVF-PQ: coarse-quantize the corpus into inverted lists
    (``assign_nearest_centroid``, auto literal/data strategy), PQ-encode
    once, then each query ADC-scores ONLY its ``n_probe`` nearest
    lists. The billion-scale recipe: candidate pruning from IVF,
    candidate cost m lookups from PQ — a full scan touches neither all
    rows nor any full vector.

    Codes here are non-residual (subvectors of the raw vector, not of
    the vector minus its coarse centroid) — the IVFFlat+PQ variant:
    LUTs stay one-per-query instead of one-per-(query, probed list),
    which is the right trade when n_probe is small and lists are many.
    Returns (query_id, id, score), score semantics as :func:`pq_topk`.
    """
    import math

    from dsgrid_spark.pipeline.similarity import assign_nearest_centroid

    if metric not in ("ip", "l2"):
        raise ValueError(f"metric must be ip|l2, got {metric!r}")
    spark = corpus.sparkSession
    # materialize the coarse assignment once: both the encode input and
    # the (id, cluster) join side read it, and without the pin the
    # k-wide argmax would run twice over the corpus
    assigned = (assign_nearest_centroid(corpus, coarse_centroids,
                                        vector_column,
                                        strategy=assign_strategy)
                .select(id_column, vector_column, "__cluster")
                .localCheckpoint())
    coded = pq_encode(assigned, codebooks, id_column=id_column,
                      vector_column=vector_column).join(
        assigned.select(id_column, "__cluster"), id_column)
    # the probe list per query is driver-computed over the small
    # centroid table, like ivf_topk — cosine ranking of coarse lists
    def cos(a, b):
        d = (math.sqrt(sum(x * x for x in a))
             * math.sqrt(sum(x * x for x in b)))
        return sum(x * y for x, y in zip(a, b)) / d if d else 0.0

    probe_rows = []
    for r in queries.collect():
        qv = [float(x) for x in r[vector_column]]
        ranked = sorted(range(len(coarse_centroids)),
                        key=lambda i: -cos(qv, coarse_centroids[i]))
        for ci in ranked[:n_probe]:
            probe_rows.append((r[query_id_column], ci))
    probes = F.broadcast(spark.createDataFrame(
        probe_rows, StructType([queries.schema[query_id_column],
                                StructField("__cluster", IntegerType())])))
    luts = _adc_luts(spark, codebooks, queries, query_id_column,
                     vector_column, metric)
    scored = (
        coded.join(probes, "__cluster")
        .join(luts, query_id_column)
        .select(query_id_column, id_column,
                _adc_score("code").alias("score"))
    )
    w = Window.partitionBy(query_id_column).orderBy(
        F.desc("score"), F.col(id_column))
    return (scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k).drop("__rn"))
