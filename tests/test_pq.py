"""Product quantization (pipeline/pq.py): encode losslessness under
exact codebooks, ADC == true dot in the exact regime, fitted-codebook
recall against brute force, IVF-PQ composition, geometry validation."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from dsgrid_spark.pipeline.pq import (
    exact_codebooks,
    ivf_pq_topk,
    pq_encode,
    pq_fit,
    pq_topk,
)
from dsgrid_spark.pipeline.similarity import brute_force_topk, kmeans_centroids


def _corpus(spark, n=60, dim=8, seed=3, quant=None):
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        v = [rnd.gauss(0, 1) for _ in range(dim)]
        if quant:
            v = [float(math.floor(x * quant)) for x in v]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_geometry_validation(spark):
    emb = _corpus(spark, n=5)
    with pytest.raises(ValueError, match="divide evenly"):
        pq_fit(emb, dim=8, n_subvectors=3, n_centroids=2)
    with pytest.raises(ValueError, match="ragged"):
        pq_encode(emb, [[[0.0, 1.0]], [[0.0]]])


def test_pq_encode_lossless_under_exact_codebooks(spark):
    """Every subvector is its own codebook entry -> decoding the code
    reproduces the vector exactly."""
    emb = _corpus(spark, n=40, dim=8, quant=2)
    books = exact_codebooks(emb, dim=8, n_subvectors=4)
    codes = {r["vec_id"]: list(r["code"])
             for r in pq_encode(emb, books).collect()}
    for r in emb.collect():
        v, code = list(r["embedding"]), codes[r["vec_id"]]
        for j, c in enumerate(code):
            assert books[j][c] == v[j * 2:(j + 1) * 2], (r["vec_id"], j)


def test_pq_topk_exact_regime_equals_brute_force(spark):
    """Lossless codes + ip ADC == true dot products, so PQ top-k must
    equal brute-force COSINE top-k when all vectors share a norm...
    they don't — so compare against an explicit python dot-product
    top-k, tie-break on id, the same ordering pq_topk implements."""
    emb = _corpus(spark, n=50, dim=8, quant=2)
    books = exact_codebooks(emb, dim=8, n_subvectors=4)
    codes = pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = pq_topk(codes, books, queries, k=5)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append(
            (r["vec_id"], round(r["score"], 9)))
    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    for qid in (0, 1, 2):
        scored = sorted(
            ((sum(a * b for a, b in zip(vecs[qid], v)), -i), i)
            for i, v in vecs.items())
        want = [(i, round(s[0], 9)) for s, i in reversed(scored[-5:])]
        assert got[qid] == want, qid


def test_pq_l2_metric_ranks_self_first(spark):
    emb = _corpus(spark, n=50, dim=8, quant=2)
    books = exact_codebooks(emb, dim=8, n_subvectors=4)
    codes = pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") == 7).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = pq_topk(codes, books, queries, k=3, metric="l2").collect()
    # exact codes -> own vector at distance 0, the max possible score
    assert out[0]["vec_id"] == 7 and abs(out[0]["score"]) < 1e-12


def test_pq_fitted_recall_against_brute_force(spark):
    """Real (lossy) fitted codebooks: top-10 ADC candidates must hit
    most of the true top-5 — the standard PQ recall check, determinized
    by fixed seeds."""
    emb = _corpus(spark, n=200, dim=16, seed=9)
    books = pq_fit(emb, dim=16, n_subvectors=4, n_centroids=16,
                   iterations=3)
    codes = pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    adc = {}
    for r in pq_topk(codes, books, queries, k=10).collect():
        adc.setdefault(r["query_id"], set()).add(r["vec_id"])
    # brute force ranks by cosine; restrict truth to dot-product order
    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    hits = total = 0
    for qid in range(5):
        true5 = sorted(
            vecs, key=lambda i: (-sum(a * b for a, b in
                                      zip(vecs[qid], vecs[i])), i))[:5]
        hits += len(adc[qid] & set(true5))
        total += 5
    assert hits / total >= 0.6, (hits, total)


def test_ivf_pq_full_probe_matches_pq_topk(spark):
    """n_probe == n_lists makes IVF-PQ scan everything -> identical to
    flat PQ ADC over the same codes."""
    emb = _corpus(spark, n=80, dim=8, quant=2)
    books = exact_codebooks(emb, dim=8, n_subvectors=4)
    cents = kmeans_centroids(emb, n_clusters=4, dim=8, iterations=2)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    flat = {(r["query_id"], r["vec_id"], round(r["score"], 9))
            for r in pq_topk(pq_encode(emb, books), books, queries,
                             k=4).collect()}
    ivf = {(r["query_id"], r["vec_id"], round(r["score"], 9))
           for r in ivf_pq_topk(emb, queries, cents, books, k=4,
                                n_probe=4).collect()}
    assert flat == ivf


def test_ivf_pq_partial_probe_contains_self(spark):
    emb = _corpus(spark, n=80, dim=8, quant=2)
    books = exact_codebooks(emb, dim=8, n_subvectors=4)
    cents = kmeans_centroids(emb, n_clusters=4, dim=8, iterations=2)
    queries = emb.filter(F.col("vec_id") == 11).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = ivf_pq_topk(emb, queries, cents, books, k=3, n_probe=1).collect()
    # the query IS a corpus vector: its own list is the closest list and
    # lossless codes make it the ip-argmax within that list... only if
    # its self-dot beats every other member's dot; assert membership
    assert any(r["vec_id"] == 11 for r in out)


def test_pq_codebooks_are_data_not_plan_literals(spark):
    """The HOF encode plan must stay O(1) in k*dim: no literal centroid
    arrays inlined (the assign_nearest_centroid 'data' lesson)."""
    emb = _corpus(spark, n=10, dim=8, quant=2)
    books = [[[float(i + j) for _ in range(2)] for i in range(64)]
             for j in range(4)]
    plan = pq_encode(emb, books, method="hof") \
        ._jdf.queryExecution().analyzed().toString()
    assert "63.0" not in plan  # the largest centroid value never appears
    assert len(plan) < 20_000, len(plan)


def test_pq_string_query_ids_and_empty_corpus(spark):
    """Query-id dtype follows the caller's frame (r7 advice: the LUT
    schema used to hardcode long), and an empty corpus raises a clear
    ValueError instead of IndexError."""
    emb = _corpus(spark, n=30, dim=8, quant=2)
    books = exact_codebooks(emb, dim=8, n_subvectors=4)
    codes = pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.concat(F.lit("q"), F.col("vec_id")).alias("query_id"),
        "embedding")
    out = pq_topk(codes, books, queries, k=3).collect()
    assert {r["query_id"] for r in out} == {"q0", "q1"}
    assert all(len([r for r in out if r["query_id"] == q]) == 3
               for q in ("q0", "q1"))
    empty = emb.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="corpus is empty"):
        exact_codebooks(empty, dim=8, n_subvectors=4)


def test_pq_encode_arrow_equals_hof(spark):
    """The numpy Arrow kernel and the pure-JVM HOF path are independent
    implementations of the same argmin; codes must agree on random
    vectors and on the tie-heavy lossless fixture."""
    for quant in (None, 2):
        emb = _corpus(spark, n=60, dim=8, seed=21, quant=quant)
        books = (exact_codebooks(emb, dim=8, n_subvectors=4) if quant
                 else pq_fit(emb, dim=8, n_subvectors=4, n_centroids=8,
                             iterations=2))
        a = {r["vec_id"]: list(r["code"]) for r in
             pq_encode(emb, books, method="arrow").collect()}
        h = {r["vec_id"]: list(r["code"]) for r in
             pq_encode(emb, books, method="hof").collect()}
        assert a == h, quant
    with pytest.raises(ValueError, match="arrow|hof"):
        pq_encode(emb, books, method="nope")
