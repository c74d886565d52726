"""DSIR hashed-ngram importance resampling (pipeline/selection.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dsgrid_spark.pipeline.selection import (
    dsir_select,
    fit_hashed_ngrams,
    gumbel_micro,
    hashed_ngram_buckets,
    heldout_ngram_coverage,
    importance_scores,
    ngram_logratio,
)

TARGETY = "quantum physics energy states and field theory lectures"
JUNKY = "buy cheap pills online casino bonus click here now win"


def _corpus(spark, n_targety=20, n_junky=80):
    rows = []
    for i in range(n_targety):
        rows.append((i, f"{TARGETY} volume {i}"))
    for i in range(n_junky):
        rows.append((1000 + i, f"{JUNKY} offer {i}"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _target(spark, n=10):
    return spark.createDataFrame(
        [(5000 + i, f"{TARGETY} chapter {i}") for i in range(n)],
        "doc_id long, text string",
    )


def test_hashed_buckets_match_external_md5(spark):
    """The bucket ids are reproducible with nothing but md5 — the
    engine-portability contract the oracle relies on."""
    buckets, salt = 10_000, "dsir"
    df = spark.createDataFrame([(1, "Alpha beta\tGAMMA")],
                               "doc_id long, text string")
    got = df.select(
        hashed_ngram_buckets(F.col("text"), buckets, salt).alias("b")
    ).collect()[0]["b"]
    grams = ["alpha", "beta", "gamma", "alpha beta", "beta gamma"]
    want = [
        int(hashlib.md5((g + salt).encode()).hexdigest()[:8], 16) % buckets
        for g in grams
    ]
    assert got == want


def test_fit_counts_duplicates(spark):
    df = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    # grams: a, a, b, "a a", "a b" -> 'a' bucket counted twice
    counts = {r["bucket"]: r["n"]
              for r in fit_hashed_ngrams(df, buckets=100, salt="t").collect()}
    a = int(hashlib.md5(b"at").hexdigest()[:8], 16) % 100
    assert counts[a] == 2
    assert sum(counts.values()) == 5


def test_logratio_covers_all_buckets_and_sign(spark):
    target = _target(spark)
    raw = _corpus(spark)
    lr = ngram_logratio(
        fit_hashed_ngrams(target, buckets=512),
        fit_hashed_ngrams(raw, buckets=512),
        buckets=512,
    )
    rows = lr.collect()
    assert len(rows) == 512
    assert lr.columns == ["bucket", "lr_micro"]
    # a bucket seen in neither corpus has lr = ln(1/(T+B)) - ln(1/(R+B))
    # = ln((R+B)/(T+B)) > 0 here because the raw corpus is bigger
    seen = set()
    for df in (target, raw):
        for r in df.select(F.explode(
                hashed_ngram_buckets(F.col("text"), 512, "dsir")
        ).alias("b")).distinct().collect():
            seen.add(r["b"])
    unseen = [r["lr_micro"] for r in rows if r["bucket"] not in seen]
    assert unseen and len(set(unseen)) == 1


def test_importance_scores_separate_target_from_junk(spark):
    target = _target(spark)
    raw = _corpus(spark)
    lr = ngram_logratio(
        fit_hashed_ngrams(target), fit_hashed_ngrams(raw))
    scores = {r["doc_id"]: r["score_micro"]
              for r in importance_scores(raw, lr).collect()}
    worst_targety = min(v for k, v in scores.items() if k < 1000)
    best_junky = max(v for k, v in scores.items() if k >= 1000)
    assert worst_targety > best_junky


def test_empty_document_scores_zero(spark):
    raw = spark.createDataFrame([(1, ""), (2, "   ")],
                                "doc_id long, text string")
    lr = ngram_logratio(fit_hashed_ngrams(raw), fit_hashed_ngrams(raw))
    got = importance_scores(raw, lr).collect()
    assert {r["doc_id"]: r["score_micro"] for r in got} == {1: 0, 2: 0}


def test_dsir_select_prefers_target_like_and_is_deterministic(spark):
    target = _target(spark)
    raw = _corpus(spark, n_targety=20, n_junky=80)
    picked = dsir_select(raw, target, k=15)
    ids1 = sorted(r["doc_id"] for r in picked.collect())
    ids2 = sorted(r["doc_id"] for r in dsir_select(raw, target, k=15)
                  .collect())
    assert ids1 == ids2
    # the 20 target-like docs out-weigh the junk so heavily that the
    # Gumbel noise (O(1) micro-units vs score gaps of many ln-units)
    # cannot promote junk into the top 15
    assert all(i < 1000 for i in ids1)
    assert len(ids1) == 15
    assert set(picked.columns) == {"doc_id", "text", "score_micro",
                                   "gumbel_key"}


def test_dsir_temperature_flattens(spark):
    """At a huge temperature the Gumbel noise dominates the weights, so
    the selection approaches a uniform draw — junk gets in."""
    target = _target(spark)
    raw = _corpus(spark, n_targety=20, n_junky=80)
    flat = dsir_select(raw, target, k=30, temperature=1e6)
    ids = [r["doc_id"] for r in flat.collect()]
    assert any(i >= 1000 for i in ids)


def test_dsir_validation():
    with pytest.raises(ValueError, match="k must be positive"):
        dsir_select(None, None, k=0)
    with pytest.raises(ValueError, match="temperature must be positive"):
        dsir_select(None, None, k=1, temperature=0.0)


def test_gumbel_micro_deterministic_and_spread(spark):
    df = spark.range(200).select(
        gumbel_micro(F.col("id")).alias("g"),
        gumbel_micro(F.col("id"), salt="other").alias("g2"))
    rows = df.collect()
    again = df.collect()
    assert rows == again
    assert len({r["g"] for r in rows}) > 150          # spread, not constant
    assert any(r["g"] != r["g2"] for r in rows)       # salt matters


def test_heldout_coverage_improves_over_random(spark):
    target = _target(spark)
    raw = _corpus(spark, n_targety=20, n_junky=80)
    picked = dsir_select(raw, target, k=10)
    random_ish = raw.filter(F.col("doc_id") >= 1000).limit(10)
    cov_dsir = heldout_ngram_coverage(picked, target)
    cov_junk = heldout_ngram_coverage(random_ish, target)
    assert cov_dsir > cov_junk


def test_buckets_validation():
    from dsgrid_spark.pipeline.selection import ngram_logratio

    with pytest.raises(ValueError, match="buckets must be in"):
        ngram_logratio(None, None, buckets=0)
    with pytest.raises(ValueError, match="broadcasts"):
        ngram_logratio(None, None, buckets=100_000_000)
