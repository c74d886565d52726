"""DSIR-style data selection: hashed n-gram importance resampling.

Selects raw-corpus documents whose hashed n-gram distribution looks like
a (small) target corpus — the public Data Selection via Importance
Resampling recipe (Xie et al., NeurIPS 2023): fit bag-of-hashed-ngrams
models on target and raw, weight every raw document by its likelihood
ratio, then Gumbel-top-k resample without replacement with probability
proportional to the importance weight.

Everything is engine-reproducible by construction (the library's audit
convention):

- features are word uni+bigrams hashed with md5 (not xxhash64) so any
  SQL engine can recompute bucket membership;
- the per-bucket log-likelihood-ratio is discretized ONCE, at the
  bucket table (``floor(lr * 1e6 + 0.5)`` micro-units), so per-document
  scores are exact integer sums — immune to float summation order
  across engines, layouts, and scales;
- the Gumbel noise comes from a deterministic md5-uniform per document,
  discretized the same way, so the "random" resample is a pure function
  of (doc id, salt).

Shuffle shape at 100 TB: fitting is one explode + groupBy(bucket) with
map-side partial aggregation — the exchange carries at most
``buckets`` rows per task regardless of corpus size. Scoring joins the
exploded token stream against the broadcast bucket table (<= ``buckets``
rows, ~100 KB at the 10k default) and partially aggregates by document
id, so the only wide exchange is one (id, partial-sum) shuffle. The
final resample is an orderBy+limit — TakeOrdered on aggregated scores,
never a full sort.

Reference behavioral parity: the reference engine has no data-selection
family; this extends the pipeline surface the same way dedup/similarity
do (SURVEY.md §2.13).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from dsgrid_spark.pipeline.text import _word_array

_MICRO = 1_000_000


def _md5_bucket(s: Column, buckets: int, salt: str) -> Column:
    """md5-derived bucket in [0, buckets) — the engine-portable hash
    (same construction as sampling.hash_bucket, parameterized width)."""
    return F.conv(
        F.substring(F.md5(F.concat(s, F.lit(salt))), 1, 8), 16, 10
    ).cast("long") % F.lit(buckets)


_MAX_BUCKETS = 10_000_000


def _check_buckets(buckets: int) -> None:
    """The log-ratio table materializes one row per bucket and
    BROADCASTS at scoring time — the whole design assumes it is small
    (DSIR uses 10k). A cap keeps a typo'd width from silently turning
    the broadcast into a multi-GB ship-to-every-executor."""
    if not 1 <= buckets <= _MAX_BUCKETS:
        raise ValueError(
            f"buckets must be in [1, {_MAX_BUCKETS}], got {buckets}; "
            "the bucket table broadcasts to every executor")


def hashed_ngram_buckets(text: Column, buckets: int = 10_000,
                         salt: str = "dsir") -> Column:
    """Array of feature-bucket ids for a document: word unigrams and
    bigrams (library tokenizer), each md5-hashed into ``buckets``.
    Duplicates preserved — the models are count-based, not set-based."""
    _check_buckets(buckets)
    words = F.filter(_word_array(text), lambda x: x != "")
    n = F.size(words)
    # slice with a negative length throws, so the bigram arm must be
    # guarded for 0/1-token documents
    bigrams = F.when(n >= 2, F.zip_with(
        F.slice(words, 1, n - 1),
        F.slice(words, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )).otherwise(F.array().cast("array<string>"))
    grams = F.concat(words, bigrams)
    return F.transform(grams, lambda g: _md5_bucket(g, buckets, salt))


def fit_hashed_ngrams(df: DataFrame, text_column: str = "text",
                      buckets: int = 10_000, salt: str = "dsir"
                      ) -> DataFrame:
    """Bag-of-hashed-ngrams model: (bucket, n) occurrence counts over
    the corpus. One explode + one groupBy — map-side combine collapses
    the token stream to <= ``buckets`` rows per task before the
    exchange, so model fitting is corpus-size-independent on the wire."""
    return (
        df.select(F.explode(
            hashed_ngram_buckets(F.col(text_column), buckets, salt)
        ).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def ngram_logratio(target_counts: DataFrame, raw_counts: DataFrame,
                   buckets: int = 10_000) -> DataFrame:
    """Per-bucket importance log-ratio table:
    ``lr_micro = floor((ln p_b - ln q_b) * 1e6 + 0.5)`` with add-one
    smoothing ``p_b = (t_b + 1) / (T + buckets)`` (q_b likewise from the
    raw counts). Returns one row per bucket in [0, buckets) — including
    never-seen buckets, so scoring needs no null fallback and the table
    size is exactly ``buckets`` (broadcastable by construction).

    Discretizing at the BUCKET table (<= ``buckets`` ln calls) rather
    than per document keeps every downstream score an exact integer sum:
    cross-engine float risk is confined to ~1e-10 * buckets boundary
    probability, not to billions of per-document sums.
    """
    _check_buckets(buckets)
    spark = target_counts.sparkSession
    t_total = (target_counts.agg(F.sum("n")).collect()[0][0] or 0)
    r_total = (raw_counts.agg(F.sum("n")).collect()[0][0] or 0)
    all_buckets = spark.range(buckets).select(
        F.col("id").cast("long").alias("bucket"))
    lr = (
        F.log((F.col("t_n") + 1.0) / F.lit(float(t_total + buckets)))
        - F.log((F.col("r_n") + 1.0) / F.lit(float(r_total + buckets)))
    )
    return (
        all_buckets
        .join(target_counts.withColumnRenamed("n", "t_n"), "bucket", "left")
        .join(raw_counts.withColumnRenamed("n", "r_n"), "bucket", "left")
        .na.fill({"t_n": 0, "r_n": 0})
        .select(
            "bucket",
            F.floor(lr * _MICRO + F.lit(0.5)).cast("long").alias("lr_micro"),
        )
    )


def importance_scores(df: DataFrame, logratio: DataFrame,
                      text_column: str = "text",
                      id_column: str = "doc_id",
                      buckets: int = 10_000,
                      salt: str = "dsir") -> DataFrame:
    """Per-document importance score: the exact integer sum of bucket
    log-ratios over the document's hashed n-grams (duplicates counted).
    Documents with no tokens score 0. Returns (id, score_micro).

    The bucket table broadcasts (<= ``buckets`` rows); the only wide
    exchange is the groupBy(id) with map-side partial sums.
    """
    tokens = df.select(
        F.col(id_column),
        F.explode(hashed_ngram_buckets(F.col(text_column), buckets, salt)
                  ).alias("bucket"),
    )
    per_doc = (
        tokens.join(F.broadcast(logratio), "bucket")
        .groupBy(id_column)
        .agg(F.sum("lr_micro").alias("score_micro"))
    )
    return (
        df.select(id_column)
        .join(per_doc, id_column, "left")
        .na.fill({"score_micro": 0})
    )


def gumbel_micro(key: Column, salt: str = "dsir-g") -> Column:
    """Deterministic standard-Gumbel draw in micro-units from an md5
    uniform: ``u = (bucket + 0.5) / 1e6`` (never 0 or 1), ``g = -ln(-ln
    u)``, discretized ``floor(g * 1e6 + 0.5)``. Same (key, salt) always
    draws the same noise — the resample is replayable on any engine."""
    u = (_md5_bucket(key.cast("string"), _MICRO, salt).cast("double")
         + F.lit(0.5)) / F.lit(float(_MICRO))
    g = -F.log(-F.log(u))
    return F.floor(g * _MICRO + F.lit(0.5)).cast("long")


def dsir_select(raw_df: DataFrame, target_df: DataFrame, k: int,
                text_column: str = "text", id_column: str = "doc_id",
                buckets: int = 10_000, salt: str = "dsir",
                temperature: float = 1.0) -> DataFrame:
    """End-to-end DSIR: fit target and raw hashed-ngram models, score
    every raw document with its importance log-ratio, add deterministic
    Gumbel noise, keep the top ``k`` (Gumbel-top-k == sampling without
    replacement with probability proportional to the importance weight
    ^(1/temperature)). Returns the selected rows of ``raw_df`` plus
    (score_micro, gumbel_key) — ordered columns, deterministic ties by
    id.

    ``temperature`` flattens (>1) or sharpens (<1) the weights — the
    Gumbel noise is scaled by ``temperature`` in micro-units, which is
    equivalent to dividing the log-weights by it.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if temperature <= 0:
        raise ValueError(f"temperature must be positive, got {temperature}")
    t_counts = fit_hashed_ngrams(target_df, text_column, buckets, salt)
    r_counts = fit_hashed_ngrams(raw_df, text_column, buckets, salt)
    lr = ngram_logratio(t_counts, r_counts, buckets)
    scored = importance_scores(raw_df, lr, text_column, id_column,
                               buckets, salt)
    noise = F.floor(
        gumbel_micro(F.col(id_column), salt + "-g").cast("double")
        * F.lit(float(temperature)) + F.lit(0.5)
    ).cast("long")
    keyed = scored.withColumn(
        "gumbel_key", F.col("score_micro") + noise)
    picked = (
        keyed.orderBy(F.desc("gumbel_key"), F.asc(id_column))
        .limit(k)
    )
    return raw_df.join(picked, id_column).select(
        *[F.col(c) for c in raw_df.columns], "score_micro", "gumbel_key")


def heldout_ngram_coverage(selected: DataFrame, target_df: DataFrame,
                           text_column: str = "text",
                           buckets: int = 10_000,
                           salt: str = "dsir") -> float:
    """Diagnostic: fraction of the target's distinct feature buckets
    that appear anywhere in the selected set — a cheap proxy for "did
    the resample actually move toward the target distribution". Both
    sides reduce to <= ``buckets`` distinct rows before the join."""
    t = fit_hashed_ngrams(target_df, text_column, buckets, salt) \
        .select("bucket").distinct()
    s = fit_hashed_ngrams(selected, text_column, buckets, salt) \
        .select("bucket").distinct()
    n_t = t.count()
    if n_t == 0:
        return 0.0
    return t.join(s, "bucket", "left_semi").count() / n_t
