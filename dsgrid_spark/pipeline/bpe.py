"""Distributed BPE vocabulary induction (byte-pair-encoding merges).

Classic corpus-level BPE (Sennrich et al. 2016) trains on the WORD
FREQUENCY table, not the raw corpus: count distinct words once, then
repeatedly (a) count adjacent symbol pairs weighted by word frequency,
(b) merge the most frequent pair everywhere. At 100 TB the word table is
itself billions of rows, so both steps stay distributed here:

- one corpus-wide shuffle builds the (word, count) table;
- each merge round is ONE map-side-combined groupBy over that table
  (pairs explode from a ``zip_with`` of the symbol array with itself
  shifted — overlapping pairs counted, the standard convention) plus a
  1-row argmax collect;
- the merge rewrite is a pure column expression (an ``aggregate`` fold
  that greedily joins adjacent (left, right) occurrences left-to-right),
  so no Python touches the table;
- lineage is truncated every round with ``localCheckpoint`` — the
  standard Spark pattern for iterative algorithms, keeping round k's
  plan O(1) deep instead of O(k).

Ties break deterministically by (count desc, left asc, right asc), so
the merge sequence is reproducible across runs and cluster layouts.

Applying a trained merge table to new text is inherently sequential per
word, so ``bpe_segment`` is the deliberate Arrow slow path: a pandas UDF
that replays the merges greedily per word (vectorized over rows by
batch; the merge list rides the closure, broadcast once per executor).
"""

from __future__ import annotations

import pandas as pd  # module-level so the pandas_udf type hints resolve
from pyspark.sql import DataFrame, functions as F

from dsgrid_spark.pipeline.text import _word_array, py_words

END_OF_WORD = "▁"  # sentence-piece-style word-end marker


def word_counts(df: DataFrame, text_column: str = "text") -> DataFrame:
    """(word, count) over the corpus — BPE's training table."""
    return (
        df.select(F.explode(_word_array(F.col(text_column))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word").agg(F.count(F.lit(1)).alias("count"))
    )


def _char_symbols(word):
    """word -> [c1, c2, ..., cn, END_OF_WORD] as a column expression."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def _merge_pair(syms, left: str, right: str):
    """Greedy left-to-right non-overlapping merge of (left, right) inside
    a symbol array, as a single fold — no UDF."""
    merged = left + right
    return F.aggregate(
        syms,
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe(df: DataFrame, text_column: str = "text",
              num_merges: int = 16, min_pair_count: int = 2,
              vocab: DataFrame | None = None) -> list[dict]:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    ordered merge table ``[{rank, left, right, merged, count}]``.

    Stops early when no remaining pair reaches ``min_pair_count``.
    Pass a precomputed ``vocab`` ((word, count) — e.g. a persisted
    ``word_counts``) to skip the corpus scan, the same reuse convention
    as the dedup entry points' ``signatures=``.
    """
    if num_merges <= 0:
        raise ValueError(f"num_merges must be positive, got {num_merges}")
    if vocab is None:
        vocab = word_counts(df, text_column)
    # a corpus word containing the end-of-word marker would alias the
    # marker symbol and silently corrupt merge counts — fail loudly
    # (assert_true in-projection, the library's composite-id convention)
    guard = F.assert_true(
        ~F.col("word").contains(F.lit(END_OF_WORD)),
        F.concat(F.lit("train_bpe: word contains the end-of-word marker "
                       f"{END_OF_WORD!r}: "), F.col("word")))
    table = vocab.select(
        F.when(guard.isNull(), F.col("count").cast("long"))
        .otherwise(F.lit(None)).alias("count"),
        _char_symbols(F.col("word")).alias("syms"),
    ).localCheckpoint(eager=True)
    merges: list[dict] = []
    try:
        for rank in range(num_merges):
            n = F.size("syms")
            pairs = table.select(
                "count",
                F.explode(
                    F.zip_with(
                        F.slice("syms", 1, n - 1),
                        F.slice(F.col("syms"), 2, n - 1),
                        lambda a, b: F.struct(a.alias("left"),
                                              b.alias("right")),
                    )
                ).alias("pair"),
            )
            best = (
                pairs.groupBy("pair.left", "pair.right")
                .agg(F.sum("count").alias("pair_count"))
                .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
                .limit(1)
                .collect()
            )
            if not best or best[0]["pair_count"] < min_pair_count:
                break
            left, right, count = (best[0]["left"], best[0]["right"],
                                  best[0]["pair_count"])
            merges.append({"rank": rank, "left": left, "right": right,
                           "merged": left + right, "count": int(count)})
            new_table = table.select(
                "count", _merge_pair(F.col("syms"), left, right).alias("syms")
            ).localCheckpoint(eager=True)
            table.unpersist()
            table = new_table
    finally:
        table.unpersist()
    return merges


def _segment_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(word) + [END_OF_WORD]
    for left, right in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        syms = out
    return syms


def bpe_segment(text_column, merges: list[dict],
                cache_size: int | None = 1 << 20):
    """array<string> of BPE tokens per row — the Arrow slow path (see
    module docstring). ``merges`` is ``train_bpe``'s output.

    Each distinct word is segmented ONCE per executor task: the merge
    replay is O(num_merges x word_len) of pure Python per word, and
    natural text is Zipf-distributed, so an uncached apply re-pays that
    cost for every occurrence of "the" (the r8 sf10 rehearsal measured
    207.5 s uncached vs 8.3 s cached at 64 merges over 123M tokens —
    25x, 1.68 -> 0.067 us/token; tools/rehearsal_bpe_apply.py). The
    memo rides the UDF closure:
    pickled EMPTY to each worker, grown per-task executor-side, bounded
    by ``cache_size`` distinct words (~tens of MB at the default;
    ``None`` caps nothing, ``0`` disables — the rehearsal baseline).
    Results are identical with or without the cache by construction
    (same ``_segment_word``, tested)."""
    from pyspark.sql.functions import pandas_udf

    seq = [(m["left"], m["right"]) for m in merges]
    memo: dict[str, list[str]] = {}

    @pandas_udf("array<string>")
    def seg(texts: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return []
            toks: list[str] = []
            # py_words == the Spark-side _word_array tokenization that
            # word_counts trained on: a bare str.split() would also
            # break on Unicode whitespace and segment a word the vocab
            # holds whole (the r8 train/apply divergence)
            for w in py_words(t):
                got = memo.get(w)
                if got is None:
                    got = _segment_word(w, seq)
                    if cache_size is None or len(memo) < cache_size:
                        memo[w] = got
                toks.extend(got)
            return toks

        return texts.map(one)

    return seg(text_column)


def bpe_token_count(text_column, merges: list[dict]):
    """Token count under a trained merge table (long)."""
    return F.size(bpe_segment(text_column, merges)).cast("long")
