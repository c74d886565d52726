"""End-to-end training-data pipeline over the synthetic documents table.

Chains the pipeline operators the way a real pretraining-data job would:

    quality funnel -> paragraph boilerplate removal -> MinHash near-dedup
    -> benchmark decontamination -> token-weighted mixture sampling
    -> sequence packing -> sharded export (+ manifest)
    plus the retrieval/vocabulary side: BPE merge induction over the
    clean corpus and a persisted inverted index probed with BM25.

Every step is a DataFrame transformation; the only actions are the
prints. Run:

    python examples/corpus_pipeline.py [sf_dir]      # default sf0.001
"""

from __future__ import annotations

import json
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from dsgrid_spark.pipeline.dedup import (  # noqa: E402
    benchmark_contamination,
    minhash_dedup,
    paragraph_dedup,
)
from dsgrid_spark.pipeline.sampling import mixture_sample, pack_sequences  # noqa: E402
from dsgrid_spark.pipeline.text import (  # noqa: E402
    alpha_ratio_ppm,
    dup_word_ppm,
    filter_funnel,
    language_id,
)
from dsgrid_spark.session import get_spark  # noqa: E402
from dsgrid_spark.sources.tables import load_table  # noqa: E402
from dsgrid_spark.sources.writers import write_training_shards  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-pipeline")
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")

    # 1. quality funnel: each doc charged to its first failing rule
    # thresholds tuned to the synthetic corpus (short repetitive texts);
    # a web crawl would use C4/Gopher-style cutoffs
    survivors, stats = filter_funnel(docs, [
        ("short", F.length(t) >= 100),
        ("nonalpha", alpha_ratio_ppm(t) >= 780000),
        ("repetitive", dup_word_ppm(t) < 900000),
        ("lang", language_id(t) != F.lit("und")),
    ])
    print("funnel:", {r["rule"]: r["n_docs"] for r in stats.collect()})

    # 2a. paragraph-level boilerplate removal (C4-style): repeated
    # paragraphs keep only their first corpus-wide occurrence; documents
    # reduced to nothing are dropped
    para = paragraph_dedup(survivors, "text", "doc_id")
    para = para.filter(F.col("text") != "")
    print("after paragraph dedup:", para.count())

    # 2b. document near-dedup (exact-first, LSH-banded, Jaccard-verified)
    deduped = minhash_dedup(para.drop("n_paras_kept", "n_paras_total"),
                            "text", "doc_id",
                            num_hashes=24, num_bands=8, shingle_k=5,
                            threshold=0.8)
    print("after dedup:", deduped.count())

    # 3. decontamination against a benchmark set
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta eta theta")],
        "bench_id long, text string")
    flagged = benchmark_contamination(deduped, bench, shingle_k=5)
    clean = deduped.join(flagged.select("doc_id"), "doc_id", "left_anti")
    print("after decontamination:", clean.count())

    # 4. token-weighted language mixture (binding group kept whole)
    mixed = mixture_sample(clean, "lang",
                           {"en": 0.5, "de": 0.2, "es": 0.15, "fr": 0.15},
                           "doc_id", size_column="n_chars", salt="demo")
    print("mixture:", {r["lang"]: r["n"] for r in
                       mixed.groupBy("lang").agg(F.count("*").alias("n"))
                       .collect()})

    # 5. pack into 5000-char training batches per language
    packed = pack_sequences(mixed, ["lang"], "doc_id", "n_chars", 5000)

    # 6. sharded export with manifest
    out = tempfile.mkdtemp(prefix="corpus_shards_")
    write_training_shards(packed, out, n_shards=4, key_column="doc_id")
    with open(f"{out}/_manifest.json") as f:
        print("shards:", json.dumps(json.load(f))[:200], "...")
    print("export:", out)

    # 7. vocabulary: first BPE merges learned from the clean corpus
    from dsgrid_spark.pipeline.bpe import train_bpe
    merges = train_bpe(clean, num_merges=4)
    print("bpe merges:", [(m["left"], m["right"], m["count"])
                          for m in merges])

    # 8. quality classifier: train logistic regression on a small
    # heuristically-labeled sample (stand-in for hand labels), then
    # score the whole corpus with a zero-UDF column expression
    from dsgrid_spark.pipeline.text import (
        logistic_regression, predict_proba, quality_score,
    )
    labeled = clean.withColumn(
        "y", (quality_score(F.col("text")) > 0.5).cast("int"))
    feats = clean.select(
        "doc_id", "text",
        (F.col("n_chars") / 500.0).alias("f_len"),
        (alpha_ratio_ppm(F.col("text")) / 1000000.0).alias("f_alpha"),
    ).join(labeled.select("doc_id", "y"), "doc_id")
    wts = logistic_regression(feats, ["f_len", "f_alpha"], "y",
                              iterations=20, lr=0.5)
    scored = feats.withColumn("p", predict_proba(wts, ["f_len", "f_alpha"]))
    print("classifier: weights", [round(x, 3) for x in wts],
          "mean p", round(scored.agg(F.avg("p")).collect()[0][0], 3))

    # 9. retrieval: persist the inverted index once, probe it with BM25
    from dsgrid_spark.pipeline.retrieval import bm25_search, write_term_index
    idx = tempfile.mkdtemp(prefix="term_index_")
    write_term_index(clean, idx, n_buckets=16)
    hits = bm25_search(spark, idx, ["window", "stream"], k=3).collect()
    print("bm25 top3:", [(r["id"], round(r["bm25"], 4)) for r in hits])

    # 10. ANN over the embeddings table: PQ-compress the vectors
    # (12x here), ADC-shortlist 20 candidates per query, re-rank the
    # shortlist exactly — the billion-vector search recipe at demo size
    from dsgrid_spark.pipeline.pq import pq_encode, pq_fit, pq_topk
    from dsgrid_spark.pipeline.similarity import dot
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    books = pq_fit(emb, dim=64, n_subvectors=16, n_centroids=16,
                   iterations=3)
    codes = pq_encode(emb, books)
    qs = emb.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    short = pq_topk(codes, books, qs, k=20)
    rerank = (short.join(emb, "vec_id")
              .join(F.broadcast(qs.withColumnRenamed("embedding", "__q")),
                    "query_id")
              .withColumn("s", dot(F.col("embedding"), F.col("__q")))
              .orderBy("query_id", F.desc("s")))
    print("pq ann:", [(r["query_id"], r["vec_id"], round(r["s"], 3))
                      for r in rerank.limit(4).collect()])


if __name__ == "__main__":
    main()
