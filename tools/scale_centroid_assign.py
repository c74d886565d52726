"""Measure assign_nearest_centroid literal vs data strategies at high
k*dim — the round-6 verdict's marked-weak item.

The literal path inlines k*dim doubles into the plan; Catalyst analysis
cost grows with the expression-node count, independent of row count. The
data path broadcasts the centroid matrix as ONE row of
array<struct<cluster,centroid>>, so plan size is O(1) in k. This script
times both (analysis-only and end-to-end) at a small fixed row count so
the delta is pure plan overhead, then scales k to show the curve.

Usage: python tools/scale_centroid_assign.py
Appends nothing; prints a markdown table for SCALE_R7.md.
"""
import random
import time

from pyspark.sql import SparkSession

from dsgrid_spark.pipeline.similarity import assign_nearest_centroid


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("scale-centroid-assign")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rnd = random.Random(3)
    dim = 512
    rows = [(i, [rnd.gauss(0, 1) for _ in range(dim)]) for i in range(2000)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").localCheckpoint()

    print("| k | dim | literal analyze | literal run | data analyze | data run |")
    print("|---|---|---|---|---|---|")
    for k in (64, 256, 1024, 2048):
        cents = [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(k)]
        cells = [str(k), str(dim)]
        for strategy in ("literal", "data"):
            if strategy == "literal" and k >= 2048:
                # 1M+ literal nodes: analysis alone takes minutes — the
                # point of the data path. Record the 1024 trend instead.
                cells += ["(skipped)", "(skipped)"]
                continue
            t0 = time.time()
            out = assign_nearest_centroid(df, cents, strategy=strategy,
                                          assume_normalized=True)
            out._jdf.queryExecution().analyzed()  # force analysis
            t1 = time.time()
            n = out.groupBy("__cluster").count().count()
            t2 = time.time()
            assert n >= 1
            cells += [f"{t1 - t0:.2f} s", f"{t2 - t1:.2f} s"]
        print("| " + " | ".join(cells) + " |")
    spark.stop()


if __name__ == "__main__":
    main()
