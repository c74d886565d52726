"""Per-branch-plan parity gate (r12): every slot that exposes the
bench's ``branch=`` kwarg must return EXACTLY the rows of the full
union filtered by the branch's tag prefix — the same work the bench's
tag-filter fallback times, constructed without the sibling branches.

Usage: python tools/branch_parity_r12.py [sf_dir]
Exit code 0 iff every branch of every slot matches.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from dsgrid_spark.session import get_spark  # noqa: E402


# (slot, tag column, tag prefixes) — bench.BRANCHES restricted to slots
# whose function takes branch=; q06 'asof' covers BOTH as-of directions
# (startswith matches 'asof_fwd' too), which the branch= form preserves.
CASES = [
    ("q06_join_multi", "op", ["multi", "asof", "range"]),
    ("q07_map_dimension", "mode", ["agg", "disagg"]),
    ("q12_peak_load", "tag", ["peak", "top3"]),
    ("q21_scalar_datetime", "op", ["month", "session"]),
    ("q23_time_downsample", "mode", ["down", "up", "cascade:"]),
    ("q30_minhash_dedup", "op", ["full", "incr", "store"]),
    ("q31_simhash_dedup", "op", ["chunk", "manku"]),
    ("q32_similarity_bruteforce", "op", ["brute", "rrf", "bdf"]),
    ("q50_dst_duplicate", "tag", ["spring", "fall", "interp"]),
]


def main() -> int:
    from pyspark.sql import functions as F

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("branch-parity", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    ok = True
    for name, col, prefixes in CASES:
        fn = getattr(entry_mod, name)
        full = fn(spark, sf_dir)
        for p in prefixes:
            got = sorted(map(tuple,
                             fn(spark, sf_dir,
                                branch=p.rstrip(":")).collect()))
            want = sorted(map(tuple, full.filter(
                F.col(col).startswith(p)).collect()))
            match = got == want
            ok = ok and match
            print(f"{'PASS' if match else 'FAIL'} {name}[{p.rstrip(':')}]: "
                  f"{len(got)} rows vs {len(want)}")
        spark.catalog.clearCache()
    print("ALL PASS" if ok else "FAIL")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
