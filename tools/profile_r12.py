"""Round-12 optimization profiler: isolate where the expensive branches
spend time — phase wall-clock + Spark job counts per phase.

Usage: python tools/profile_r12.py [target ...]
Targets: q28_stream q30_store q30_incr q30_full q31 q32_bdf q44_sem
         q44_pair q33 q45 q06
Each target constructs/executes its branch with per-phase timers and a
statusTracker job-count delta, printing one line per phase. The noop
sink forces every column (guide §1.4); construction-time jobs are
timed inside the construction phase.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from dsgrid_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


class Phase:
    """Context manager: wall time + job-id delta for one labeled phase."""

    def __init__(self, spark, label):
        self.spark = spark
        self.label = label

    def __enter__(self):
        self.t0 = time.time()
        self.j0 = self.spark.sparkContext.statusTracker().getJobIdsForGroup(None)
        self.spark.sparkContext.setJobDescription(self.label)
        return self

    def __exit__(self, *exc):
        dt = time.time() - self.t0
        j1 = self.spark.sparkContext.statusTracker().getJobIdsForGroup(None)
        njobs = len(set(j1) - set(self.j0))
        print(f"  {self.label:<44s} {dt:7.3f}s  jobs+{njobs}")
        self.spark.sparkContext.setJobDescription(None)
        return False


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def profile_query(spark, name, branch=None, runs=2):
    qs = entry_mod.queries()
    import inspect
    fn = qs[name]
    takes_branch = "branch" in inspect.signature(fn).parameters
    label = f"{name}" + (f"[{branch}]" if branch else "")
    for i in range(runs):
        with Phase(spark, f"{label} construct+count run{i}"):
            if branch and takes_branch:
                fn(spark, SF_DIR, branch=branch).count()
            else:
                fn(spark, SF_DIR).count()
        spark.catalog.clearCache()


def main():
    targets = sys.argv[1:] or ["q28_stream"]
    spark = get_spark("dsgrid-profile-r12", master=f"local[{CPUS}]",
                      shuffle_partitions=int(CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    # warm up listing + codegen like bench.py
    from dsgrid_spark.sources.tables import load_tables
    for df in load_tables(spark, SF_DIR).values():
        df.count()

    from pyspark.sql import functions as F  # noqa: F401

    for tgt in targets:
        print(f"== {tgt} ==")
        if tgt == "q28_stream":
            # phase the streaming branch: setup (input write) vs stream
            for i in range(3):
                with Phase(spark, f"q28_stream full call {i}"):
                    entry_mod._q28_stream(spark, SF_DIR).count()
        elif tgt == "q30_store":
            profile_query(spark, "q30_minhash_dedup", branch="store")
        elif tgt == "q30_incr":
            profile_query(spark, "q30_minhash_dedup", branch="incr")
        elif tgt == "q30_full":
            profile_query(spark, "q30_minhash_dedup", branch="full")
        elif tgt == "q31":
            profile_query(spark, "q31_simhash_dedup")
        elif tgt == "q32_bdf":
            profile_query(spark, "q32_similarity_bruteforce", branch="bdf")
        elif tgt == "q44_sem":
            for i in range(2):
                with Phase(spark, f"q44_sem full call {i}"):
                    entry_mod._q44_sem(spark, SF_DIR).count()
        elif tgt == "q44_pair":
            for i in range(2):
                with Phase(spark, f"q44_pair full call {i}"):
                    entry_mod._q44_pair(spark, SF_DIR).count()
        elif tgt in entry_mod.queries():
            profile_query(spark, tgt)
        else:
            print(f"  unknown target {tgt}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
