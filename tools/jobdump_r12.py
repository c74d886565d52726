"""Per-job attribution for one query branch: run it once warm, then
dump every Spark job the run launched (duration, tasks, call site) from
the UI REST API — the guide §1/§7.1 empirical loop, headless.

Usage: python tools/jobdump_r12.py q30_minhash_dedup [store]
"""
from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from dsgrid_spark.session import get_spark  # noqa: E402


def main():
    name = sys.argv[1]
    branch = sys.argv[2] if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("dsgrid-jobdump", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    from dsgrid_spark.sources.tables import load_tables
    for df in load_tables(spark, sf_dir).values():
        df.count()
    import inspect
    fn = entry_mod.queries()[name]
    kw = ({"branch": branch} if branch and
          "branch" in inspect.signature(fn).parameters else {})
    # warm run
    fn(spark, sf_dir, **kw).count()
    spark.catalog.clearCache()
    tracker = spark.sparkContext.statusTracker()
    j0 = set(tracker.getJobIdsForGroup(None))
    import time
    t0 = time.time()
    fn(spark, sf_dir, **kw).count()
    wall = time.time() - t0
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs") as r:
        jobs = json.load(r)
    new = [j for j in jobs if j["jobId"] not in j0]
    new.sort(key=lambda j: j["jobId"])
    total = 0.0
    for j in new:
        from datetime import datetime
        st = datetime.strptime(j["submissionTime"], "%Y-%m-%dT%H:%M:%S.%fGMT")
        ct = datetime.strptime(j["completionTime"], "%Y-%m-%dT%H:%M:%S.%fGMT")
        dur = (ct - st).total_seconds()
        total += dur
        print(f"  job {j['jobId']:>4} {dur:7.3f}s tasks={j['numTasks']:>4} "
              f"{j['name'][:100]}")
    print(f"TOTAL {len(new)} jobs, {total:.3f}s job time, {wall:.3f}s wall")
    spark.stop()


if __name__ == "__main__":
    main()
