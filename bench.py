"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.

Each query is forced with a count() (no driver-side result transfer
beyond the count) after a warm-up of the input file listing.

Series note (round 3): the q01-q50 consolidation merged extra operators
into several headline slots as tagged unions (q07 +disaggregation,
q12 +top-k, q23 +upsample, q50 +interpolated DST, q43 +contamination),
so those queries now do strictly more work per run than in rounds 1-2 —
the per-slot numbers are not like-for-like with BENCH_r1/r2. Round 3
also switches to min-of-2 runs per query (recorded as "methodology" in
the JSON): run 1 pays driver-side codegen compile/JIT that a long-lived
cluster session amortizes away; run 2 is the steady state that repeats
at scale.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from dsgrid_spark.session import get_spark  # noqa: E402

# merged tagged-union slots: discriminator column + branch prefixes, so
# the series stays separable when a slot absorbs more work (VERDICT r3
# item 5) — each branch is timed via a literal tag filter, which Catalyst
# folds to false on the other union children, pruning their subtrees
BRANCHES = {
    "q06_join_multi": ("op", ["multi", "asof", "range"]),
    "q07_map_dimension": ("mode", ["agg", "disagg"]),
    "q12_peak_load": ("tag", ["peak", "top3"]),
    "q21_scalar_datetime": ("op", ["month", "session"]),
    "q23_time_downsample": ("mode", ["down", "up", "cascade:"]),
    "q30_minhash_dedup": ("op", ["full", "incr", "store"]),
    "q31_simhash_dedup": ("op", ["chunk", "manku"]),
    "q32_similarity_bruteforce": ("op", ["brute", "rrf", "bdf"]),
    "q50_dst_duplicate": ("tag", ["spring", "fall", "interp"]),
}

# canonical-branch headline (round 7, VERDICT r6 item 2): the slot
# totals grow whenever a slot absorbs a new branch (4 did in r6 alone),
# so the round-over-round series needs a fixed-work number. For each
# merged slot ONE named branch — the slot's original operator — is
# pinned here; the canonical headline is the sum of those branch times
# plus the unmerged slot times. Recorded as "canonical_value" in the
# JSON next to the full-slot "value"; the reference point (r6 = 15.71 s)
# and the convention live in BASELINE.md. Adding a branch to a slot must
# NOT change this map — that is the whole point.
CANONICAL_BRANCH = {
    "q06_join_multi": "multi",
    "q07_map_dimension": "agg",
    "q12_peak_load": "peak",
    "q21_scalar_datetime": "month",
    "q23_time_downsample": "down",
    "q30_minhash_dedup": "full",
    "q31_simhash_dedup": "chunk",
    "q50_dst_duplicate": "spring",
    "q28_dedup_exact": "batch",
    "q44_embedding_neardup": "pair",
    "q32_similarity_bruteforce": "brute",  # +'rrf' hybrid fusion in r7
}

# headline set: one per operator family that matters at scale
HEADLINE = [
    "q01_pricing_summary",
    "q06_join_multi",
    "q07_map_dimension",
    "q09_two_table",
    "q12_peak_load",
    "q20_unpivot",
    "q21_scalar_datetime",
    "q23_time_downsample",
    "q24_annual_to_hourly",
    "q28_dedup_exact",
    "q30_minhash_dedup",
    "q31_simhash_dedup",
    "q32_similarity_bruteforce",
    "q44_embedding_neardup",
    "q50_dst_duplicate",
    "q05_project_query",
]


def _spin_child(_i: int) -> float:
    """One fixed integer-spin sample, module-level so mp.Pool can pickle
    it (the parallel env-stamp reference in main)."""
    import time as _t
    t0 = _t.perf_counter()
    x = 0
    for i in range(2_000_000):
        x += i * i
    return (_t.perf_counter() - t0) * 1000.0


def _other_jvms() -> int:
    """Count of OTHER live JVM processes (ours hasn't started yet when
    this runs). A prior test/bench JVM still exiting inflates every
    parallel query 2-5x (SCALE_R10 §11 measured exactly that; the r10
    driver board recorded a phantom +26% from it), so the run waits
    for strays and stamps what it saw into the JSON."""
    import subprocess
    try:
        out = subprocess.run(["pgrep", "-c", "java"],
                             capture_output=True, text=True, timeout=10)
        return int(out.stdout.strip() or 0)
    except Exception:
        return -1


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # environment guard (r10 verdict item 3): a contaminated run poisons
    # the round-over-round series silently. Wait up to 60 s for stray
    # JVMs to exit; whatever remains is STAMPED into the JSON so a
    # contaminated board is self-identifying instead of a mystery.
    jvms0 = _other_jvms()
    waited = 0.0
    while _other_jvms() > 0 and waited < 60.0:
        time.sleep(2.0)
        waited += 2.0
    jvms_left = _other_jvms()
    try:
        load1, load5, _ = (round(x, 2) for x in os.getloadavg())
    except OSError:
        load1 = load5 = -1.0
    # dirty-page writeback is the contamination mode the LOAD guards
    # can't see (r12: a stamped-clean board doubled the WRITE-heavy
    # slots q28/q30 minutes after a heavy job, load5 1.8): pending
    # writeback competes with the slots' own parquet writes. Read it
    # directly and wait for the flush like we wait for stray JVMs.
    def _dirty_mb() -> float:
        try:
            vals = {}
            with open("/proc/meminfo") as f:
                for line in f:
                    k, v = line.split(":", 1)
                    if k in ("Dirty", "Writeback"):
                        vals[k] = float(v.strip().split()[0])
            return round(sum(vals.values()) / 1024.0, 1)
        except Exception:
            return -1.0

    dirty0 = _dirty_mb()
    while _dirty_mb() > 256.0 and waited < 120.0:
        time.sleep(2.0)
        waited += 2.0
    dirty_left = _dirty_mb()

    # hypervisor CPU steal is the contamination mode NONE of the guest
    # guards can see (r12: a load1-0.08, zero-dirty board still ran the
    # branch phase 3-9x slow; /proc/stat's cumulative steal column was
    # ticking during it): the host is running someone else on our
    # cores. Sample steal% over one second and wait for it to subside,
    # like the JVM/writeback waits; stamp what the run started with.
    def _steal_pct(interval: float = 1.0) -> float:
        try:
            def read():
                with open("/proc/stat") as f:
                    vals = [int(x) for x in f.readline().split()[1:]]
                return sum(vals), (vals[7] if len(vals) > 7 else 0)
            t0, s0 = read()
            time.sleep(interval)
            t1, s1 = read()
            dt = t1 - t0
            return round(100.0 * (s1 - s0) / dt, 2) if dt > 0 else -1.0
        except Exception:
            return -1.0

    steal0 = _steal_pct()
    steal_left = steal0
    while steal_left > 5.0 and waited < 120.0:
        time.sleep(2.0)
        waited += 3.0  # the sample itself sleeps 1 s
        steal_left = _steal_pct()

    # calibrated single-core spin (fixed integer loop): an ABSOLUTE
    # speed reference the relative guards above can't provide. Steal
    # sampled on an idle guest underestimates what a busy host takes
    # once all cores demand CPU (r12: a 3.6%-idle-steal board ran 40%
    # slow wall-to-wall); the spin milliseconds let any two boards
    # from the same box be compared directly — a 0.8 -> 1.0 drift IS
    # the host running someone else, whatever the other stamps say.
    def _spin_ms() -> float:
        t0 = time.perf_counter()
        x = 0
        for i in range(2_000_000):
            x += i * i
        return round((time.perf_counter() - t0) * 1000.0, 1)

    spin = min(_spin_ms() for _ in range(3))

    # ALL-CORES spin (r12 close-out): the single-core spin cannot see
    # host SMT siblings / overcommit that slow only WIDE stages — a
    # session measured single spin 92.8 ms (clean) while a 32-wide
    # spin read ~1.5x that per core, exactly when the parallel-heavy
    # slots ran 45% over their best-window numbers with single-task
    # slots unchanged. Stamped (not gated): lets any two boards be
    # compared on the parallel axis the queries actually exercise.
    def _spin_parallel_ms() -> float:
        try:
            import multiprocessing as mp
            n = min(int(cpus), os.cpu_count() or 1)
            with mp.Pool(n) as pool:
                r = sorted(pool.map(_spin_child, range(n)))
            return round(r[len(r) // 2], 1)  # median of n workers
        except Exception:
            return -1.0

    spin_par = _spin_parallel_ms()

    # cumulative steal ticks at run start: instantaneous steal samples
    # miss a mid-run burst entirely (r12: a board whose start AND end
    # samples read <3% still ran one slot 2.5x slow); the tick delta
    # over the whole run gives the average steal the run actually paid.
    def _steal_ticks():
        try:
            with open("/proc/stat") as f:
                vals = [int(x) for x in f.readline().split()[1:]]
            return sum(vals), (vals[7] if len(vals) > 7 else 0)
        except Exception:
            return 0, 0

    ticks0 = _steal_ticks()
    env_stamp = {
        "other_jvms_at_start": jvms0,
        "other_jvms_after_wait": jvms_left,
        "waited_sec": waited,
        "load1_at_start": load1,
        # load5 catches the just-finished-a-heavy-job state (dirty page
        # cache, decaying scheduler pressure) that load1 already forgave
        # — measured doubling the WRITE-heavy slots (q28/q30/q32) while
        # CPU-bound slots stayed flat
        "load5_at_start": load5,
        "dirty_mb_at_start": dirty0,
        "dirty_mb_after_wait": dirty_left,
        "steal_pct_at_start": steal0,
        "steal_pct_after_wait": steal_left,
        "spin_ms": spin,
        "spin_ms_parallel": spin_par,
        "contaminated": bool(jvms_left > 0 or load1 >= 8.0
                             or load5 >= 4.0 or dirty_left > 512.0
                             or steal_left > 5.0),
    }
    spark = get_spark("dsgrid-spark-bench", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()

    sf = 0.1
    if "sf0.01" in sf_dir:
        sf = 0.01
    elif "sf0.001" in sf_dir:
        sf = 0.001
    elif "sf100" in sf_dir:
        sf = 100.0
    elif "sf10" in sf_dir:
        sf = 10.0
    elif "sf1" in sf_dir:
        sf = 1.0

    # warm-up: JVM/codegen/file-listing costs land here, not on q01
    from dsgrid_spark.sources.tables import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        # min of 2 runs: run 1 pays per-plan Janino codegen compile + JIT
        # (driver-side, amortized to nothing on a long-lived cluster
        # session); run 2 measures the steady-state execution the 100 TB
        # scale-up actually repeats. The min also damps virtualization
        # host-steal noise. Methodology recorded in the JSON.
        best = None
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).count()
            elapsed = time.time() - t0
            best = elapsed if best is None else min(best, elapsed)
        timings[name] = round(best, 3)
        # each call persists ITS OWN new DataFrames (q30 signatures/bands,
        # q31 signatures), so dropping prior slots' cache is timing-neutral
        # — but without it ~40 runs of persisted 5M-row tables accumulate
        # and the sf100 rehearsal bench dies in GCLocker allocation retries
        spark.catalog.clearCache()

    # per-branch attribution for merged slots (single run each; the slot
    # totals above stay the comparable series)
    from pyspark.sql import functions as F

    import inspect

    branch_timings: dict[str, dict[str, float]] = {}
    for name, (col, prefixes) in BRANCHES.items():
        if name not in timings:
            continue
        # slots exposing a branch= kwarg construct ONLY that branch's
        # plan, so the timing excludes sibling-branch plan analysis
        # (the r7 q32 'brute' drift: tag filters prune execution, not
        # construction). Slots without it keep the tag-filter fallback.
        takes_branch = "branch" in inspect.signature(qs[name]).parameters
        per = {}
        for p in prefixes:
            # min-of-2 like the slots (r10 verdict item 3): the
            # single-run branch numbers were the noisiest series the
            # verdicts track
            best = None
            for _ in range(2):
                t0 = time.time()
                if takes_branch:
                    qs[name](spark, sf_dir, branch=p.rstrip(":")).count()
                else:
                    qs[name](spark, sf_dir).filter(
                        F.col(col).startswith(p)).count()
                elapsed = time.time() - t0
                best = elapsed if best is None else min(best, elapsed)
            per[p.rstrip(":")] = round(best, 3)
        branch_timings[name] = per
        spark.catalog.clearCache()

    # q28's 'stream' side runs imperatively (writeStream +
    # awaitTermination) at query-construction time, so a tag filter can't
    # prune it; its branches are timed through the dedicated sub-functions
    # instead (VERDICT r4 item 2). Input files already exist from the
    # headline runs, so both numbers are steady-state.
    def _min_of_2(fn):
        best = None
        for _ in range(2):
            t0 = time.time()
            fn(spark, sf_dir).count()
            elapsed = time.time() - t0
            best = elapsed if best is None else min(best, elapsed)
        return round(best, 3)

    if "q28_dedup_exact" in timings:
        per = {}
        for tag, fn in (("batch", entry_mod._q28_batch),
                        ("bloom", entry_mod._q28_bloom),
                        ("stream", entry_mod._q28_stream),
                        ("compact", entry_mod._q28_compact)):
            per[tag] = _min_of_2(fn)
        branch_timings["q28_dedup_exact"] = per

    # q44's 'sem' side (semantic_dedup) runs connected-components
    # convergence jobs at construction time — same imperative shape as
    # q28 'stream', so its branches are also timed via sub-functions.
    if "q44_embedding_neardup" in timings:
        per = {}
        for tag, fn in (("pair", entry_mod._q44_pair),
                        ("sem", entry_mod._q44_sem)):
            per[tag] = _min_of_2(fn)
        branch_timings["q44_embedding_neardup"] = per
        spark.catalog.clearCache()

    # end-of-run re-sample (r12: a board stamped clean at start — spin
    # 95.7 ms, steal 0 — still ran 3x slow because the host started
    # stealing AFTER the stamp; sampling both ends brackets the run).
    # A run whose END spin is >1.5x its start spin, or whose end steal
    # is above the start gate, was contaminated mid-flight.
    steal_end = _steal_pct()
    spin_end = min(_spin_ms() for _ in range(3))
    ticks1 = _steal_ticks()
    run_dt = ticks1[0] - ticks0[0]
    steal_avg = (round(100.0 * (ticks1[1] - ticks0[1]) / run_dt, 2)
                 if run_dt > 0 else -1.0)
    env_stamp["steal_pct_at_end"] = steal_end
    env_stamp["spin_ms_at_end"] = spin_end
    env_stamp["spin_ms_parallel_at_end"] = _spin_parallel_ms()
    env_stamp["steal_pct_run_avg"] = steal_avg
    if (steal_end > 5.0 or steal_avg > 2.0
            or (spin > 0 and spin_end > 1.5 * spin)):
        env_stamp["contaminated"] = True

    total = round(sum(timings.values()), 3)
    canonical_queries = {
        name: (branch_timings[name][CANONICAL_BRANCH[name]]
               if name in CANONICAL_BRANCH else timings[name])
        for name in HEADLINE
    }
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "branches": branch_timings,
        "canonical_value": round(sum(canonical_queries.values()), 3),
        "canonical_queries": canonical_queries,
        "sf": sf,
        "env": env_stamp,
        "methodology": "min_of_2_runs_per_query AND per_branch (r11: "
                       "branch numbers were the noisiest series), on "
                       "per-branch plans where the slot supports "
                       "branch=; canonical = pinned-branch sum (see "
                       "BASELINE.md); env stamp records stray JVMs / "
                       "load at start after a <=60s settle wait",
    }
    # the artifact must be SELF-CONTAINED (r11 verdict: the one-line
    # JSON outgrew the driver's tail-capture window and BENCH_r11
    # lost its headline to truncation): the FULL record goes to a
    # file next to this script; stdout gets a compact line — metric
    # first — that fits any capture window
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_FULL.json")
    try:
        with open(full_path, "w") as f:
            json.dump(full, f, indent=1)
            f.write("\n")
    except OSError:
        full_path = None
    compact = {k: full[k] for k in ("metric", "value", "unit",
                                    "canonical_value", "sf")}
    compact["queries"] = timings
    compact["contaminated"] = env_stamp["contaminated"]
    compact["full_json"] = full_path
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
