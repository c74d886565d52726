"""Driver-style correctness harness: run each queries() entry on Spark and
its oracle_sql() on DuckDB, compare row count, schema width, and
order-insensitive values. Usage:

    python tools/compare.py [--exact] [sf_dir] [query_name ...]

--exact disables the 9-digit float rounding AND makes the compare
type-faithful, emulating the driver's bit-exact value hash — a query that
PASSes default compare but FAILs --exact will show hash_match=false in
CORRECTNESS_r*.json.

Type-faithfulness (round-5 lesson): DuckDB types a bare sum() over any
integer as HUGEINT (decimal128 via Arrow) while Spark emits int64 — equal
values, unequal types, driver hash mismatch.  Python's Decimal(5) == 5 and
hash(Decimal(5)) == hash(5), so a naive value compare can NEVER see this.
In --exact mode every cell is therefore tagged with its type class, so a
Decimal on one side vs an int on the other FAILS loudly.  Rule of thumb:
every integer sum in oracle_sql() must be wrapped CAST(sum(...) AS BIGINT).
"""

from __future__ import annotations

import sys
import time
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, ".")


EXACT = False
# --rel-tol X: accept float cells within X relative difference (types
# still enforced in EXACT mode). For SCALE REHEARSALS only — group sums
# past ~1e12 flip their last ULP with cross-engine partial-sum order
# (round(sum, 2) needs 14+ significant digits there), the documented
# 2^53 limit in the verify skill. The driver-gate emulation at sf0.01
# must NOT pass this flag.
REL_TOL = 0.0


def rows_equal_tol(a, b, tol) -> tuple[bool, float]:
    """Pairwise row compare allowing relative float deltas <= tol;
    returns (equal, max relative delta seen)."""
    max_d = 0.0
    if len(a) != len(b):
        return False, max_d
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False, max_d
        for x, y in zip(ra, rb):
            if x == y:
                continue
            if (isinstance(x, tuple) and isinstance(y, tuple)
                    and len(x) == len(y) == 2
                    and x[0] == y[0] == "float"
                    and isinstance(x[1], float) and isinstance(y[1], float)):
                d = abs(x[1] - y[1]) / max(abs(x[1]), abs(y[1]), 1e-300)
                if d <= tol:
                    max_d = max(max_d, d)
                    continue
            return False, max_d
    return True, max_d


def norm_cell(v):
    if isinstance(v, Decimal):
        # Type-faithful in EXACT mode: Decimal (DuckDB HUGEINT/DECIMAL) must
        # NOT silently equal an int/float from the other engine — the driver's
        # value hash distinguishes arrow types, so we must too.
        return ("decimal", str(v)) if EXACT else float(v)
    if isinstance(v, bool):
        return ("bool", v) if EXACT else v
    if isinstance(v, float):
        return ("float", v) if EXACT else round(v, 9)
    if isinstance(v, int):
        return ("int", v) if EXACT else v
    if isinstance(v, (datetime, date)):
        return str(v)
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


# above this many rows, skip the O(n log n) sort-by-repr and compare an
# order-insensitive aggregate hash instead (sum of per-row hashes mod
# 2^64 — both sides hash in the same process, so PYTHONHASHSEED is
# consistent).  The 18M-row sf1 results take minutes to sort and seconds
# to hash; the driver's own gate is also count+schema+value-hash.
HASH_THRESHOLD = 100_000


def agg_hash(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    h = 0
    for r in rows:
        h = (h + hash(tuple(norm_cell(r[i]) for i in order))) % (1 << 64)
    return h


def main():
    global EXACT, REL_TOL
    argv = []
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        if args[i] == "--exact":
            EXACT = True
        elif args[i] == "--rel-tol":
            i += 1
            REL_TOL = float(args[i])
        else:
            argv.append(args[i])
        i += 1
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    import duckdb
    import __spark_entry__ as entry_mod
    from dsgrid_spark.session import get_spark

    import os

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = get_spark("compare", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        # driver testdata are single files; Spark-written datasets (e.g.
        # tools/scale_up.py output) are directories of part files
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        el = time.time() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows-only, {len(srows)} rows ({el:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            # Fetch through Arrow, not fetchall(): the driver's value hash is
            # computed on Arrow types, where DuckDB's HUGEINT surfaces as
            # decimal128 (→ Python Decimal).  fetchall() collapses HUGEINT to
            # a plain int and would mask exactly the type mismatch the driver
            # fails on (round-5 regression).
            tbl = res.fetch_arrow_table()
            dcols = tbl.column_names
            dcols_data = [c.to_pylist() for c in tbl.columns]
            drows = list(zip(*dcols_data)) if dcols_data else []
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: schema {sorted(scols)} vs {sorted(dcols)}")
            failures.append(name)
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(drows)}")
            failures.append(name)
            continue
        if len(srows) > HASH_THRESHOLD:
            ha = agg_hash([tuple(r) for r in srows], scols)
            hb = agg_hash(drows, dcols)
            if ha != hb:
                print(f"FAIL {name}: value hash mismatch "
                      f"({ha:#x} vs {hb:#x}, {len(srows)} rows)")
                failures.append(name)
                continue
            print(f"PASS {name}: {len(srows)} rows, hash compare "
                  f"({el:.1f}s)", flush=True)
            continue
        a = norm_rows([tuple(r) for r in srows], scols)
        b = norm_rows(drows, dcols)
        if a != b:
            if REL_TOL:
                ok, max_d = rows_equal_tol(a, b, REL_TOL)
                if ok:
                    print(f"PASS {name}: {len(srows)} rows, within "
                          f"rel-tol (max delta {max_d:.2e}) ({el:.1f}s)",
                          flush=True)
                    continue
            bad = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, e.g. {bad}")
            failures.append(name)
            continue
        print(f"PASS {name}: {len(srows)} rows ({el:.1f}s)", flush=True)

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL PASS")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
