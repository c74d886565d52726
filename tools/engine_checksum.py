"""In-engine order-insensitive result checksum: verify a board query at a
scale where fetching the rows into Python is infeasible (q20's sf10 result
is 180 million rows — tens of GB as Python tuples).

Both engines reduce the FULL result to one 64-bit number THEMSELVES —
Spark aggregates its own DataFrame, DuckDB aggregates the oracle SQL —
and only the two scalars cross into Python:

    per row:   md5( col1 | col2 | ... )  with
                 - integers/strings cast to their identical decimal text
                 - doubles discretized by a magnitude-tiered rule (below)
                   -> exact integer text (identical IEEE sequence on both
                   engines; raw float-to-text formatting is NOT
                   cross-engine stable)
    checksum:  sum( first 15 md5 hex digits as bigint  mod 1e8 )
               (order-insensitive; max 1e10 rows * 1e8 < 2^63, no overflow
                under Spark's ANSI mode)

Double discretization is magnitude-TIERED so the int64 cast can never
overflow at rehearsal scale (sf100 surfaced group sums ~3.8e15, where the
old unconditional x*1e4 produced 3.8e19 > 2^63 and DuckDB raised):

    |x| <  9e14   -> floor(x*1e4 + 0.5)   (max ~9e18 < 2^63-1)
    |x| <  9e18   -> floor(x + 0.5)       (ULP >= 0.125 here: only
                                            integer-valued doubles, e.g.
                                            discretized sums cast back to
                                            double, are exact anyway)
    else          -> floor(x / 1e6)       (ULP > 1000: any engine delta
                                            at this magnitude is already
                                            beyond float determinism)

Every branch is the same IEEE compare/multiply/floor sequence on both
engines, so the tier choice itself is cross-engine deterministic.

Usage:
    python tools/engine_checksum.py [sf_dir] [query ...]   # default q20
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def spark_checksum(df):
    from pyspark.sql import functions as F

    parts = []
    for name, dtype in df.dtypes:
        c = F.col(name)
        if dtype == "double" or dtype == "float":
            a = F.abs(c)
            c = (F.when(a < 9e14, F.floor(c * 10000 + F.lit(0.5)))
                  .when(a < 9e18, F.floor(c + F.lit(0.5)))
                  .otherwise(F.floor(c / F.lit(1e6)))).cast("long")
        parts.append(c.cast("string"))
    h = F.conv(F.substring(F.md5(F.concat_ws("|", *parts)), 1, 15), 16, 10)
    # ONE action: checksum and row count in the same aggregation — the
    # query runs once, not twice (ADVICE r5; at q20 sf10 scale the second
    # full run doubled the tool's cost)
    return df.select((h.cast("long") % 100000000).alias("h")) \
             .agg(F.sum("h").alias("checksum"), F.count("*").alias("n"))


def duck_checksum(con, sql, dtypes):
    parts = []
    for name, dtype in dtypes:
        if dtype in ("double", "float"):
            parts.append(
                f"CAST(CAST(CASE"
                f" WHEN abs(\"{name}\") < 9e14"
                f" THEN floor(\"{name}\" * 10000 + 0.5)"
                f" WHEN abs(\"{name}\") < 9e18"
                f" THEN floor(\"{name}\" + 0.5)"
                f" ELSE floor(\"{name}\" / 1e6) END AS BIGINT)"
                " AS VARCHAR)")
        else:
            parts.append(f'CAST("{name}" AS VARCHAR)')
    concat = " || '|' || ".join(parts)
    q = (f"SELECT sum(CAST(concat('0x', substr(md5({concat}), 1, 15))"
         f" AS BIGINT) % 100000000) AS checksum, count(*) AS n"
         f" FROM ({sql})")
    row = con.execute(q).fetchone()
    return row[0], row[1]


def main():
    import duckdb

    import __spark_entry__ as entry_mod
    from dsgrid_spark.session import get_spark

    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    names = args[1:] or ["q20_unpivot"]

    spark = get_spark("engine-checksum")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name in names:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        s_sum, sn = spark_checksum(df).collect()[0]
        t1 = time.time()
        d_sum, dn = duck_checksum(con, oracles[name], df.dtypes)
        status = "PASS" if (s_sum == d_sum and sn == dn) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(f"{status} {name}: rows {sn}/{dn}, checksum "
              f"{s_sum}/{d_sum} (spark {t1 - t0:.1f}s, duck "
              f"{time.time() - t1:.1f}s)")
    if failures:
        print(f"{len(failures)} failures: {failures}")
    else:
        print("ALL PASS")


if __name__ == "__main__":
    main()
