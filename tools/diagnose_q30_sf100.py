"""One-off diagnosis for the q30 sf100 row-count gap (9,511,756 vs
9,511,750): identify the Spark-kept-but-oracle-dropped doc ids, their
true Jaccard to their smaller-id partner, and compare the observed miss
count with the LSH catch-probability expectation sum((1-j^r)^b) over all
true pairs at j >= threshold (8 bands x 3 rows at threshold 0.8 has a
0.32% per-pair miss probability at exactly j=0.8 — invisible on one
corpus instance, expected to surface a handful of misses across 1000
token-prefixed replicas).

Usage: python tools/diagnose_q30_sf100.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NORM = ("trim(regexp_replace(regexp_replace(lower(text), '[^\\w\\s]', '',"
        " 'g'), '\\s+', ' ', 'g'))")

PAIRS_SQL = f"""
    WITH sh AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 5 THEN
               list_distinct([array_to_string(w[(i+1):(i+5)], ' ')
                              for i in range(0, len(w) - 4)])
             ELSE [array_to_string(w, ' ')] END AS s
      FROM (SELECT doc_id, string_split({NORM}, ' ') AS w
            FROM documents)
    ), e AS (
      SELECT doc_id, UNNEST(s) AS g FROM sh
    ), sz AS (
      SELECT doc_id, len(s) AS n FROM sh
    ), pc AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
      FROM e a JOIN e b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT pc.ia, pc.ib,
           pc.inter * 1.0 / (sa.n + sb.n - pc.inter) AS jac
    FROM pc JOIN sz sa ON sa.doc_id = pc.ia
            JOIN sz sb ON sb.doc_id = pc.ib
    WHERE pc.inter * 1.0 / (sa.n + sb.n - pc.inter) >= 0.8
"""


def main():
    import duckdb

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf100"
    out = "/tmp/q30_diag"
    os.makedirs(out, exist_ok=True)

    # --- Spark: full-branch survivors ------------------------------------
    spark_ids = f"{out}/spark_full_ids.parquet"
    if not os.path.exists(spark_ids):
        import __spark_entry__ as entry_mod
        from pyspark.sql import functions as F

        from dsgrid_spark.session import get_spark

        spark = get_spark("q30-diag")
        spark.sparkContext.setLogLevel("ERROR")
        t0 = time.time()
        df = entry_mod.queries()["q30_minhash_dedup"](spark, sf_dir)
        df.filter(F.col("op") == "full").select("doc_id") \
            .write.mode("overwrite").parquet(spark_ids)
        print(f"spark full survivors written ({time.time() - t0:.0f}s)")
        spark.stop()

    # --- DuckDB: exact pair table + diff ---------------------------------
    con = duckdb.connect()
    p = f"{sf_dir}/documents.parquet"
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{src}'")
    t0 = time.time()
    con.execute(f"CREATE TABLE pairs AS {PAIRS_SQL}")
    print(f"exact pair table built ({time.time() - t0:.0f}s): "
          f"{con.execute('SELECT count(*) FROM pairs').fetchone()[0]} pairs"
          f" at jac >= 0.8")
    con.execute(
        f"CREATE VIEW spark_kept AS SELECT * FROM '{spark_ids}/*.parquet'")
    missed = con.execute("""
        SELECT s.doc_id, p.ia AS partner, p.jac
        FROM spark_kept s JOIN pairs p ON p.ib = s.doc_id
        ORDER BY s.doc_id
    """).fetchall()
    print(f"\nSpark-kept docs that have a smaller-id partner at jac>=0.8 "
          f"(= LSH misses): {len(set(m[0] for m in missed))}")
    for doc_id, partner, jac in missed[:40]:
        prob_miss = (1 - jac ** 3) ** 8
        print(f"  doc {doc_id} (orig {doc_id % 10000} rep {doc_id // 10000})"
              f" ~ partner {partner}: jac={jac:.4f}"
              f" -> per-pair miss prob {prob_miss:.2e}")
    exp = con.execute(
        "SELECT sum(power(1 - power(jac, 3), 8)), count(*) FROM pairs"
    ).fetchone()
    print(f"\nexpected misses over all {exp[1]} true pairs: {exp[0]:.2f}"
          f" (observed {len(set(m[0] for m in missed))})")


if __name__ == "__main__":
    main()
