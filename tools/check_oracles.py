"""Local stand-in for the driver's correctness gate: run each
``__spark_entry__.queries()`` entry and its ``oracle_sql()`` in DuckDB on
the same parquet tables, compare row count + column names + order-
insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from linkgraph_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if not isinstance(r, tuple) else r[cols.index(c)]
            if isinstance(v, float):
                v = round(v, 9)
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle_check", master="local[16]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {str(ex)[:300]}")
            failures.append(name)
            continue
        spark_t = time.monotonic() - t0
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{spark_t:.1f}s]")
            continue
        t0 = time.monotonic()
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {str(ex)[:300]}")
            failures.append(name)
            continue
        duck_t = time.monotonic() - t0
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns spark={scols} duck={dcols}")
            failures.append(name)
            continue
        cols = sorted(scols)
        s_n = normalize([{c: row[c] for c in scols} for row in srows], cols)
        d_n = normalize([dict(zip(dcols, row)) for row in drows], cols)
        if len(s_n) != len(d_n):
            print(f"FAIL  {name}: rows spark={len(s_n)} duck={len(d_n)}")
            sset, dset = set(s_n), set(d_n)
            for x in list(sset - dset)[:3]:
                print(f"        spark-only: {x}")
            for x in list(dset - sset)[:3]:
                print(f"        duck-only:  {x}")
            failures.append(name)
        elif s_n != d_n:
            diff = [i for i, (a, b) in enumerate(zip(s_n, d_n)) if a != b]
            print(f"FAIL  {name}: {len(diff)} differing rows of {len(s_n)}")
            for i in diff[:3]:
                print(f"        spark: {s_n[i]}")
                print(f"        duck:  {d_n[i]}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(s_n)} rows match [spark {spark_t:.1f}s, duck {duck_t:.1f}s]")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL MATCH")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
