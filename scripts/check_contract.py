"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the same sf dir, compare
row count + order-insensitive canonical values.

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
from decimal import Decimal

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]

    def norm(v):
        if v is None:
            return None
        if isinstance(v, float):
            if pd.isna(v):
                return None
            return repr(v)
        if isinstance(v, Decimal):
            return str(v.normalize())
        if isinstance(v, (pd.Timestamp,)):
            return v.isoformat()
        if isinstance(v, (int,)):
            return str(v)
        return str(v)

    rows = [tuple(norm(v) for v in r) for r in df.itertuples(index=False)]
    return sorted(rows, key=lambda t: tuple((x is None, x or "") for x in t))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from kgx import session

    spark = session.get_spark("contract-check", master="local[8]", shuffle_partitions=16)

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} (rows-only, no oracle)")
            if len(got) == 0:
                print(f"      WARNING: zero rows")
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(want.columns)}")
            n_fail += 1
            continue
        g, w = canon_rows(got), canon_rows(want)
        if len(g) != len(w):
            print(f"FAIL {name}: rowcount {len(g)} vs {len(w)}")
            n_fail += 1
            continue
        if g != w:
            diffs = [i for i, (x, y) in enumerate(zip(g, w)) if x != y]
            print(f"FAIL {name}: {len(diffs)} differing rows of {len(g)}")
            for i in diffs[:3]:
                print(f"      spark : {g[i]}")
                print(f"      duckdb: {w[i]}")
            n_fail += 1
            continue
        print(f"ok   {name}: rows={len(g)} values match")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
