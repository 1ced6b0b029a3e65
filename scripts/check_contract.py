"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the same sf dir, compare
row count + order-insensitive canonical values.

Usage: python scripts/check_contract.py [--json out.json] [sf_dir] [query ...]

--json writes a driver-CORRECTNESS-shaped record per row (rows_match /
schema_match / hash_match / spark_rows / oracle_rows / err) so a
full-registry local run is auditable and diffable against the driver's
windowed CORRECTNESS_r*.json files.
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
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    records: dict[str, dict] = {}

    def record(name, *, rows_match, schema_match, hash_match,
               spark_rows, oracle_rows, err):
        records[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err,
        }

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
            record(name, rows_match=False, schema_match=False,
                   hash_match=False, spark_rows=None, oracle_rows=None,
                   err=f"spark: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} (rows-only, no oracle)")
            if len(got) == 0:
                print(f"      WARNING: zero rows")
            record(name, rows_match=len(got) > 0, schema_match=True,
                   hash_match=None, spark_rows=len(got), oracle_rows=None,
                   err=None)
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            record(name, rows_match=False, schema_match=False,
                   hash_match=False, spark_rows=len(got), oracle_rows=None,
                   err=f"duckdb: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(want.columns)}")
            record(name, rows_match=len(got) == len(want), schema_match=False,
                   hash_match=False, spark_rows=len(got),
                   oracle_rows=len(want), err="schema mismatch")
            n_fail += 1
            continue
        g, w = canon_rows(got), canon_rows(want)
        if len(g) != len(w):
            print(f"FAIL {name}: rowcount {len(g)} vs {len(w)}")
            record(name, rows_match=False, schema_match=True,
                   hash_match=False, spark_rows=len(g), oracle_rows=len(w),
                   err="rowcount mismatch")
            n_fail += 1
            continue
        if g != w:
            diffs = [i for i, (x, y) in enumerate(zip(g, w)) if x != y]
            print(f"FAIL {name}: {len(diffs)} differing rows of {len(g)}")
            for i in diffs[:3]:
                print(f"      spark : {g[i]}")
                print(f"      duckdb: {w[i]}")
            record(name, rows_match=True, schema_match=True,
                   hash_match=False, spark_rows=len(g), oracle_rows=len(w),
                   err=f"{len(diffs)} differing rows")
            n_fail += 1
            continue
        print(f"ok   {name}: rows={len(g)} values match")
        record(name, rows_match=True, schema_match=True, hash_match=True,
               spark_rows=len(g), oracle_rows=len(w), err=None)
    spark.stop()
    if json_out:
        import json as _json
        # a filtered run UPDATES an existing record file in place —
        # otherwise `--json F sf q1` would silently clobber a
        # full-registry run's 150+ records with one row
        if only and os.path.exists(json_out):
            merged = _json.load(open(json_out))
            merged.update(records)
            records = merged
        with open(json_out, "w") as fh:
            _json.dump(records, fh, indent=2)
        print(f"wrote {len(records)} records to {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
