"""Local harness mimicking the driver's correctness gate: run each
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet, compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return str(v)


def compare(name, sdf, sql, con) -> str:
    spark_rows = sdf.collect()
    scols = sdf.columns
    ddf = con.sql(sql)
    dcols = [c[0] for c in ddf.description]
    drows = ddf.fetchall()
    if sorted(scols) != sorted(dcols):
        return f"SCHEMA MISMATCH spark={scols} duck={dcols}"
    if len(spark_rows) != len(drows):
        return f"ROWCOUNT MISMATCH spark={len(spark_rows)} duck={len(drows)}"
    sidx = [scols.index(c) for c in sorted(scols)]
    didx = [dcols.index(c) for c in sorted(dcols)]
    sset = sorted(tuple(norm_cell(r[i]) for i in sidx) for r in spark_rows)
    dset = sorted(tuple(norm_cell(r[i]) for i in didx) for r in drows)
    if sset != dset:
        diffs = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
        return f"VALUE MISMATCH e.g. {diffs}"
    return f"OK ({len(spark_rows)} rows)"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from medtype_spark.session import get_spark

    spark = get_spark("oracle_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            try:
                n = fn(spark, sf_dir).count()
                print(f"{name:32s} rows-only ({n} rows)")
            except Exception as e:
                failures += 1
                print(f"{name:32s} ERROR {type(e).__name__}: {str(e)[:200]}")
            continue
        try:
            res = compare(name, fn(spark, sf_dir), oracles[name], con)
        except Exception as e:
            res = f"ERROR {type(e).__name__}: {str(e)[:300]}"
        if not res.startswith("OK"):
            failures += 1
        print(f"{name:32s} {res}")
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
