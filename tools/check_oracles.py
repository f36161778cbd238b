"""Local replica of the driver's correctness gate: run every
__spark_entry__ query via Spark and via its DuckDB oracle on the same
parquet, compare row count + column names + order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from resolve_spark.sources.tables import TPCH_TABLES  # noqa: E402
from resolve_spark.session import build_session  # noqa: E402


def norm_cell(v):
    import decimal
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # r7 (VERDICT r6 #4): FULL precision, like the driver's hash —
        # the old %.9g normalization hid exactly the last-ulp class the
        # driver's hash_match catches (q69/q70)
        return repr(v)
    return str(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_session(master="local[8]")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        unknown = only - set(qs)
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")
    failures = []
    n_checked = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_checked += 1
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(srows)} rows")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok_cols = sorted(scols) == sorted(dcols)
        sn, dn = norm_rows(scols, srows), norm_rows(dcols, drows)
        ok_vals = sn == dn
        status = "OK" if (ok_cols and ok_vals) else "MISMATCH"
        print(f"{name:28s} {status}  spark={len(srows)} duck={len(drows)} cols_ok={ok_cols}")
        if not (ok_cols and ok_vals):
            failures.append(name)
            diff_s = [r for r in sn if r not in set(dn)][:3]
            diff_d = [r for r in dn if r not in set(sn)][:3]
            print("   spark-only:", diff_s)
            print("   duck-only :", diff_d)
            print("   spark cols:", scols, "duck cols:", dcols)
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    if n_checked == 0:
        # r7 (VERDICT r6 #4): an empty selection used to print ALL-OK
        raise SystemExit("no queries selected — nothing was checked")
    print("ALL-OK")


if __name__ == "__main__":
    main()
