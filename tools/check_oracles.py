"""Local stand-in for the driver's CORRECTNESS gate: run every
__spark_entry__.queries() entry AND its oracle_sql() on the same sf dir,
compare row-count + column names + order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from logunifier_spark.session import get_spark
    spark = get_spark(app_name="oracle-check", master="local[8]")

    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"~ {name}: rows-only ({len(srows)} rows, cols={scols})")
            if not srows:
                failures.append(name)
                print(f"  ✗ zero rows")
            continue
        try:
            res = con.sql(oracles[name])
            dcols = [c for c in res.columns]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"✗ {name}: DUCKDB ERROR {type(e).__name__}: {e}")
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_vals = ok_cols and ok_count and _canon(srows, scols) == _canon(drows, dcols)
        if ok_vals:
            print(f"✓ {name}: {len(srows)} rows match")
        else:
            failures.append(name)
            print(f"✗ {name}: cols {sorted(scols)} vs {sorted(dcols)} | "
                  f"rows {len(srows)} vs {len(drows)}")
            if ok_cols and ok_count:
                a, b = _canon(srows, scols), _canon(drows, dcols)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
                for x, y in diffs:
                    print(f"    spark={x}\n    duck ={y}")
    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
