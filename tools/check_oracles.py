"""Local stand-in for the driver's CORRECTNESS gate: run every
__spark_entry__.queries() entry AND its oracle_sql() on the same sf dir,
compare row-count + column names + order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import decimal
import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402


def _norm(v):
    """Canonical string for one value, TYPE-TAGGED for numerics.

    The driver's value hasher fetches results through Arrow/pandas dtypes,
    so an int64 column on one side and a float64 on the other (e.g. DuckDB
    HUGEINT from a windowed sum) hash differently even when the printed
    values coincide ("0" vs "0.0").  Tag floats with ":f" so this local gate
    reproduces the driver's int-vs-float sensitivity; Decimals normalize to
    float first (both engines surface DECIMAL aggregates as float64 through
    the driver's fetch).
    """
    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN:f"
        return f"{v:.9g}:f"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, int):
        return f"{v}:i"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


# How the driver's hasher sees each engine type after the pandas fetch.
# DuckDB HUGEINT/DECIMAL become float64 through .df() even though
# fetchall() yields exact Python ints — that asymmetry is exactly the
# class of bug this check exists to catch (pack_sequences, round 2).
_SPARK_INTEGRAL = {"tinyint", "smallint", "int", "bigint"}
_SPARK_FLOATING = {"float", "double"}


def _duck_class(type_str):
    t = type_str.upper()
    if t in {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}:
        return "int"
    if t in {"HUGEINT", "UHUGEINT", "FLOAT", "DOUBLE"} or t.startswith("DECIMAL"):
        return "float"
    return None


def _type_drift(scols, sdtypes, dcols, dtypes):
    """Columns whose numeric class differs between Spark and the driver's
    view of the DuckDB result (int64 vs float64 after pandas fetch)."""
    smap = dict(sdtypes)
    dmap = {c: _duck_class(str(t)) for c, t in zip(dcols, dtypes)}
    drift = []
    for c in scols:
        st = smap.get(c)
        dc = dmap.get(c)
        if st in _SPARK_INTEGRAL and dc == "float":
            drift.append(f"{c}: spark {st} vs duck float-class")
        elif st in _SPARK_FLOATING and dc == "int":
            drift.append(f"{c}: spark {st} vs duck int-class")
    return drift


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
    import time as _time
    for name, fn in queries.items():
        if only and name not in only:
            continue
        _t0 = _time.perf_counter()
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
            dtypes = list(res.types)
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"✗ {name}: DUCKDB ERROR {type(e).__name__}: {e}")
            continue
        drift = _type_drift(scols, sdf.dtypes, dcols, dtypes)
        if drift:
            failures.append(name)
            print(f"✗ {name}: NUMERIC TYPE DRIFT (driver would hash-mismatch)")
            for d in drift:
                print(f"    {d}")
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_vals = ok_cols and ok_count and _canon(srows, scols) == _canon(drows, dcols)
        if ok_vals:
            print(f"✓ {name}: {len(srows)} rows match "
                  f"[{_time.perf_counter() - _t0:.1f}s]")
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
