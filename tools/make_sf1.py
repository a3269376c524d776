"""Derive the sf1.0 soak tables (10x sf0.1) deterministically from the
driver's read-only sf0.1 parquet — no new randomness, no external data.

The driver generates sf{0.001,0.01,0.1} (seed=42, TESTDATA.md) and the
round-3 verdict asked for a 10x scale soak: hot-bucket caps, broadcast
gates, and interval bucket widths all have thresholds whose first real
test is a bigger input. Rather than re-implementing (and inevitably
drifting from) the driver's generator, sf1.0 is pure arithmetic on its
sf0.1 output:

  * FACT tables get 10 key-offset copies — orders/lineitem orderkey
    += c*150_000 (referential integrity preserved: both sides shift
    together, o_custkey/l_partkey/l_suppkey keep pointing at the
    unchanged dimensions, so each customer simply owns 10x orders);
    events event_id += c*100_000 (stays contiguous 0..10N-1) with ts
    += c*31 days (a ~10-month timeline instead of 10 duplicates of
    January); documents doc_id += c*5_000 with text UNCHANGED — every
    doc gains 9 exact clones, deliberately adversarial for the dedup
    family (every LSH bucket is hot, exact_dedup collapses 10:1);
    embeddings vec_id += c*2_000 (9 zero-distance neighbours per
    vector stress ANN tie-breaks).
  * DIMENSION tables (region nation customer supplier part) are
    copied as-is — facts grow faster than dims, which is exactly the
    broadcast-join assumption the soak must exercise.

Usage: python tools/make_sf1.py [out_dir]   (default: <repo>/testdata_sf1)
Then:  python tools/check_oracles.py <out_dir>
       SPARK_GRAFT_SF_DIR=<out_dir> python bench.py
"""
from __future__ import annotations

import os
import sys
import time

import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10

OFFSETS = {  # table -> (key columns to offset, stride)
    "orders": (["o_orderkey"], 150_000),
    "lineitem": (["l_orderkey"], 150_000),
    "events": (["event_id"], 100_000),
    "documents": (["doc_id"], 5_000),
    "embeddings": (["vec_id"], 2_000),
}
DIMS = ["region", "nation", "customer", "supplier", "part"]


def make(out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
                    f"'{out_dir}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied")
    for t, (keys, stride) in OFFSETS.items():
        cols = [c[0] for c in
                con.execute(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'")
                   .fetchall()]
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"{c} + c.copy * {stride} AS {c}")
            elif t == "events" and c == "ts":
                sel.append(f"ts + INTERVAL (c.copy * 31) DAYS AS ts")
            else:
                sel.append(c)
        order = keys[0]
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM '{SRC}/{t}.parquet', "
            f"(SELECT unnest(range({COPIES})) AS copy) c ORDER BY {order}) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET, "
            f"ROW_GROUP_SIZE 122880)")
        n = con.execute(f"SELECT count(*) FROM '{out_dir}/{t}.parquet'") \
               .fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "testdata_sf1")
    t0 = time.perf_counter()
    make(out)
    print(f"done in {time.perf_counter() - t0:.1f}s -> {out}")
