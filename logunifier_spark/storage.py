"""Bucketed-table storage: co-located joins and aggregations.

At 100 TB the dominant cost of any keyed join/aggregate is the shuffle.
Spark's native bucketing (no Hive required — the in-memory session
catalog + a parquet path suffice) persists a table pre-hash-partitioned
on a key: every later equi-join between two tables bucketed on the same
key with compatible bucket counts, and every aggregate on that key,
plans WITHOUT a shuffle exchange — the scan itself satisfies the
distribution requirement.

Use it for the stable high-fan-in keys of this engine:
  - documents/embeddings bucketed by doc_id → exchange-free
    dedup-verify joins, ANN candidate re-joins, stats joins
  - routed sink tables bucketed by (conv_id) → exchange-free
    per-conversation reprocessing

The bucket count is a LAYOUT property, not a parallelism cap: scans
split large buckets by file; pick buckets ≈ cluster cores at the target
scale (1000-executor rule of thumb: 4-8k) and keep it IDENTICAL across
tables that join — mismatched counts fall back to shuffling the smaller
side (Spark only avoids the exchange when one count divides the other).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table: str, key: str | list[str],
                   buckets: int, path: str | None = None,
                   file_format: str = "parquet",
                   mode: str = "overwrite") -> None:
    """Persist df hash-bucketed (and per-file sorted) on `key` as a
    catalog table. `path` makes it an external table at that location —
    required when the warehouse dir is not where the data should live."""
    keys = [key] if isinstance(key, str) else list(key)
    w = (df.write.mode(mode).format(file_format)
           .bucketBy(buckets, *keys).sortBy(*keys))
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def is_shuffle_free_join(a: DataFrame, b: DataFrame, on: list[str]) -> bool:
    """True iff the equi-join of a and b on `on` plans with no shuffle
    exchange (broadcast exchanges excluded) — the co-location check to run
    once after changing a table's bucketing layout."""
    plan = (a.join(b, on=on)._jdf.queryExecution()  # noqa: SLF001
             .executedPlan().toString())
    return not any(line.lstrip(" :+-*").startswith("Exchange")
                   for line in plan.splitlines())


def bucket_info(spark: SparkSession, table: str) -> dict:
    """Bucketing layout of a catalog table: {'buckets': n, 'columns': [...]}
    (zeros/empty when the table is unbucketed)."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    info = {r["col_name"]: r["data_type"] for r in rows}
    n = int(info.get("Num Buckets", "0") or 0)
    cols = [c.strip("[] `") for c in
            info.get("Bucket Columns", "").split(",") if c.strip("[] `")]
    return {"buckets": n, "columns": cols}


def zorder_key(cols: list[Column], bits: int = 8) -> Column:
    """Morton (Z-order) interleave of `cols` — a layout key for
    multi-dimensional data skipping. Sorting/range-partitioning a table
    by this key before writing clusters rows that are close in EVERY
    dimension into the same files, so parquet min/max stats prune scans
    for predicates on ANY prefix-free subset of the dimensions — the
    one-key-per-file-sort answer to "we filter by (tenant, day) AND by
    (day) AND by (tenant)".

    Inputs must already be non-negative ints < 2^bits (quantize/clamp
    upstream — e.g. `F.pmod(x, 256)` or a histogram-style bucket; the
    caller owns the mapping because it IS the layout contract). Bit i of
    column j lands at position i*len(cols)+j. The expression unrolls to
    bits*len(cols) shift-and-or terms of plain int64 ops — keep
    bits*len(cols) <= ~48 so the fused stage stays under the JIT method
    budget (CLAUDE.md: a ~400-node scalar expression deoptimized a whole
    stage) and the result fits int64. SQL mirror per term:
    (((x >> i) & 1) << k)."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs >= 2 columns")
    if bits * n > 60:
        raise ValueError(f"bits*cols = {bits * n} exceeds the int64/JIT "
                         "budget (keep <= 60)")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, x in enumerate(cols):
            bit = F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z
