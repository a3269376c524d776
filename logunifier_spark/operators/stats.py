"""Exact distributed order statistics: per-group quantiles.

Corpus curation reads quantile summaries constantly (doc-length p50/p95
per source, tokens-per-turn tails per conversation family) and the
approximate `percentile_approx` is the right default at 100 TB — but
thresholds that feed FILTERS (e.g. "drop docs beyond p99 length")
need the exact statistic, reproducibly, on both the engine and any SQL
oracle. This module computes exact discrete quantiles with integer-only
rank math so the result is engine-portable bit-for-bit.

Semantics: the type-1 (discrete) quantile — the value at 1-based sorted
position ceil(q·n) — matching DuckDB's `quantile_disc` exactly (probed:
n=4, q=.25/.5/.75/.95 → positions 1/2/3/4; n=5, q=.5/.95 → 3/5).
Quantile fractions are taken as integer PERCENTS and the position is
computed as floor((n·p + 99) / 100) ≡ ceil(n·p/100) in pure integer
arithmetic — a float q (n·0.95) is inexact in binary and flips the
position at exact multiples. Exact for n·p + 99 < 2^53 (n per group up
to ~9.5e13 at p=95), far past any real group.

Scale: one hash exchange on the keys + one sort (the ranking window);
the count rides the same partitioning without its own exchange, and the
final reduction is a hash aggregate over the already-shuffled rows.
That sort-per-group is inherent to EXACT quantiles; when an estimate
suffices, use `F.percentile_approx` and skip the sort entirely.

Ties: row_number among equal values is arbitrary, but the VALUE at a
given sorted position of a multiset is deterministic — the selected
quantile never depends on tie order or partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_quantiles(df: DataFrame, keys: list[str] | str, col: str,
                    percents: tuple[int, ...] = (50, 95),
                    out_prefix: str = "p") -> DataFrame:
    """Per-`keys` exact discrete quantiles of `col`: one row per group
    with `n` (non-null count) and one `<out_prefix><p>` column per
    requested percent. Null `col` values are ignored (standard quantile
    semantics); groups with only nulls are absent from the result."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    for p in percents:
        if not (isinstance(p, int) and 1 <= p <= 100):
            raise ValueError(f"percents must be ints in 1..100, got {p!r}")
    d = df.where(F.col(col).isNotNull()).select(*keys, col)
    w_row = Window.partitionBy(*keys).orderBy(col)
    w_all = Window.partitionBy(*keys)
    rn = F.row_number().over(w_row)
    n = F.count(col).over(w_all)
    d = d.withColumn("_rn", rn).withColumn("_n", n)
    aggs = [F.max("_n").alias("n")]
    for p in percents:
        # pos = ceil(n*p/100), integer-only (see module docstring)
        a = F.col("_n") * F.lit(int(p)) + F.lit(99)
        pos = (a - F.pmod(a, F.lit(100))) / F.lit(100)
        aggs.append(F.max(F.when(F.col("_rn") == pos, F.col(col)))
                    .alias(f"{out_prefix}{p}"))
    return d.groupBy(*keys).agg(*aggs)
