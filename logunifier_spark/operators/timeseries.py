"""Time-series rate monitoring: bucketed counts and burst detection.

The reference's end consumer is a Loki/Grafana stack whose alerting is
rate-over-window on the shipped label streams (the per-sink/per-level
counters the pipeline emits — operators/aggregate.py — are its inputs).
This module closes that loop inside the engine: tumbling-bucket counts
and a trailing-window burst detector, usable on any keyed event table
(per-sink error rates, per-conversation turn rates, per-tenant volume).

Numeric design: everything is INTEGER arithmetic end to end. The bucket
id is the bucket's start in epoch micros computed as `us - (us mod w)` —
pure int64 ops (an epoch-micros value exceeds 2^53, so any double-based
floor(us/w) can be off by one at bucket edges). The spike criterion
  cnt * n_trail > mult * trail_sum
is the integer cross-multiplied form of `cnt > mult * trailing_mean`
— exact, engine-portable (no stddev/mean float drift between Spark and
an SQL oracle), and monotone in the same sense as a z-score on a
Poisson-ish rate.

Scale: bucket_counts is one partial-aggregable hash aggregate (the
shuffle carries one row per (key, bucket), not per event). rate_spikes
adds one window over the COUNTS table — partitioned by key, sorted by
bucket; the window input is already reduced, so the sort is over
buckets-per-key rows, never events. The trailing frame ranges over
OBSERVED buckets (empty buckets are absent, not zero): on sparse keys
the trailing window reaches further back in wall time. Densifying
(sequence+explode per key) is deliberately NOT default — at 10^12 events
the dense bucket grid can dwarf the observed one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from logunifier_spark.operators.temporal import _ts_micros


def bucket_counts(df: DataFrame, keys: list[str] | str, ts: str = "ts",
                  bucket_s: int = 3600,
                  bucket_col: str = "bucket_us") -> DataFrame:
    """Events per (key, tumbling bucket). `bucket_col` is the bucket start
    in epoch micros (int64-exact; see module docstring)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    us = _ts_micros(df, ts)
    w = F.lit(int(bucket_s) * 1_000_000)
    bucket = (us - F.pmod(us, w)).alias(bucket_col)
    return (df.groupBy(*keys, bucket)
              .agg(F.count("*").alias("cnt")))


def rate_spikes(df: DataFrame, keys: list[str] | str, ts: str = "ts",
                bucket_s: int = 3600, trailing: int = 24,
                mult: int = 3) -> DataFrame:
    """Buckets whose event count exceeds `mult` × the mean of the key's
    `trailing` preceding observed buckets (integer cross-multiplied —
    exact). Returns (keys..., bucket_us, cnt, trail_sum, n_trail), spike
    rows only; a key's first bucket (n_trail=0) never flags."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    counts = bucket_counts(df, keys, ts=ts, bucket_s=bucket_s)
    w = (Window.partitionBy(*keys).orderBy("bucket_us")
         .rowsBetween(-trailing, -1))
    out = (counts
           .withColumn("trail_sum",
                       F.coalesce(F.sum("cnt").over(w), F.lit(0)))
           .withColumn("n_trail", F.count("cnt").over(w)))
    return out.where(
        (F.col("n_trail") > 0)
        & (F.col("cnt") * F.col("n_trail")
           > F.lit(int(mult)) * F.col("trail_sum")))


def watermark_lag_stats(df: DataFrame, keys: list[str] | str,
                        arrival: str, ts: str = "ts") -> DataFrame:
    """Event-time disorder measurement — the data-driven way to pick a
    streaming watermark delay (streaming/stream.py::stream_unify takes
    one; too small drops late rows to the dead-letter count, too large
    bloats state). Per key, replay rows in ARRIVAL order (`arrival`: an
    ingest sequence / kafka offset / event_id) and measure each row's
    lateness = running-max(event time among earlier arrivals) - its own
    event time, when positive. Returns (keys..., n, n_late, max_lag_us,
    sum_lag_us): set the watermark to cover the observed max_lag tail.

    Shape: ONE window (partition by key, order by arrival, running max
    over the strictly-earlier frame) + one hash aggregate on the same
    key — the aggregate reuses the window's partitioning, so the job
    shuffles the table once. All lag math in int64 epoch micros."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    us = _ts_micros(df, ts)
    w = (Window.partitionBy(*keys).orderBy(arrival)
               .rowsBetween(Window.unboundedPreceding, -1))
    d = (df.select(*keys, F.col(arrival), us.alias("_us"))
           .withColumn("_prevmax", F.max("_us").over(w)))
    lag = F.when(F.col("_prevmax") > F.col("_us"),
                 F.col("_prevmax") - F.col("_us"))
    d = d.withColumn("_lag", lag)
    return (d.groupBy(*keys)
             .agg(F.count("*").alias("n"),
                  F.count("_lag").alias("n_late"),
                  F.coalesce(F.max("_lag"), F.lit(0)).alias("max_lag_us"),
                  F.coalesce(F.sum("_lag"), F.lit(0)).alias("sum_lag_us")))


def rolling_counts(df: DataFrame, keys: list[str] | str, ts: str = "ts",
                   bucket_s: int = 86400,
                   trailing: int = 6) -> DataFrame:
    """Trailing-window rate metrics over CALENDAR time: per (key,
    bucket), the event count plus the sum / observed-bucket count /
    exact milli-average over the window [bucket - trailing*width,
    bucket]. Unlike rate_spikes' ROWS frame (last n OBSERVED buckets),
    this is a RANGE frame on the int64 bucket timestamp — absent
    (empty) buckets genuinely age out of the window, which is what a
    7-day rolling metric means on sparse keys.

    One bucket aggregate (shuffle carries (key, bucket) rows, not
    events) + one window over the counts frame sharing the key
    partitioning. avg_milli = (sum*1000) DIV n — exact integer math,
    no float drift."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    counts = bucket_counts(df, keys, ts=ts, bucket_s=bucket_s)
    width = int(bucket_s) * 1_000_000
    w = (Window.partitionBy(*keys).orderBy("bucket_us")
               .rangeBetween(-trailing * width, 0))
    out = (counts.withColumn("trail_sum", F.sum("cnt").over(w))
                 .withColumn("n_obs", F.count("cnt").over(w)))
    return out.withColumn(
        "avg_milli",
        F.expr("CAST((trail_sum * 1000) DIV n_obs AS BIGINT)"))
