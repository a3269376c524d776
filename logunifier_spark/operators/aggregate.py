"""Aggregations: per-sink routed-row counts + pattern-hit histogram.

Spark analogs of the reference's only aggregate surfaces:
  - per-label-stream grouping  (batch.go:55-79)  -> groupBy(stream-level keys)
  - prometheus counters        (client.go:53-142) -> hash aggregates

All map-side-combinable hash aggregates (partial aggregation happens before
the exchange, so the shuffle carries one row per (key, partition))."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sink_counts(df: DataFrame) -> DataFrame:
    """(sink, routed_rows) — the driver's routed-row equality metric."""
    return df.groupBy("sink").agg(F.count("*").alias("routed_rows"))


def pattern_histogram(df: DataFrame) -> DataFrame:
    """(pattern_key, hits)."""
    return (df.groupBy(F.col("log_pattern_key").alias("pattern_key"))
              .agg(F.count("*").alias("hits")))


def level_histogram(df: DataFrame) -> DataFrame:
    return (df.groupBy(F.col("log_level").alias("level"))
              .agg(F.count("*").alias("hits")))


def stream_counts(df: DataFrame) -> DataFrame:
    """Entries per canonical label-stream key (A1), plus byte accounting
    analog of batch.go:114-127 (sum of line BYTE lengths — octet_length,
    matching Go's len() on a UTF-8 string)."""
    return (df.groupBy("stream_key")
              .agg(F.count("*").alias("entries"),
                   F.sum(F.octet_length(F.coalesce(F.col("message"), F.lit("")))).alias("line_bytes")))


def sink_bytes(df: DataFrame) -> DataFrame:
    """(sink, routed_rows, payload_bytes) — A2/A3 batch-size accounting
    parity: the reference sizes Loki batches by summed entry line bytes
    (/root/reference/pkg/clients/lokiclient/batch.go:113-123, sizeBytes /
    sizeBytesAfter gate the flush at BatchSize; age() gates on BatchWait).
    Batch flush timing itself is a no-op under Spark's bulk execution
    model, but the accounting surface — bytes routed per sink — is the
    reference metric users actually read, so it ships as a first-class
    map-side-combinable aggregate."""
    return df.groupBy("sink").agg(
        F.count("*").alias("routed_rows"),
        F.sum(F.octet_length(F.coalesce(F.col("message"), F.lit(""))))
         .alias("payload_bytes"))


def error_counts(df: DataFrame) -> DataFrame:
    """(sink, process_errors, validation_errors) — shipper drop/mutate
    counter analog."""
    return (df.groupBy("sink").agg(
        F.count(F.when(F.col("process_error_reason").isNotNull(), 1)).alias("process_errors"),
        F.count(F.when(F.col("validation_errors").isNotNull(), 1)).alias("validation_errors"),
        F.count("*").alias("routed_rows"),
    ))
