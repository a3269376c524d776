"""Structured Streaming: readStream → unify → per-sink parquet, with
checkpoint resume (SURVEY.md §2.9; reference durable-consumer resume at
internal/bootstrap/streamcfg.go:42-47)."""

import datetime

from pyspark.sql import functions as F

BASE_TS = datetime.datetime(2024, 1, 1, 12, 0, 0)


def _write_batch(spark, path, conv_prefix, n):
    from logunifier_spark.schema import TRANSCRIPT_SCHEMA
    rows = [(f"{conv_prefix}{i % 3}", i, "agent",
             f"2023-03-20 14:27:28,296 WARNING evt {i}", "tslevelmsg", BASE_TS)
            for i in range(n)]
    (spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
          .coalesce(1).write.mode("append").parquet(path))


def test_stream_unify_and_resume(spark, tmp_path):
    from logunifier_spark.streaming.stream import (
        read_transcript_stream,
        stream_unify,
    )
    src = str(tmp_path / "in")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(spark, src, "a", 20)
    q = stream_unify(read_transcript_stream(spark, src), sink, ckpt)
    q.awaitTermination(240)

    out = spark.read.parquet(sink)
    assert out.count() == 20
    r = out.where(F.col("turn_idx") == 3).collect()[0]
    assert r["message"] == "evt 3"            # parse ran inside the stream
    assert r["log_level"] == "warn"
    assert r["sink"] == "loki_app"

    # resume: append more input, restart from the same checkpoint — only the
    # NEW files are processed (no duplicates of the first 20)
    _write_batch(spark, src, "b", 10)
    q2 = stream_unify(read_transcript_stream(spark, src), sink, ckpt)
    q2.awaitTermination(240)

    out2 = spark.read.parquet(sink)
    assert out2.count() == 30
    assert out2.dropDuplicates(["conv_id", "turn_idx"]).count() == 30
