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


def test_late_rows_dead_lettered_not_shipped(spark, tmp_path):
    """Reference semantics for 'entry too far behind' (lokishipper.go:
    183-188: terminate + log the lost entry): a row older than the
    checkpoint-recovered watermark is NOT shipped to the sink and IS
    counted by dead_letter_count / health_check."""
    from logunifier_spark.checkpoint import health_check
    from logunifier_spark.schema import TRANSCRIPT_SCHEMA
    from logunifier_spark.streaming.stream import (
        dead_letter_count,
        read_transcript_stream,
        stream_unify,
    )
    src = str(tmp_path / "in")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1 advances the watermark to BASE_TS - 5 min (persisted in ckpt)
    _write_batch(spark, src, "a", 10)
    q = stream_unify(read_transcript_stream(spark, src), sink, ckpt)
    q.awaitTermination(240)
    assert dead_letter_count(q) == 0

    # batch 2: one fresh row + one row 10 min behind the watermark
    late_ts = BASE_TS - datetime.timedelta(minutes=10)
    rows = [("fresh0", 100, "agent",
             "2023-03-20 14:27:28,296 WARNING evt 100", "tslevelmsg", BASE_TS),
            ("late0", 101, "agent",
             "2023-03-20 14:27:28,296 WARNING evt 101", "tslevelmsg", late_ts)]
    (spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
          .coalesce(1).write.mode("append").parquet(src))
    q2 = stream_unify(read_transcript_stream(spark, src), sink, ckpt)
    # health_check sees the live query's dead-letter total
    h = health_check(spark)
    assert "dead_letter_rows" in h["details"]["streams"]
    q2.awaitTermination(240)

    out = spark.read.parquet(sink)
    convs = {r["conv_id"] for r in out.select("conv_id").distinct().collect()}
    assert "fresh0" in convs and "late0" not in convs   # late row not shipped
    assert out.count() == 11
    assert dead_letter_count(q2) == 1                   # ...and accounted


def test_stateful_reassembly_across_batches_and_restart(spark, tmp_path):
    """applyInPandasWithState multi-part reassembly: fragments of one
    message arrive in different micro-batches AND across a full query
    restart — the keyed state (in the checkpoint) carries the open group.
    Orphan groups (no last fragment) emit nothing."""
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from logunifier_spark.streaming.stateful import stream_reassemble_partials

    schema = StructType([
        StructField("partial_id", StringType()),
        StructField("partial_ordinal", IntegerType()),
        StructField("partial_last", BooleanType()),
        StructField("message", StringType()),
        StructField("svc", StringType()),
    ])
    src = str(tmp_path / "in")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        # timeout_ms=None: availableNow + processing-time timeouts never
        # terminates (empty batches are scheduled until the TTL fires)
        q = (stream_reassemble_partials(stream, timeout_ms=None)
             .writeStream.format("parquet")
             .option("path", sink)
             .option("checkpointLocation", ckpt)
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination(240)

    batch1 = [("p1", 1, False, "frag1-", "m-a"),
              ("p1", 2, False, "frag2-", "m-b"),
              (None, 0, False, "whole one", "m-w"),
              ("orphan", 1, False, "lost-", "m-o")]
    spark.createDataFrame(batch1, schema).coalesce(1) \
         .write.mode("append").parquet(src)
    run_once()
    got = {r["message"] for r in spark.read.parquet(sink).collect()}
    assert got == {"whole one"}          # p1 still open, orphan unemitted

    # restart the query: the closing fragment arrives AFTER a stop/start —
    # state must resume from the checkpoint
    batch2 = [("p1", 3, True, "frag3", "m-c"),
              ("p3", 1, True, "solo", "m-s")]
    spark.createDataFrame(batch2, schema).coalesce(1) \
         .write.mode("append").parquet(src)
    run_once()
    rows = {r["message"]: r["svc"] for r in spark.read.parquet(sink).collect()}
    assert rows == {"whole one": "m-w",
                    "frag1-frag2-frag3": "m-c",   # final part's metadata
                    "solo": "m-s"}


def test_stream_session_stats_matches_batch(spark, tmp_path):
    """Streaming gap sessions (session_window + watermark, append mode)
    emit EXACTLY the batch session_stats rollup for watermark-closed
    sessions: same membership, same start/end/duration."""
    from logunifier_spark.operators.temporal import session_stats
    from logunifier_spark.streaming.stream import stream_session_stats

    src = str(tmp_path / "in")
    sink = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id long, ts timestamp"

    def t(minute):
        return BASE_TS + datetime.timedelta(minutes=minute)

    # u1: two sessions (0,10 | 120,121); u2: one event; the u99 sentinel
    # sits far in the future so the final watermark closes every real
    # session (append mode only emits watermark-finalized sessions)
    rows = [(1, t(0)), (1, t(10)), (1, t(120)), (1, t(121)), (2, t(5))]
    sentinel = [(99, t(100000))]
    spark.createDataFrame(rows + sentinel, schema).coalesce(1) \
         .write.mode("append").parquet(src)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 8).parquet(src))
    q = (stream_session_stats(stream, "user_id", gap="30 minutes",
                              watermark="1 hour")
         .writeStream.format("parquet")
         .option("path", sink).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(240)

    got = sorted((r["user_id"], r["n_events"],
                  r["session_start"], r["session_end"], r["duration_s"])
                 for r in spark.read.parquet(sink).collect())
    batch = session_stats(
        spark.createDataFrame(rows, schema), "user_id", gap_s=1800.0)
    want = sorted((r["user_id"], r["n_events"],
                   r["session_start"], r["session_end"], r["duration_s"])
                  for r in batch.collect())
    assert got == want        # the sentinel's own session is NOT emitted
    assert len(got) == 3      # (u1 s0), (u1 s1), (u2 s0)


def test_stream_session_stats_accepts_timestamp_ntz(spark, tmp_path):
    # the corpus ts type is TIMESTAMP_NTZ, which withWatermark/unix_micros
    # reject — the operator must normalize the event-time column itself
    from logunifier_spark.streaming.stream import stream_session_stats
    src, sink, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    rows = [(1, BASE_TS), (1, BASE_TS + datetime.timedelta(minutes=5)),
            (99, BASE_TS + datetime.timedelta(days=2000))]
    spark.createDataFrame(rows, "user_id long, ts timestamp_ntz") \
         .coalesce(1).write.parquet(src)
    st = spark.readStream.schema("user_id long, ts timestamp_ntz").parquet(src)
    q = (stream_session_stats(st, "user_id", gap="30 minutes",
                              watermark="1 hour")
         .writeStream.format("parquet")
         .option("path", sink).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(240)
    got = [(r["user_id"], r["n_events"], r["duration_s"])
           for r in spark.read.parquet(sink).collect()]
    assert got == [(1, 2, 300)]


def test_suggest_watermark_delay_covers_observed_lag(spark):
    from logunifier_spark.streaming.stream import suggest_watermark_delay
    rows = [("k", 1, 1_000_000_000), ("k", 2, 995_000_000),  # 5 s late
            ("k", 3, 1_010_000_000), ("q", 1, 50)]
    df = spark.createDataFrame(rows, "key string, arr long, ts long")
    # max lag 5 s * 1.5 = 7.5 -> ceil 8, floored at min_seconds=2
    assert suggest_watermark_delay(df, "key", arrival="arr",
                                   min_seconds=2) == "8 seconds"
    # in-order history falls back to the floor
    inorder = df.where("arr = 1")
    assert suggest_watermark_delay(inorder, "key", arrival="arr") \
        == "60 seconds"


def test_suggest_max_files_fits_fixed_plus_rate_model():
    # synthetic progress: fixed 2000 ms + 0.05 ms/row, 8 files of 8000
    # rows per full batch plus a trailing partial batch (the second
    # distinct size that identifies the slope)
    from logunifier_spark.streaming.stream import suggest_max_files

    def prog(rows):
        return {"numInputRows": rows,
                "durationMs": {"triggerExecution": int(2000 + 0.05 * rows)}}

    hist = [prog(64_000)] * 7 + [prog(16_000), prog(0)]
    # budget 10 s: rows_target = (10000-2000)/0.05 = 160k rows = 20 files
    assert suggest_max_files(hist, 10.0, current_max_files=8) == 20
    # tight budget that only covers the fixed cost -> floor
    assert suggest_max_files(hist, 1.0, current_max_files=8) == 1
    # huge budget hits the cap
    assert suggest_max_files(hist, 10_000.0, current_max_files=8,
                             cap=256) == 256
    # single batch size: proportional fallback (median 5200 ms for 64k
    # rows -> 12.3 files/s budget at 10 s ~ 15 files, conservative)
    one = [prog(64_000)] * 5
    got = suggest_max_files(one, 10.0, current_max_files=8)
    assert got == int((64_000 * 10_000 / 5200) // 8_000)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        suggest_max_files([prog(0)], 10.0, current_max_files=8)
    with _pytest.raises(ValueError):
        suggest_max_files(hist, 10.0, current_max_files=0)
