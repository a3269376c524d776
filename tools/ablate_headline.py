"""Ablation harness for the headline pipeline: time unify variants at 1M
turns on local[N] to locate the JVM-side cost (parse UDF vs projection vs
validate vs stream key vs routing). Not part of the driver contract —
perf-diagnosis tooling only.

Usage: python tools/ablate_headline.py [cpus] [turns]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402


def timed(label, df_thunk):
    # thunk, not DataFrame: unify() construction runs eager jobs (dedup
    # key-count short-circuit) that must land inside the timed window
    t0 = time.perf_counter()
    df = df_thunk() if callable(df_thunk) else df_thunk
    df.groupBy().agg(
        F.count("*"),
        F.sum(F.length("message")) if "message" in df.columns else F.count("*"),
    ).collect()
    dt = time.perf_counter() - t0
    print(f"{label:35s} {dt:7.3f}s")
    return dt


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    turns = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    from logunifier_spark.fixtures import synth_transcripts
    from logunifier_spark.operators.enrich import default_pattern_labels
    from logunifier_spark.pipeline import unify
    from logunifier_spark.session import get_spark
    spark = get_spark(app_name="ablate", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    nparts = spark.sparkContext.defaultParallelism
    t = synth_transcripts(spark, turns, num_partitions=nparts)
    labels = default_pattern_labels(spark)

    # warmup
    unify(synth_transcripts(spark, 20_000), pattern_labels=labels) \
        .groupBy().count().collect()

    for _ in range(2):
        print("---")
        timed("synth only", lambda: t.withColumn("message", F.col("text")))
        timed("unify no-enrich no-dedup", lambda: unify(t, dedup=False))
        timed("unify no-enrich", lambda: unify(t))
        timed("unify full", lambda: unify(t, pattern_labels=labels))
        timed("unify full + stream_key consumed",
              lambda: unify(t, pattern_labels=labels)
              .withColumn("message", F.col("stream_key")))
    spark.stop()


if __name__ == "__main__":
    main()
