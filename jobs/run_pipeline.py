"""spark-submit entry point for the unification pipeline.

Launch (the north-rule packaging contract):

    python -m logunifier_spark.package dist/        # build the --py-files zip
    spark-submit --py-files dist/logunifier_spark.zip \
        jobs/run_pipeline.py \
        --input  /data/transcripts \
        --output /data/unified \
        --ranges 64

The job is resumable: the input is processed in deterministic hash ranges
of conv_id, each committed with a lineage manifest under
<output>/_lineage/; re-running the same command skips committed ranges
(kill it mid-run and relaunch to test). Run-level parse/route/sink metrics
are written to <output>/run_metrics.json.

With --streaming the same pipeline runs as a Structured Streaming job over
the input directory with checkpoint/resume at <output>/_checkpoint.

No master/config is set here — spark-submit owns that (cluster mode,
executor sizing, shuffle partitions). Local smoke run:

    spark-submit --master 'local[8]' jobs/run_pipeline.py \
        --input /root/testdata/sf0.001-transcripts --output /tmp/out
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="logunifier-spark pipeline job")
    ap.add_argument("--input", required=True,
                    help="transcripts table path (parquet dir or Iceberg table)")
    ap.add_argument("--output", required=True, help="output base path")
    ap.add_argument("--ranges", type=int, default=64,
                    help="resume granularity: independent commit ranges")
    ap.add_argument("--run-id", default="run")
    ap.add_argument("--streaming", action="store_true",
                    help="run as a Structured Streaming job instead of batch")
    ap.add_argument("--iceberg", action="store_true",
                    help="read --input as an Iceberg table name, not a path")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("logunifier-pipeline").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    if args.streaming:
        from logunifier_spark.streaming.stream import (
            read_transcript_stream,
            stream_unify,
        )
        q = stream_unify(
            read_transcript_stream(spark, args.input),
            sink_path=f"{args.output}/sinks",
            checkpoint_path=f"{args.output}/_checkpoint",
        )
        q.awaitTermination()
        return 0

    from logunifier_spark.checkpoint import emit_run_metrics, run_resumable
    t = (spark.read.format("iceberg").load(args.input) if args.iceberg
         else spark.read.parquet(args.input))
    written = run_resumable(spark, t, args.output, n_ranges=args.ranges,
                            run_id=args.run_id)
    metrics = emit_run_metrics(args.output)
    print(json.dumps({"committed_this_run": len(written), **metrics}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
