"""Resumable batch runs: partition-range checkpoints + lineage manifests
+ run metrics (the north-rule resumability contract).

The reference resumes via JetStream durable consumers (last-unacked message,
/root/reference/internal/bootstrap/streamcfg.go:42-47). The Spark-native
equivalent is snapshot/commit-based: the input is split into deterministic
partition ranges (hash of conv_id), each range is processed and committed
independently, and a JSON lineage manifest records exactly which input range
produced which output files with which counts. A restart skips committed
ranges — at-least-once becomes exactly-once because a range commit is atomic
(manifest written last, after the data).

On an Iceberg deployment the same structure maps onto snapshot commits
(`writeTo(...).append()` per range; manifest = snapshot summary metadata).
Parquet + sidecar manifests keep the logic testable in this sandbox.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class RangeManifest:
    run_id: str
    range_id: int
    n_ranges: int
    input_rows: int
    routed_rows: int
    sinks: dict  # sink -> rows
    patterns: dict  # pattern_key -> hits
    # wall_sec is the range's EVEN SHARE of the single-pass job (all
    # uncommitted ranges are processed in one job since round 2, so there
    # is no per-range measurement; summing wall_sec across manifests still
    # gives the true job wall). run_wall_sec carries the unattributed
    # total for operators who need the real number.
    wall_sec: float
    status: str = "committed"
    run_wall_sec: float = 0.0


def _manifest_path(base: str, range_id: int) -> str:
    return os.path.join(base, "_lineage", f"range={range_id:05d}.json")


def committed_ranges(base: str) -> set[int]:
    d = os.path.join(base, "_lineage")
    if not os.path.isdir(d):
        return set()
    out = set()
    for f in os.listdir(d):
        if f.startswith("range=") and f.endswith(".json"):
            try:
                with open(os.path.join(d, f)) as fh:
                    m = json.load(fh)
                if m.get("status") == "committed":
                    out.add(int(m["range_id"]))
            except (ValueError, KeyError, json.JSONDecodeError):
                continue
    return out


def run_resumable(
    spark: SparkSession,
    transcripts: DataFrame,
    base_path: str,
    n_ranges: int = 8,
    run_id: str = "run",
    pattern_labels: DataFrame | None = None,
) -> list[RangeManifest]:
    """Process the input in n_ranges deterministic hash ranges of conv_id.
    Already-committed ranges are skipped on restart; all uncommitted ranges
    are processed in ONE job (a single input scan, partitionBy(_range, sink)
    write with dynamic partition overwrite), then committed independently —
    each range's manifest is still its atomic commit point, written only
    after the data is on disk, so a crash re-runs exactly the uncommitted
    ranges and dynamic overwrite replaces their partitions in place.
    Returns the manifests written this invocation.

    (The previous design filtered `_range == r` in a loop — n_ranges full
    input scans + n_ranges parse-UDF passes. At 100 TB that is n_ranges
    reads of the corpus; this is one.)"""
    from logunifier_spark.operators.enrich import default_pattern_labels
    from logunifier_spark.pipeline import unify

    labels = pattern_labels if pattern_labels is not None \
        else default_pattern_labels(spark)
    os.makedirs(os.path.join(base_path, "_lineage"), exist_ok=True)
    done = committed_ranges(base_path)
    todo = [r for r in range(n_ranges) if r not in done]
    if not todo:
        return []

    t0 = time.perf_counter()
    rng = F.pmod(F.xxhash64("conv_id"), F.lit(n_ranges))
    part = transcripts.where(rng.isin(todo))
    u = unify(part, pattern_labels=labels).drop("loki_labels")
    # _range is a pure function of conv_id — recomputing it after unify is a
    # projection, not a second scan
    u = u.withColumn("_range", F.pmod(F.xxhash64("conv_id"), F.lit(n_ranges)))
    data_dir = os.path.join(base_path, "data")
    (u.repartition(F.col("_range"), F.col("sink"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_range", "sink")
      .parquet(data_dir))
    wall = time.perf_counter() - t0

    # counts are read BACK from the committed files (what's on disk is what
    # the manifest attests) — one scan of the freshly written output, with
    # partition pruning on _range
    written: list[RangeManifest] = []
    sinks_by_range: dict[int, dict] = {r: {} for r in todo}
    pats_by_range: dict[int, dict] = {r: {} for r in todo}
    if any(f.endswith(".parquet")
           for _, _, files in os.walk(data_dir) for f in files):
        back = spark.read.parquet(data_dir).where(F.col("_range").isin(todo))
        counts = (back.groupBy("_range", "sink", "log_pattern_key")
                      .agg(F.count("*").alias("n")).collect())
        for row in counts:
            r = int(row["_range"])
            sinks_by_range[r][row["sink"]] = \
                sinks_by_range[r].get(row["sink"], 0) + row["n"]
            pats_by_range[r][row["log_pattern_key"]] = \
                pats_by_range[r].get(row["log_pattern_key"], 0) + row["n"]
    for r in todo:
        sinks = sinks_by_range[r]
        manifest = RangeManifest(
            run_id=run_id, range_id=r, n_ranges=n_ranges,
            input_rows=sum(sinks.values()), routed_rows=sum(sinks.values()),
            sinks=sinks, patterns=pats_by_range[r],
            wall_sec=round(wall / len(todo), 3),
            run_wall_sec=round(wall, 3),
        )
        # manifest written LAST → commit point
        with open(_manifest_path(base_path, r), "w") as fh:
            json.dump(asdict(manifest), fh)
        written.append(manifest)
    return written


def health_check(spark: SparkSession, base_path: str | None = None) -> dict:
    """S7: the health-endpoint analog — named component checks serialized
    to the same {"status", "details"} JSON shape as the reference's
    /health handler (/root/reference/internal/health/check.go:14-53, which
    wires "nats" and "loki" checks). Spark-native components:

      - "spark":   the session/context is alive and schedulable
      - "sinks":   the sink base path is writable and lineage is readable
                   (the Loki-connectivity analog)
      - "streams": every active streaming query is healthy (no exception)

    Serve it from any HTTP frontend; here it is a pure function so tests
    and the driver can call it directly."""
    checks: dict[str, dict] = {}

    try:
        sc = spark.sparkContext
        alive = not sc._jsc.sc().isStopped()  # noqa: SLF001
        checks["spark"] = {
            "status": "up" if alive else "down",
            "detail": f"defaultParallelism={sc.defaultParallelism}",
        }
    except Exception as e:  # noqa: BLE001
        checks["spark"] = {"status": "down", "detail": str(e)}

    if base_path is not None:
        try:
            os.makedirs(os.path.join(base_path, "_lineage"), exist_ok=True)
            committed = committed_ranges(base_path)
            checks["sinks"] = {
                "status": "up",
                "detail": f"{len(committed)} ranges committed",
            }
        except OSError as e:
            checks["sinks"] = {"status": "down", "detail": str(e)}

    bad = []
    try:
        active = spark.streams.active
        for q in active:
            if q.exception() is not None:
                bad.append(q.name or q.id)
        checks["streams"] = {
            "status": "down" if bad else "up",
            "detail": f"{len(active)} active" + (f", failed: {bad}" if bad else ""),
        }
        # the reference's "entry too far behind" lost-entry accounting
        # (lokishipper.go:183-188): rows dropped older than watermark.
        # ADVISORY metric in its own guard — a progress-read failure on one
        # handle must not flip a healthy component to "down"
        try:
            from logunifier_spark.streaming.stream import dead_letter_count
            checks["streams"]["dead_letter_rows"] = sum(
                dead_letter_count(q) for q in active)
        except Exception:  # noqa: BLE001
            checks["streams"]["dead_letter_rows"] = None
    except Exception as e:  # noqa: BLE001
        checks["streams"] = {"status": "down", "detail": str(e)}

    status = "up" if all(c["status"] == "up" for c in checks.values()) else "down"
    return {"status": status, "details": checks}


def emit_run_metrics(base_path: str, out_file: str | None = None) -> dict:
    """Aggregate all range manifests into the run-level parse/route/sink
    metrics JSON (the A4 metrics surface)."""
    metrics: dict = {"ranges": 0, "routed_rows": 0, "sinks": {}, "patterns": {},
                     "wall_sec": 0.0}
    d = os.path.join(base_path, "_lineage")
    if os.path.isdir(d):
        for f in sorted(os.listdir(d)):
            if not f.endswith(".json"):
                continue
            with open(os.path.join(d, f)) as fh:
                m = json.load(fh)
            metrics["ranges"] += 1
            metrics["routed_rows"] += m["routed_rows"]
            metrics["wall_sec"] += m["wall_sec"]
            for k, v in m["sinks"].items():
                metrics["sinks"][k] = metrics["sinks"].get(k, 0) + v
            for k, v in m["patterns"].items():
                metrics["patterns"][k] = metrics["patterns"].get(k, 0) + v
    out_file = out_file or os.path.join(base_path, "run_metrics.json")
    with open(out_file, "w") as fh:
        json.dump(metrics, fh, indent=2)
    return metrics
