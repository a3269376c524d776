"""Custom stateful streaming operator: multi-part message reassembly.

The batch pipeline reassembles journald CONTAINER_PARTIAL_* fragments with
a groupBy (operators/multiline.py, reference journald.go:110-133). In
streaming, fragments of one message can arrive in DIFFERENT micro-batches —
a per-batch groupBy cannot join them. This operator holds open fragment
groups in Spark-managed keyed state via `applyInPandasWithState`
(SURVEY.md §2.9 / north-star "custom stateful operators"):

  - key: partial_id (the fragment-group id)
  - state: the parts seen so far (ordinals, messages, per-part metadata)
  - emit: when the `partial_last` fragment arrives — assembled message with
    the FINAL part's metadata (same contract as the batch operator)
  - timeout: groups whose last fragment never arrives are dropped after
    `timeout_ms` of processing time (the batch operator's orphan-drop,
    expressed as state TTL)

State lives in the streaming checkpoint: an assembly interrupted by a
restart resumes with its accumulated fragments intact (the test appends
the closing fragment after a full stop/start cycle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

ASSEMBLED_SCHEMA = StructType([
    StructField("message", StringType()),
    StructField("svc", StringType()),
])

_STATE_SCHEMA = StructType([
    StructField("ords", ArrayType(IntegerType())),
    StructField("msgs", ArrayType(StringType())),
    StructField("svcs", ArrayType(StringType())),
])


def stream_reassemble_partials(parts: DataFrame,
                               timeout_ms: int | None = 60_000) -> DataFrame:
    """parts (streaming DF with partial_id, partial_ordinal, partial_last,
    message, svc) → streaming DF of assembled (message, svc). Rows with a
    null/empty partial_id are whole messages and pass through untouched.

    `timeout_ms` is the orphan-group TTL (state for a group whose last
    fragment never arrives is dropped — bounds state size on a lossy
    ingress). Caveat observed on Spark 4.1: with ProcessingTimeTimeout an
    `availableNow` query keeps scheduling empty micro-batches until every
    pending timeout has fired, so it does not terminate promptly on bounded
    input — pass timeout_ms=None (NoTimeout) for run-to-completion batch
    drains, and a TTL for continuous triggers."""
    is_part = F.col("partial_id").isNotNull() & (F.col("partial_id") != "")
    whole = (parts.where(~is_part)
                  .select("message", "svc"))

    def assemble_with_ttl(key, pdf_iter, state: GroupState):
        # bind the configured TTL (closure over timeout_ms)
        if state.hasTimedOut:
            state.remove()
            return
        import pandas as pd
        ords, msgs, svcs = state.get if state.exists else ([], [], [])
        ords, msgs, svcs = list(ords), list(msgs), list(svcs)
        has_last = False
        for pdf in pdf_iter:
            for row in pdf.itertuples(index=False):
                ords.append(int(row.partial_ordinal))
                msgs.append(row.message)
                svcs.append(row.svc)
                if bool(row.partial_last):
                    has_last = True
        if has_last:
            order = sorted(range(len(ords)), key=lambda i: ords[i])
            state.remove()
            yield pd.DataFrame({
                "message": ["".join(msgs[i] for i in order)],
                "svc": [svcs[order[-1]]],
            })
        else:
            state.update((ords, msgs, svcs))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)

    # sanitize JVM-side BEFORE the python state fn: a null ordinal/message
    # would raise inside applyInPandasWithState, and a failed micro-batch
    # replays forever from the checkpoint — one malformed row must not be
    # able to wedge the stream
    assembled = (parts.where(is_part)
                 .select("partial_id",
                         F.coalesce(F.col("partial_ordinal").cast("int"),
                                    F.lit(0)).alias("partial_ordinal"),
                         F.coalesce(F.col("partial_last").cast("boolean"),
                                    F.lit(False)).alias("partial_last"),
                         F.coalesce(F.col("message"), F.lit("")).alias("message"),
                         F.coalesce(F.col("svc"), F.lit("")).alias("svc"))
                 .groupBy("partial_id")
                 .applyInPandasWithState(
                     assemble_with_ttl,
                     outputStructType=ASSEMBLED_SCHEMA,
                     stateStructType=_STATE_SCHEMA,
                     outputMode="append",
                     timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout
                                  if timeout_ms is not None
                                  else GroupStateTimeout.NoTimeout)))
    return assembled.unionByName(whole)
