"""Conversation-level operators over multi-turn transcripts.

The pipeline's row unit is a TURN; training-data and analytics consumers
also need the CONVERSATION as a unit — stats for filtering (turn counts,
role mix, span), and ordered stitching for context assembly. Both are
single hash aggregates over conv_id: partial aggregation reduces map-side
to one row per (conv, partition) before the exchange, so at 10^12 turns
the shuffle carries the conversation set, not the turn set. Stitching
aggregates an (turn_idx, text) struct array and sorts per group AFTER the
aggregate (array_sort over the collected array) rather than pre-sorting
rows — no global sort, no window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def conversation_stats(df: DataFrame) -> DataFrame:
    """(conv_id, n_turns, n_roles, first_ts, last_ts, total_chars,
    agent_turns) — the per-conversation filter features (length band,
    role balance, time span)."""
    return df.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.count_distinct("role").alias("n_roles"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("total_chars"),
        F.count(F.when(F.col("role") == "agent", 1)).alias("agent_turns"),
    )


def stitch_conversations(df: DataFrame, sep: str = "\n") -> DataFrame:
    """(conv_id, n_turns, conversation) — turns concatenated in stable
    (turn_idx) order. collect_list order is partition-arbitrary, so the
    struct array is sorted INSIDE the group after collection (struct
    comparison is field-ordinal, turn_idx first) — deterministic without
    a window or a global sort. Memory bound: one conversation's turns
    must fit an executor's aggregation buffer — at transcript shapes
    (10^2-10^4 turns/conv) that is KBs to MBs; pathological conversations
    should be length-capped upstream."""
    collected = F.array_sort(F.collect_list(
        F.struct(F.col("turn_idx"), F.coalesce(F.col("text"), F.lit("")).alias("t"))))
    return (df.groupBy("conv_id")
              .agg(F.count("*").alias("n_turns"),
                   F.array_join(F.transform(collected, lambda s: s["t"]), sep)
                    .alias("conversation")))
