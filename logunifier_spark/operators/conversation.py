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
from pyspark.sql.window import Window


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


#: explicit tool-call schema: agent transcripts carry tool invocations as
#: JSON strings; parsing them with a declared schema (not schema
#: inference) keeps the scan single-pass and the plan stable as payloads
#: drift. Unknown fields are ignored; missing fields are null.
TOOL_CALL_SCHEMA = ("struct<fn:string,"
                    " args:struct<q:string, url:string, top_k:int>,"
                    " ms:bigint>")


def tool_call_stats(df: DataFrame, col: str = "tool_json") -> DataFrame:
    """Per-function rollup of a JSON tool-call column: (fn, n_calls,
    sum_ms, max_top_k, n_with_query). Malformed JSON and calls without a
    `fn` field land in the '_unparsed' bucket — from_json in PERMISSIVE
    mode yields an all-null struct for garbage (it never throws), so the
    single coalesce classifies both cases and a poisoned row can never
    kill the job. One JVM-side Jackson parse (no Python), one hash
    aggregate with map-side combine keyed by the tool-function
    vocabulary (tiny)."""
    c = F.from_json(F.col(col), TOOL_CALL_SCHEMA)
    d = df.select(c.alias("c"))
    return (d.groupBy(F.coalesce(F.col("c.fn"), F.lit("_unparsed"))
                       .alias("fn"))
             .agg(F.count("*").alias("n_calls"),
                  F.sum("c.ms").alias("sum_ms"),
                  F.max("c.args.top_k").alias("max_top_k"),
                  F.count("c.args.q").alias("n_with_query")))


def turn_context(df: DataFrame, k: int = 3, sep: str = "\n") -> DataFrame:
    """Per-turn training context: each turn with its previous `k` turns
    concatenated in order (the SFT example-assembly primitive). A window
    partitioned by conv_id — the sort is PER CONVERSATION after the hash
    shuffle on conv_id, never global; skew bound is the longest single
    conversation, same bound as any per-conv operator here."""
    if k < 1:
        raise ValueError(f"turn_context needs k >= 1 prior turns, got {k}")
    w = (Window.partitionBy("conv_id").orderBy("turn_idx")
               .rowsBetween(-k, -1))
    ctx = F.array_join(
        F.collect_list(F.coalesce(F.col("text"), F.lit(""))).over(w), sep)
    return df.select("conv_id", "turn_idx", "text",
                     ctx.alias("context"))


def response_pairs(df: DataFrame, prompt_role: str = "user",
                   response_role: str = "agent") -> DataFrame:
    """Adjacent (prompt_role → response_role) turn pairs — the
    instruction-tuning pair extractor. lag() over the same per-conv
    window; only immediate successions qualify (a run of same-role turns
    yields no pair, matching the strict-alternation convention)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    out = df.select(
        "conv_id", "turn_idx",
        F.col("role"), F.col("text"),
        F.lag("role").over(w).alias("_prev_role"),
        F.lag("text").over(w).alias("_prev_text"),
        F.lag("turn_idx").over(w).alias("prompt_turn_idx"),
    )
    return (out.where((F.col("role") == response_role)
                      & (F.col("_prev_role") == prompt_role))
               .select("conv_id", "prompt_turn_idx",
                       F.col("_prev_text").alias("prompt"),
                       F.col("turn_idx").alias("response_turn_idx"),
                       F.col("text").alias("response")))


def conversation_qc(df: DataFrame) -> DataFrame:
    """Transcript structural QC — the gate before a conversation enters
    an SFT set: per conv_id, (n_turns, n_gaps: turn_idx jumps > 1,
    n_role_repeats: consecutive same-role turns, n_empty: null/empty
    text, first_idx, dup_turn_idx: count of duplicated turn ordinals,
    clean BOOLEAN: all of the above zero and the ordinals start at 0).
    One per-conv window (lag over turn_idx order — the same shuffle
    every per-conv operator here rides) + one hash aggregate on the
    window's partitioning."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    d = df.select(
        "conv_id", "turn_idx", "role",
        F.coalesce(F.col("text"), F.lit("")).alias("_t"),
        F.lag("turn_idx").over(w).alias("_pidx"),
        F.lag("role").over(w).alias("_prole"))
    gap = ((F.col("turn_idx") - F.col("_pidx")) > 1).cast("long")
    rep = (F.col("role") == F.col("_prole")).cast("long")
    dup = (F.col("turn_idx") == F.col("_pidx")).cast("long")
    agg = (d.groupBy("conv_id")
            .agg(F.count("*").alias("n_turns"),
                 F.coalesce(F.sum(gap), F.lit(0)).alias("n_gaps"),
                 F.coalesce(F.sum(rep), F.lit(0)).alias("n_role_repeats"),
                 F.sum((F.length("_t") == 0).cast("long")).alias("n_empty"),
                 F.min("turn_idx").alias("first_idx"),
                 F.coalesce(F.sum(dup), F.lit(0)).alias("dup_turn_idx")))
    clean = ((F.col("n_gaps") == 0) & (F.col("n_role_repeats") == 0)
             & (F.col("n_empty") == 0) & (F.col("first_idx") == 0)
             & (F.col("dup_turn_idx") == 0))
    return agg.withColumn("clean", clean)
