"""Ordered-event funnel completion and cohort retention.

The reference's consumers chart event streams in Grafana; the two rollups
every such deployment eventually asks of its unified event table are
"how far do users get through an ordered flow" (funnel) and "of the users
first seen in week W, how many are still active in week W+k" (retention).
Both are pure relational shapes — no sessionization state, no UDFs.

Funnel semantics (earliest-completion): a user reaches step 1 at the
timestamp of their first step-1 event; they reach step i>1 at their first
step-i event STRICTLY AFTER the step-(i-1) reach time. Strict `>` means
two steps cannot be satisfied by one instant; the comparison is on int64
epoch micros, so the result is deterministic under any partitioning and
exactly reproducible in a SQL oracle (no float time math).

Scale shape: the event table is scanned once per step with a
filter-pushdown on the step's event type; each step is one user-keyed
hash aggregate plus one user-keyed join against the reach frame. The
reach frame holds ONE ROW PER USER that reached step 1 — orders of
magnitude smaller than the event table — so at cluster scale AQE turns
these into broadcast joins; every shuffle that does occur is on the same
user key, and the aggregate is map-side combinable. Steps are sequential
by definition (step i's filter depends on step i-1's time) — the k-1
round-trips are inherent to the semantics, not an implementation choice,
and k is small (3-6) in practice.

Retention: one aggregate finds each user's first-activity bucket
(cohort), one distinct reduces events to (user, active-bucket) pairs,
one join tags activity with its cohort, one final aggregate counts. All
bucket math is `us - us mod w` int64 (see timeseries.py for why doubles
are wrong here); offsets divide exactly because both operands are
multiples of the bucket width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logunifier_spark.operators.temporal import _ts_micros


def funnel_reach(events: DataFrame, steps: list[str],
                 user: str = "user_id", etype: str = "event_type",
                 ts: str = "ts") -> DataFrame:
    """Per-user earliest funnel completion over `steps` (ordered event
    types). Returns one row per user that reached step 1:
    (user, steps_completed INT, t1_us..tk_us BIGINT nullable) — tN_us is
    the epoch-micros reach time of step N, null once the funnel stalls.
    """
    if len(steps) < 2:
        raise ValueError(f"funnel needs >= 2 steps, got {steps!r}")
    e = events.select(F.col(user).alias("user"),
                      F.col(etype).alias("_t"),
                      _ts_micros(events, ts).alias("_us"))
    reach = (e.where(F.col("_t") == steps[0])
              .groupBy("user").agg(F.min("_us").alias("t1_us")))
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t{i - 1}_us"
        nxt = (e.where(F.col("_t") == step)
                .join(reach.select("user", prev).where(
                    F.col(prev).isNotNull()), "user")
                .where(F.col("_us") > F.col(prev))
                .groupBy("user").agg(F.min("_us").alias(f"t{i}_us")))
        reach = reach.join(nxt, "user", "left")
    done = sum((F.col(f"t{i}_us").isNotNull().cast("int")
                for i in range(1, len(steps) + 1)), F.lit(0))
    return reach.select(F.col("user"), done.alias("steps_completed"),
                        *[f"t{i}_us" for i in range(1, len(steps) + 1)])


def funnel_counts(events: DataFrame, steps: list[str],
                  user: str = "user_id", etype: str = "event_type",
                  ts: str = "ts") -> DataFrame:
    """Funnel summary: (step INT, event_type STRING, users BIGINT) —
    how many users reached each step. Monotone non-increasing by
    construction."""
    reach = funnel_reach(events, steps, user=user, etype=etype, ts=ts)
    # one aggregate over the per-user frame, then unpivot — a single job,
    # not one count job per step
    agg = reach.agg(*[F.count(F.col(f"t{i}_us")).alias(f"_c{i}")
                      for i in range(1, len(steps) + 1)])
    rows = [F.struct(F.lit(i).alias("step"), F.lit(s).alias("event_type"),
                     F.col(f"_c{i}").alias("users"))
            for i, s in enumerate(steps, start=1)]
    return (agg.select(F.explode(F.array(*rows)).alias("r"))
               .select("r.step", "r.event_type", "r.users"))


def cohort_retention(events: DataFrame, user: str = "user_id",
                     ts: str = "ts",
                     bucket_s: int = 7 * 24 * 3600) -> DataFrame:
    """Cohort retention matrix: (cohort_us BIGINT, week_offset INT,
    n_users BIGINT). `cohort_us` is the start (epoch micros) of the
    bucket holding the user's FIRST event; a row says n_users of that
    cohort had at least one event in bucket cohort + offset. offset 0
    rows equal the cohort sizes."""
    w = int(bucket_s) * 1_000_000
    us = _ts_micros(events, ts)
    e = events.select(F.col(user).alias("user"),
                      (us - F.pmod(us, F.lit(w))).alias("_bucket"))
    first = e.groupBy("user").agg(F.min("_bucket").alias("cohort_us"))
    active = e.distinct()
    j = active.join(first, "user")
    offset = ((F.col("_bucket") - F.col("cohort_us")) / F.lit(w)) \
        .cast("int")
    return (j.groupBy("cohort_us", offset.alias("week_offset"))
             .agg(F.countDistinct("user").alias("n_users")))
