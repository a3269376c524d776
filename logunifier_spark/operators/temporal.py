"""Temporal operators: as-of join and gap sessionization.

The reference correlates log entries by time everywhere it matters —
multi-part reassembly stitches fragments to their lead line by
CONTAINER_ID + ordinal (internal/streams/ingress/journald.go, the
multiline buffer), and the dedup window keys entries to the most recent
prior occurrence inside a 5-minute horizon
(internal/bootstrap/streamcfg.go:30). Both are "match this row to the
nearest earlier row of another stream" problems. This module provides the
two general-purpose forms a transcript/telemetry corpus needs at scale:

- `asof_join` — for each left row, the single right row with the same key
  and the greatest timestamp <= the left row's (direction="backward";
  "forward" = smallest timestamp >=). Spark has no native as-of join;
  the classic distributed formulation used here is union → single hash
  shuffle on the key → one window sort → last(payload, ignorenulls).
  Cost is ONE exchange + ONE sort over |L|+|R| rows — no join explosion,
  no per-key Python (contrast pandas merge_asof inside applyInPandas,
  which ships both tables through Arrow and buffers each key group in
  Python memory). Skew caveat: a hot KEY is one window partition, same
  bound as any keyed window; if one key dominates, pre-split it by a
  coarse time bucket and stitch the bucket boundaries.

- `sessionize` / `session_stats` — gap-based session assignment
  (a new session starts when the inter-event gap exceeds `gap_s`), the
  standard event-stream segmentation. One hash shuffle on the key, one
  sort; the lag and the running sum share the same window spec so
  Catalyst plans a single exchange+sort with two Window nodes on top.
  `session_stats` then partial-aggregates per (key, session), so the
  post-window reduction is map-side combinable.

Both operators are deterministic under retries: ordering keys are
(ts, tiebreak) with caller-supplied total tiebreaks, never rand() or
monotonically_increasing_id().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

_SIDE = "_asof_side"
_PAYLOAD = "_asof_payload"


def _ts_micros(df: DataFrame, ts: str) -> Column:
    """Timestamp column as int64 micros (timestamps via unix_micros,
    numerics passed through) — one comparable axis for gap/tolerance math."""
    dt = df.schema[ts].dataType
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return F.unix_micros(F.col(ts).cast("timestamp"))
    return F.col(ts).cast("long")


def asof_join(left: DataFrame, right: DataFrame, on: list[str] | str,
              ts: str = "ts", direction: str = "backward",
              tolerance_us: int | None = None,
              tiebreak: str | None = None,
              matched_ts: str = "matched_ts") -> DataFrame:
    """Left as-of join: every left row, plus the payload columns of the
    single best right row with equal `on` keys and `ts` on the `direction`
    side (inclusive). Unmatched (or out-of-`tolerance_us`) left rows keep
    nulls in the right columns — left rows are never dropped or duplicated.

    direction="backward": best = greatest right ts <= left ts (ties on
    right ts broken toward the LARGEST `tiebreak`);
    direction="forward": best = smallest right ts >= left ts (ties toward
    the SMALLEST `tiebreak`). If (key, ts) is not unique on the right,
    pass `tiebreak` (any totally-ordering right column) for a
    deterministic result.

    Physical plan: tag both inputs, unionByName, hash-partition by `on`,
    ONE window sort by (ts, side[, tiebreak]), last(payload, ignorenulls)
    over rows unbounded-preceding — then keep the left rows. The right
    side sorts rights BEFORE lefts at equal ts, which is what makes the
    join inclusive.

    Null semantics: right rows with a null ts are dropped (they order
    before everything and would otherwise match every left row); left
    rows with a null ts are kept but never match; null join keys group
    with each other (window partitioning), unlike an SQL equi-join —
    filter them upstream if join semantics are required.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns
                    if c not in keys and c != ts and c != tiebreak]
    collide = (set(payload_cols) | {matched_ts}) & set(left.columns)
    if collide:
        raise ValueError(f"right payload collides with left columns: {sorted(collide)}")

    r = right.where(F.col(ts).isNotNull()).select(
        *keys, ts,
        *([tiebreak] if tiebreak else []),
        F.lit(0).alias(_SIDE),
        F.struct(F.col(ts).alias("_rts"),
                 *[F.col(c) for c in payload_cols]).alias(_PAYLOAD),
    )
    payload_type = r.schema[_PAYLOAD].dataType.simpleString()
    l = left.select(
        "*", F.lit(1).alias(_SIDE),
        F.lit(None).cast(payload_type).alias(_PAYLOAD),
        *([F.lit(None).cast(right.schema[tiebreak].dataType).alias(tiebreak)]
          if tiebreak and tiebreak not in left.columns else []),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    # backward scans time ascending; forward scans descending (so "last
    # preceding in scan order" = "first following in time"). Rights sort
    # before lefts at equal ts either way -> inclusive bounds.
    if direction == "backward":
        order = [F.col(ts).asc(), F.col(_SIDE).asc()] + \
            ([F.col(tiebreak).asc_nulls_first()] if tiebreak else [])
    else:
        order = [F.col(ts).desc(), F.col(_SIDE).asc()] + \
            ([F.col(tiebreak).desc_nulls_first()] if tiebreak else [])
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (u.withColumn("_m", F.last(_PAYLOAD, ignorenulls=True).over(w))
                .where(F.col(_SIDE) == 1))

    # a null left ts is unmatchable in EITHER direction: backward sorts it
    # before all rights (no running payload yet) but forward's ts.desc()
    # sorts it after them, where it would pick up the running last() —
    # gate explicitly rather than rely on sort-order luck
    valid = F.col("_m").isNotNull() & F.col(ts).isNotNull()
    if tolerance_us is not None:
        lt = _ts_micros(matched, ts)
        rt = F.unix_micros(F.col("_m._rts").cast("timestamp")) \
            if isinstance(right.schema[ts].dataType,
                          (TimestampType, TimestampNTZType)) \
            else F.col("_m._rts").cast("long")
        delta = (lt - rt) if direction == "backward" else (rt - lt)
        valid = valid & (delta <= F.lit(int(tolerance_us)))

    out_cols = [F.col(c) for c in left.columns]
    out_cols.append(F.when(valid, F.col("_m._rts")).alias(matched_ts))
    out_cols += [F.when(valid, F.col(f"_m.{c}")).alias(c) for c in payload_cols]
    return matched.select(*out_cols)


def sessionize(df: DataFrame, key: list[str] | str, ts: str = "ts",
               gap_s: float = 1800.0, tiebreak: str | None = None,
               session_col: str = "session_id") -> DataFrame:
    """Assign a per-key session index (0-based, dense, in time order): a
    new session starts when the gap since the key's previous event
    exceeds `gap_s` seconds. Adds `session_col` (bigint); row set and
    all other columns pass through unchanged.

    Equivalent to Spark's streaming session_window() segmentation, but
    batch-exact and with a stable per-key index usable as a join/group
    key. Pass `tiebreak` when (key, ts) is not unique so the running sum
    is deterministic.
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(ts).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w_row = Window.partitionBy(*keys).orderBy(*order)
    w_cum = w_row.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t = _ts_micros(df, ts)
    gap_us = int(gap_s * 1_000_000)
    # first event of a key: lag is null -> coalesce to 0 (not a new-session
    # increment; sessions are 0-based)
    new_sess = F.coalesce(
        (t - F.lag(t).over(w_row) > F.lit(gap_us)).cast("long"), F.lit(0))
    return df.withColumn(session_col, F.sum(new_sess).over(w_cum))


def session_stats(df: DataFrame, key: list[str] | str, ts: str = "ts",
                  gap_s: float = 1800.0,
                  tiebreak: str | None = None) -> DataFrame:
    """Per-(key, session) roll-up over `sessionize`: event count, first/last
    timestamp, duration in seconds (bigint, floor). The aggregate is
    hash/partial-aggregable, so after the one sessionize sort the
    reduction combines map-side."""
    keys = [key] if isinstance(key, str) else list(key)
    s = sessionize(df, keys, ts=ts, gap_s=gap_s, tiebreak=tiebreak)
    t = _ts_micros(s, ts)
    return (s.groupBy(*keys, "session_id")
             .agg(F.count("*").alias("n_events"),
                  F.min(ts).alias("session_start"),
                  F.max(ts).alias("session_end"),
                  # floor(), not cast: Spark double->long truncates but
                  # DuckDB rounds, so floor is the only portable floor
                  F.floor((F.max(t) - F.min(t)) / F.lit(1_000_000))
                  .cast("long").alias("duration_s")))
