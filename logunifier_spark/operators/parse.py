"""The vectorized parse core: one Arrow-batched pandas UDF.

Re-creates the extractor chain of the reference
(/root/reference/pkg/patterns/patternfactory.go:113-165 dispatch,
patternGrokTsLevelMsg.go:16-105, patternLogfmt.go:18-170,
patternDefault.go) as a single pandas UDF over (text, pattern_key):

  - grok keys (TsLevelMsg / Envoy / Traefik) are extracted with
    pd.Series.str.extract against the per-executor-compiled regex bank —
    zero per-row Python;
  - LogFmt rows run the stateful tokenizer per row *within* the Arrow batch
    (the tokenizer is order-dependent; only logfmt rows pay);
  - Nop copies the raw message and pins level=unknown;
  - Clf / Unknown (unmapped keys) reproduce the factory's default branch:
    parse error + Nop behavior (patternfactory.go:156-163);
  - Ecs rows are untouched here — the native from_json branch in
    pipeline.py handles them.

Timestamp strings from all rows are normalized in one vectorized pass
(functions/timeparse.py).  The UDF returns a struct; everything downstream
is native Spark SQL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from logunifier_spark.functions import grok, logfmt
from logunifier_spark.functions.levels import STRING_TO_LEVEL
from logunifier_spark.functions.timeparse import parse_series

GROK_KEYS = ("TsLevelMsg", "Envoy", "Traefik")

PARSE_RESULT_SCHEMA = StructType([
    StructField("ts", TimestampType()),          # parsed event ts (None = keep fallback)
    StructField("message", StringType()),        # None = extractor did not touch
    StructField("level", StringType()),          # canonical name; None = untouched
    StructField("labels", MapType(StringType(), StringType())),
    StructField("origin_file", StringType()),
    StructField("origin_line", StringType()),
    StructField("error_message", StringType()),  # logfmt `error` key
    StructField("trace_id", StringType()),
    StructField("span_id", StringType()),
    StructField("parse_error", StringType()),    # ProcessError.Reason contribution
])

_COLS = [f.name for f in PARSE_RESULT_SCHEMA.fields]


def _empty_result(index) -> pd.DataFrame:
    out = pd.DataFrame(index=index, columns=_COLS, dtype="object")
    out["labels"] = [dict() for _ in range(len(index))]
    return out


def _map_level(raw: pd.Series) -> pd.Series:
    """StringToLogLevel (model/utils.go:13-20): lowercase alias lookup,
    miss -> unknown. Input NaN stays NaN (level untouched)."""
    lowered = raw.str.lower()
    mapped = lowered.map(STRING_TO_LEVEL)
    return mapped.where(raw.isna() | mapped.notna(), "unknown")


def _parse_grok_block(out: pd.DataFrame, texts: pd.Series, key: str,
                      ts_strings: dict, ts_err_fmt: dict) -> None:
    ext = texts.str.extract(grok.compiled(key))
    matched = ext["timestamp"].notna()

    # message(): found -> captured; missing -> raw + error
    msg = ext["message"] if "message" in ext else pd.Series(pd.NA, index=ext.index)
    out.loc[texts.index, "message"] = msg.where(matched, texts)

    # logInfo(): level, origin+originline (Traefik)
    if "level" in ext:
        out.loc[texts.index, "level"] = _map_level(ext["level"])
    if "origin" in ext.columns and "originline" in ext.columns:
        both = ext["origin"].notna() & ext["originline"].notna()
        out.loc[ext.index[both], "origin_file"] = ext.loc[both, "origin"]
        out.loc[ext.index[both], "origin_line"] = ext.loc[both, "originline"]

    # leftover registered keys -> labels["pattern_"+k]
    # (patternGrokTsLevelMsg.go:96-104; only `thread` can remain)
    if "thread" in ext.columns:
        has_thread = ext["thread"].notna()
        for i in ext.index[has_thread]:
            out.at[i, "labels"]["pattern_thread"] = ext.at[i, "thread"]

    # timeStamp(): collect for the batch-wide vectorized parse
    for i in ext.index[matched]:
        ts_strings[i] = ext.at[i, "timestamp"]
        ts_err_fmt[i] = "Can't find timestamp for {s}"

    # unmatched rows: errors in chain order (timeStamp -> message)
    for i in ext.index[~matched]:
        out.at[i, "parse_error"] = "Can't find timestamp\nCan't find a message"


def _parse_logfmt_block(out: pd.DataFrame, texts: pd.Series,
                        ts_strings: dict, ts_err_fmt: dict) -> None:
    for i, raw in texts.items():
        kv, errs = logfmt.decode(raw if isinstance(raw, str) else "")
        # chain order (types.go:68-84): from -> timeStamp -> message ->
        # errorInfo -> logInfo(caller, level) -> tracingInfo -> extract.
        # userInfo/eventInfo are NOT in the chain (verbatim reference quirk):
        # user/event keys spill to labels.
        if logfmt.KEY_TS in kv:
            ts_strings[i] = kv.pop(logfmt.KEY_TS)
            ts_err_fmt[i] = "Can't find timestamp for {s}"
        if logfmt.KEY_MSG in kv:
            out.at[i, "message"] = kv.pop(logfmt.KEY_MSG)
        if logfmt.KEY_ERROR in kv:
            out.at[i, "error_message"] = kv.pop(logfmt.KEY_ERROR)
        if logfmt.KEY_CALLER in kv:
            caller = kv.pop(logfmt.KEY_CALLER)
            split = caller.split(":")
            out.at[i, "origin_file"] = split[0]
            # line only when exactly file:line (patternLogfmt.go:96-101)
            out.at[i, "origin_line"] = split[1] if len(split) == 2 else "-1"
        if logfmt.KEY_LEVEL in kv:
            lvl = kv.pop(logfmt.KEY_LEVEL)
            out.at[i, "level"] = STRING_TO_LEVEL.get(lvl.lower(), "unknown")
        if logfmt.KEY_TRACE_ID in kv:
            out.at[i, "trace_id"] = kv.pop(logfmt.KEY_TRACE_ID)
            # spanID removed only together with traceID (patternLogfmt.go:144-158)
            out.at[i, "span_id"] = kv.pop(logfmt.KEY_SPAN_ID, None)
        # ALL remaining keys spill (patternLogfmt.go:161-169)
        if kv:
            labels = out.at[i, "labels"]
            for k, v in kv.items():
                labels["logfmt_" + k] = v
        if errs:
            out.at[i, "parse_error"] = "\n".join(errs)


def parse_batch(text: pd.Series, pattern_key: pd.Series) -> pd.DataFrame:
    """One Arrow batch through the extractor bank. Pure function of its
    inputs — shared by the pandas UDF and by unit tests."""
    texts = text.fillna("")
    out = _empty_result(text.index)
    ts_strings: dict = {}
    ts_err_fmt: dict = {}

    for key in GROK_KEYS:
        mask = pattern_key == key
        if mask.any():
            _parse_grok_block(out, texts[mask], key, ts_strings, ts_err_fmt)

    lf_mask = pattern_key == "LogFmt"
    if lf_mask.any():
        _parse_logfmt_block(out, texts[lf_mask], ts_strings, ts_err_fmt)

    nop_mask = pattern_key == "Nop"
    if nop_mask.any():
        out.loc[nop_mask, "message"] = texts[nop_mask]
        out.loc[nop_mask, "level"] = "unknown"

    # factory default branch: unmapped enum keys (Clf / Unknown) ->
    # parse error + Nop behavior (patternfactory.go:156-163)
    known = list(GROK_KEYS) + ["LogFmt", "Nop", "Ecs"]
    unmapped = ~pattern_key.isin(known) & pattern_key.notna()
    if unmapped.any():
        out.loc[unmapped, "message"] = texts[unmapped]
        out.loc[unmapped, "level"] = "unknown"
        for i in pattern_key.index[unmapped]:
            err = (f"The identified PatternKey {pattern_key.at[i]} by the "
                   f"ingress is not mapped to a pattern extractor")
            prev = out.at[i, "parse_error"]
            out.at[i, "parse_error"] = err if prev is None or pd.isna(prev) else f"{prev}\n{err}"

    # one vectorized timestamp pass for the whole batch
    if ts_strings:
        ser = pd.Series(ts_strings, dtype="object")
        parsed = parse_series(ser)
        ok = parsed.notna()
        out.loc[parsed.index[ok], "ts"] = parsed[ok]
        for i in parsed.index[~ok]:
            # timeStamp() runs right after from() in the chain: the ts error
            # is appended after any decode error (logfmt) and there can be no
            # earlier error for grok-matched rows
            err = ts_err_fmt[i].format(s=ts_strings[i])
            prev = out.at[i, "parse_error"]
            out.at[i, "parse_error"] = err if prev is None or pd.isna(prev) else f"{prev}\n{err}"

    # pandas object columns with pd.NA confuse Arrow; normalize to None
    for c in _COLS:
        if c not in ("labels", "ts"):
            out[c] = out[c].where(out[c].notna(), None)
    out["ts"] = pd.to_datetime(out["ts"], utc=True, errors="coerce")
    return out


parse_turns = F.pandas_udf(parse_batch, returnType=PARSE_RESULT_SCHEMA)
