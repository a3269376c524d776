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

Implementation note: the batch works on positional numpy object arrays, not
pandas .at/.loc scalar indexing — profiling showed label-based scalar
get/set dominating batch time (~10 µs/call vs ~0.1 µs for a numpy write).
"""

from __future__ import annotations

import numpy as np
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

_TS_ERR = "Can't find timestamp for {s}"
_GROK_NOMATCH_ERR = "Can't find timestamp\nCan't find a message"


def _obj(series_or_arr) -> np.ndarray:
    """numpy object array with NaN/pd.NA normalized to None."""
    arr = np.asarray(series_or_arr, dtype=object)
    mask = pd.isna(arr)
    if mask.any():
        arr = arr.copy()
        arr[mask] = None
    return arr


def _map_level(raw: pd.Series) -> pd.Series:
    """StringToLogLevel (model/utils.go:13-20): lowercase alias lookup,
    miss -> unknown. Input NaN stays NaN (level untouched)."""
    lowered = raw.str.lower()
    mapped = lowered.map(STRING_TO_LEVEL)
    return mapped.where(raw.isna() | mapped.notna(), "unknown")


_EMPTY_LABELS: dict = {}  # shared read-only sentinel for untouched rows


class _Batch:
    """Positional working state for one Arrow batch."""

    def __init__(self, n: int):
        self.cols = {c: np.full(n, None, dtype=object)
                     for c in _COLS if c != "labels"}
        # labels dicts are allocated lazily via label_dict() — most rows
        # never spill a label, and n dict() allocations per batch measurably
        # slow the UDF; untouched rows share one immutable empty dict
        self.labels = np.full(n, None, dtype=object)
        self.ts_idx: list = []    # positional indices with a ts string
        self.ts_val: list = []    # the raw ts strings

    def label_dict(self, i: int) -> dict:
        d = self.labels[i]
        if d is None:
            d = {}
            self.labels[i] = d
        return d

    def final_labels(self) -> np.ndarray:
        out = self.labels
        out[pd.isna(out)] = _EMPTY_LABELS
        return out


def _parse_grok_rows(b: _Batch, texts: np.ndarray, idx: np.ndarray,
                     key: str) -> None:
    ext = pd.Series(texts[idx]).str.extract(grok.compiled(key))
    matched = ext["timestamp"].notna().to_numpy()

    # message(): found -> captured; missing -> raw + error
    msg = (_obj(ext["message"]) if "message" in ext.columns
           else np.full(idx.size, None, dtype=object))
    b.cols["message"][idx] = np.where(matched, msg, texts[idx])

    # logInfo(): level, origin+originline (Traefik)
    if "level" in ext.columns:
        b.cols["level"][idx] = _obj(_map_level(ext["level"]))
    if "origin" in ext.columns and "originline" in ext.columns:
        both = (ext["origin"].notna() & ext["originline"].notna()).to_numpy()
        b.cols["origin_file"][idx[both]] = _obj(ext["origin"])[both]
        b.cols["origin_line"][idx[both]] = _obj(ext["originline"])[both]

    # leftover registered keys -> labels["pattern_"+k]
    # (patternGrokTsLevelMsg.go:96-104; only `thread` can remain)
    if "thread" in ext.columns:
        th = _obj(ext["thread"])
        for j in np.flatnonzero(th != None):  # noqa: E711 (elementwise)
            b.label_dict(idx[j])["pattern_thread"] = th[j]

    # timeStamp(): collect for the batch-wide vectorized parse
    b.ts_idx.append(idx[matched])
    b.ts_val.append(_obj(ext["timestamp"])[matched])

    # unmatched rows: errors in chain order (timeStamp -> message)
    b.cols["parse_error"][idx[~matched]] = _GROK_NOMATCH_ERR


def _parse_logfmt_rows(b: _Batch, texts: np.ndarray, idx: np.ndarray) -> None:
    c = b.cols
    ts_i, ts_v = [], []
    for i in idx:
        raw = texts[i]
        kv, errs = logfmt.decode(raw if isinstance(raw, str) else "")
        # chain order (types.go:68-84): from -> timeStamp -> message ->
        # errorInfo -> logInfo(caller, level) -> tracingInfo -> extract.
        # userInfo/eventInfo are NOT in the chain (verbatim reference quirk):
        # user/event keys spill to labels.
        if logfmt.KEY_TS in kv:
            ts_i.append(i)
            ts_v.append(kv.pop(logfmt.KEY_TS))
        if logfmt.KEY_MSG in kv:
            c["message"][i] = kv.pop(logfmt.KEY_MSG)
        if logfmt.KEY_ERROR in kv:
            c["error_message"][i] = kv.pop(logfmt.KEY_ERROR)
        if logfmt.KEY_CALLER in kv:
            caller = kv.pop(logfmt.KEY_CALLER)
            split = caller.split(":")
            c["origin_file"][i] = split[0]
            # line only when exactly file:line (patternLogfmt.go:96-101)
            c["origin_line"][i] = split[1] if len(split) == 2 else "-1"
        if logfmt.KEY_LEVEL in kv:
            lvl = kv.pop(logfmt.KEY_LEVEL)
            c["level"][i] = STRING_TO_LEVEL.get(lvl.lower(), "unknown")
        if logfmt.KEY_TRACE_ID in kv:
            c["trace_id"][i] = kv.pop(logfmt.KEY_TRACE_ID)
            # spanID removed only together with traceID (patternLogfmt.go:144-158)
            c["span_id"][i] = kv.pop(logfmt.KEY_SPAN_ID, None)
        # ALL remaining keys spill (patternLogfmt.go:161-169)
        if kv:
            labels = b.label_dict(i)
            for k, v in kv.items():
                labels["logfmt_" + k] = v
        if errs:
            c["parse_error"][i] = "\n".join(errs)
    if ts_i:
        b.ts_idx.append(np.asarray(ts_i, dtype=np.int64))
        b.ts_val.append(np.asarray(ts_v, dtype=object))


def parse_batch(text: pd.Series, pattern_key: pd.Series) -> pd.DataFrame:
    """One Arrow batch through the extractor bank. Pure function of its
    inputs — shared by the pandas UDF and by unit tests."""
    n = len(text)
    texts = _obj(text)
    texts[texts == None] = ""  # noqa: E711 (elementwise fillna)
    keys = np.asarray(pattern_key, dtype=object)
    b = _Batch(n)

    for key in GROK_KEYS:
        idx = np.flatnonzero(keys == key)
        if idx.size:
            _parse_grok_rows(b, texts, idx, key)

    lf_idx = np.flatnonzero(keys == "LogFmt")
    if lf_idx.size:
        _parse_logfmt_rows(b, texts, lf_idx)

    # Nop / unmapped rows copy the raw message and leave level UNTOUCHED —
    # the reference's Nop extractor keeps the MetaLog's fallback level
    # (PRIORITY-derived for journald; absent → unknown downstream), it does
    # not pin one (patternfactory.go:119-121,156-163)
    nop = np.flatnonzero(keys == "Nop")
    if nop.size:
        b.cols["message"][nop] = texts[nop]

    # factory default branch: unmapped enum keys (Clf / Unknown) ->
    # parse error + Nop behavior (patternfactory.go:156-163)
    known = set(GROK_KEYS) | {"LogFmt", "Nop", "Ecs"}
    unmapped = np.flatnonzero(
        ~np.isin(keys, list(known)) & (keys != None))  # noqa: E711
    if unmapped.size:
        b.cols["message"][unmapped] = texts[unmapped]
        pe = b.cols["parse_error"]
        for i in unmapped:
            err = (f"The identified PatternKey {keys[i]} by the "
                   f"ingress is not mapped to a pattern extractor")
            pe[i] = err if pe[i] is None else f"{pe[i]}\n{err}"

    # one vectorized timestamp pass for the whole batch; stays in
    # datetime64 end-to-end (object-array Timestamps cost a per-value
    # box/unbox on both assignment and Arrow conversion)
    ts_col = pd.Series(pd.NaT, index=pd.RangeIndex(n),
                       dtype="datetime64[ns, UTC]")
    if b.ts_idx:
        all_idx = np.concatenate(b.ts_idx)
        all_val = np.concatenate(b.ts_val)
        parsed = parse_series(pd.Series(all_val, dtype="object"))
        ok = parsed.notna().to_numpy()
        ts_col.iloc[all_idx[ok]] = parsed.iloc[np.flatnonzero(ok)]
        pe = b.cols["parse_error"]
        for j in np.flatnonzero(~ok):
            # timeStamp() runs right after from() in the chain: the ts error
            # is appended after any decode error (logfmt) and there can be no
            # earlier error for grok-matched rows
            i = all_idx[j]
            err = _TS_ERR.format(s=all_val[j])
            pe[i] = err if pe[i] is None else f"{pe[i]}\n{err}"

    out = pd.DataFrame(index=pd.RangeIndex(n))
    out["ts"] = ts_col
    for c in _COLS:
        if c == "labels":
            out[c] = b.final_labels()
        elif c != "ts":
            out[c] = b.cols[c]
    # match the declared struct field order
    out = out[_COLS]
    # the UDF contract is the caller's index
    out.index = text.index
    return out


parse_turns = F.pandas_udf(parse_batch, returnType=PARSE_RESULT_SCHEMA)
