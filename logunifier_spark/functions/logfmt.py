"""Logfmt decoder with the reference's trash / msg-promotion semantics.

Re-creates /root/reference/pkg/utils/logfmtutils.go:27-162 (which wraps the
Loki logfmt tokenizer): scan k=v pairs; bare (valueless) words accumulate into
a space-joined "trash" buffer; duplicate keys merge values with a space; if no
kv pair decoded at all the whole line becomes `msg` plus a parse error; if
trash was caught and no `msg` key exists the trash is promoted to `msg`;
key aliases are normalized (ts/timestamp/time/t→ts, msg/message→msg,
err/error→error, traceid/tid→traceID, spanid→spanID, usr/user→user).

Pure Python, stateful per line — called row-wise inside an Arrow-batched
pandas UDF (only logfmt-keyed rows pay this cost; grok rows use vectorized
str.extract)."""

from __future__ import annotations

KEY_TS = "ts"
KEY_LEVEL = "level"
KEY_MSG = "msg"
KEY_CALLER = "caller"
KEY_TRACE_ID = "traceID"
KEY_SPAN_ID = "spanID"
KEY_ERROR = "error"
KEY_USER = "user"
KEY_EVENT = "event"
KEY_TRASH = "trash"

_ALIASES = {
    "ts": KEY_TS, "timestamp": KEY_TS, "time": KEY_TS, "t": KEY_TS,
    "msg": KEY_MSG, "message": KEY_MSG,
    "level": KEY_LEVEL,
    "err": KEY_ERROR, "error": KEY_ERROR,
    "caller": KEY_CALLER,
    "traceid": KEY_TRACE_ID, "tid": KEY_TRACE_ID,
    "spanid": KEY_SPAN_ID,
    "user": KEY_USER, "usr": KEY_USER,
    "event": KEY_EVENT,
}

_UNESCAPE = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\", "/": "/"}


def normalize_key(key: str) -> str:
    """logfmtutils.go:136-162 — alias normalization (case-insensitive)."""
    return _ALIASES.get(key.lower(), key)


def _tokenize(line: str) -> list[tuple[str, str | None]]:
    """Scan (key, value|None) pairs, logfmt-style. value is None for a bare
    word (no '='); quoted values are unescaped and may span newlines."""
    out: list[tuple[str, str | None]] = []
    i, n = 0, len(line)
    while i < n:
        # skip inter-token whitespace
        while i < n and line[i] in " \t\r\n":
            i += 1
        if i >= n:
            break
        # key: run until '=', whitespace or '"'
        k0 = i
        while i < n and line[i] not in ' \t\r\n="':
            i += 1
        key = line[k0:i]
        if i < n and line[i] == "=":
            i += 1
            if i < n and line[i] == '"':
                # quoted value (may contain newlines / escapes)
                i += 1
                buf: list[str] = []
                closed = False
                while i < n:
                    c = line[i]
                    if c == "\\" and i + 1 < n:
                        buf.append(_UNESCAPE.get(line[i + 1], line[i + 1]))
                        i += 2
                        continue
                    if c == '"':
                        i += 1
                        closed = True
                        break
                    buf.append(c)
                    i += 1
                out.append((key, "".join(buf)))
                if not closed:
                    # unterminated quote: keep what we have (lenient)
                    pass
            else:
                v0 = i
                while i < n and line[i] not in " \t\r\n":
                    i += 1
                out.append((key, line[v0:i]))
        elif key:
            out.append((key, None))  # bare word
        else:
            i += 1  # stray '"' etc.
    return out


def _is_key(word: str, rest: str) -> tuple[str, bool]:
    """logfmtutils.go:87-112 — find the first whitespace-field of `rest`
    containing `word`; it is "a key" iff that field contains '='; returns the
    remaining fields re-joined. (Reference shape, kept for unit parity;
    decode() uses the O(1)-amortized pointer scan below instead — calling
    this per token re-splits the remainder and is O(n²) on long lines.)"""
    fields = rest.split()
    for idx, cur in enumerate(fields):
        if word in cur:
            return " ".join(fields[idx + 1:]), "=" in cur
    return rest, False


def decode(line: str) -> tuple[dict[str, str], list[str]]:
    """DecodeLogFmt (logfmtutils.go:27-85). Returns (result, errors);
    errors joined with '\\n' reproduce the Go errors.Join string."""
    errors: list[str] = []
    result: dict[str, str] = {}
    if not line:
        return result, ["empty log not expected"]

    # the isKey scan over a shrinking remainder, without re-splitting the
    # remainder per token (the reference's rest-string shape is O(n²) on
    # long lines — measured 10 s on a 20k-token line; this is linear)
    fields = line.split()
    ptr = 0
    acc: dict[str, list[str]] = {}
    trash: list[str] = []
    for key, value in _tokenize(line):
        found_is_key = False
        for idx in range(ptr, len(fields)):
            if key in fields[idx]:
                ptr = idx + 1
                found_is_key = "=" in fields[idx]
                break
        if value is None and not found_is_key:
            trash.append(normalize_key(key))
        else:
            # duplicate keys merge with a space — accumulate and join once
            acc.setdefault(normalize_key(key), []).append(
                value if value is not None else "")
    result = {k: " ".join(v) for k, v in acc.items()}

    if not result:
        errors.append("could not extract key value pairs")
        result[KEY_MSG] = line
    elif trash:
        if not result.get(KEY_MSG, ""):
            result[KEY_MSG] = " ".join(trash)
            errors.append("is not in logfmt")
        else:
            result[KEY_TRASH] = " ".join(trash)
            errors.append("log fmt trash caught")
    return result, errors
