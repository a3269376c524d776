"""Grok pattern bank → compiled Python regexes (per-executor, compile-once).

Re-creates the reference's pattern bank semantics
(/root/reference/pkg/utils/patternutils.go:38-57, compile-once at
/root/reference/pkg/patterns/patternfactory.go:37-97) on top of Python `re`.

Grok atom definitions below are the standard public grok patterns (the same
set bundled by every grok library: logstash/grok-patterns); custom patterns
mirror the reference's `CustomPatterns` map.

Expansion rules:
  %{NAME:alias} -> (?P<alias>expansion)
  %{NAME}       -> (?:expansion)       (non-capturing; Python re forbids
                                        duplicate group names, and unaliased
                                        captures are never read anyway)
Matching uses re.search (grok ParseString semantics: first match anywhere).

The module-level ``_COMPILED`` cache gives the per-executor compile-once
behavior mandated by the design: each Python worker process compiles the bank
on first use and reuses it for every Arrow batch thereafter.
"""

from __future__ import annotations

import re
from functools import lru_cache

# --- standard grok atoms (public logstash grok-patterns definitions) --------
_BASE_PATTERNS: dict[str, str] = {
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "USER": r"%{USERNAME}",
    "INT": r"(?:[+-]?(?:[0-9]+))",
    # atomic group (?>...) is supported by Python >= 3.11
    "BASE10NUM": r"(?<![0-9.+-])(?>[+-]?(?:(?:[0-9]+(?:\.[0-9]+)?)|(?:\.[0-9]+)))",
    "NUMBER": r"(?:%{BASE10NUM})",
    "WORD": r"\b\w+\b",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "YEAR": r"(?>\d\d){1,2}",
    "MONTH": (
        r"\b(?:Jan(?:uary|uar)?|Feb(?:ruary|ruar)?|M(?:a|ä)?r(?:ch|z)?"
        r"|Apr(?:il)?|Ma(?:y|i)?|Jun(?:e|i)?|Jul(?:y)?|Aug(?:ust)?"
        r"|Sep(?:tember)?|O(?:c|k)?t(?:ober)?|Nov(?:ember)?"
        r"|De(?:c|z)(?:ember)?)\b"
    ),
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:(?:0[1-9])|(?:[12][0-9])|(?:3[01])|[1-9])",
    "HOUR": r"(?:2[0123]|[01]?[0-9])",
    "MINUTE": r"(?:[0-5][0-9])",
    # [:.,] fraction separator set matches the upstream grok SECOND atom
    "SECOND": r"(?:(?:[0-5]?[0-9]|60)(?:[:.,][0-9]+)?)",
    # the (?!<[0-9]) oddity is verbatim from upstream grok-patterns
    "TIME": r"(?!<[0-9])%{HOUR}:%{MINUTE}(?::%{SECOND})(?![0-9])",
    "ISO8601_TIMEZONE": r"(?:Z|[+-]%{HOUR}(?::?%{MINUTE}))",
    "TIMESTAMP_ISO8601": (
        r"%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:?%{MINUTE}"
        r"(?::?%{SECOND})?%{ISO8601_TIMEZONE}?"
    ),
    "HOSTNAME": (
        r"\b(?:[0-9A-Za-z][0-9A-Za-z-]{0,62})"
        r"(?:\.(?:[0-9A-Za-z][0-9A-Za-z-]{0,62}))*(?:\.?|\b)"
    ),
    "IPV4": (
        r"(?<![0-9])(?:(?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5])[.]"
        r"(?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5])[.]"
        r"(?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5])[.]"
        r"(?:[0-1]?[0-9]{1,2}|2[0-4][0-9]|25[0-5]))(?![0-9])"
    ),
    "IPV6": (
        r"(?:(?:(?:[0-9A-Fa-f]{1,4}:){7}(?:[0-9A-Fa-f]{1,4}|:))"
        r"|(?:(?:[0-9A-Fa-f]{1,4}:){6}(?::[0-9A-Fa-f]{1,4}|(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(?:\.(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3})|:))"
        r"|(?:(?:[0-9A-Fa-f]{1,4}:){5}(?:(?:(?::[0-9A-Fa-f]{1,4}){1,2})|:(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(?:\.(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3})|:))"
        r"|(?:(?:[0-9A-Fa-f]{1,4}:){4}(?:(?:(?::[0-9A-Fa-f]{1,4}){1,3})|(?:(?::[0-9A-Fa-f]{1,4})?:(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(?:\.(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}))|:))"
        r"|(?:(?:[0-9A-Fa-f]{1,4}:){3}(?:(?:(?::[0-9A-Fa-f]{1,4}){1,4})|(?:(?::[0-9A-Fa-f]{1,4}){0,2}:(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(?:\.(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}))|:))"
        r"|(?:(?:[0-9A-Fa-f]{1,4}:){2}(?:(?:(?::[0-9A-Fa-f]{1,4}){1,5})|(?:(?::[0-9A-Fa-f]{1,4}){0,3}:(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(?:\.(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}))|:))"
        r"|(?:(?:[0-9A-Fa-f]{1,4}:){1}(?:(?:(?::[0-9A-Fa-f]{1,4}){1,6})|(?:(?::[0-9A-Fa-f]{1,4}){0,4}:(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(?:\.(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}))|:))"
        r"|(?::(?:(?:(?::[0-9A-Fa-f]{1,4}){1,7})|(?:(?::[0-9A-Fa-f]{1,4}){0,5}:(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(?:\.(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}))|:)))(?:%[0-9A-Za-z]+)?"
    ),
    "IP": r"(?:%{IPV6}|%{IPV4})",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "HTTPDATE": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} %{INT}",
    "URIPATH": r"(?:/[A-Za-z0-9$.+!*'(){},~:;=@#%&_\-]*)+",
    "URIPARAM": r"\?[A-Za-z0-9$.+!*'|(){},~@#%&/=:;_?\-\[\]<>]*",
    "URIPATHPARAM": r"%{URIPATH}(?:%{URIPARAM})?",
}

# --- reference custom patterns (patternutils.go:38-57) ----------------------
# ts-format sub-aliases used inside TS (patternutils.go:32-36)
TS_FMT_ISO = "timeFormatIso8001"
TS_FMT_SLASH = "timeFormatYYYY_SLASH"
TS_FMT_APACHE = "timeFormatApacheLog"

_CUSTOM_PATTERNS: dict[str, str] = {
    "MULTILINE": r"((\s)*(.*))*",
    # (?i) scoped per-alternation in Go; Python needs a single scoped group —
    # same language (case-insensitive alternation, same order).
    "LOGLEVEL_KEYWORD": (
        r"((?i:trace|trc|debug|dbg|dbug|info|inf|notice|wrn|warn|warning"
        r"|error|err|alert|fatal|ftl|emerg|emergency|crit|critical))"
    ),
    "TS_YYMMDD_SLASH": r"%{YEAR}/%{MONTHNUM}/%{MONTHDAY} %{TIME}.%{INT:milliseconds}",
    "TS_APACHE_LOG": r"%{MONTHDAY}/%{MONTH}/%{YEAR}:%{HOUR}:%{MINUTE}:%{SECOND} ?%{ISO8601_TIMEZONE}",
    "TS": (
        "%%{TIMESTAMP_ISO8601:%s}|%%{TS_YYMMDD_SLASH:%s}|%%{TS_APACHE_LOG:%s}"
        % (TS_FMT_ISO, TS_FMT_SLASH, TS_FMT_APACHE)
    ),
    "GENERIC_TS": r"%{TS:timestamp}",
    # pattern-key-named entries (MetaLog_PatternKey enum .String() names)
    "Envoy": (
        r"""[",',\[]?%{GENERIC_TS}[",',\]]?[",',\[]?%{NUMBER:thread}"""
        r"""[",',\]]?[",',\[]?%{LOGLEVEL_KEYWORD:level}[",',\]]?%{MULTILINE:message}"""
    ),
    "TsLevelMsg": (
        r"""[",',\[]?%{GENERIC_TS}[",',\]]? [",',\[]?"""
        r"""%{LOGLEVEL_KEYWORD:level}[",',\]]? %{MULTILINE:message}"""
    ),
    "Clf": (
        r"""%{IPORHOST:client_ip} %{USER:ident} %{USER:auth} \[%{HTTPDATE:timestamp}\] """
        r"""\"%{WORD:method} %{URIPATHPARAM:request} HTTP/%{NUMBER:http_version}\" """
        r"""%{NUMBER:status_code} %{NUMBER:bytes} \"%{DATA:referrer}\" \"%{DATA:user_agent}\""""
    ),
    "Traefik": (
        r"%{TIMESTAMP_ISO8601:timestamp} %{LOGLEVEL_KEYWORD:level} "
        r"%{DATA:origin}:%{NUMBER:originline} > %{GREEDYDATA:message}"
    ),
}

ALL_PATTERNS: dict[str, str] = {**_BASE_PATTERNS, **_CUSTOM_PATTERNS}

# registered capture keys kept by the projection (patternutils.go:14-30)
REGISTERED_KEYS = frozenset(
    {"timestamp", "level", "message", "thread", "origin", "originline"}
)

_REF_RE = re.compile(r"%\{(\w+)(?::(\w+))?\}")


def expand(pattern: str, _depth: int = 0) -> str:
    """Recursively expand %{NAME[:alias]} references into raw Python regex."""
    if _depth > 32:
        raise ValueError("grok pattern recursion too deep (cycle?)")

    def repl(m: re.Match) -> str:
        name, alias = m.group(1), m.group(2)
        try:
            body = ALL_PATTERNS[name]
        except KeyError:
            raise KeyError(f"unknown grok pattern %{{{name}}}") from None
        inner = expand(body, _depth + 1)
        if alias:
            return f"(?P<{alias}>{inner})"
        return f"(?:{inner})"

    return _REF_RE.sub(repl, pattern)


@lru_cache(maxsize=None)
def compiled(key: str) -> re.Pattern:
    """Compile-once-per-process pattern lookup (the executor-local bank)."""
    return re.compile(expand(ALL_PATTERNS[key]))


def parse(key: str, text: str) -> dict[str, str]:
    """grok ParseString: first match anywhere; named captures (participating
    groups only). Empty dict when the pattern does not match."""
    m = compiled(key).search(text)
    if m is None:
        return {}
    return {k: v for k, v in m.groupdict().items() if v is not None}


def parse_registered(key: str, text: str) -> dict[str, str]:
    """ParseAndGetRegisteredKey (patternutils.go:59-74): keep only the
    registered capture keys {timestamp, level, message, thread, origin,
    originline}."""
    return {k: v for k, v in parse(key, text).items() if k in REGISTERED_KEYS}
