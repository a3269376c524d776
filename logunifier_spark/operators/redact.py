"""PII redaction over text columns — a training-data hygiene pass.

A corpus assembled from logs/transcripts routinely leaks emails, phone
numbers, IPs and card-like digit runs (the reference's logfmt/grok
extractors pull exactly these as `user=`, `client_ip=` style fields —
internal/grok/grok.go pattern bank); a pipeline that ships text to
training must be able to strip them deterministically and account for
what it stripped.

Design constraints:
- **JVM-side, codegen-friendly.** Each rule is one `regexp_replace` on a
  native column — no Python in the hot path; the whole chain fuses into
  one WholeStageCodegen projection. At 100 TB this is a pure map stage:
  no shuffle, no state, predicate/column pruning unaffected.
- **Engine-portable patterns.** Every pattern sticks to the syntax subset
  with identical semantics in Java regex (Spark) and RE2 (DuckDB oracle):
  explicit `[0-9]` classes (never `\\d`, whose Unicode width is
  engine-dependent), no lookaround, no backrefs. Leftmost-first matching
  is the same in both engines for this subset.
- **Ordered rules.** Replacement is sequential (emails before phones
  before bare digit runs), so a digit string consumed by an earlier rule
  can't double-fire a later one. Counts are taken on the text state the
  rule actually saw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (name, pattern, replacement) — order matters; see module docstring.
DEFAULT_PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+[0-9]{7,15}\b", "<PHONE>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("longnum", r"\b[0-9]{13,19}\b", "<LONGNUM>"),
]


def redact_pii(df: DataFrame, col: str, out: str | None = None,
               rules: list[tuple[str, str, str]] | None = None,
               counts: bool = True) -> DataFrame:
    """Replace PII spans in `df[col]` with typed placeholder tokens.

    Adds `out` (default: overwrite `col`) with the redacted text and —
    when `counts` — one `n_<rule>` bigint column per rule with the number
    of spans that rule replaced. Pure projection: no shuffle, no UDF.
    """
    rules = DEFAULT_PII_RULES if rules is None else rules
    out = out or col
    text = F.col(col)
    count_cols = []
    for name, pat, _repl in rules:
        if counts:
            count_cols.append(
                F.regexp_count(text, F.lit(pat)).cast("long").alias(f"n_{name}"))
        text = F.regexp_replace(text, pat, _repl)
    keep = [c for c in df.columns if c != out]
    return df.select(*keep, text.alias(out), *count_cols)
