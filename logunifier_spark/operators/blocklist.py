"""URL/domain blocklist filtering — the C4/RefinedWeb-style source gate.

Web-corpus curation drops documents whose source domain (or any parent
domain) is on a blocklist: an entry `tracker.example.com` must also
block `cdn.tracker.example.com`. That suffix-hierarchy match is NOT an
equality join on the host, so the relational shape is:

  host -> explode its domain-suffix chain (a.b.c -> [a.b.c, b.c, c])
       -> semi/anti join the suffix stream against the blocklist.

Scale: the suffix chain is bounded by the label count (<= ~6 for real
hosts), so the explode is a small constant fan-out; the blocklist side
is KB-MB and broadcasts (hinted explicitly — the join key is a domain
string, and at 10^12 rows a shuffle here would dwarf the whole job).
The chain itself is built with the row-local HOF form (transform over
sequence) — CLAUDE.md's carve-out: HOF lambdas are interpreted but fine
for small fixed arrays; an explode of the label stream would cost a
second pass for no win at this fan-out.

Matching is on the registrable host only (scheme/port/path stripped by
one regex), lowercased; entries in the blocklist are bare domains.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HOST_RE = r"^[a-z][a-z0-9+.-]*://([^/:?#]+)"


def host_of(url: Column) -> Column:
    """The lowercased host of a URL ('' when the scheme/host shape is
    absent). SQL mirror: regexp_extract(lower(url), pattern, 1)."""
    return F.regexp_extract(F.lower(url), _HOST_RE, 1)


def domain_suffixes(host: Column) -> Column:
    """array<string> of the host's domain-suffix chain, most-specific
    first: a.b.c -> [a.b.c, b.c, c]. Empty host -> empty array."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    chain = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.array_join(F.slice(parts, i, n), "."))
    return F.when(F.length(host) > 0, chain) \
            .otherwise(F.array().cast("array<string>"))


def blocklist_hits(df: DataFrame, blocklist: DataFrame,
                   url_col: str = "url",
                   domain_col: str = "domain") -> DataFrame:
    """Rows of `df` whose URL host matches the blocklist by domain
    suffix, with `matched_domain` = the most specific matching entry
    (deterministic: suffixes are unique per host, the min length —
    equivalently min over the chain order — picks one). Blocklist is
    broadcast."""
    d = df.withColumn("_host", host_of(F.col(url_col)))
    ex = d.withColumn("_suf", F.explode(domain_suffixes(F.col("_host"))))
    b = blocklist.select(F.col(domain_col).alias("_suf")).distinct()
    hits = ex.join(F.broadcast(b), "_suf")
    keys = [c for c in df.columns]
    return (hits.groupBy(*keys)
                .agg(F.max_by(F.col("_suf"), F.length("_suf"))
                      .alias("matched_domain")))


def blocklist_filter(df: DataFrame, blocklist: DataFrame,
                     url_col: str = "url",
                     domain_col: str = "domain") -> DataFrame:
    """`df` minus blocklisted rows — the curation gate. One explode +
    one broadcast LEFT ANTI join on the suffix stream; a row survives
    iff NO suffix matched (anti join after explode would keep partially
    matching rows, so the anti join runs on the matched-id set)."""
    d = df.withColumn("_host", host_of(F.col(url_col)))
    ex = d.select(F.col(url_col).alias("_u"),
                  F.explode(domain_suffixes(F.col("_host"))).alias("_suf"))
    b = blocklist.select(F.col(domain_col).alias("_suf")).distinct()
    blocked = ex.join(F.broadcast(b), "_suf").select("_u").distinct()
    return df.join(blocked, df[url_col] == blocked["_u"], "left_anti")
