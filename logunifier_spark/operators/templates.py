"""Log template mining: discover the pattern bank from the data.

The reference ships a FIXED grok pattern bank (its patternfactory — see
/root/reference/internal/patterns) that an operator curated by hand.
Template mining is the discovery side of that workflow: cluster raw lines
by their constant skeleton so the operator can see which families exist,
how often each fires, and which lines fall outside the curated bank.
This is the classic log-template problem (Drain, He et al. 2017); the
variant here is deterministic masking — no online tree state — because a
distributed miner must produce the SAME template for a line regardless
of which executor sees it first, or the groupBy key itself becomes
partitioning-dependent.

Masking rules (ordered; order matters and is part of the contract):
  1. hex runs of >= 8 chars  -> <HEX>   (ids, digests, uuids-sans-dashes)
  2. decimal digit runs      -> <N>     (timestamps, counters, sizes)
A pure-digit run of >= 8 is masked <HEX> by rule 1 — acceptable: both
read "variable id-like token", and one canonical answer beats a lookahead
regex that engines implement differently. Rules are plain character-class
regexes deliberately: identical semantics in Java regex (Spark), RE2
(DuckDB), and PCRE, so the mined templates are engine-portable and the
miner can be value-hash oracled.

Scale shape: the masking chain is a JVM-side whole-stage-codegen
projection (two regexp_replace, no Python); the rollup is ONE hash
aggregate with map-side combine whose key cardinality is the number of
DISTINCT TEMPLATES — thousands, while input lines are 10^12. min(raw)
as the example keeps the aggregate hash-able (single value, not a
collect_list) and deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (pattern, replacement), applied in order — see module docstring
MASK_RULES: list[tuple[str, str]] = [
    (r"[0-9a-fA-F]{8,}", "<HEX>"),
    (r"[0-9]+", "<N>"),
]


def template_of(col: Column) -> Column:
    """The deterministic template skeleton of a raw line (Column form)."""
    out = col
    for pat, rep in MASK_RULES:
        out = F.regexp_replace(out, pat, rep)
    return out


def mine_templates(df: DataFrame, text: str = "text",
                   with_example: bool = True) -> DataFrame:
    """Mine the template bank of a line corpus: one row per discovered
    template — (template_id STRING[16 hex], template STRING, hits BIGINT
    [, example STRING]). `template_id` is the first 16 hex chars of
    md5(template) (portable, stable across runs/engines); `example` is
    the lexicographically smallest raw line of the family (deterministic
    representative). Null lines are ignored.

    Plan note: min(<string>) buffers are not hash-aggregable, so
    `with_example=True` plans as a SortAggregate — a per-partition sort
    of the line corpus by template before the (still partial) combine.
    Fine up to mid scale; at 10^12 lines pass `with_example=False`
    (count-only, pure hash aggregate) and fetch examples afterwards
    with a template-filtered scan of a sample."""
    keyed = (df.where(F.col(text).isNotNull())
               .select(template_of(F.col(text)).alias("template"),
                       F.col(text).alias("_raw")))
    aggs = [F.count("*").alias("hits")]
    if with_example:
        aggs.append(F.min("_raw").alias("example"))
    out = keyed.groupBy("template").agg(*aggs)
    cols = ["template", "hits"] + (["example"] if with_example else [])
    return out.select(F.substring(F.md5(F.col("template")), 1, 16)
                       .alias("template_id"), *cols)


def template_outliers(df: DataFrame, text: str = "text",
                      min_hits: int = 10) -> DataFrame:
    """Lines whose template family has fewer than `min_hits` members —
    the review queue for extending a curated pattern bank (rare shapes
    are either bugs, attacks, or missing patterns). Returns the raw
    rows plus (template, hits). Implementation: mine, filter the
    SMALL families (a tiny frame), then a broadcast-friendly join back
    — the big table is scanned twice but never shuffled on template."""
    fams = mine_templates(df, text=text).where(F.col("hits") < min_hits) \
                                        .select("template", "hits")
    keyed = df.withColumn("template", template_of(F.col(text)))
    return keyed.join(F.broadcast(fams), "template")
