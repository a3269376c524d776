"""Hashed-feature linear classifier inference (fastText-style) for
document quality gating.

The production quality gate most pipelines run (CCNet, RefinedWeb,
FineWeb) is a linear model over hashed bag-of-words features: no
vocabulary table, just `bucket = hash(token) mod D` and a weight vector
of length D. This module is the INFERENCE shape of that gate as a pure
Spark plan:

  - token stream = split + explode (zero Python, fuses with the scan —
    the repo's explode-then-project rule; a HOF fold would run
    interpreted per token);
  - bucket + weight are row projections inside whole-stage codegen;
  - the per-document margin is ONE map-side-combinable hash aggregate —
    at 10^12 docs the shuffle carries partially-summed (doc, margin)
    rows, not tokens.

Weights are int64 FIXED-POINT (milli-units): a float dot product sums in
partial-aggregation order and is not even run-stable; integer sums are
associative, so the margin is exact, reproducible, and value-hash
oracle-able. In production the weight vector comes from a trained model
(broadcast as a D-length map or joined as a tiny table); here the
default derives weights from the bucket id via the repo's portable-hash
family — deterministic on every engine, which is what lets the DuckDB
oracle re-run the classifier independently. The hash is the 48-bit md5
prefix (stats.kmv_hash), so bucketing is identical in Spark and any
SQL engine with md5.

Tokens: lowercase, split on textstats.ASCII_WS, empty strings dropped
(split keeps leading/trailing empties in both Java and DuckDB —
filtering them is part of the cross-engine contract). Documents with no
tokens produce no row (their margin is exactly the bias; callers
needing them materialized can left-join and coalesce).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from logunifier_spark.operators.sampling import SAMPLE_MULT, _MOD
from logunifier_spark.operators.stats import kmv_hash
from logunifier_spark.operators.textstats import ASCII_WS

#: weight range is [-1000, 1000] milli-units
_W_SPAN = 2001


def hashed_weight(bucket: Column) -> Column:
    """Deterministic milli-unit weight for a feature bucket:
    ((bucket * MULT) mod 2^31) mod 2001 - 1000. bucket < 2^20 keeps the
    product far under 2^63 (overflow discipline — CLAUDE.md). SQL
    mirror: (((b * 2654435761) % 2147483648) % 2001) - 1000."""
    return (F.pmod(F.pmod(bucket * F.lit(SAMPLE_MULT), F.lit(_MOD)),
                   F.lit(_W_SPAN)) - F.lit(_W_SPAN // 2))


def hashed_linear_score(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n_buckets: int = 1024,
                        bias_milli: int = 0,
                        weight_fn=hashed_weight) -> DataFrame:
    """Per-document classifier margin: (id, n_tokens BIGINT,
    margin_milli BIGINT, keep BOOLEAN) with
    margin = bias + sum(weight(hash(token) mod D)) and keep = margin > 0.
    `weight_fn` maps a bucket Column to an int64 milli-unit weight Column
    — swap in a broadcast-map lookup of trained weights in production."""
    if not (1 <= n_buckets <= 1 << 20):
        raise ValueError(f"n_buckets must be in [1, 2^20], got {n_buckets}")
    toks = (docs.select(F.col(id_col),
                        F.explode(F.split(F.lower(F.col(text_col)),
                                          ASCII_WS + "+")).alias("tok"))
                .where(F.col("tok") != ""))
    bucket = F.pmod(kmv_hash(F.col("tok")), F.lit(n_buckets))
    w = weight_fn(bucket).cast("long")
    agg = (toks.select(F.col(id_col), w.alias("_w"))
               .groupBy(id_col)
               .agg(F.count("*").alias("n_tokens"),
                    (F.sum("_w") + F.lit(int(bias_milli)))
                    .alias("margin_milli")))
    return agg.withColumn("keep", F.col("margin_milli") > 0)
