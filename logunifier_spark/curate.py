"""End-to-end corpus curation: the standard pretraining funnel as ONE
composable plan — exact dedup → language filter → quality filter →
deterministic sample.

Each stage is an already-verified operator (operators/dedup.py,
operators/textstats.py, operators/sampling.py); this module is the
composition a training-data user actually runs, and the driver query
`curate_corpus` value-hash-verifies the WHOLE funnel against a single
DuckDB oracle — stage-boundary bugs (a filter applied to the wrong
intermediate, a sample gate evaluated pre-dedup) would break the hash
even though every stage passes its own oracle in isolation.

Plan shape: the dedup keep-set is one hash aggregate on the text plus a
semi-join on the id; every later stage is a pure projection/filter that
Catalyst fuses into the post-join stage — language, quality, and the
sample gate add NO further shuffle or Python. Order matters for cost at
100 TB: dedup first (it must see every row), then the cheap native
filters, with the sample gate LAST so its rate applies to the curated
population (the auditable semantics: re-running with a higher rate is a
superset)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logunifier_spark.operators.dedup import exact_dedup
from logunifier_spark.operators.sampling import sample_gate
from logunifier_spark.operators.textstats import language_id, quality_score


def curate(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
           dedup: bool = True, langs: Sequence[str] | None = ("en",),
           min_quality: float | None = None,
           sample_rate: float | None = None, salt: int = 0) -> DataFrame:
    """Run the curation funnel over `df`. Returns the surviving rows with
    `lang_id` and `quality` columns appended. Stages are individually
    optional (None/False disables); the sample gate is keyed on `id_col`
    via the portable hash, so the keep-set is stable across partitionings,
    retries, and cluster sizes."""
    out = df
    if dedup:
        keep = exact_dedup(out, text_col, id_col).select(id_col)
        out = out.join(keep, id_col, "left_semi")
    t = F.col(text_col)
    out = out.withColumn("lang_id", language_id(t)) \
             .withColumn("quality", quality_score(t))
    if langs is not None:
        out = out.where(F.col("lang_id").isin(*langs))
    if min_quality is not None:
        out = out.where(F.col("quality") >= F.lit(float(min_quality)))
    if sample_rate is not None:
        out = out.where(sample_gate(F.col(id_col), sample_rate, salt))
    return out
