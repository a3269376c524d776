"""Token-window document chunking: split each document's word stream into
fixed-size windows with a configurable stride (overlap), the standard
context-length preparation step for training corpora.

Start offsets are 0, stride, 2*stride, ...; the window count is
1 + ceil(max(n_words - size, 0) / stride), so every word is covered, the
final window may be shorter than `size`, and no window is a strict suffix
of its predecessor. All native expressions — per 100-TB row this is a pure
projection plus one Generate (posexplode), no shuffle, no Python; the
chunk array is bound in a prior projection so the transform lambda does
not re-evaluate the split per element.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logunifier_spark.operators.decontam import norm_words


def chunk_by_tokens(df: DataFrame, size: int = 512, stride: int | None = None,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One output row per (document, window): id_col, chunk_id (0-based),
    n_tokens (actual words in this window), chunk_text. An empty document
    yields a single empty chunk with n_tokens = 0 (callers filter)."""
    if size < 1:
        raise ValueError("size must be >= 1")
    stride = size if stride is None else stride
    if not 1 <= stride <= size:
        raise ValueError("stride must be in [1, size]")
    w = df.select(F.col(id_col), norm_words(F.col(text_col)).alias("_w"))
    nw = F.size(F.col("_w"))
    # integer ceil via floor((a + stride - 1)/stride): exact for any corpus
    # (< 2^53 words/doc); floor() because Spark casts truncate but DuckDB
    # casts round — floor agrees everywhere.
    n_chunks = (F.floor((F.greatest(nw - size, F.lit(0)) + (stride - 1))
                        / F.lit(stride)) + 1).cast("int")
    c = w.withColumn("_chunks", F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(F.col("_w"), i * stride + 1, size))))
    out = c.select(id_col, F.size("_w").alias("_nw"),
                   F.posexplode("_chunks").alias("chunk_id", "chunk_text"))
    n_tokens = F.greatest(
        F.least(F.lit(size), F.col("_nw") - F.col("chunk_id") * stride),
        F.lit(0)).cast("long")
    return out.select(id_col, "chunk_id", n_tokens.alias("n_tokens"),
                      "chunk_text")
