"""Corpus snapshot diff — dataset versioning for training corpora.

Curation pipelines re-run: crawls refresh, filters get tuned, dedup
thresholds move. Before promoting a new corpus snapshot you diff it
against the previous one — how many documents appeared, vanished,
changed — and audit samples of each class. At 10^12 rows that diff must
be a JOIN, not a download: this module is the relational shape.

Design: each side reduces to (id, content-hash); the diff is ONE full
outer equi-join on id. The hash is md5 over the content columns joined
with a 0x1F unit separator after casting to string — engine-portable
(the DuckDB oracle recomputes it), and the separator prevents
("ab","c") / ("a","bc") collisions. Nulls: concat_ws SKIPS null fields
(both engines), so ("x", NULL) and ("x") collide — callers diff
explicit columns they know are non-null, or pre-coalesce; the driver
query uses a single non-null column. Unchanged rows are dropped by
default (at 10^12 rows they are ~the whole result; the summary counts
them via the id-join row count instead).

Scale: both sides shuffle once on id (or zero times if both snapshots
are bucketed by id — storage.py); the hash projection fuses into each
scan; column pruning reaches parquet (only id + content columns read).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"


def content_hash(cols: list[str]) -> Column:
    """md5 of the unit-separator-joined string forms of `cols`.
    SQL mirror: md5(concat_ws(chr(31), CAST(c1 AS VARCHAR), ...))."""
    return F.md5(F.concat_ws(_SEP, *[F.col(c).cast("string")
                                     for c in cols]))


def corpus_diff(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                content_cols: list[str] | None = None,
                keep_unchanged: bool = False) -> DataFrame:
    """Diff two corpus snapshots: (id, status STRING in
    added|removed|changed[|unchanged], old_hash, new_hash). `added` rows
    exist only in `new`, `removed` only in `old`, `changed` in both with
    differing content hashes over `content_cols` (default: every shared
    non-id column, sorted by name for a stable contract)."""
    if content_cols is None:
        shared = set(old.columns) & set(new.columns) - {id_col}
        content_cols = sorted(shared)
        if not content_cols:
            raise ValueError("no shared content columns to diff")
    o = old.select(F.col(id_col), content_hash(content_cols).alias("old_hash"))
    n = new.select(F.col(id_col), content_hash(content_cols).alias("new_hash"))
    j = o.join(n, id_col, "full_outer")
    status = (F.when(F.col("old_hash").isNull(), F.lit("added"))
               .when(F.col("new_hash").isNull(), F.lit("removed"))
               .when(F.col("old_hash") != F.col("new_hash"),
                     F.lit("changed"))
               .otherwise(F.lit("unchanged")))
    out = j.select(F.col(id_col), status.alias("status"),
                   "old_hash", "new_hash")
    if not keep_unchanged:
        out = out.where(F.col("status") != "unchanged")
    return out


def diff_summary(old: DataFrame, new: DataFrame, id_col: str = "doc_id",
                 content_cols: list[str] | None = None) -> DataFrame:
    """(status, n BIGINT) including 'unchanged' — one aggregate over the
    joined frame (the count is cheap even when the row-level diff would
    not be)."""
    d = corpus_diff(old, new, id_col=id_col, content_cols=content_cols,
                    keep_unchanged=True)
    return d.groupBy("status").agg(F.count("*").alias("n"))
