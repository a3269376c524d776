"""Multi-part (partial) message reassembly — M1.

Re-creates the journald CONTAINER_PARTIAL_* reassembly
(/root/reference/internal/streams/ingress/journald/journald.go:110-133,
sorter :82-91): parts buffered per CONTAINER_PARTIAL_ID, sorted by ordinal,
concatenated; non-final parts are skipped (acked, not forwarded).

Batch shape: one groupBy + sort_array + concat — a single shuffle keyed by
the partial id (bounded by the number of multi-part groups, not rows, after
partial aggregation). The reference's in-memory cache is unbounded and
process-local (a known leak risk); the groupBy version is bounded and
cluster-wide by construction."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reassemble_partials(
    df: DataFrame,
    message_col: str = "message",
    partial_id_col: str = "partial_id",
    ordinal_col: str = "partial_ordinal",
    last_col: str = "partial_last",
) -> DataFrame:
    """Rows with a non-empty partial id collapse to one row per id: ordinal-
    sorted concatenation of messages, all other columns taken from the final
    part (the reference keeps the last part's metadata, journald.go:126-133).
    Complete-only semantics: groups whose last part has not arrived are
    dropped (the reference would keep buffering them)."""
    is_partial = (F.col(partial_id_col).isNotNull() & (F.col(partial_id_col) != "")
                  & (F.col(ordinal_col).cast("int") > 0))
    whole = df.where(~is_partial)
    parts = df.where(is_partial)

    other_cols = [c for c in df.columns
                  if c not in (message_col, partial_id_col, ordinal_col, last_col)]
    assembled = (
        parts.groupBy(partial_id_col)
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.sort_array(F.collect_list(F.struct(
                        F.col(ordinal_col).cast("int").alias("ord"),
                        F.col(message_col).alias("msg"),
                    ))),
                    lambda s: s["msg"],
                ),
            ).alias(message_col),
            F.max(F.when(F.col(last_col).cast("string") == "true", F.lit(1))
                  .otherwise(F.lit(0))).alias("_has_last"),
            *[F.max_by(F.col(c), F.col(ordinal_col).cast("int")).alias(c)
              for c in other_cols],
        )
        .where(F.col("_has_last") == 1)
        .drop("_has_last", partial_id_col)
    )
    return whole.drop(partial_id_col, ordinal_col, last_col).unionByName(
        assembled, allowMissingColumns=True)
