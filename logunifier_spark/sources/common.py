"""Shared ingress helpers.

The reference's converters treat Go zero values ('' for strings) as
ABSENT — every precedence cascade (service-name, pattern-key, host)
skips empty strings, not just nulls. `nz` is that convention as a column
expression; both the journald and docker ingresses import it so the
absent-value semantics can never diverge between them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def nz(c: Column) -> Column:
    """NULL when the string is empty — the Go zero-value-is-absent rule."""
    return F.nullif(c, F.lit(""))
