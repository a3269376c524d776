"""Blocked fuzzy matching (record linkage) via edit distance.

Entity resolution across noisy corpora — service names drifting between
deploys ("auth-svc" / "auth_svc2"), user handles with typos, tool names
across transcript schema versions — needs a string-similarity join. The
all-pairs form is O(n·m) and dead at corpus scale; the standard shape is
BLOCK, then verify:

  - blocking key = (first letter, length band): two strings within edit
    distance d differ in length by at most d < band width (2*max_dist+1),
    so their band indices differ by at most 1. The LEFT side probes
    bands {b-1, b, b+1} while the right sits only in its own band —
    every qualifying pair meets EXACTLY once (the right band is unique),
    so there is no recall loss and no dedup pass, at the cost of 3x
    left-side replication in the join input. First-letter equality IS
    lossy for edits at position 0 — documented, standard trade
    (Soundex-style phonetic keys are the non-lossy alternative).
  - verify = levenshtein(l, r) <= max_dist on the blocked candidates
    only.

Cross-engine: Spark's levenshtein (JVM DP) and DuckDB's levenshtein
(C++) are independent implementations of the same metric, so the
value-hash oracle cross-checks them; the blocking arithmetic is plain
integer math mirrored in SQL.

Scale: one hash equi-join on the block key; candidates per key are
(left-per-block × right-per-block) — bounded by the alphabet × length
banding. Skewed blocks (every service named "s...") are ordinary hot
join keys: cap them upstream or salt via join.salted_join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _band(col: Column, width: int) -> Column:
    return F.floor(F.length(col) / width).cast("int")


def blocked_fuzzy_pairs(left: DataFrame, right: DataFrame,
                        on: str, max_dist: int = 2,
                        suffix: str = "_r") -> DataFrame:
    """All (left row, right row) pairs with
    levenshtein(left.on, right.on) <= max_dist, found via first-letter +
    length-band blocking (see module docstring for the recall
    guarantee). Right-side columns are renamed with `suffix`. Adds
    `dist INT`. Null/empty keys never match."""
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    width = 2 * max_dist + 1
    r = right.select(*[F.col(c).alias(c + suffix) for c in right.columns])
    ron = on + suffix
    lb = _band(F.col(on), width)
    rb = _band(F.col(ron), width)
    # the left probes all three neighboring bands (see module docstring:
    # exact recall, each pair meets once); band -1 joins nothing
    lx = (left.where(F.col(on).isNotNull() & (F.length(on) > 0))
              .withColumn("_lc", F.substring(F.col(on), 1, 1))
              .withColumn("_bk", F.explode(F.array(lb - 1, lb, lb + 1))))
    rx = (r.where(F.col(ron).isNotNull() & (F.length(ron) > 0))
           .withColumn("_rc", F.substring(F.col(ron), 1, 1))
           .withColumn("_bkr", rb))
    cand = lx.join(rx, (lx["_bk"] == rx["_bkr"]) & (lx["_lc"] == rx["_rc"]))
    return (cand.withColumn("dist", F.levenshtein(F.col(on), F.col(ron)))
                .where(F.col("dist") <= max_dist)
                .drop("_bk", "_bkr", "_lc", "_rc"))
