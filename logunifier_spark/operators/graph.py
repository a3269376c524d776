"""Graph operators: fixed-point PageRank over an edge list.

Corpus curation meets graphs constantly: near-dup clusters
(dedup.connected_components), citation/link authority for quality
weighting, user-interaction graphs for conversation sampling. This
module adds the canonical authority score — PageRank — in the same
engine-portable fixed-point discipline as kmeans.py, so an ITERATIVE
algorithm carries a full value-hash oracle (each Lloyd/power iteration
unrolled as a SQL CTE).

Integer recurrence (all int64, exact on every engine):

  Q       = rank quantization (1e12 fixed-point units of total mass 1·Q)
  r0(v)   = Q div N
  contrib = r(u) div outdeg(u)            per edge u->v
  r'(v)   = (((100-d)·(Q div N)) div 100) + ((d · Σ contrib) div 100)

with d the damping numerator (85 = 0.85). Division is integer floor
div, so every iteration is a pure function of the edge set — no float
summation order, no libm. Overflow-safe: Σ contrib ≤ Q (the total mass
never grows), so d·Σ ≤ 85e12 « 2^63. Dangling nodes (no out-edges)
simply drop their mass each iteration — the early MapReduce PageRank
behavior; ranks then measure RELATIVE authority, which is what ranking
and sampling weights consume. Deliberate spec, mirrored by the oracle.

Scale shape per iteration: one equi-join ranks⋈edges on src (ranks is
one row per node — broadcasts while it fits, hash-shuffles beyond) and
one map-side-combinable hash aggregate on dst. The edge list is scanned
once per iteration — localCheckpoint it (or bucket both sides by
src/dst via storage.py) before iterating on a real corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PR_QUANT = 10**12


def transition_edges(events: DataFrame, order_col: str = "event_id",
                     part_col: str = "event_type",
                     node_col: str = "user_id") -> DataFrame:
    """Distinct (src, dst) user-transition edges: within each
    `part_col` stream ordered by `order_col`, an edge connects each
    event's user to the next event's user (who-follows-whom in the
    activity sequence). Self-loops are dropped; edges are
    deduplicated. One window shuffle on the partition column."""
    w = Window.partitionBy(part_col).orderBy(order_col)
    nxt = F.lead(node_col).over(w)
    return (events.select(F.col(node_col).alias("src"), nxt.alias("dst"))
                  .where(F.col("dst").isNotNull()
                         & (F.col("dst") != F.col("src")))
                  .distinct())


def pagerank_fixed_point(edges: DataFrame, iters: int = 3,
                         damping_pct: int = 85,
                         quant: int = PR_QUANT) -> DataFrame:
    """PageRank over a distinct (src, dst) edge list via `iters` exact
    integer power iterations (see module docstring for the recurrence).
    Nodes are every id appearing as src or dst. Returns
    (node, rank_q BIGINT) — fixed-point rank in units of 1/quant;
    divide by quant for the float score. Deterministic and
    engine-portable bit-for-bit."""
    if not (1 <= iters <= 8):
        raise ValueError(f"iters must be in [1, 8], got {iters}")
    if not (1 <= damping_pct <= 99):
        raise ValueError(f"damping_pct must be in [1, 99], got {damping_pct}")
    edges = edges.select("src", "dst").localCheckpoint(eager=False)
    nodes = (edges.select(F.col("src").alias("node"))
                  .unionByName(edges.select(F.col("dst").alias("node")))
                  .distinct()
                  .localCheckpoint(eager=False))
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0).cast("long").alias("rank_q"))
    outdeg = edges.groupBy("src").agg(F.count("*").alias("_deg"))
    init = int(quant) // n
    teleport = ((100 - damping_pct) * init) // 100
    ranks = nodes.select("node", F.lit(init).cast("long").alias("rank_q"))
    for _ in range(iters):
        contrib = (edges.join(outdeg, "src")
                        .join(ranks.withColumnRenamed("node", "src"), "src")
                        .select(F.col("dst").alias("node"),
                                F.expr("CAST(rank_q DIV _deg AS BIGINT)")
                                 .alias("_c")))
        inflow = contrib.groupBy("node").agg(F.sum("_c").alias("_s"))
        ranks = (nodes.join(inflow, "node", "left")
                      .select("node",
                              (F.lit(teleport)
                               + F.expr(f"CAST(({damping_pct} * "
                                        f"coalesce(_s, 0)) DIV 100 "
                                        f"AS BIGINT)"))
                              .cast("long").alias("rank_q")))
        # each iteration references the previous ranks once per edge
        # join; checkpoint to stop the lineage doubling per iteration
        ranks = ranks.localCheckpoint(eager=False)
    return ranks
