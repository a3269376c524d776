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


def triangle_counts(edges: DataFrame, src: str = "src",
                    dst: str = "dst") -> DataFrame:
    """Per-node triangle participation counts: (node, triangles BIGINT),
    nodes in no triangle absent. Input edges are treated as UNDIRECTED
    (direction, duplicates, and self-loops are normalized away first).

    Algorithm: degree-ordered forward counting — the skew bound that
    makes triangle counting tractable on power-law graphs. Every edge
    is oriented from the (degree, id)-SMALLER endpoint to the larger;
    a triangle {a,b,c} with a < b < c in that total order is found
    exactly once, as wedge a->b, a->c joined against oriented edge
    b->c. Orientation caps every node's out-degree at O(sqrt(m)) on any
    graph, so the wedge self-join on the low endpoint — the expensive
    step — is bounded even when raw degrees are wildly skewed (a
    celebrity node's million in-edges orient INTO it and generate no
    wedges).

    Plan: one distinct + one degree aggregate + a degree join per
    endpoint, the wedge self-join on the shared low endpoint, one
    equi-join of wedges against oriented edges, one explode of the
    triangle's three corners, one final count aggregate."""
    e = (edges.select(F.least(F.col(src), F.col(dst)).alias("u"),
                      F.greatest(F.col(src), F.col(dst)).alias("v"))
              .where(F.col("u") != F.col("v"))
              .distinct())
    deg = (e.select(F.col("u").alias("n"))
            .unionAll(e.select(F.col("v").alias("n")))
            .groupBy("n").agg(F.count("*").alias("d")))
    keyed = (e.join(deg.withColumnRenamed("n", "u")
                       .withColumnRenamed("d", "du"), "u")
              .join(deg.withColumnRenamed("n", "v")
                       .withColumnRenamed("d", "dv"), "v"))
    lo_first = (F.col("du") < F.col("dv")) | \
               ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    o = keyed.select(
        F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        # the high endpoint's (degree, id) key — the SAME total order
        # the orientation uses, so wedge spokes can be ordered to match
        # the closing edge's direction and the check stays an EQUI-join
        F.when(lo_first, F.struct(F.col("dv").alias("d"),
                                  F.col("v").alias("n")))
         .otherwise(F.struct(F.col("du").alias("d"),
                             F.col("u").alias("n"))).alias("kb"))
    o = o.localCheckpoint(eager=False)
    w1 = o.select(F.col("a"), F.col("b").alias("x"),
                  F.col("kb").alias("kx"))
    w2 = o.select(F.col("a"), F.col("b").alias("y"),
                  F.col("kb").alias("ky"))
    # kx < ky (struct compare) orders the spokes by orientation order:
    # each unordered pair once, and the closing edge — if present — is
    # oriented exactly x -> y
    wedges = (w1.join(w2, "a").where(F.col("kx") < F.col("ky"))
                .select("a", "x", "y"))
    closed = wedges.join(
        o.select(F.col("a").alias("x"), F.col("b").alias("y")),
        ["x", "y"])
    tri = closed.select("a", "x", "y")
    corners = tri.select(F.explode(F.array("a", "x", "y")).alias("node"))
    return corners.groupBy("node").agg(F.count("*").alias("triangles"))


def label_propagation(edges: DataFrame, iters: int = 3,
                      src: str = "src", dst: str = "dst") -> DataFrame:
    """Community detection via SYNCHRONOUS label propagation:
    (node, label BIGINT) after `iters` rounds — every node adopts the
    most frequent label among its neighbors (ties -> smallest label;
    isolated nodes keep their own id). Deterministic by construction —
    no random visit order, so the result is engine-portable and the
    DuckDB oracle unrolls every round as CTEs (the third iterative
    algorithm with a full value-hash oracle, after k-means and
    PageRank).

    Scale shape per round: one labels⋈edges equi-join on the node key
    (labels is one row per node — broadcasts while it fits), one
    map-side-combinable count aggregate on (node, label), and the
    argmax as min(struct(-count, label)) — an all-int fixed-width
    buffer, so it stays a HashAggregate (no sort). Labels
    localCheckpoint per round to keep lineage flat."""
    und = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
                .where(F.col("u") != F.col("v"))
                .unionAll(edges.select(F.col(dst).alias("u"),
                                       F.col(src).alias("v")))
                .where(F.col("u") != F.col("v"))
                .distinct())
    und = und.localCheckpoint(eager=False)
    nodes = und.select(F.col("u").alias("node")).distinct()
    labels = nodes.select("node", F.col("node").alias("label"))
    for _ in range(iters):
        nb = (und.join(labels.withColumnRenamed("node", "v"), "v")
                 .select(F.col("u").alias("node"), "label"))
        counts = nb.groupBy("node", "label").agg(F.count("*").alias("c"))
        best = (counts.groupBy("node")
                      .agg(F.min(F.struct((-F.col("c")).alias("nc"),
                                          F.col("label").alias("l")))
                            .alias("_b"))
                      .select("node", F.col("_b.l").alias("new_label")))
        labels = (labels.join(best, "node", "left")
                        .select("node",
                                F.coalesce("new_label", "label")
                                 .alias("label")))
        labels = labels.localCheckpoint(eager=False)
    return labels
