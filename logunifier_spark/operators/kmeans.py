"""Fixed-point k-means over embedding columns — corpus clustering for
mixture balancing / semantic dedup shards.

Classic Lloyd iterations in the scalable broadcast-centroids shape:

  - centroids live on the DRIVER (k x dim ints, a few KiB) and enter the
    plan as literals, so cell assignment is a zero-shuffle projection —
    the corpus is scanned once per iteration and never joined/multiplied;
  - the per-iteration update shuffles only k*dim (cid, pos, partial-sum)
    rows after map-side combine, independent of corpus size;
  - iterations are a driver loop of narrow jobs — at 1000 executors each
    iteration is one scan + one tiny agg, the canonical pattern MLlib's
    KMeans uses underneath.

Everything is INTEGER-exact so results are reproducible across engines,
partitionings, and retries (and value-hash oracleable, which float
k-means never is): vectors are quantized to BIGINT via floor(x * scale),
distances are int64 squared-L2, the centroid update is exact floor
division. Doubles appear only inside floor(sum/cnt) where both sum and
the quotient are < 2^53 for any realistic corpus (|sum| <= n_rows *
scale * max|x|; at 10^12 rows x scale 1000 that is ~10^15 < 2^53 — note
in the docstring contract, checked nowhere hot).

No reference counterpart (the reference is a log pipeline); this extends
the training-data toolkit next to similarity.py's IVF index, sharing its
deterministic lowest-portable-hash seeding.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def quantize(vec: Column, scale: int = 1000) -> Column:
    """array<float> -> array<bigint> via floor(double(x) * scale): floor is
    bit-identical on every engine (round() half-way ties are not)."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * F.lit(scale)).cast("long"))


def _sq_dist(a: Column, cent: list[int]) -> Column:
    """Exact int64 squared L2 distance to a driver-held centroid literal."""
    return F.aggregate(
        F.zip_with(a, F.array(*[F.lit(int(c)) for c in cent]),
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"), lambda acc, v: acc + v)


def _nearest(qv: Column, cents: list[list[int]]) -> Column:
    """(dist, cid) argmin over centroid literals as array_min of structs —
    a pure projection; lexicographic struct order breaks ties toward the
    smaller cid."""
    return F.array_min(F.array(*[
        F.struct(_sq_dist(qv, cv).alias("dist"),
                 F.lit(cid).cast("long").alias("cluster"))
        for cid, cv in enumerate(cents)
    ]))


#: past this many centroids the Column struct-fold battery's generated
#: code outgrows the JIT method budget and the whole fused stage runs
#: deoptimized (the pq.py lesson: 10-26 s vs 1.3 s at sf0.1) — switch to
#: one numpy Arrow kernel per batch, bit-identical integer math.
COLUMN_BATTERY_MAX_K = 16


def assign_np_udf(cents: list[list[int]], scale: int, with_dist: bool = False):
    """array<float> embedding -> nearest-centroid id (or struct with the
    int64 squared distance), one numpy batch per Arrow chunk. Bit-identical
    to `_nearest` over `quantize`: same float64 quantization (pq._quant_np),
    exact int64 squared-L2, argmin ties to the smaller cid. The UDF takes
    the RAW vector column (a quantize() HOF as UDF arg breaks
    ExtractPythonUDFs — CLAUDE.md) and quantizes inside."""
    # function-level import: pq imports quantize from this module
    from logunifier_spark.operators.pq import _quant_np, _sub_assign

    dim = len(cents[0])

    if with_dist:
        @pandas_udf("struct<dist:long, cluster:long>")
        def _assign_d(v: pd.Series) -> pd.DataFrame:
            if len(v) == 0:
                return pd.DataFrame({"dist": [], "cluster": []},
                                    dtype="int64")
            ids, dmin = _sub_assign(_quant_np(v, scale), cents, 0, dim)
            return pd.DataFrame({"dist": dmin, "cluster": ids})

        return _assign_d

    @pandas_udf("long")
    def _assign(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int64")
        ids, _ = _sub_assign(_quant_np(v, scale), cents, 0, dim)
        return pd.Series(ids)

    return _assign


def seed_centroids(corpus: DataFrame, k: int, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   scale: int = 1000) -> list[list[int]]:
    """Deterministic seeds: the k vectors with the lowest portable hash of
    id (same injective-on-int32 family as sampling/ivf — plain-SQL
    expressible), quantized. Ties broken by id. Raises when the corpus
    holds fewer than k rows (mirrors pq._seed_full): a short seed list
    would make the Lloyd update's cents[cid] IndexError later with no
    hint at the cause, and padding seeds would silently change every
    assignment."""
    from logunifier_spark.operators.sampling import _portable_hash
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    rows = (corpus
            .withColumn("_r", _portable_hash(F.col(id_col)))
            .orderBy("_r", id_col).limit(k)
            .select(quantize(F.col(vec_col), scale).alias("_q")).collect())
    if len(rows) < k:
        raise ValueError(
            f"corpus has only {len(rows)} rows, need k={k} seeds")
    return [list(r["_q"]) for r in rows]


def kmeans_centroids(corpus: DataFrame, k: int = 8, iters: int = 2,
                     scale: int = 1000, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> list[list[int]]:
    """Run `iters` exact Lloyd iterations and return the FINAL centroids
    (k x dim int64, driver-held — a few KiB). Downstream consumers embed
    them as literals so assignment stays a zero-shuffle projection
    (`kmeans_fixed_point` for the per-row assignment table, `semdedup`
    for within-cluster pruning).

    Per iteration: assignment is a zero-shuffle projection against
    centroid literals; the update is posexplode -> groupBy (cluster, pos)
    -> sum/count (map-side combined to k*dim rows) -> driver floor-div.
    A cluster that captures no rows keeps its previous centroid."""
    # fan_out: a one-file corpus scans as ONE task, serializing the
    # per-iteration distance projections; a no-op once the input has >=
    # session-parallelism partitions. Assignment is row-local and the
    # update sums are integers, so the result is partitioning-invariant.
    from logunifier_spark.operators.dedup import fan_out
    q = fan_out(corpus).select(F.col(vec_col),
                               quantize(F.col(vec_col), scale).alias("_q"))
    cents = seed_centroids(corpus, k, id_col, vec_col, scale)
    for _ in range(iters):
        if k > COLUMN_BATTERY_MAX_K:
            assigned = q.select(
                "_q", assign_np_udf(cents, scale)(F.col(vec_col))
                .alias("cluster"))
        else:
            assigned = q.select(
                "_q", _nearest(F.col("_q"), cents)["cluster"].alias("cluster"))
        upd = (assigned
               .select("cluster", F.posexplode("_q").alias("pos", "v"))
               .groupBy("cluster", "pos")
               .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
               .collect())
        by_cid: dict[int, list[tuple[int, int, int]]] = {}
        for r in upd:
            by_cid.setdefault(int(r["cluster"]), []).append(
                (int(r["pos"]), int(r["s"]), int(r["n"])))
        cents = [
            [s // n for _, s, n in sorted(by_cid[cid])]  # Python // floors
            if cid in by_cid else cents[cid]
            for cid in range(k)
        ]
    return cents


def kmeans_fixed_point(corpus: DataFrame, k: int = 8, iters: int = 2,
                       scale: int = 1000, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Train via `kmeans_centroids`, then return one row per input row:
    (id, cluster, dist) with the FINAL assignment and its squared
    distance, all BIGINT."""
    cents = kmeans_centroids(corpus, k, iters, scale, id_col, vec_col)
    if k > COLUMN_BATTERY_MAX_K:
        # fan_out: the Arrow UDF stage otherwise serializes onto one task
        # for a one-file corpus (same rationale as the training passes)
        from logunifier_spark.operators.dedup import fan_out
        near_df = fan_out(corpus).select(
            F.col(id_col),
            assign_np_udf(cents, scale, with_dist=True)(F.col(vec_col))
            .alias("_nc"))
        return near_df.select(F.col(id_col),
                              F.col("_nc.cluster").alias("cluster"),
                              F.col("_nc.dist").alias("dist"))
    q = corpus.select(F.col(id_col),
                      quantize(F.col(vec_col), scale).alias("_q"))
    near = _nearest(F.col("_q"), cents)
    return q.select(F.col(id_col), near["cluster"].alias("cluster"),
                    near["dist"].alias("dist"))
