"""Similarity search over embedding columns (array<float>).

  - brute_force_topk: exact cosine top-k against a query set — the
    correctness baseline. Dot products via F.zip_with + F.aggregate
    (JVM-side, codegen) — no Python.
  - lsh_topk: random-hyperplane LSH-bucketed approximate variant — the
    100 TB scale path: candidates restricted to matching sign-bucket keys
    (probing all single-bit flips), so the join touches a small slice of the
    corpus instead of all of it.
  - ivf_topk: IVF-style coarse quantization: k deterministic centroid seeds
    drawn from the corpus, vectors assigned to nearest centroid (broadcast),
    queries probe the nprobe nearest centroids only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    # widen float→double BEFORE multiplying (float32 products then widened
    # lose bits and drift from double-precision engines on the same data)
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x.cast("double") * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b) + F.lit(1e-12))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     qid_col: str = "qid") -> DataFrame:
    """Exact top-k: broadcast the (small) query set against the corpus and
    rank per query. Returns (qid, vec_id, score, rank)."""
    from logunifier_spark.operators.dedup import fan_out
    c = fan_out(corpus).select(F.col(id_col), F.col(vec_col).alias("_cv"))
    q = queries.select(F.col(qid_col), F.col(vec_col).alias("_qv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        qid_col, id_col, cosine(F.col("_cv"), F.col("_qv")).alias("score"))
    w = Window.partitionBy(qid_col).orderBy(F.desc("score"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k))


# --------------------------------------------------- random-hyperplane LSH --

def _hyperplane(dim: int, bit: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane (splitmix-style)."""
    vals = []
    state = (bit + 1) * 0x9E3779B97F4A7C15
    for i in range(dim):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        vals.append(((state >> 32) / 2**31) - 1.0)  # [-1, 1)
    return vals


def hyperplane_bucket(vec: Column, dim: int, n_bits: int = 12) -> Column:
    """n_bits sign bits against fixed hyperplanes → integer bucket id."""
    out = F.lit(0).cast("long")
    for bit in range(n_bits):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, bit)])
        s = F.when(dot(vec, plane) >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
        out = out.bitwiseOR(F.shiftleft(s, bit))
    return out


def lsh_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 10,
             n_bits: int = 12, id_col: str = "vec_id",
             vec_col: str = "embedding", qid_col: str = "qid") -> DataFrame:
    """Approximate top-k: join on hyperplane buckets with 1-bit probing.
    Returns (qid, vec_id, score, rank) over the candidate set."""
    from logunifier_spark.operators.dedup import fan_out
    c = fan_out(corpus).select(
        F.col(id_col), F.col(vec_col).alias("_cv"),
        hyperplane_bucket(F.col(vec_col), dim, n_bits).alias("bucket"))
    qb = queries.select(
        F.col(qid_col), F.col(vec_col).alias("_qv"),
        hyperplane_bucket(F.col(vec_col), dim, n_bits).alias("b0"))
    # multiprobe: the exact bucket + all single-bit flips
    probes = F.array(*([F.col("b0")] +
                       [F.col("b0").bitwiseXOR(F.lit(1 << i)) for i in range(n_bits)]))
    q = qb.select(qid_col, "_qv", F.explode(probes).alias("bucket"))
    scored = (c.join(q, on="bucket")
                .select(qid_col, id_col, cosine(F.col("_cv"), F.col("_qv")).alias("score")))
    w = Window.partitionBy(qid_col).orderBy(F.desc("score"), F.asc(id_col))
    return (scored.dropDuplicates([qid_col, id_col])
                  .withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k))


# ------------------------------------------------------------------- IVF ---

def ivf_centroids(corpus: DataFrame, n_centroids: int = 16,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> list[tuple[int, list[float]]]:
    """Deterministic corpus-sample centroids: the n rows with the lowest
    portable hash of id (seedless, engine-portable — expressible in plain
    SQL, unlike xxhash64; the multiplier is sampling.SAMPLE_MULT, the one
    canonical copy), cid = rank in that order with id as tie-break (the
    hash is injective only on [0, 2^31) ids — ids past that can collide).
    Collected to the driver: n_centroids vectors are a few KiB, and holding
    them driver-side is what makes cell assignment a zero-shuffle map (the
    classic kmeans-style broadcast-constants pattern)."""
    from logunifier_spark.operators.sampling import _portable_hash
    rows = (corpus
            .withColumn("_r", _portable_hash(F.col(id_col)))
            .orderBy("_r", id_col).limit(n_centroids)
            .select(vec_col).collect())
    return [(cid, [float(v) for v in r[vec_col]]) for cid, r in enumerate(rows)]


def _argmax_cell(vec: Column, cents: list[tuple[int, list[float]]]) -> Column:
    """Nearest-centroid id via array_max over (score, cid) structs built
    from centroid literals — a pure projection, NO shuffle (the previous
    crossJoin + row_number window shuffled the whole corpus x n_centroids).
    Ties pick the larger cid (struct comparison is lexicographic)."""
    scored = F.array(*[
        F.struct(cosine(vec, F.array(*[F.lit(x) for x in cv])).alias("s"),
                 F.lit(cid).alias("cid"))
        for cid, cv in cents
    ])
    return F.array_max(scored)["cid"]


def _topn_cells(vec: Column, cents: list[tuple[int, list[float]]],
                nprobe: int) -> Column:
    """The nprobe nearest centroid ids, as an array (sorted by descending
    score, ties toward larger cid — mirrors _argmax_cell)."""
    scored = F.array(*[
        F.struct(cosine(vec, F.array(*[F.lit(x) for x in cv])).alias("s"),
                 F.lit(cid).alias("cid"))
        for cid, cv in cents
    ])
    ranked = F.reverse(F.array_sort(scored))
    return F.transform(F.slice(ranked, 1, nprobe), lambda e: e["cid"])


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_centroids: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "qid") -> DataFrame:
    """IVF coarse quantization: deterministic corpus-sample centroids held
    as driver-side literals; cell assignment is a zero-shuffle projection
    (array_max over broadcast-constant scores); queries probe the nprobe
    nearest cells. The only shuffle in the plan is the cell join itself,
    keyed on cid — the corpus is touched once, never multiplied."""
    from logunifier_spark.operators.dedup import fan_out
    cents = ivf_centroids(corpus, n_centroids, id_col, vec_col)
    assigned = fan_out(corpus).select(
        F.col(id_col), F.col(vec_col).alias("_cv"),
        _argmax_cell(F.col(vec_col), cents).alias("cid"))
    q = queries.select(
        F.col(qid_col), F.col(vec_col).alias("_qv"),
        F.explode(_topn_cells(F.col(vec_col), cents, nprobe)).alias("cid"))
    # query side is tiny (|queries| x nprobe rows): broadcast it so the
    # corpus side never shuffles at all — the cell "join" degenerates to a
    # map-side hash probe
    scored = (assigned.join(F.broadcast(q), on="cid")
                      .select(qid_col, id_col,
                              cosine(F.col("_cv"), F.col("_qv")).alias("score")))
    w = Window.partitionBy(qid_col).orderBy(F.desc("score"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k))
