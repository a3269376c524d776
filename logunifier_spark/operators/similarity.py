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
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cv"))
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
    c = corpus.select(
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

def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_centroids: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             qid_col: str = "qid") -> DataFrame:
    """IVF coarse quantization: centroids = deterministic corpus sample
    (lowest xxhash64 of id — seedless and reproducible), one broadcast join
    to assign cells, queries probe the nprobe nearest cells."""
    cent = (corpus
            .withColumn("_r", F.xxhash64(F.col(id_col)))
            .orderBy("_r").limit(n_centroids)
            .select(F.monotonically_increasing_id().alias("cid"),
                    F.col(vec_col).alias("_cent")))
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("_cv"))
    assigned = (c.crossJoin(F.broadcast(cent))
                  .withColumn("_d", cosine(F.col("_cv"), F.col("_cent")))
                  .withColumn("_rk", F.row_number().over(
                      Window.partitionBy(id_col).orderBy(F.desc("_d"))))
                  .where(F.col("_rk") == 1)
                  .select(id_col, "_cv", "cid"))
    q = queries.select(F.col(qid_col), F.col(vec_col).alias("_qv"))
    qcells = (q.crossJoin(F.broadcast(cent))
                .withColumn("_d", cosine(F.col("_qv"), F.col("_cent")))
                .withColumn("_rk", F.row_number().over(
                    Window.partitionBy(qid_col).orderBy(F.desc("_d"))))
                .where(F.col("_rk") <= nprobe)
                .select(qid_col, "_qv", "cid"))
    scored = (assigned.join(qcells, on="cid")
                      .select(qid_col, id_col,
                              cosine(F.col("_cv"), F.col("_qv")).alias("score")))
    w = Window.partitionBy(qid_col).orderBy(F.desc("score"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k))
