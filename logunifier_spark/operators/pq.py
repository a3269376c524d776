"""Product quantization (PQ) — compact vector codes for billion-scale
ANN (Jégou et al. 2011), completing the IVF story in similarity.py:
IVF prunes WHICH vectors a query compares against; PQ shrinks WHAT is
compared, replacing a dim-D float vector with m sub-codes (one byte-ish
each) whose codebooks are per-subspace k-means centroids. At 10^12
vectors the raw embeddings are ~300 TB while 8-byte PQ codes are ~8 TB —
the difference between an index that fits the cluster's memory and one
that doesn't.

Shape, reusing the integer-exact k-means machinery (kmeans.py):

  - TRAIN: the vector splits into m contiguous subvectors; each subspace
    trains its own k centroids via `kmeans_centroids` — driver-held
    literals (m*k*(D/m) ints, a few KiB), zero-shuffle assignment, the
    update shuffle bounded at k*(D/m) rows per subspace;
  - ENCODE: one projection computes all m argmins against the literal
    codebooks and packs them into ONE int64 (`code = Σ cid_j << bits*j`,
    bits = ceil(log2 k)) — packed because a bigint is groupable /
    joinable / oracle-hashable where array<int> is awkward, and because
    that IS the storage win; `err` = Σ per-subspace squared distances is
    the exact int64 reconstruction error (the quantization-quality
    metric you monitor before trusting the index).

Everything inherits kmeans.py's fixed-point discipline (floor-quantize,
int64 squared-L2, floor-div updates), so a full value-hash oracle exists:
the DuckDB side re-trains all m codebooks via the parameterized unrolled
Lloyd CTE generator (duck_oracles._kmeans_ctes with per-subspace
prefixes) and must agree bit-for-bit — an iterative, multi-model
training pipeline held to exact cross-engine equality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logunifier_spark.operators.kmeans import (
    _nearest,
    kmeans_centroids,
    quantize,
)


def pq_codebooks(corpus: DataFrame, dim: int, m: int = 8, k: int = 16,
                 iters: int = 1, scale: int = 1000,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> list[list[list[int]]]:
    """Train the m per-subspace codebooks (each k x dim/m int64,
    driver-held). `dim` is explicit — reading it from data would cost a
    job and make the layout contract implicit."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    books = []
    for j in range(m):
        sub = corpus.select(
            F.col(id_col),
            F.slice(F.col(vec_col), j * d + 1, d).alias(vec_col))
        books.append(kmeans_centroids(sub, k=k, iters=iters, scale=scale,
                                      id_col=id_col, vec_col=vec_col))
    return books


def pq_encode(corpus: DataFrame, dim: int, m: int = 8, k: int = 16,
              iters: int = 1, scale: int = 1000, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, code BIGINT, err BIGINT): the packed PQ code and exact
    reconstruction error per vector. bits = ceil(log2 k) per sub-code;
    m*bits must fit an int64 (<= 60)."""
    bits = max(1, (k - 1).bit_length())
    if m * bits > 60:
        raise ValueError(f"m*bits = {m * bits} exceeds int64 (keep <= 60)")
    d = dim // m
    books = pq_codebooks(corpus, dim, m, k, iters, scale, id_col, vec_col)
    q = corpus.select(F.col(id_col),
                      quantize(F.col(vec_col), scale).alias("_q"))
    near = q.select(
        F.col(id_col),
        *[_nearest(F.slice(F.col("_q"), j * d + 1, d), books[j])
          .alias(f"_n{j}") for j in range(m)])
    code = sum((F.col(f"_n{j}")["cluster"] * F.lit(1 << (bits * j))
                for j in range(m)), F.lit(0).cast("long"))
    err = sum((F.col(f"_n{j}")["dist"] for j in range(m)),
              F.lit(0).cast("long"))
    return near.select(F.col(id_col), code.alias("code"),
                       err.alias("err"))
