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

from pyspark.sql import Window

from logunifier_spark.operators.kmeans import (
    _nearest,
    _sq_dist,
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


def ivfpq_topk(corpus: DataFrame, queries: DataFrame, dim: int,
               m: int = 8, k_codes: int = 16, n_cells: int = 8,
               nprobe: int = 2, topk: int = 5, iters: int = 1,
               scale: int = 1000, id_col: str = "vec_id",
               vec_col: str = "embedding",
               qid_col: str = "qid") -> DataFrame:
    """IVF-PQ search — the billion-scale ANN shape: an integer k-means
    coarse quantizer prunes the corpus to `nprobe` cells per query, and
    ranking inside the cells uses the ASYMMETRIC DISTANCE (ADC): the
    exact int64 squared L2 between the quantized query and each doc's
    PQ RECONSTRUCTION, evaluated as per-subspace distance-table lookups
    — the doc's full vector is never touched after encoding (that is
    the memory win; at 10^12 vectors only codes + codebooks stay hot).

    Plan shape: codebooks and coarse centroids are driver literals
    (KiBs); corpus-side cell assignment and PQ encoding are one
    zero-shuffle projection each; the query side (tiny) precomputes its
    m distance tables (k_codes ints each) BEFORE the join, so the cell
    join — the plan's only shuffle, and broadcast on the query side —
    is followed by m element_at lookups per candidate, not a vector
    fold. Returns (qid, id, adc BIGINT, rank INT).

    Everything is fixed-point (kmeans.py discipline), so the whole
    index — coarse training, m codebook trainings, probing, ADC — is
    value-hash oracled cross-engine."""
    d = dim // m
    books = pq_codebooks(corpus, dim, m, k_codes, iters, scale,
                         id_col, vec_col)
    cells = kmeans_centroids(corpus, k=n_cells, iters=iters, scale=scale,
                             id_col=id_col, vec_col=vec_col)
    cq = corpus.select(F.col(id_col),
                       quantize(F.col(vec_col), scale).alias("_q"))
    enc = cq.select(
        F.col(id_col),
        _nearest(F.col("_q"), cells)["cluster"].alias("_cell"),
        *[_nearest(F.slice(F.col("_q"), j * d + 1, d), books[j])["cluster"]
          .alias(f"_c{j}") for j in range(m)])
    qq = queries.select(F.col(qid_col),
                        quantize(F.col(vec_col), scale).alias("_q"))
    # nprobe nearest cells, ascending (dist, cid) struct sort
    probed = F.transform(
        F.slice(F.array_sort(F.array(*[
            F.struct(_sq_dist(F.col("_q"), cv).alias("d"),
                     F.lit(cid).cast("long").alias("cid"))
            for cid, cv in enumerate(cells)])), 1, nprobe),
        lambda e: e["cid"])
    # per-subspace ADC tables: distances from the query subvector to
    # every codebook entry — computed once per query, before the join
    dts = [F.array(*[
        _sq_dist(F.slice(F.col("_q"), j * d + 1, d), cv)
        for cv in books[j]]).alias(f"_dt{j}") for j in range(m)]
    qx = qq.select(F.col(qid_col), *dts,
                   F.explode(probed).alias("_cell"))
    cand = enc.join(F.broadcast(qx), "_cell")
    adc = sum((F.element_at(F.col(f"_dt{j}"),
                            (F.col(f"_c{j}") + 1).cast("int"))
               for j in range(m)), F.lit(0).cast("long"))
    scored = cand.select(F.col(qid_col), F.col(id_col),
                         adc.alias("adc"))
    w = Window.partitionBy(qid_col).orderBy(F.asc("adc"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= topk))
