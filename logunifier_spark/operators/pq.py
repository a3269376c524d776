"""Product quantization (PQ) — compact vector codes for billion-scale
ANN (Jégou et al. 2011), completing the IVF story in similarity.py:
IVF prunes WHICH vectors a query compares against; PQ shrinks WHAT is
compared, replacing a dim-D float vector with m sub-codes (one byte-ish
each) whose codebooks are per-subspace k-means centroids. At 10^12
vectors the raw embeddings are ~300 TB while 8-byte PQ codes are ~8 TB —
the difference between an index that fits the cluster's memory and one
that doesn't.

Numeric spec — kmeans.py's fixed-point discipline end to end: vectors
floor-quantize to int64 (floor(double(x)*scale)), distances are exact
int64 squared L2, ties break toward the smaller centroid id, the Lloyd
update is exact floor division, empty cells keep their previous
centroid, seeds are the k lowest-portable-hash rows. Every number is a
pure function of the input set, so a full value-hash oracle exists: the
DuckDB side re-trains ALL m codebooks via the parameterized
unrolled-Lloyd CTE generator (duck_oracles._kmeans_ctes with
per-subspace prefixes) and must agree bit-for-bit.

Engine shape — this is the module's one deliberate departure from the
pure-Column kmeans.py path, and it is measured: evaluating m*k
centroid distances per row as Column expressions is either m*k
interpreted HOF folds (zip_with/aggregate lambdas run on the
interpreted path per element) or a fused scalar tree that blows the
JIT method budget (CLAUDE.md's 400-node lesson) — both measured
10-20 s for a 5k x 64 corpus at sf0.1. The same math as ONE
Arrow-batched numpy UDF (quantize, broadcast (n,k,d) diff, argmin) is
vectorized C per batch and runs the whole encode in well under a
second. Training assigns ALL m subspaces in one scan (one UDF), the
update is a single posexplode + hash aggregate keyed (subspace,
cluster, pos) — map-side combined to m*k*(D/m) rows regardless of
corpus size — and seeding is ONE collect of the k lowest-hash full
vectors, sliced driver-side. Per iteration: one scan, one tiny
shuffle, exactly like kmeans.py, but m models at once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from logunifier_spark.operators.kmeans import quantize


def _quant_np(vecs: pd.Series, scale: int) -> np.ndarray:
    """(n, dim) int64 — numpy mirror of kmeans.quantize: float32 ->
    float64 -> *scale -> floor. Bit-identical to the Column form (same
    IEEE ops in the same order)."""
    a = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
    return np.floor(a * scale).astype(np.int64)


def _sub_assign(q: np.ndarray, cents: list[list[int]], lo: int,
                hi: int) -> tuple[np.ndarray, np.ndarray]:
    """argmin cluster ids + min distances of q[:, lo:hi] against the
    centroid list. np.argmin takes the FIRST minimum — same tie-break
    as the (dist, cid) struct min (smaller cid wins)."""
    sub = q[:, lo:hi]
    c = np.asarray(cents, dtype=np.int64)
    dist = ((sub[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
    ids = dist.argmin(axis=1)
    return ids, dist[np.arange(len(ids)), ids]


def _seed_full(corpus: DataFrame, k: int, scale: int, id_col: str,
               vec_col: str) -> list[list[int]]:
    """The k lowest-portable-hash rows' FULL quantized vectors — ONE
    job via kmeans.seed_centroids (the canonical seeding rule; a
    second copy here would let the two drift apart and break the
    bit-for-bit oracle). Subspace seeds are driver-side slices
    (quantize is element-wise, so slice-then-quantize ==
    quantize-then-slice). Raises when the corpus holds fewer than k
    rows — padding codebooks would silently change every code."""
    from logunifier_spark.operators.kmeans import seed_centroids
    full = seed_centroids(corpus, k, id_col, vec_col, scale)
    if len(full) < k:
        raise ValueError(
            f"corpus has only {len(full)} rows, need k={k} seeds")
    return full


def pq_codebooks(corpus: DataFrame, dim: int, m: int = 8, k: int = 16,
                 iters: int = 1, scale: int = 1000,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> list[list[list[int]]]:
    """Train the m per-subspace codebooks (each k x dim/m int64,
    driver-held). `dim` is explicit — reading it from data would cost a
    job and make the layout contract implicit. All m subspaces train in
    each single scan (see module docstring); the result is identical to
    m independent kmeans.kmeans_centroids runs on the subvector frames
    (proven in tests and by the oracle)."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    full = _seed_full(corpus, k, scale, id_col, vec_col)
    books = [[fs[j * d:(j + 1) * d] for fs in full] for j in range(m)]
    from logunifier_spark.operators.dedup import fan_out
    q = fan_out(corpus).select(F.col(vec_col),
                               quantize(F.col(vec_col), scale).alias("_q"))
    for _ in range(iters):
        bks = [list(map(list, b)) for b in books]

        @pandas_udf("array<long>")
        def assign_all(v: pd.Series) -> pd.Series:
            if len(v) == 0:
                return pd.Series([], dtype=object)
            qn = _quant_np(v, scale)
            ids = [(_sub_assign(qn, bks[j], j * d, (j + 1) * d)[0])
                   for j in range(m)]
            out = np.stack(ids, axis=1)
            return pd.Series([row.tolist() for row in out])

        # UDF in its own projection; explode in a separate select
        # (CLAUDE.md: keep UDFs out of Generate nodes)
        assigned = q.select("_q", assign_all(F.col(vec_col)).alias("_cl"))
        ex = assigned.select("_cl", F.posexplode("_q").alias("pos", "v"))
        jcol = F.floor(F.col("pos") / F.lit(d)).cast("int")
        upd = (ex.select(jcol.alias("j"),
                         F.element_at(F.col("_cl"), jcol + 1)
                          .alias("cluster"),
                         F.col("pos"), F.col("v"))
                 .groupBy("j", "cluster", "pos")
                 .agg(F.sum("v").alias("s"), F.count("*").alias("n"))
                 .collect())
        acc: dict[tuple[int, int], list[tuple[int, int, int]]] = {}
        for r in upd:
            acc.setdefault((int(r["j"]), int(r["cluster"])), []).append(
                (int(r["pos"]), int(r["s"]), int(r["n"])))
        books = [
            [[s // n for _, s, n in sorted(acc[(j, cid)])]
             if (j, cid) in acc else books[j][cid]
             for cid in range(k)]
            for j in range(m)
        ]
    return books


def pq_encode(corpus: DataFrame, dim: int, m: int = 8, k: int = 16,
              iters: int = 1, scale: int = 1000, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, code BIGINT, err BIGINT): the packed PQ code and exact
    reconstruction error per vector. bits = ceil(log2 k) per sub-code;
    m*bits must fit an int64 (<= 60). Packed because a bigint is
    groupable / joinable / oracle-hashable where array<int> is awkward
    — and the 8-byte row IS the storage win."""
    bits = max(1, (k - 1).bit_length())
    if m * bits > 60:
        raise ValueError(f"m*bits = {m * bits} exceeds int64 (keep <= 60)")
    d = dim // m
    books = pq_codebooks(corpus, dim, m, k, iters, scale, id_col, vec_col)
    shifts = [1 << (bits * j) for j in range(m)]

    @pandas_udf("array<long>")
    def encode(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        qn = _quant_np(v, scale)
        code = np.zeros(len(qn), dtype=np.int64)
        err = np.zeros(len(qn), dtype=np.int64)
        for j in range(m):
            ids, dmin = _sub_assign(qn, books[j], j * d, (j + 1) * d)
            code += ids * shifts[j]
            err += dmin
        return pd.Series([[int(c), int(e)] for c, e in zip(code, err)])

    out = corpus.select(F.col(id_col), encode(F.col(vec_col)).alias("_ce"))
    return out.select(F.col(id_col),
                      F.element_at("_ce", 1).alias("code"),
                      F.element_at("_ce", 2).alias("err"))


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
    (KiBs); the corpus side is ONE scan through the numpy assign/encode
    UDF (cell + m sub-codes per row); the query side (tiny) precomputes
    its m distance tables (k_codes ints each) BEFORE the join, so the
    cell join — the plan's only shuffle, and broadcast on the query
    side — is followed by m element_at lookups per candidate, not a
    vector fold. Returns (qid, id, adc BIGINT, rank INT).

    Everything is fixed-point, so the whole index — coarse training, m
    codebook trainings, probing, ADC — is value-hash oracled
    cross-engine (the oracle computes ADC by the mathematically-equal
    reconstruction route)."""
    d = dim // m
    books = pq_codebooks(corpus, dim, m, k_codes, iters, scale,
                         id_col, vec_col)
    # the coarse quantizer is the m=1 degenerate of the same trainer —
    # identical spec (and results) to kmeans.kmeans_centroids, through
    # the vectorized path
    cells = pq_codebooks(corpus, dim, 1, n_cells, iters, scale,
                         id_col, vec_col)[0]

    @pandas_udf("array<long>")
    def cell_and_codes(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        qn = _quant_np(v, scale)
        cell, _ = _sub_assign(qn, cells, 0, dim)
        cols = [cell] + [
            _sub_assign(qn, books[j], j * d, (j + 1) * d)[0]
            for j in range(m)]
        out = np.stack(cols, axis=1)
        return pd.Series([row.tolist() for row in out])

    enc = (corpus.select(F.col(id_col),
                         cell_and_codes(F.col(vec_col)).alias("_a"))
                 .select(F.col(id_col),
                         F.element_at("_a", 1).alias("_cell"),
                         *[F.element_at("_a", j + 2).alias(f"_c{j}")
                           for j in range(m)]))
    # query-side probe list + per-subspace ADC tables in ONE numpy UDF
    # row: [probed cells (nprobe)..., dt_0 (k_codes)..., dt_{m-1}...].
    # The HOF/Column form of these ~m*k_codes distance trees ran the
    # tiny query frame fine but cost seconds of driver-side analysis +
    # codegen per run — the tables are data, not plan structure.
    np_cells = np.asarray(cells, dtype=np.int64)

    @pandas_udf("array<long>")
    def query_tables(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        qn = _quant_np(v, scale)
        dc = ((qn[:, None, :] - np_cells[None, :, :]) ** 2).sum(axis=2)
        # stable ascending argsort: ties keep the smaller cid, same as
        # the (dist, cid) struct sort
        probe = np.argsort(dc, axis=1, kind="stable")[:, :nprobe]
        parts = [probe]
        for j in range(m):
            b = np.asarray(books[j], dtype=np.int64)
            sub = qn[:, j * d:(j + 1) * d]
            parts.append(((sub[:, None, :] - b[None, :, :]) ** 2)
                         .sum(axis=2))
        out = np.concatenate(parts, axis=1)
        return pd.Series([row.tolist() for row in out])

    qt = queries.select(F.col(qid_col),
                        query_tables(F.col(vec_col)).alias("_a"))
    qx = qt.select(
        F.col(qid_col),
        *[F.slice(F.col("_a"), nprobe + j * k_codes + 1, k_codes)
          .alias(f"_dt{j}") for j in range(m)],
        F.explode(F.slice(F.col("_a"), 1, nprobe)).alias("_cell"))
    cand = enc.join(F.broadcast(qx), "_cell")
    adc = sum((F.element_at(F.col(f"_dt{j}"),
                            (F.col(f"_c{j}") + 1).cast("int"))
               for j in range(m)), F.lit(0).cast("long"))
    scored = cand.select(F.col(qid_col), F.col(id_col),
                         adc.alias("adc"))
    w = Window.partitionBy(qid_col).orderBy(F.asc("adc"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= topk))
