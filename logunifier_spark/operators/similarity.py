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
  - embedding_neardup_pairs: all-pairs near-duplicate detection with a
    BOUNDED default (exact-vector collapse + banded sign-bit LSH candidates
    + exact cosine verify); the O(n²) cross join survives behind exact=True
    as the correctness baseline.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
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


def _vec_lengths(v: pd.Series) -> np.ndarray:
    """Per-row vector lengths; -1 for SQL NULL rows."""
    return np.fromiter(((-1 if x is None else len(x)) for x in v),
                       dtype=np.int64, count=len(v))


def _index_order_dots(v: pd.Series, cmat: np.ndarray):
    """THE shared battery recurrence for every cosine kernel in this
    module: (dots (n,k), vnorm2 (n,), valid (n,) bool) where dots/vnorm2
    accumulate one dimension at a time in index order — exactly the
    `dot`/`norm` F.aggregate recurrence in float64, vectorized ACROSS
    batch rows — so scores (including near-zero sign decisions and tie
    breaks) stay bit-identical to the Column forms and the DuckDB
    oracles' list_sum spec. Rows that are NULL or whose length differs
    from cmat's dim are flagged invalid (the zip_with forms padded with
    null and produced a NULL score); callers must mask them to None."""
    n = len(v)
    k, dim = cmat.shape
    valid = _vec_lengths(v) == dim
    dots = np.zeros((n, k))
    vn = np.zeros(n)
    idx = np.flatnonzero(valid)
    if idx.size:
        mat = np.stack([np.asarray(v.iloc[i], dtype=np.float64)
                        for i in idx])
        d = np.zeros((len(idx), k))
        nv = np.zeros(len(idx))
        for i in range(dim):   # index order == the fold's order
            d = d + mat[:, i:i + 1] * cmat[:, i][None, :]
            nv = nv + mat[:, i] * mat[:, i]
        dots[idx] = d
        vn[idx] = nv
    return dots, vn, valid


def _index_order_norm2(cmat: np.ndarray) -> np.ndarray:
    """Squared norms of the constant matrix's rows, accumulated in the
    same per-dimension index order as `_index_order_dots`."""
    nc = np.zeros(cmat.shape[0])
    for i in range(cmat.shape[1]):
        nc = nc + cmat[:, i] * cmat[:, i]
    return nc


def _masked(vals: np.ndarray, valid: np.ndarray) -> pd.Series:
    """Scalar kernel results with invalid rows as SQL NULL (object
    dtype — float64 NaN is NOT null, and Spark sorts NaN as the
    LARGEST double, which would poison a desc top-k window). The
    all-valid batch — the only case on a well-formed corpus — keeps
    the numeric dtype: object arrays cross Arrow element-by-element."""
    if valid.all():
        return pd.Series(vals)
    out = vals.astype(object)
    out[~valid] = None
    return pd.Series(out)


def pair_cosine(a: Column, b: Column) -> Column:
    """Arrow-batched cosine over joined (vec, vec) pair columns —
    BIT-IDENTICAL to the interpreted `cosine` fold (and therefore to
    the DuckDB oracles' list_sum spec): the `_index_order_dots`
    recurrence, grouped by pair length so mixed-dimension batches still
    compute every well-formed pair (zip_with semantics: a NULL vector
    or a length mismatch yields a NULL score). The HOF fold measured
    ~50 µs/element (CLAUDE.md); on the sf0.1 brute-force battery this
    kernel is ~6x end-to-end. Same shape as the pq.py / kmeans.py
    large-k lesson: vector batteries belong in numpy. The UDF is built
    at CALL time — a module-level @pandas_udf parses its DDL type
    against the active SparkContext at import (crashes sessionless
    imports, the verify-skill gotcha)."""
    @pandas_udf("double")
    def _kernel(x: pd.Series, y: pd.Series) -> pd.Series:
        n = len(x)
        if n == 0:
            return pd.Series([], dtype="float64")
        lx, ly = _vec_lengths(x), _vec_lengths(y)
        valid = (lx >= 0) & (lx == ly)
        out = np.empty(n, dtype=object)
        out[:] = None
        for length in np.unique(lx[valid]):
            idx = np.flatnonzero(valid & (lx == length))
            va = np.stack([np.asarray(x.iloc[i], dtype=np.float64)
                           for i in idx])
            vb = np.stack([np.asarray(y.iloc[i], dtype=np.float64)
                           for i in idx])
            dot_ = np.zeros(len(idx))
            na = np.zeros(len(idx))
            nb = np.zeros(len(idx))
            for i in range(int(length)):  # index order == the fold's
                dot_ = dot_ + va[:, i] * vb[:, i]
                na = na + va[:, i] * va[:, i]
                nb = nb + vb[:, i] * vb[:, i]
            vals = dot_ / (np.sqrt(na) * np.sqrt(nb) + 1e-12)
            if len(idx) == n:     # all-valid single-dim batch: keep the
                return pd.Series(vals)  # numeric dtype through Arrow
            out[idx] = vals
        return pd.Series(out)

    return _kernel(a, b)


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     qid_col: str = "qid") -> DataFrame:
    """Exact top-k against a SMALL query set. Returns (qid, vec_id,
    score, rank).

    The query set rides into the kernel closure as a matrix (it was
    already broadcast under the previous crossJoin form — collecting it
    driver-side is the same size assumption, the ivf_centroids
    pattern; the collect is one tiny job at plan-construction time).
    Each corpus vector is scored against ALL queries in one Arrow
    batch — a battery, the pq.py/_argmax_cell shape — then the score
    array posexplodes JVM-side and position maps back to qid through
    an array literal. Scale shape: the old crossJoin-HOF form ran one
    interpreted fold PER (corpus, query) PAIR — n·q·dim lambda calls —
    while the battery ships each corpus vector ONCE and runs dim numpy
    ops per Arrow batch. Honest micro-bench caveat: at sf0.1 the
    corpus is only 2k vectors, so the row is fixed-overhead bound and
    the battery's worker spin-up + query-collect job actually LOSES
    the interleaved A/B (~0.9 vs ~0.56 s); the win shows where it
    matters — ann_recall (battery + numpy bucketing) 1.5→0.5 s and at
    any corpus size where per-pair work dominates. Scores are
    bit-identical to the `cosine` fold (the shared `_index_order_dots`
    recurrence). Query rows with a NULL qid or NULL embedding are
    DROPPED (the crossJoin form emitted a null-scored partition for
    them — garbage either way); corpus rows with a NULL or
    wrong-dimension embedding score NULL per query and fall out of the
    rank window, exactly like the zip_with form."""
    from logunifier_spark.operators.dedup import fan_out
    qid_type = queries.schema[qid_col].dataType
    qrows = sorted(queries.select(qid_col, vec_col)
                          .where(F.col(qid_col).isNotNull() &
                                 F.col(vec_col).isNotNull())
                          .collect(),
                   key=lambda r: r[qid_col])
    qids = [r[qid_col] for r in qrows]
    if not qids:  # empty query set: the crossJoin form returned empty
        return corpus.select(
            F.lit(None).cast(qid_type).alias(qid_col),
            F.col(id_col), F.lit(0.0).alias("score"),
            F.lit(0).alias("rank")).where(F.lit(False))
    qmat = np.array([[float(x) for x in r[vec_col]] for r in qrows],
                    dtype=np.float64)                       # (q, dim)

    @pandas_udf("array<double>")
    def _battery(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        dots, nv, valid = _index_order_dots(v, qmat)
        nc = _index_order_norm2(qmat)
        scores = dots / (np.sqrt(nv)[:, None] * np.sqrt(nc)[None, :] + 1e-12)
        if valid.all():
            return pd.Series(list(scores))
        return pd.Series([scores[i] if valid[i] else None
                          for i in range(len(v))])

    # UDF in its own projection; the posexplode runs in a SEPARATE
    # select (ExtractPythonUDFs cannot place a UDF inside a Generate
    # node — CLAUDE.md)
    c = fan_out(corpus).select(F.col(id_col),
                               _battery(F.col(vec_col)).alias("_s"))
    # cast: F.lit of small Python ints is IntegerType — the output qid
    # must carry the QUERY frame's type regardless of row count/values
    qid_arr = F.array(*[F.lit(q) for q in qids])
    scored = (c.select(id_col, F.posexplode("_s").alias("_p", "score"))
               .select(F.element_at(qid_arr, F.col("_p") + 1)
                        .cast(qid_type).alias(qid_col),
                       F.col(id_col), F.col("score")))
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
    """n_bits sign bits against fixed hyperplanes → integer bucket id.
    Arrow-batched numpy kernel with the SAME accumulation order as the
    interpreted fold (per-dimension loop, vectorized across rows) so
    the sign of a near-zero dot product — and therefore the bucket —
    is bit-identical to the `dot` Column form and to the oracle's
    list_sum: a matmul's pairwise summation could flip it. n_bits
    interpreted folds per row were the dominant cost of lsh_topk at
    sf0.1 (the pq.py lesson again). NULL / wrong-dimension vectors get
    a NULL bucket (the fold form scored them null → null bucket) and
    drop out of the equi-join."""
    planes = np.array([_hyperplane(dim, b) for b in range(n_bits)],
                      dtype=np.float64)             # (n_bits, dim)
    weights = (1 << np.arange(n_bits)).astype(np.int64)

    @pandas_udf("long")
    def _bucket(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int64")
        dots, _, valid = _index_order_dots(v, planes)
        return _masked((dots >= 0).astype(np.int64) @ weights, valid)

    return _bucket(vec)


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
                .select(qid_col, id_col, pair_cosine(F.col("_cv"), F.col("_qv")).alias("score")))
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
    """Nearest-centroid id over the corpus — Arrow-batched numpy kernel
    (the n_centroids cosine batteries as Column HOF folds are
    interpreted per element, and as a fused scalar tree they blow the
    JIT method budget — the pq.py lesson; this was the dominant cost of
    ivf_topk at sf0.1). Bit-identical to the previous array_max-over-
    structs form: scores accumulate per dimension in index order
    (exactly the `cosine` fold recurrence, same final
    dot/(norm*norm + 1e-12) expression shape), and ties pick the
    LARGER cid (struct comparison was lexicographic on (score, cid)) —
    the reversed-argmax picks the last maximum. Still a pure
    projection: centroids ride into the UDF closure, NO shuffle.
    NULL / wrong-dimension vectors get a NULL cid and drop out of the
    probe equi-join."""
    cids = [cid for cid, _ in cents]
    assert cids == list(range(len(cents))), "cid must equal list index"
    cmat = np.array([cv for _, cv in cents], dtype=np.float64)  # (k, dim)
    k = cmat.shape[0]

    @pandas_udf("int")
    def _assign(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        dots, nv, valid = _index_order_dots(v, cmat)
        nc = _index_order_norm2(cmat)
        scores = dots / (np.sqrt(nv)[:, None] * np.sqrt(nc)[None, :] + 1e-12)
        # ties -> larger cid: argmax returns the FIRST max, so reverse
        best = (k - 1) - np.argmax(scores[:, ::-1], axis=1)
        return _masked(best.astype(np.int32), valid)

    return _assign(vec)


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
                              pair_cosine(F.col("_cv"), F.col("_qv")).alias("score")))
    w = Window.partitionBy(qid_col).orderBy(F.desc("score"), F.asc(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k))


# ------------------------------------------------------- index evaluation --

def ann_recall(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5,
               n_bits: int = 12, id_col: str = "vec_id",
               vec_col: str = "embedding",
               qid_col: str = "qid") -> DataFrame:
    """Recall@k of the hyperplane-LSH index against exact brute-force
    ground truth, per query: (qid, hits, k, recall_ppm). THE
    measure-don't-guess companion to lsh_topk — an ANN index whose
    recall was never measured is a guess, and at corpus scale the only
    affordable ground truth is exact top-k over a SMALL query sample
    (here: the caller's `queries` frame), which is linear
    (|queries| x corpus) and embarrassingly parallel.

    hits counts approximate top-k members that appear in the exact
    top-k (the standard recall@k numerator); the denominator is k even
    when the LSH candidate set returned fewer rows — an index that
    can't fill k slots HAS low recall. recall_ppm is integer DIV
    (Spark/DuckDB double rounding differs, CLAUDE.md). Scale shape:
    both top-k frames are |queries| x k rows, so the semi-join and the
    per-query aggregate are broadcast-sized no matter the corpus."""
    exact = brute_force_topk(corpus, queries, k, id_col, vec_col, qid_col)
    approx = lsh_topk(corpus, queries, dim, k, n_bits, id_col, vec_col,
                      qid_col)
    hits = (approx.join(F.broadcast(exact.select(qid_col, id_col)),
                        [qid_col, id_col], "left_semi")
                  .groupBy(qid_col)
                  .agg(F.count("*").alias("hits")))
    return (queries.select(qid_col).distinct()
                   .join(hits, qid_col, "left")
                   .na.fill({"hits": 0})
                   .select(qid_col, F.col("hits").cast("long").alias("hits"),
                           F.lit(k).cast("long").alias("k"),
                           F.expr(f"CAST((hits * 1000000) DIV {k} AS BIGINT)")
                            .alias("recall_ppm")))


# ------------------------------------------- all-pairs near-dup (bounded) --

def auto_bands(threshold: float, n_bits: int,
               miss_prob: float = 0.005) -> int:
    """Band count for the banded sign-bit LSH so a pair at EXACTLY the
    cosine threshold collides in >= 1 band with probability 1-miss_prob.
    Per Goemans-Williamson, one hyperplane separates a pair at angle θ
    with probability θ/π, so a threshold pair matches a full r-bit band
    with p1^r where p1 = 1 - acos(threshold)/π; bands = ln(1/miss_prob)
    / p1^r makes (1-p1^r)^bands ≈ miss_prob. Pairs ABOVE the threshold
    are recalled with strictly higher probability."""
    p1 = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    if p1 <= 0:
        raise ValueError(f"threshold {threshold} gives no LSH signal")
    return max(1, math.ceil(math.log(1.0 / miss_prob) / p1 ** n_bits))


def _band_buckets_udf(dim: int, n_bits: int, bands: int):
    """array<float> embedding -> array<long> of `bands` band-bucket keys
    ((band << n_bits) | sign bits against the module's deterministic
    hyperplanes). ONE numpy matmul per Arrow batch — the bands×n_bits
    dot products as Column expressions would build a multi-thousand-node
    scalar tree that blows the JIT method budget and deoptimizes the
    whole fused stage (the pq.py lesson: 10-26 s vs 1.3 s)."""
    from pyspark.sql.functions import pandas_udf

    planes = np.array([_hyperplane(dim, b) for b in range(bands * n_bits)],
                      dtype=np.float64).T          # (dim, bands*n_bits)
    weights = (1 << np.arange(n_bits)).astype(np.int64)
    offsets = (np.arange(bands, dtype=np.int64) << n_bits)

    @pandas_udf("array<long>")
    def _buckets(v: pd.Series) -> pd.Series:
        mat = np.stack(v.to_numpy()).astype(np.float64)   # (batch, dim)
        bits = (mat @ planes >= 0).astype(np.int64)
        bits = bits.reshape(len(mat), bands, n_bits)
        keys = bits @ weights + offsets                    # (batch, bands)
        return pd.Series(list(keys))

    return _buckets


def vector_exact_groups(emb: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding"
                        ) -> tuple[DataFrame, DataFrame]:
    """Exact-duplicate collapse for VECTORS (the dedup.exact_groups
    pattern): returns (members, rep_vecs) where members maps every id
    (`_m`) to its exact-clone group's min-id representative (`_rep`;
    grouped on the raw vector — at dim 64 the key is 256 B, narrower
    than most texts; key on a strong hash first if dims grow huge) and
    rep_vecs is emb filtered to representatives. BOTH frames are
    localCheckpointed: members feeds up to three expansion joins, and
    rep_vecs feeds the size-gate count plus the pairing pass — without
    the cut the groupBy collapse re-executes once per consumer
    (measured ~3× at sf0.1)."""
    members = emb.select(F.col(id_col).alias("_m"), F.col(vec_col).alias("_v"))
    reps = members.groupBy("_v").agg(F.min("_m").alias("_rep"))
    members = (members.join(reps, "_v").select("_m", "_rep")
                      .localCheckpoint(eager=False))
    rep_vecs = (emb.join(reps.select(F.col("_rep").alias(id_col)),
                         id_col, "left_semi")
                   .localCheckpoint(eager=False))
    return members, rep_vecs


def expand_rep_pairs_vec(pairs: DataFrame, members: DataFrame,
                         selfcos: DataFrame,
                         extra: tuple[str, ...] = ()) -> DataFrame:
    """Rep-level near-dup pairs -> member-level pairs, the vector twin of
    dedup.expand_rep_pairs (ONE Spark spec shared by embedding_neardup
    and semdedup, mirrored in SQL by duck_oracles._expand_sql):

      - `pairs` (*extra, id_a, id_b, cos): rep pairs; cross-group member
        pairs inherit the rep pair's cos (and `extra` columns) verbatim —
        cos is a pure function of the two vectors and identical vectors
        share the rep's;
      - `members` (_m, _rep): the exact-clone groups;
      - `selfcos` (_rep, *extra, cos): the rep's SELF-cosine, already
        computed by the same expression and gated on the same threshold —
        within-group (exact clone) pairs take it verbatim (≈1.0;
        degenerate near-zero vectors fall below the gate and drop,
        exactly as the brute path would emit)."""
    ma = members.select(F.col("_rep").alias("id_a"), F.col("_m").alias("_a"))
    mb = members.select(F.col("_rep").alias("id_b"), F.col("_m").alias("_b"))
    cross = (pairs.join(ma, "id_a").join(mb, "id_b")
             .select(*extra, F.least("_a", "_b").alias("id_a"),
                     F.greatest("_a", "_b").alias("id_b"), "cos"))
    within = (members.alias("x").join(members.alias("y"), "_rep")
              .where(F.col("x._m") < F.col("y._m"))
              .join(selfcos, "_rep")
              .select(*extra, F.col("x._m").alias("id_a"),
                      F.col("y._m").alias("id_b"), "cos"))
    return cross.unionByName(within)


def embedding_neardup_pairs(emb: DataFrame, dim: int,
                            threshold: float = 0.45,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            exact: bool = False, n_bits: int = 6,
                            bands: int | None = None,
                            miss_prob: float = 0.005,
                            collapse_exact: bool = True,
                            expand: bool = True,
                            max_bucket: int | None = 100_000,
                            exact_max_reps: int = 4096) -> DataFrame:
    """All (id_a < id_b) pairs with cosine >= threshold, as
    (id_a, id_b, cos). DEFAULT is the bounded composition (round-5, was
    the engine's one remaining intentional O(n²) default):

      1. exact-clone collapse — identical vectors verify once on their
         min-id representative (cos is a pure function of the two
         vectors), then expand back; the round-4 soak lesson applied to
         embeddings (c clones per vector otherwise multiply candidates
         by c²). `expand=False` returns rep pairs only.
      2. banded sign-bit LSH candidates — `bands` bands of `n_bits`
         deterministic-hyperplane sign bits (ONE numpy Arrow matmul,
         exploded to (band_bucket, id) and self-joined), so candidate
         work scales ~ bands · Σ_bucket pop² instead of n²/2. Bands
         default from `auto_bands(threshold, n_bits, miss_prob)`.
      3. exact cosine verify — the identical zip_with/aggregate double
         fold as the brute path, so PRECISION IS EXACT; the only
         approximation is candidate recall.

    RECALL BOUND (docstring contract): a pair at cosine s >= threshold
    is missed with probability <= (1 - p1^n_bits)^bands where
    p1 = 1 - acos(s)/π — at the defaults (threshold 0.45, n_bits 6,
    miss_prob 0.005, 72 bands) a threshold-grade pair is recalled with
    p >= 0.995 and stronger pairs exponentially better (exact clones
    always, via the collapse). Empirically on the sf0.1 corpus the full
    144-pair truth set is recalled with 1.5× band margin (all pairs
    collide by band 48). `exact=True` keeps the brute-force cross join
    (every pair, fanned out, broadcast right side) for oracles and
    small corpora.

    Scale shape: n_bits should grow ~log2(n / target_bucket_pop) as the
    corpus grows (bands re-derive automatically from the threshold);
    `max_bucket` drops hotter-than-cap band buckets from candidate
    generation (with collapse ON, populations count DISTINCT vectors —
    the minhash_lsh_pairs cap rationale, see dedup.py).

    SIZE-ADAPTIVE exactness: when the collapsed corpus holds <=
    `exact_max_reps` distinct vectors (default 4096 → <= ~8.4M pair
    evaluations), the rep pairing runs the EXACT broadcast cross join
    instead of the banded chain — at that size brute force is both
    faster (the band explode + bucket joins cost ~10 exchanges of fixed
    overhead; measured 3.8 s banded vs 1.2 s brute at 2k vectors,
    sf0.1) and exact, so the recall bound only ever applies where
    approximation is actually needed. The rep count is one narrow
    aggregate at plan-construction time (same pattern as unify()'s
    dedup probe — benches time construction + execution together)."""
    from logunifier_spark.operators.dedup import fan_out

    cos_ab = (dot(F.col("_va"), F.col("_vb"))
              / (F.col("_na") * F.col("_nb") + F.lit(1e-12)))

    def _brute_pairs(base):
        """Exact all-pairs among `base` (_id, _v): fan the left side out,
        broadcast the right — the ONE brute spec shared by exact=True and
        the size-gate path (a tweak to the epsilon/hint lands in both)."""
        a = (fan_out(base)
             .select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
             .withColumn("_na", norm(F.col("_va"))))
        b = (base.select(F.col("_id").alias("id_b"),
                         F.col("_v").alias("_vb"))
                 .withColumn("_nb", norm(F.col("_vb"))))
        return (a.crossJoin(F.broadcast(b))
                 .where(F.col("id_a") < F.col("id_b"))
                 .withColumn("cos", cos_ab)
                 .where(F.col("cos") >= threshold)
                 .select("id_a", "id_b", "cos"))

    members = None
    if collapse_exact and not exact:
        members, corpus = vector_exact_groups(emb, id_col, vec_col)
        # one aggregate answers both questions (rows vs distinct reps):
        # clone-free corpora skip the expansion joins AND the rep
        # semi-join entirely (corpus = the raw input)
        row = members.agg(F.count("*").alias("_n"),
                          F.countDistinct("_rep").alias("_r")).first()
        n_reps = int(row["_r"])
        if n_reps == int(row["_n"]):
            members = None
            corpus = emb
    else:
        corpus = emb
        n_reps = None

    base = corpus.select(F.col(id_col).alias("_id"),
                         F.col(vec_col).alias("_v"))
    if exact:
        return _brute_pairs(base)

    if n_reps is None:
        n_reps = corpus.count()
    if n_reps <= exact_max_reps:
        pairs = _brute_pairs(base)
        sides = base.select("_id", "_v", norm(F.col("_v")).alias("_n"))
    else:
        if bands is None:
            bands = auto_bands(threshold, n_bits, miss_prob)
        # UDF input is a plain column and the explode happens on a projected
        # array column in a separate select (ExtractPythonUDFs cannot place a
        # Python UDF inside a Generate node — CLAUDE.md)
        with_keys = (fan_out(base)
                     .withColumn("_bb", _band_buckets_udf(dim, n_bits, bands)(
                         F.col("_v")))
                     .localCheckpoint(eager=False))  # both join sides
        banded = with_keys.select("_id", F.explode("_bb").alias("_k"))
        if max_bucket is not None:
            cool = (banded.groupBy("_k").agg(F.count("*").alias("_n"))
                          .where(F.col("_n") <= max_bucket).select("_k"))
            banded = banded.join(cool, "_k", "left_semi")
        cand = (banded.alias("x").join(banded.alias("y"), "_k")
                .where(F.col("x._id") < F.col("y._id"))
                .select(F.col("x._id").alias("id_a"),
                        F.col("y._id").alias("id_b"))
                .dropDuplicates(["id_a", "id_b"]))
        sides = with_keys.select("_id", "_v", norm(F.col("_v")).alias("_n"))
        pairs = (cand
                 .join(sides.select(F.col("_id").alias("id_a"),
                                    F.col("_v").alias("_va"),
                                    F.col("_n").alias("_na")), "id_a")
                 .join(sides.select(F.col("_id").alias("id_b"),
                                    F.col("_v").alias("_vb"),
                                    F.col("_n").alias("_nb")), "id_b")
                 .withColumn("cos", cos_ab)
                 .where(F.col("cos") >= threshold)
                 .select("id_a", "id_b", "cos"))
    if members is None or not expand:
        return pairs
    selfcos = (sides
               .select(F.col("_id").alias("_rep"),
                       (dot(F.col("_v"), F.col("_v"))
                        / (F.col("_n") * F.col("_n") + F.lit(1e-12)))
                       .alias("cos"))
               .where(F.col("cos") >= threshold))
    return expand_rep_pairs_vec(pairs, members, selfcos)
