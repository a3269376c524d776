"""Round-5 additions: JL random projection, ANN recall evaluation,
Zipf vocabulary table, cross-source overlap. Cross-checked against
plain-Python references on deterministic synthetic inputs."""

import math
import random

import pytest
from pyspark.sql import functions as F

from logunifier_spark.operators.dedup import source_overlap
from logunifier_spark.operators.projection import (RP_MULT, RP_OFF,
                                                   rp_project,
                                                   rp_sign_matrix)
from logunifier_spark.operators.similarity import ann_recall
from logunifier_spark.operators.textstats import vocab_zipf


# ------------------------------------------------------- rp_project ----

def _py_sign(j, dim, i):
    t = j * dim + i
    h = ((t % 2**31) * RP_MULT + RP_OFF) % 2**31
    return 1 if (h >> 15) & 1 else -1


def test_rp_sign_matrix_matches_scalar_spec():
    m = rp_sign_matrix(dim=7, r=5)
    for j in range(5):
        for i in range(7):
            assert m[j, i] == _py_sign(j, 7, i)


def test_rp_project_matches_python(spark):
    rng = random.Random(7)
    dim, r = 16, 6
    rows = [(vid, [rng.uniform(-1, 1) for _ in range(dim)])
            for vid in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(x.vec_id, x.comp): (x.val_fp, x.val)
           for x in rp_project(df, dim=dim, r=r).collect()}
    assert len(got) == 40 * r
    # python reference: float32-exact input values, per-term floor
    import numpy as np
    for vid, vec in rows[:10]:
        v32 = np.asarray(vec, dtype=np.float32).astype(np.float64)
        for j in range(r):
            fp = sum(int(math.floor(float(v32[i]) * _py_sign(j, dim, i)
                                    * (1 << 20)))
                     for i in range(dim))
            assert got[(vid, j)][0] == fp
            assert got[(vid, j)][1] == fp / (1 << 20)


def test_rp_project_preserves_relative_distance(spark):
    # JL sanity: a vector is closer (L2) to a near-copy of itself than
    # to an unrelated vector, after projection too
    rng = random.Random(3)
    dim = 64
    base = [rng.uniform(-1, 1) for _ in range(dim)]
    near = [x + 0.01 for x in base]
    far = [rng.uniform(-1, 1) for _ in range(dim)]
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)],
        "vec_id long, embedding array<float>")
    out = rp_project(df, dim=dim, r=16).collect()
    proj = {}
    for row in out:
        proj.setdefault(row.vec_id, {})[row.comp] = row.val
    d_near = sum((proj[0][c] - proj[1][c]) ** 2 for c in range(16))
    d_far = sum((proj[0][c] - proj[2][c]) ** 2 for c in range(16))
    assert d_near < d_far


# ------------------------------------------------------- ann_recall ----

def test_ann_recall_bounds_and_self_hit(spark):
    rng = random.Random(11)
    dim = 8
    rows = [(vid, [rng.uniform(-1, 1) for _ in range(dim)])
            for vid in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = (emb.where(F.col("vec_id") < 4)
            .select(F.col("vec_id").alias("qid"), "embedding"))
    out = ann_recall(emb, q, dim=dim, k=5, n_bits=4).collect()
    assert sorted(r.qid for r in out) == [0, 1, 2, 3]
    for r in out:
        # the query itself is in its own bucket with cosine 1.0, so it
        # is always a hit: 1 <= hits <= k
        assert 1 <= r.hits <= r.k == 5
        assert r.recall_ppm == (r.hits * 1_000_000) // 5


def test_ann_recall_is_one_when_lsh_is_exhaustive(spark):
    # n_bits=0 would be degenerate; with 1 bit + 1-bit multiprobe every
    # query probes BOTH buckets, so the candidate set is the full corpus
    # and recall must be exactly 1
    rng = random.Random(13)
    dim = 8
    rows = [(vid, [rng.uniform(-1, 1) for _ in range(dim)])
            for vid in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = (emb.where(F.col("vec_id") < 3)
            .select(F.col("vec_id").alias("qid"), "embedding"))
    out = ann_recall(emb, q, dim=dim, k=4, n_bits=1).collect()
    assert all(r.hits == 4 and r.recall_ppm == 1_000_000 for r in out)


# ------------------------------------------------------- vocab_zipf ----

def test_vocab_zipf_counts_and_coverage(spark):
    df = spark.createDataFrame(
        [(0, "a a a b b c"), (1, "a b X"), (2, None)],
        "doc_id long, text string")
    out = {r.token: r for r in vocab_zipf(df).collect()}
    # lower() folds X -> x; total tokens = 9
    assert out["a"].freq == 4 and out["a"].rank == 1
    assert out["b"].freq == 3 and out["b"].rank == 2
    # freq-1 tie between c and x: token ASC puts c first
    assert out["c"].rank == 3 and out["x"].rank == 4
    assert out["a"].zipf_c == 4 and out["b"].zipf_c == 6
    assert out["a"].cum_ppm == (4 * 1_000_000) // 9
    assert out["x"].cum_ppm == 1_000_000


def test_vocab_zipf_top_k_truncates_after_coverage(spark):
    df = spark.createDataFrame([(0, "a a b c")], "doc_id long, text string")
    out = vocab_zipf(df, top_k=1).collect()
    assert len(out) == 1
    # coverage is of the FULL corpus (4 tokens), not the truncated table
    assert out[0].token == "a" and out[0].cum_ppm == 500_000


# --------------------------------------------------- source_overlap ----

def test_source_overlap_known_jaccard(spark):
    shared = "t1 t2 t3 t4 t5 t6 t7 t8"          # exactly one 8-gram
    only_a = "a1 a2 a3 a4 a5 a6 a7 a8"
    only_b = "b1 b2 b3 b4 b5 b6 b7 b8"
    df = spark.createDataFrame(
        [(0, "sA", shared), (1, "sA", only_a),
         (2, "sB", shared), (3, "sB", only_b)],
        "doc_id long, source string, text string")
    out = source_overlap(df, gram_len=8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.source_a, r.source_b) == ("sA", "sB")
    assert r.inter_grams == 1 and r.union_grams == 3
    assert r.jaccard_ppm == 1_000_000 // 3


def test_source_overlap_max_sources_cap(spark):
    boiler = "t1 t2 t3 t4 t5 t6 t7 t8"           # in all three sources
    pair = "p1 p2 p3 p4 p5 p6 p7 p8"             # in sA and sB only
    df = spark.createDataFrame(
        [(0, "sA", boiler), (1, "sB", boiler), (2, "sC", boiler),
         (3, "sA", pair), (4, "sB", pair)],
        "doc_id long, source string, text string")
    # cap at 2 drops the universal gram; only the sA/sB pair survives
    out = source_overlap(df, gram_len=8, max_sources=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.source_a, r.source_b) == ("sA", "sB")
    assert r.inter_grams == 1 and r.union_grams == 1
    assert r.jaccard_ppm == 1_000_000
