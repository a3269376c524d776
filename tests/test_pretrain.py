"""Pretraining-hygiene operators: decontamination, token-window chunking,
Gopher-style repetition stats. Cross-checked against plain-Python
reference implementations on deterministic synthetic corpora."""

import random
import re

import pytest
from pyspark.sql import functions as F

from logunifier_spark.operators.chunk import chunk_by_tokens
from logunifier_spark.operators.decontam import (contaminated_ids,
                                                 decontaminate)
from logunifier_spark.operators.textstats import repetition_stats

WS_RE = re.compile(r"[ \t\r\n\f\x0B]+")


def _pywords(text):
    norm = WS_RE.sub(" ", (text or "").lower()).strip()
    return norm.split(" ") if norm else []


def _pygrams(text, n):
    w = _pywords(text)
    return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]


def _salad(rng, n):
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa"]
    return " ".join(rng.choice(vocab) for _ in range(n))


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(7)
    rows = [(i, _salad(rng, rng.randint(0, 40)), f"s{i % 3}")
            for i in range(60)]
    # plant a benchmark phrase (doc 20 is bench) inside two training docs
    rows[20] = (20, rows[20][1] + " the quick brown fox jumps", "s2")
    rows[10] = (10, rows[10][1] + " the quick brown fox jumps high", "s1")
    rows[11] = (11, "the quick brown fox jumps " + rows[11][1], "s2")
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    return rows, df


def test_decontaminate_matches_python(spark, corpus):
    rows, df = corpus
    bench = df.where(F.col("doc_id") % 20 == 0)      # ids 0,20,40
    train = df.where(F.col("doc_id") % 20 != 0)
    n = 5
    bgrams = set()
    for i, text, _ in rows:
        if i % 20 == 0:
            bgrams.update(_pygrams(text, n))
    expect = {}
    for i, text, _ in rows:
        if i % 20 != 0:
            hits = {g for g in _pygrams(text, n) if g in bgrams}
            if hits:
                expect[i] = len(hits)
    got = {r["doc_id"]: r["n_hits"]
           for r in contaminated_ids(train, bench, n=n).collect()}
    assert got == expect and 10 in got and 11 in got
    survivors = {r["doc_id"] for r in decontaminate(train, bench, n=n).collect()}
    train_ids = {i for i, _, _ in rows if i % 20 != 0}
    assert survivors == train_ids - set(expect)      # partition: disjoint, total


def test_chunk_reconstruction_and_windows(spark, corpus):
    rows, df = corpus
    # non-overlapping chunks concatenate back to the normalized text
    out = chunk_by_tokens(df, size=7, stride=7).orderBy("doc_id", "chunk_id")
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, text, _ in rows:
        words = _pywords(text)
        chunks = by_doc[i]
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        joined = " ".join(c["chunk_text"] for c in chunks if c["chunk_text"])
        assert joined == " ".join(words)
        assert sum(c["n_tokens"] for c in chunks) == len(words)
    # overlapping windows equal python slicing; every word covered
    size, stride = 8, 3
    out2 = chunk_by_tokens(df, size=size, stride=stride)
    got = {(r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
           for r in out2.collect()}
    for i, text, _ in rows:
        words = _pywords(text)
        n_chunks = 1 + -(-max(len(words) - size, 0) // stride)
        for c in range(n_chunks):
            piece = words[c * stride: c * stride + size]
            assert got[(i, c)] == (" ".join(piece), len(piece))
        assert (i, n_chunks) not in got


def test_chunk_validates_params(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_by_tokens(df, size=0)
    with pytest.raises(ValueError):
        chunk_by_tokens(df, size=4, stride=5)
    with pytest.raises(ValueError):
        chunk_by_tokens(df, size=4, stride=0)


def test_repetition_stats_rules(spark):
    good = " ".join(f"word{i} item{i} thing{i}" for i in range(20))  # 60 distinct
    dup2 = "spam ham " * 40                                          # all dup 2-grams
    lines = "\n".join(["same line"] * 8 + [f"l{i}" for i in range(2)])
    numeric = " ".join(str(i) for i in range(100, 160))              # no alpha
    rows = [(0, good), (1, dup2), (2, lines), (3, numeric), (4, ""), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[0]["gopher_pass"] and out[0]["dup_2gram_frac"] == 0.0
    assert not out[1]["gopher_pass"] and out[1]["dup_2gram_frac"] > 0.9
    assert out[2]["dup_line_frac"] == pytest.approx(0.7)
    assert not out[3]["gopher_pass"] and out[3]["alpha_word_frac"] == 0.0
    for i in (4, 5):   # empty/null: all-zero stats, fails the floor rules
        assert out[i]["n_words"] == 0 and not out[i]["gopher_pass"]
        assert out[i]["mean_word_len"] == 0.0
    # python cross-check of the distinct-ratio metrics
    g2 = _pygrams(dup2, 2)
    assert out[1]["dup_2gram_frac"] == pytest.approx(
        1 - len(set(g2)) / len(g2), abs=1e-6)
    w = _pywords(good)
    assert out[0]["n_words"] == len(w)
    assert out[0]["mean_word_len"] == pytest.approx(
        sum(map(len, w)) / len(w), abs=1e-6)


# --------------------------------------------------------------- TF-IDF ----

def _py_tfidf(rows, k=3):
    """Independent reference: python dict tf/df + math.log."""
    import math
    import re
    tf = {}
    for doc_id, text in rows:
        if text is None:
            continue
        for t in re.split("[ \t\r\n\f\x0B]+", text.lower()):
            if re.fullmatch("[a-z]{2,}", t):
                tf[(doc_id, t)] = tf.get((doc_id, t), 0) + 1
    df = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    n = len(rows)
    out = []
    for doc_id in {d for d, _ in rows}:
        scored = sorted(
            ((t, c, df[t], c * math.log((n + 1) / (df[t] + 1)))
             for (d, t), c in tf.items() if d == doc_id),
            key=lambda x: (-x[3], x[0]))
        for rank, (t, c, dfv, s) in enumerate(scored[:k], 1):
            out.append((doc_id, t, c, dfv, rank, round(s, 6)))
    return sorted(out)


def test_tfidf_matches_python(spark):
    from logunifier_spark.operators.tfidf import tfidf_top_terms
    rows = [
        (0, "the cat sat on the mat the cat"),
        (1, "the dog sat on the log"),
        (2, "cat dog cat dog cat"),
        (3, "Zebra zebra ZEBRA unique"),          # case folding
        (4, "123 456 !!! a"),                     # no valid terms at all
        (5, ""),                                  # empty
        (6, None),                                # null
        (7, "tie tie vie vie"),                   # same tf+df → term order
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(map(tuple, tfidf_top_terms(df, k=3).collect()))
    assert got == _py_tfidf(rows, k=3)
    docs_with_rows = {r[0] for r in got}
    assert docs_with_rows == {0, 1, 2, 3, 7}  # 4/5/6 yield nothing


def test_tfidf_tie_break_is_term_ascending(spark):
    from logunifier_spark.operators.tfidf import tfidf_top_terms
    rows = [(0, "bb aa bb aa"), (1, "cc dd")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["doc_id"], r["rank"]): r["term"]
           for r in tfidf_top_terms(df, k=2).collect()}
    # equal tf and df inside each doc → alphabetical rank
    assert out[(0, 1)] == "aa" and out[(0, 2)] == "bb"
    assert out[(1, 1)] == "cc" and out[(1, 2)] == "dd"


# --------------------------------------------------- unigram perplexity ----

def test_unigram_logppl_matches_python(spark):
    import math
    import re
    from logunifier_spark.operators.perplexity import QUANT, unigram_logppl
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the the the the"),            # all high-freq → low logppl
        (2, "zyzzyva qwertyish blorp"),    # all hapax → high logppl
        (3, "123 !!!"),                    # no tokens → no row
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["logppl"])
           for r in unigram_logppl(df).collect()}

    tf = {}
    for d, t in rows:
        for w in re.split("[ \t\r\n\f\x0B]+", (t or "").lower()):
            if re.fullmatch("[a-z]{2,}", w):
                tf[(d, w)] = tf.get((d, w), 0) + 1
    cnt = {}
    for (_, w), c in tf.items():
        cnt[w] = cnt.get(w, 0) + c
    denom = sum(cnt.values()) + len(cnt)
    want = {}
    for d in {r[0] for r in rows}:
        items = [(w, c) for (dd, w), c in tf.items() if dd == d]
        if not items:
            continue
        n = sum(c for _, c in items)
        s = sum(c * math.floor(QUANT * math.log((cnt[w] + 1) / denom))
                for w, c in items)
        want[d] = (n, round(-(float(s) / (float(QUANT) * n)), 6))
    assert got == want
    assert set(got) == {0, 1, 2}
    assert got[1][1] < got[0][1] < got[2][1]  # freq ordering is sane


def test_logppl_token_free_corpus_is_empty(spark):
    # rows but zero valid tokens: sum() aggregates to NULL — must return
    # the empty frame, not crash on int(None) (ADVICE r3)
    from logunifier_spark.operators.perplexity import unigram_logppl
    df = spark.createDataFrame([(0, "123 !!!"), (1, None)],
                               "doc_id long, text string")
    out = unigram_logppl(df)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == \
        ["doc_id", "n_tokens", "logppl"]


def test_perplexity_filter_keeps_low_tail(spark):
    from logunifier_spark.operators.perplexity import (
        perplexity_filter,
        unigram_logppl,
    )
    rows = [(i, "common words repeat here " * 3) for i in range(8)]
    rows.append((8, "xqzzt vvkpw jjqrr"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    scores = {r["doc_id"]: r["logppl"] for r in unigram_logppl(df).collect()}
    cut = (max(v for d, v in scores.items() if d != 8)
           + scores[8]) / 2
    kept = {r["doc_id"] for r in perplexity_filter(df, cut).collect()}
    assert kept == set(range(8))


# ---------------------------------------------------------------- BM25 ----

def test_bm25_token_free_corpus_is_empty(spark):
    # same int(None) edge as unigram_logppl: docs exist, no valid tokens
    from logunifier_spark.operators.bm25 import bm25_topk
    df = spark.createDataFrame([(0, "42 !!"), (1, "")],
                               "doc_id long, text string")
    out = bm25_topk(df, [("q", "spark")])
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == \
        ["query_id", "doc_id", "rank", "score"]


def test_bm25_matches_python_reference(spark):
    import math
    import re
    from logunifier_spark.operators.bm25 import BM25_QUANT, bm25_topk
    docs = [
        (0, "spark shuffle join join join window"),
        (1, "spark window agg filter window"),
        (2, "customer order order payment ledger"),
        (3, "the of and or but"),
        (4, "spark spark spark spark spark spark spark spark"),
        (5, ""),
    ]
    queries = [("q_sp", "spark join"), ("q_cust", "customer payment order"),
               ("q_none", "zzzzz")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [(r["query_id"], r["doc_id"], r["rank"], r["score"])
           for r in bm25_topk(df, queries, top_k=3).collect()]

    # independent reference
    k1, b = 1.2, 0.75
    tok = lambda t: [w for w in re.split("[ \t\r\n\f\x0B]+", t.lower())
                     if re.fullmatch("[a-z]{2,}", w)]
    toks = {d: tok(t) for d, t in docs}
    n = len(docs)
    dl = {d: len(ws) for d, ws in toks.items()}
    avgdl = sum(dl.values()) / float(n)
    want = []
    for qid, qt in queries:
        qterms = set(tok(qt))
        scores = {}
        for d, ws in toks.items():
            s = 0
            for t in qterms:
                tf = ws.count(t)
                if not tf:
                    continue
                df_ = sum(1 for ws2 in toks.values() if t in ws2)
                idf = math.log(1.0 + (float(n) - df_ + 0.5) / (df_ + 0.5))
                c = idf * (tf * (k1 + 1.0)) / \
                    (tf + k1 * ((1.0 - b) + b * dl[d] / avgdl))
                s += math.floor(BM25_QUANT * c)
            if s:
                scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        want += [(qid, d, i + 1, round(float(s) / BM25_QUANT, 6))
                 for i, (d, s) in enumerate(ranked)]
    assert sorted(got) == sorted(want)
    # saturation sanity: 8x'spark' must not drown the multi-term match
    by_q = {(q, r): d for q, d, r, _ in got}
    assert by_q[("q_sp", 1)] == 0          # matches both query terms


# -------------------------------------------------- repeated n-grams ----

def test_repeated_ngram_stats(spark):
    import pytest as _pytest
    from logunifier_spark.operators.dedup import repeated_ngram_stats
    boiler = "all rights reserved by the"
    rows = [
        (0, boiler + " acme corp and its partners"),
        (1, boiler + " zenith inc forever and ever"),
        (2, "completely unique prose about nothing in particular"),
        (3, "tiny"),                                # < n words -> no row
        (4, "rep rep rep rep rep rep rep rep"),     # self-repetition counts
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repeated_ngram_stats(df, n=5).collect()}
    assert 3 not in out
    # docs 0 and 1 share exactly one 5-gram (the boilerplate prefix)
    assert out[0]["n_grams"] == 6 and out[0]["n_repeated"] == 1
    assert out[1]["n_grams"] == 6 and out[1]["n_repeated"] == 1
    assert out[2]["n_repeated"] == 0 and out[2]["repeated_frac"] == 0.0
    # "rep"x8 -> 4 identical 5-grams, all repeated within the doc itself
    assert out[4]["n_grams"] == 4 and out[4]["n_repeated"] == 4
    assert out[4]["repeated_frac"] == 1.0
    with _pytest.raises(ValueError):
        repeated_ngram_stats(df, n=1)


def test_fingerprint_frame_equals_column_form(spark):
    from pyspark.sql import functions as F
    from logunifier_spark.operators.textstats import (
        fingerprint,
        fingerprint_frame,
    )
    rows = [(0, "the quick brown fox jumps over the lazy dog"),
            (1, "one two three four"),          # exactly 4 words -> 1 gram
            (2, "short text"),                  # < 4 words -> padded gram
            (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    col_form = {r["doc_id"]: r["fp"] for r in
                df.select("doc_id",
                          fingerprint(F.col("text")).alias("fp")).collect()}
    frame_form = {r["doc_id"]: r["fp"] for r in
                  fingerprint_frame(df).collect()}
    assert frame_form == col_form


def test_pmi_collocations_matches_python(spark):
    import math
    import re
    from collections import Counter
    from logunifier_spark.operators.tfidf import pmi_collocations
    texts = ["new york is big", "new york new york", "big apple is new",
             "york is new", "the the the the"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [(r["l"], r["r"], r["c_ab"], r["pmi"]) for r in
           pmi_collocations(df, min_count=2, k=5).collect()]
    uni, pairs = Counter(), Counter()
    for t in texts:
        toks = [w for w in re.split(r"\s+", t.lower())
                if re.fullmatch(r"[a-z]{2,}", w)]
        uni.update(toks)
        pairs.update(zip(toks, toks[1:]))
    n = sum(uni.values())
    want = [(l, r, c, round(math.log((float(c) * float(n))
                                     / (float(uni[l]) * float(uni[r]))), 6))
            for (l, r), c in pairs.items() if c >= 2]
    want.sort(key=lambda x: (-x[3], x[0], x[1]))
    assert got == want[:5]


# ---------------------------------------------------------------- DSIR ----

def test_dsir_logweights_match_python(spark):
    import hashlib
    import math
    import re
    from collections import Counter
    from logunifier_spark.operators.dsir import dsir_logweights, dsir_topk

    texts = {0: "the cat sat on the mat", 1: "spark shuffle join spark",
             2: "le chat est sur le tapis", 3: "the dog sat on the rug",
             4: "x 9"}
    raw = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    tgt_ids = {0, 3}
    target = raw.where(F.col("doc_id").isin(*tgt_ids))
    B = 64

    def grams(t):
        ws = re.split(r"[ \t\r\n\f\x0B]+", t.lower())
        return [f"{a} {b}" for a, b in zip(ws, ws[1:])
                if re.fullmatch(r"[a-z]{2,}", a)
                and re.fullmatch(r"[a-z]{2,}", b)]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:12], 16) % B

    sc: Counter = Counter()
    tc: Counter = Counter()
    per_doc = {}
    for i, t in texts.items():
        bs = [bucket(g) for g in grams(t)]
        per_doc[i] = bs
        sc.update(bs)
        if i in tgt_ids:
            tc.update(bs)
    S, T = sum(sc.values()), sum(tc.values())
    lr = {b: math.floor(1e6 * (math.log((tc.get(b, 0) + 1) / (T + B))
                               - math.log((c + 1) / (S + B))))
          for b, c in sc.items()}
    want = {i: (len(bs), round(sum(lr[b] for b in bs) / 1e6, 6))
            for i, bs in per_doc.items() if bs}
    got = {r["doc_id"]: (r["n_bigrams"], r["logw"]) for r in
           dsir_logweights(raw, target, buckets=B).collect()}
    assert got == want
    assert 4 not in got  # no valid bigram -> no row
    # target-domain docs must outrank the off-domain one
    top = [r["doc_id"] for r in
           dsir_topk(raw, target, k=2, buckets=B).orderBy("rank").collect()]
    assert set(top) <= {0, 3}


def test_char_entropy_matches_python(spark):
    import math
    from collections import Counter
    from logunifier_spark.operators.textstats import char_entropy
    texts = {0: "aaaa", 1: "abcd", 2: "the cat sat", 3: "", 5: "zzzzzzzzzy"}
    df = spark.createDataFrame(
        list(texts.items()) + [(4, None)], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_counted"], r["entropy"]) for r in
           char_entropy(df).collect()}
    for i, t in texts.items():
        if not t:
            assert i not in got
            continue
        cnt = Counter(t)
        s = sum(c * math.floor(1e6 * math.log(c)) for c in cnt.values())
        want = round(math.log(len(t)) - s / (1e6 * len(t)), 6)
        assert got[i] == (len(t), want), i
    assert 4 not in got
    # low-diversity junk scores below prose
    assert got[5][1] < got[2][1]


def test_source_drift_matches_python(spark):
    import hashlib
    import math
    import re
    from collections import Counter
    from logunifier_spark.operators.dsir import source_drift
    rows = [(0, "aa", "the cat sat on the mat"),
            (1, "aa", "the dog sat on the rug"),
            (2, "bb", "spark shuffle join spark shuffle"),
            (3, "bb", "query plan codegen stage")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    B = 64

    def buckets_of(t):
        ws = re.split(r"[ \t\r\n\f\x0B]+", t.lower())
        return [int(hashlib.md5(f"{a} {b}".encode()).hexdigest()[:12], 16) % B
                for a, b in zip(ws, ws[1:])
                if re.fullmatch(r"[a-z]{2,}", a)
                and re.fullmatch(r"[a-z]{2,}", b)]

    per_grp: dict = {}
    corpus: Counter = Counter()
    for _, g, t in rows:
        bs = buckets_of(t)
        per_grp.setdefault(g, Counter()).update(bs)
        corpus.update(bs)
    C = sum(corpus.values())
    want = {}
    for g, cnts in per_grp.items():
        G = sum(cnts.values())
        s = sum((cnts.get(b, 0) + 1)
                * math.floor(1e6 * (math.log((cnts.get(b, 0) + 1) / (G + B))
                                    - math.log((c + 1) / (C + B))))
                for b, c in corpus.items())
        want[g] = (G, round(s / (1e6 * (G + B)), 6))
    got = {r["source"]: (r["n_bigrams"], r["drift"]) for r in
           source_drift(df, buckets=B).collect()}
    assert got == want
    # the divergent source must out-drift the self-similar pair
    assert got["bb"][1] != got["aa"][1]


def test_bigram_logppl_matches_python(spark):
    import math
    import re
    from collections import Counter
    from logunifier_spark.operators.perplexity import bigram_logppl
    texts = {0: "the cat sat on the mat", 1: "the cat sat the cat ran",
             2: "qq zz qq", 3: "x 9"}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    lam = 0.7

    def words(t):
        return re.split(r"[ \t\r\n\f\x0B]+", t.lower())

    def valid(w):
        return re.fullmatch(r"[a-z]{2,}", w) is not None

    uni: Counter = Counter()
    blm: Counter = Counter()
    per_doc: dict = {}
    for i, t in texts.items():
        ws = words(t)
        uni.update(w for w in ws if valid(w))
        doc_pairs = [(a, b) for a, b in zip(ws, ws[1:])
                     if valid(a) and valid(b)]
        per_doc[i] = Counter(doc_pairs)
        blm.update(doc_pairs)
    T, V = sum(uni.values()), len(uni)
    ctx = Counter()
    for (p, _), c in blm.items():
        ctx[p] += c
    want = {}
    for i, pairs in per_doc.items():
        if not pairs:
            continue
        n = sum(pairs.values())
        s = 0
        for (p, t), tf in pairs.items():
            mix = (lam * (blm[(p, t)] + 1) / (ctx[p] + V)
                   + (1 - lam) * (uni[t] + 1) / (T + V))
            s += tf * math.floor(1e6 * math.log(mix))
        want[i] = (n, round(-s / (1e6 * n), 6))
    got = {r["doc_id"]: (r["n_bigrams"], r["logppl"]) for r in
           bigram_logppl(df).collect()}
    assert got == want
    assert 3 not in got  # no valid adjacent pair -> no row
    # the common-phrase doc scores lower ppl than the rare-vocab doc
    assert got[0][1] < got[2][1]
