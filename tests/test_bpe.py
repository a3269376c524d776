import re
from collections import Counter


def _py_bpe(word_counts, iters):
    """Token-space reference BPE (independent of the string-replace
    implementation): greedy left-to-right merge within symbol lists."""
    vocab = {tuple(w): n for w, n in word_counts.items()}
    merges = []
    for step in range(iters):
        pairs = Counter()
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += n
        if not pairs:
            break
        # count DESC, pair ASC
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, l, r, l + r, c))
        new = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + n
        vocab = new
    return merges, vocab


def _counts(texts):
    c = Counter()
    for t in texts:
        for w in re.split(r"[ \t\r\n\f\x0B]+", t.lower()):
            if re.fullmatch(r"[a-z]{2,}", w):
                c[w] += 1
    return c


def test_bpe_train_matches_python_reference(spark):
    from logunifier_spark.operators.bpe import bpe_train
    texts = ["low low lower lowest", "new newer newest low wider",
             "low lower new new new", "widest wide wide low"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [(r["step"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
           for r in bpe_train(df, iters=7).orderBy("step").collect()]
    want, _ = _py_bpe(_counts(texts), 7)
    assert got == want
    # deterministic under partitioning
    got2 = [(r["step"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
            for r in bpe_train(df.repartition(5), iters=7)
            .orderBy("step").collect()]
    assert got2 == got


def test_bpe_apply_counts_match_reference(spark):
    from logunifier_spark.operators.bpe import bpe_apply, bpe_train
    texts = ["aaab aab ab", "aaab aaab b", "ab aab cc"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = bpe_train(df, iters=4).orderBy("step").collect()
    merges = [(r["lhs"], r["rhs"]) for r in rows]
    out = [r["bpe_tokens"] for r in
           bpe_apply(df, merges).select("bpe_tokens").collect()]

    def apply_py(t):
        total = 0
        for w in re.findall(r"[a-z]+", t.lower()):
            syms = list(w)
            for l, r in merges:
                out_s, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == l
                            and syms[i + 1] == r):
                        out_s.append(l + r)
                        i += 2
                    else:
                        out_s.append(syms[i])
                        i += 1
                syms = out_s
            total += len(syms)
        return total

    assert out == [apply_py(t) for t in texts]
    # punctuation/boundaries: merges never bridge words
    df2 = spark.createDataFrame([("ab a.b, AB!",)], "text string")
    got = bpe_apply(df2, [("a", "b")]).collect()[0]["bpe_tokens"]
    assert got == 4  # [ab] [a] [b] [ab] — the a.b pair stays split


def test_bpe_hybrid_paths_agree(spark):
    # the in-memory incremental trainer (default for collectable vocabs)
    # and the distributed per-iteration loop must emit bit-identical
    # merge tables — same greedy semantics, same tie-break
    from logunifier_spark.operators.bpe import bpe_train
    texts = ["low low lower lowest", "new newer newest low wider",
             "aaab aab ab ab abba", "widest wide wide low banana bandana"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    key = lambda r: r["step"]  # noqa: E731
    inmem = [tuple(r) for r in
             sorted(bpe_train(df, iters=12).collect(), key=key)]
    dist = [tuple(r) for r in
            sorted(bpe_train(df, iters=12, driver_vocab_max=0).collect(),
                   key=key)]
    assert inmem == dist and len(inmem) == 12


def test_bpe_inmem_heap_handles_count_decay(spark):
    # after merging (a,a) in 'aaaa...' words the stale heap entries for
    # (a,a) must be skipped, and a pair whose count DROPS but stays top
    # must still win with its current count recorded
    from logunifier_spark.operators.bpe import _train_inmem
    rows = [("a a a a a", 10), ("a a b", 3), ("b c", 1)]
    merges = _train_inmem(rows, iters=3)
    # initial counts: (a,a)=4*10+3=43, (a,b)=3, (b,c)=1
    assert merges[0] == (0, "a", "a", "aa", 43)
    # 'a a a a a'->'aa aa a': (aa,aa)=10,(aa,a)=10; 'a a b'->'aa b'=3
    assert merges[1][4] == max(10, 10, 3, 1)
    assert len(merges) == 3
