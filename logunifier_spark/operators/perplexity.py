"""Unigram log-perplexity scoring — CCNet-style LM quality filtering.

The CCNet/C4 lineage of web-curation pipelines scores every document
against a language model and drops the high-perplexity tail (gibberish,
boilerplate soup, OCR noise). A full KenLM is out of scope for a
self-contained engine, but the unigram variant is the same shape and
already separates natural prose from junk: train term frequencies on
the corpus itself, score each doc by the mean negative log-probability
of its tokens (add-one smoothing).

Spark shape, built for 10^12 docs:

  - one pass builds the (doc, term) tf frame (map-side-combined
    aggregate; `localCheckpoint` because both the LM aggregation and the
    scoring join reference it — same trade as tfidf/minhash);
  - the LM is the vocab-sized `(term, cnt)` aggregate of tf; corpus
    totals (T tokens, V vocab) are two driver scalars off it;
  - scoring joins tf back to the LM on term (vocab-keyed; AQE
    broadcasts when it fits) and reduces per doc with a hash aggregate.

Cross-engine float discipline: a double SUM over a doc's token
log-probs is order-dependent (Spark partial aggregation sums in
nondeterministic order — not even run-stable). So per-term
contributions are FIXED-POINT: floor(1e6 * ln((cnt+1)/(T+V))) as int64,
multiplied by tf and summed as integers — associative, order-free,
engine-exact (the kmeans.py trick). The final score divides the integer
sum back out in two correctly-rounded double ops. At quant=1e6 a
floor-boundary flip needs ln() to land within ~2e-9 of a grid line —
vanishing, and the output is rounded to 1e-6 anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logunifier_spark.operators.textstats import ASCII_WS
from logunifier_spark.operators.tfidf import TERM_RE

QUANT = 10**6


def unigram_logppl(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-document mean negative log-probability under the corpus's own
    add-one-smoothed unigram LM: logppl = -(1/n) * sum_t tf_t *
    ln((cnt_t + 1) / (T + V)). Returns (doc_id, n_tokens, logppl
    rounded to 6); documents with no valid tokens produce no rows.
    Higher = less like the corpus = drop-candidate."""
    terms = (docs
             .select(F.col(id_col),
                     F.explode(F.split(F.lower(F.col(text_col)),
                                       ASCII_WS + "+")).alias("term"))
             .where(F.col("term").rlike(TERM_RE)))
    tf = (terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
               .localCheckpoint(eager=False))
    lm = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    tot = lm.agg(F.sum("cnt").alias("t"), F.count("*").alias("v")).first()
    # sum over an empty/token-free corpus is NULL → int(None) crash
    # (ADVICE r3); with zero tokens the result is the empty frame
    denom = int(tot["t"] or 0) + int(tot["v"] or 0)
    if denom == 0:
        id_t = docs.schema[id_col].dataType.simpleString()
        return docs.sparkSession.createDataFrame(
            [], f"{id_col} {id_t}, n_tokens bigint, logppl double")
    logp_q = F.floor(
        F.lit(float(QUANT))
        * F.log((F.col("cnt") + F.lit(1)).cast("double")
                / F.lit(float(denom)))).cast("long")
    scored = (tf.join(lm, "term")
                .select(F.col(id_col), "tf",
                        (F.col("tf") * logp_q).alias("_c"))
                .groupBy(id_col)
                .agg(F.sum("tf").alias("n_tokens"),
                     F.sum("_c").alias("_s")))
    return scored.select(
        F.col(id_col), F.col("n_tokens"),
        F.round(-(F.col("_s").cast("double")
                  / (F.lit(float(QUANT)) * F.col("n_tokens"))),
                6).alias("logppl"))


def perplexity_filter(docs: DataFrame, max_logppl: float,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Keep documents whose unigram log-perplexity is <= max_logppl
    (docs with no valid tokens are dropped — they have no score)."""
    keep = (unigram_logppl(docs, text_col, id_col)
            .where(F.col("logppl") <= max_logppl)
            .select(id_col))
    return docs.join(keep, id_col, "left_semi")


def bigram_logppl(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", lam: float = 0.7) -> DataFrame:
    """Interpolated-bigram log-perplexity — the step up from
    unigram_logppl toward a real LM filter: score each token given its
    predecessor under p = λ·p_bigram + (1−λ)·p_unigram, both
    add-one-smoothed over the corpus's own counts (Jelinek-Mercer
    interpolation, the classic backoff that keeps unseen bigrams
    finite). Scored tokens are the right element of each RAW-adjacent
    valid word pair (the dsir bigram identity — both words TERM_RE);
    docs with no valid pair produce no row. Returns (id_col, n_bigrams
    BIGINT, logppl DOUBLE rounded 1e-6); higher = less like the corpus.

      p_bi(t|prev)  = (cnt(prev,t) + 1) / (ctx(prev) + V)
      p_uni(t)      = (cnt(t) + 1) / (T + V)
      contribution  = tf · floor(1e6·ln(λ·p_bi + (1−λ)·p_uni))  (int64)

    Cross-engine float discipline: the mixture is evaluated in doubles
    with the IDENTICAL expression tree in the SQL oracle (bare float
    literals are CAST — DuckDB parses them as DECIMAL otherwise), then
    floored to fixed point per (doc, prev, term) row so the per-doc sum
    is order-free and engine-exact.

    Scale shape: one codegen pair stream → per-doc bigram tf (hash
    aggregate, localCheckpointed — referenced by the LM aggregation and
    the scoring join); the bigram LM, context, and unigram LM tables
    are vocab-scale (Heaps' law) equi-joins; totals ride in-plan as
    1-row crossJoins. No window, no sort, no Python."""
    from logunifier_spark.operators.textstats import adjacent_word_pairs
    ws = F.split(F.lower(F.col(text_col)), ASCII_WS + "+")
    pairs = adjacent_word_pairs(docs, text_col, id_col)
    btf = (pairs.groupBy(id_col, "prev", "term")
                .agg(F.count("*").alias("tf"))
                .localCheckpoint(eager=False))
    blm = btf.groupBy("prev", "term").agg(F.sum("tf").alias("bcnt"))
    ctx = blm.groupBy("prev").agg(F.sum("bcnt").alias("ccnt"))
    # unigram LM over ALL valid tokens (the unigram_logppl tokenizer)
    terms = (docs.select(F.col(id_col),
                         F.explode(ws).alias("term"))
                 .where(F.col("term").rlike(TERM_RE)))
    ulm = terms.groupBy("term").agg(F.count("*").alias("ucnt"))
    utot = ulm.agg(F.sum("ucnt").alias("utotal"),
                   F.count("*").alias("vsize"))
    v = F.col("vsize").cast("double")
    p_bi = ((F.col("bcnt") + F.lit(1)).cast("double")
            / (F.col("ccnt").cast("double") + v))
    p_uni = ((F.col("ucnt") + F.lit(1)).cast("double")
             / (F.col("utotal").cast("double") + v))
    mix = F.lit(float(lam)) * p_bi + F.lit(float(1.0 - lam)) * p_uni
    contrib = (F.col("tf")
               * F.floor(F.lit(float(QUANT)) * F.log(mix)).cast("long"))
    scored = (btf.join(blm, ["prev", "term"])
                 .join(ctx, "prev")
                 .join(ulm, "term")
                 .crossJoin(utot))
    return (scored.groupBy(id_col)
                  .agg(F.sum("tf").alias("n_bigrams"),
                       F.sum(contrib).alias("_s"))
                  .select(id_col, "n_bigrams",
                          F.round(-(F.col("_s").cast("double")
                                    / (F.lit(float(QUANT))
                                       * F.col("n_bigrams"))), 6)
                           .alias("logppl")))
