"""Distributed BPE tokenizer training (Sennrich et al. 2016) — learn
the merge table from the corpus itself.

textstats.bpe_ish_token_count APPROXIMATES a subword tokenizer; this
module TRAINS one. The classic algorithm: start from characters, then
repeatedly merge the most frequent adjacent symbol pair. The
distributed shape follows the standard implementation trick — train on
the WORD-FREQUENCY table, not the token stream: one corpus pass
aggregates (word, count) (vocabulary is sublinear in corpus size —
Heaps' law — ~10^8 rows at 100 TB, a small frame by then), and every
merge iteration touches only that frame:

  per iteration: one explode of adjacent symbol pairs weighted by word
  count -> one map-side-combinable hash aggregate -> a LIMIT-1 collect
  of the argmax pair (deterministic: count DESC, pair ASC) -> one
  projection rewriting the symbol strings. No corpus re-scan, ever.

Merge-application semantics are the part that must be EXACT and
portable: greedy left-to-right non-overlapping replacement of the pair
within each word, which is precisely what plain string `replace` does
in both the JVM and DuckDB — no regex, no lookarounds (RE2 has none).
Token boundaries are protected by the DOUBLE-SPACE trick: the
canonical symbol string is single-space-joined; for application the
separators double (' a  b ' can only match a true adjacent pair, and
neighbouring matches never share a separator character, so
string-level replace equals token-level greedy merging — proven
against a token-space Python reference in tests). The symbol alphabet
is [a-z] (tfidf.TERM_RE tokens), so symbols never collide with the
space separator.

Lineage discipline: each iteration chains three string functions onto
the vocab plan; localCheckpoint every few steps keeps the lineage (and
the driver's analysis time) flat over many merges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logunifier_spark.operators.textstats import ASCII_WS
from logunifier_spark.operators.tfidf import TERM_RE

#: localCheckpoint the vocab frame every this many merges
_CKPT_EVERY = 4


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    toks = (docs.select(F.explode(F.split(F.lower(F.col(text_col)),
                                          ASCII_WS + "+")).alias("w"))
                .where(F.col("w").rlike(TERM_RE)))
    return toks.groupBy("w").agg(F.count("*").alias("n"))


def bpe_train(docs: DataFrame, text_col: str = "text",
              iters: int = 8) -> DataFrame:
    """Learn `iters` BPE merges; returns the merge table
    (step INT 0-based, lhs STRING, rhs STRING, merged STRING,
    pair_count BIGINT; lhs/rhs, not left/right — those are SQL keywords) — the artifact a tokenizer applies. Stops early
    (fewer rows) when no adjacent pair remains."""
    spark = docs.sparkSession
    vocab = _word_counts(docs, text_col).select(
        # 'abc' -> 'a b c': every char becomes a symbol
        F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")).alias("sym"),
        F.col("n"))
    # checkpoint the INITIAL vocab too: without it, every iteration
    # before the first periodic checkpoint re-runs the corpus word
    # count (measured 4.98 s -> 1.72 s for 6 merges at sf0.1)
    vocab = vocab.localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(iters):
        arr = F.split(F.col("sym"), " ")
        ex = (vocab.select(arr.alias("_a"), F.col("n"))
                   .where(F.size("_a") >= 2)
                   .select(F.col("_a"), F.col("n"),
                           F.explode(F.sequence(
                               F.lit(1), F.size("_a") - 1)).alias("i"))
                   .select(F.element_at("_a", F.col("i")).alias("l"),
                           F.element_at("_a", F.col("i") + 1).alias("r"),
                           F.col("n")))
        pc = ex.groupBy("l", "r").agg(F.sum("n").alias("c"))
        best = (pc.orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
                  .limit(1).collect())
        if not best:
            break
        l, r, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merges.append((step, l, r, l + r, c))
        padded = F.concat(F.lit(" "),
                          F.replace(F.col("sym"), F.lit(" "), F.lit("  ")),
                          F.lit(" "))
        applied = F.replace(padded, F.lit(f" {l}  {r} "),
                            F.lit(f" {l}{r} "))
        vocab = vocab.select(
            F.trim(F.regexp_replace(applied, " +", " ")).alias("sym"),
            F.col("n"))
        if (step + 1) % _CKPT_EVERY == 0:
            vocab = vocab.localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges, "step int, lhs string, rhs string, merged string, "
                "pair_count long")


def bpe_apply(df: DataFrame, merges: list[tuple[str, str]],
              text_col: str = "text",
              out_col: str = "bpe_tokens") -> DataFrame:
    """Apply a learned merge list: `out_col` = BIGINT token count of
    `text_col` under the merges (the trained-tokenizer replacement for
    bpe_ish_token_count). The whole text streams through the same
    double-space replace chain as training — a pure JVM projection.
    Word boundaries become the '|' symbol (outside the [a-z] merge
    alphabet), so no merge can ever bridge two words: the pattern
    ' l  r ' requires strict adjacency and '|' sits between words."""
    sym = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]+", "|"),
        "(.)", "$1 "))
    for l, r in merges:
        padded = F.concat(F.lit(" "),
                          F.replace(sym, F.lit(" "), F.lit("  ")),
                          F.lit(" "))
        sym = F.trim(F.regexp_replace(
            F.replace(padded, F.lit(f" {l}  {r} "), F.lit(f" {l}{r} ")),
            " +", " "))
    n_bars = F.size(F.split(sym, r"[|]")) - 1
    total = F.when(F.length(sym) == 0, F.lit(0)) \
             .otherwise(F.size(F.split(sym, " ")))
    return df.withColumn(out_col, (total - n_bars).cast("long"))
