"""TF-IDF keyword extraction over a document corpus — the corpus-level
companion to textstats.py's row-local projections (quality, language,
token counts): the score of a term depends on every other document via
the document frequency.

Spark shape, built for 10^12 docs:

  - term stream = split + explode (zero Python, fuses with the scan);
  - tf = one shuffle on (doc, term) with map-side combine — the only
    pass over the full token stream;
  - df aggregates the (already doc-distinct) tf frame down to vocab
    size, and the tf⋈df join is a vocab-keyed join: vocab is sublinear
    in corpus size (Heaps' law), AQE broadcasts it when it fits;
  - top-k per doc is one window shuffle on doc_id over the tf-sized
    (not token-sized) frame;
  - N (corpus row count) enters the plan as a driver literal — one
    count() job, metadata-only on parquet sources.

Cross-engine float discipline (the value-hash gate): (N+1)/(df+1) is a
single IEEE-correctly-rounded double division of exactly-representable
integers, identical on every engine; ln() is the one libm call (Java
Math.log vs DuckDB's ln may differ in the last ulp for SOME inputs, but
equal (tf, df) pairs — the only systematic near-ties — produce the SAME
double within each engine, so the term-ascending tie-break ranks them
identically on both sides). Scores are rounded to 6 places on output;
ranking uses the unrounded value.

Tokenization matches the repo-wide convention (textstats.ASCII_WS):
lowercase, split on the explicit ASCII whitespace class, keep pure
ASCII-alpha terms of length >= 2 (`^[a-z]{2,}$` — identical semantics in
Java regex, Python re, and RE2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from logunifier_spark.operators.textstats import ASCII_WS

TERM_RE = "^[a-z]{2,}$"


def tfidf_top_terms(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", k: int = 5) -> DataFrame:
    """Top-k terms per document by tf·idf, idf = ln((N+1)/(df+1)).
    Returns (doc_id, term, tf, df, rank, score) — tf/df BIGINT, rank INT
    (row_number), score rounded to 6. Ties rank by term ascending.
    Documents whose text yields no terms produce no rows."""
    n_docs = docs.count()
    terms = (docs
             .select(F.col(id_col),
                     F.explode(F.split(F.lower(F.col(text_col)),
                                       ASCII_WS + "+")).alias("term"))
             .where(F.col("term").rlike(TERM_RE)))
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    # df derives FROM tf, and the plan references tf twice (df agg + the
    # score join): without materialization Spark re-scans the corpus and
    # re-aggregates the token stream per reference. Same trade as the
    # minhash signature checkpoint — executor-local storage of the
    # (doc, term) frame buys back a full second pass. (The alternative —
    # df as count().over(Window.partitionBy(term)) — is one scan with no
    # checkpoint but puts ALL rows of a hot term in one window task:
    # stopword skew at corpus scale. Partial aggregation is skew-safe.)
    tf = tf.localCheckpoint(eager=False)
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (tf.join(df_, "term")
                .withColumn(
                    "score",
                    F.col("tf") * F.log(F.lit(float(n_docs + 1))
                                        / (F.col("df") + F.lit(1))
                                        .cast("double"))))
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select(F.col(id_col), "term", "tf", "df", "rank",
                          F.round("score", 6).alias("score")))
