"""Deduplication operators for large-scale training-data pipelines.

All operators take a DataFrame with (id_col, text_col) and return either a
keep-set or duplicate-pair frame. Designed for 100 TB shapes:

  - exact_dedup:     hash-groupBy on a 64-bit content hash (one shuffle of
                     (hash, id) pairs only — never the text)
  - minhash_lsh:     shingle → minhash signature → band buckets → bucket
                     join; candidate verification by signature similarity.
                     The banding join shuffles only (band_key, id, signature),
                     so the width is O(rows · bands), independent of doc size.
  - simhash:         64-bit simhash; near-dup candidates via 4×16-bit block
                     buckets (Hamming ≤ 3 within a block scheme)
  - ngram_jaccard:   character n-gram Jaccard over a self-join restricted to
                     shared-shingle buckets (exact, for modest candidate sets)

Everything is native Spark SQL expressions (xxhash64, explode, aggregate) —
no Python UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------- exact ----


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative per exact text hash (deterministic)."""
    h = F.xxhash64(F.col(text_col))
    return (df.withColumn("_h", h)
              .groupBy("_h")
              .agg(F.min(id_col).alias(id_col),
                   F.count("*").alias("dup_count"))
              .drop("_h"))


# -------------------------------------------------------------- shingles ---

def _normalize(text: Column) -> Column:
    return F.regexp_replace(F.lower(text), r"\s+", " ")


def char_shingles(text: Column, n: int = 5) -> Column:
    """Distinct character n-gram 64-bit hashes, as an array column.
    Native: sequence → transform(substring) → xxhash64 → array_distinct."""
    norm = _normalize(text)
    idx = F.sequence(F.lit(1), F.greatest(F.length(norm) - (n - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.xxhash64(F.substring(norm, i, n)))
    return F.array_distinct(grams)


def word_shingles(text: Column, n: int = 3) -> Column:
    words = F.split(_normalize(text), " ")
    k = F.greatest(F.size(words) - (n - 1), F.lit(1))
    idx = F.sequence(F.lit(0), k - 1)
    grams = F.transform(idx, lambda i: F.xxhash64(
        F.concat_ws(" ", F.slice(words, i + 1, n))))
    return F.array_distinct(grams)


# -------------------------------------------------------------- minhash ----

def minhash_signature(shingles: Column, num_hashes: int = 64) -> Column:
    """num_hashes minhash values via the (a*x+b mod p) family over the
    shingle hashes — one aggregate per hash function, fully native."""
    # deterministic affine parameters (odd multipliers); reduce into 31-bit
    # space BEFORE multiplying so ANSI mode can't overflow int64
    p = F.lit(2_147_483_647)
    sig = F.array(*[
        F.array_min(F.transform(
            shingles,
            lambda s, i=i: F.pmod(
                F.pmod(s, p) * F.lit(2 * i + 1) + F.lit(1_000_003 * (i + 7)), p),
        ))
        for i in range(num_hashes)
    ])
    return sig


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", num_hashes: int = 64,
                      bands: int = 16, shingle_n: int = 5,
                      threshold: float = 0.7) -> DataFrame:
    """Candidate near-duplicate pairs via banded minhash LSH, verified by
    signature agreement (estimate of Jaccard). Returns (id_a, id_b, sim)."""
    rows_per_band = num_hashes // bands
    sig = (df.select(F.col(id_col).alias("id"),
                     minhash_signature(char_shingles(F.col(text_col), shingle_n),
                                       num_hashes).alias("sig")))
    banded = sig.select(
        "id", "sig",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.xxhash64(F.concat_ws(
                         ",", *[F.element_at(F.col("sig"), b * rows_per_band + r + 1)
                                for r in range(rows_per_band)])).alias("bucket"))
            for b in range(bands)
        ])).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (a.join(b, on=["band", "bucket"], how="inner")
              .where(F.col("a.id") < F.col("b.id"))
              .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                      F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b"))
              .dropDuplicates(["id_a", "id_b"]))

    agree = F.size(F.filter(
        F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: (x == y).cast("int")),
        lambda v: v == 1))
    sim = (agree / F.lit(num_hashes)).alias("sim")
    return cand.select("id_a", "id_b", sim).where(F.col("sim") >= threshold)


def minhash_dedup(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", **kwargs) -> DataFrame:
    """Keep-set after dropping the higher id of every near-dup pair
    (greedy single-pass; exact connected components would iterate)."""
    pairs = minhash_lsh_pairs(df, text_col, id_col, **kwargs)
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drops, on=id_col, how="left_anti")


# -------------------------------------------------------------- simhash ----

def simhash64(text: Column, shingle_n: int = 4) -> Column:
    """64-bit simhash over character shingles — ONE aggregate pass with a
    64-wide array accumulator (a per-bit expression tree of 64 separate
    aggregates blows up codegen; this stays a single higher-order function)."""
    sh = char_shingles(text, shingle_n)
    zero = F.array_repeat(F.lit(0).cast("long"), 64)
    idx = F.sequence(F.lit(0), F.lit(63))
    # bit extraction via the two's-complement binary string (F.bin) —
    # pyspark's shiftright/shiftleft take only Python-int shift amounts
    counts = F.aggregate(
        sh, zero,
        lambda acc, s: F.zip_with(
            acc,
            F.transform(idx, lambda i: F.when(
                F.lpad(F.bin(s), 64, "0").substr(F.lit(64) - i, F.lit(1)) == "1",
                F.lit(1)).otherwise(F.lit(-1)).cast("long")),
            lambda a, b: a + b,
        ),
    )
    # bit i weight; bit 63 is the sign bit of the signed long
    powers = F.array(*[F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")
                       for i in range(64)])
    packed = F.aggregate(
        F.zip_with(counts, powers,
                   lambda c, p: F.when(c > 0, p).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, v: acc.bitwiseOR(v),
    )
    return packed


def simhash_pairs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming, using the
    4×16-bit block pigeonhole: any pair within distance 3 shares at least one
    exact 16-bit block — bucket-join per block, then verify."""
    s = df.select(F.col(id_col).alias("id"),
                  simhash64(F.col(text_col)).alias("sh"))
    blocks = s.select(
        "id", "sh",
        F.explode(F.array(*[
            F.struct(F.lit(k).alias("blk"),
                     F.shiftright(F.col("sh"), 16 * k).bitwiseAND(F.lit(0xFFFF)).alias("val"))
            for k in range(4)
        ])).alias("b"),
    ).select("id", "sh", F.col("b.blk").alias("blk"), F.col("b.val").alias("val"))
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (a.join(b, on=["blk", "val"])
              .where(F.col("a.id") < F.col("b.id"))
              .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                      F.col("a.sh").alias("sh_a"), F.col("b.sh").alias("sh_b"))
              .dropDuplicates(["id_a", "id_b"]))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming")
    return cand.select("id_a", "id_b", ham).where(F.col("hamming") <= max_hamming)


# -------------------------------------------------------- ngram jaccard ----

def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.8) -> DataFrame:
    """Exact character-n-gram Jaccard for pairs sharing at least one shingle.
    Shuffles (shingle, id); candidate pairs deduped before the exact
    intersection/union computation on the shingle arrays."""
    sh = df.select(F.col(id_col).alias("id"),
                   char_shingles(F.col(text_col), n).alias("sh"))
    exploded = sh.select("id", F.explode("sh").alias("g"))
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (a.join(b, on="g").where(F.col("a.id") < F.col("b.id"))
              .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
              .distinct())
    pairs = (cand.join(sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
                 .join(sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = (inter / union).alias("jaccard")
    return pairs.select("id_a", "id_b", jac).where(F.col("jaccard") >= threshold)
