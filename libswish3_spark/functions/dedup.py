"""Deduplication at corpus scale: exact, MinHash+LSH, SimHash, n-gram
Jaccard.

All deterministic and engine-portable: hashes are md5-based (identical
in Spark and DuckDB) rather than engine-private hash functions, so every
stage has an independent SQL oracle. Scale notes per operator:

* exact        — one hash-groupBy shuffle on the digest; partial agg
                 map-side, skew-free (digests are uniform).
* minhash LSH  — shingle → k minhashes → b bands; the only shuffle is
                 the band-bucket self-join, whose fan-out is bounded by
                 bucket size (near-dups only); this is the 100 TB path.
* ngram jaccard— exact verification on LSH candidates (or small
                 corpora); the shingle self-join is quadratic per
                 bucket — never run it raw at scale, gate behind LSH.
* simhash      — fixed-width signature; hamming-radius candidates via
                 band equality on signature nibbles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from libswish3_spark.functions.text import fingerprint, tokens

MINHASH_K = 8
MINHASH_BANDS = 4  # r = K / BANDS = 2 rows per band
SIMHASH_BITS = 16


def shingles(tok_col, n: int = 3) -> Column:
    """Word n-gram shingles from a token array (JVM-side).

    Guarded for short docs: Spark's sequence(0, -1) would descend, so
    fewer than n tokens yields an empty array explicitly.
    """
    gram = F.transform(
        F.sequence(F.lit(0), F.size(tok_col) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tok_col, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(tok_col) >= n, F.array_distinct(gram)).otherwise(
        F.array().cast("array<string>")
    )


def minhash(sh_col, seed: int) -> Column:
    """One minhash value: min over md5(shingle || seed) (string order).

    md5-string min is engine-portable; the reference-free alternative
    (xxhash64) is Spark-private and would have no oracle.
    """
    return F.array_min(
        F.transform(sh_col, lambda s: F.md5(F.concat(s, F.lit(f"#{seed}"))))
    )


def band_buckets(sh_col, k: int = MINHASH_K, bands: int = MINHASH_BANDS) -> Column:
    """Array of LSH band bucket keys (md5 of the band's minhashes)."""
    r = k // bands
    cols = []
    for b in range(bands):
        parts = [minhash(sh_col, b * r + j) for j in range(r)]
        cols.append(F.md5(F.concat_ws("|", F.lit(str(b)), *parts)))
    return F.array(*cols)


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: digest → (keeper, dup count). One shuffle."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keeper"),
            F.count("*").alias("n_dups"),
        )
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = MINHASH_K
) -> DataFrame:
    """id → k minhash columns via explode + partial min-aggregate.

    Shingling/tokenization run exactly once per document (project
    collapse would otherwise inline them into every minhash transform);
    the k mins combine map-side, so the shuffle carries one row per
    (doc, k-signature) — this is the formulation that holds at 100 TB.
    """
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(tokens(F.col(text_col)))).alias("shingle"),
    )
    aggs = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{j}")))).alias(f"mh{j}")
        for j in range(k)
    ]
    return exploded.groupBy("id").agg(*aggs)


def minhash_candidates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """LSH candidate pairs (a < b) sharing at least one band bucket."""
    k, bands = MINHASH_K, MINHASH_BANDS
    r = k // bands
    minh = minhash_signatures(df, id_col, text_col, k)
    bucket_cols = [
        F.md5(
            F.concat_ws(
                "|", F.lit(str(b)), *[F.col(f"mh{b * r + j}") for j in range(r)]
            )
        )
        for b in range(bands)
    ]
    exploded = minh.select("id", F.explode(F.array(*bucket_cols)).alias("bucket"))
    left = exploded.alias("l")
    right = exploded.alias("r")
    return (
        left.join(right, (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.5, n: int = 3
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing a shingle.

    Quadratic per shared-shingle bucket — at scale, feed it LSH
    candidates instead of the whole corpus (see minhash_candidates).
    Jaccard is returned ×10000 as a bigint for engine-portable hashing.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        shingles(tokens(F.col(text_col)), n).alias("sh"),
    ).select("id", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle"))
    l, r = sh.alias("l"), sh.alias("r")
    pairs = (
        l.join(r, (F.col("l.shingle") == F.col("r.shingle")) & (F.col("l.id") < F.col("r.id")))
        .groupBy(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.col("l.n_sh").alias("na"),
            F.col("r.n_sh").alias("nb"),
        )
        .agg(F.count("*").alias("common"))
    )
    jacc = F.floor(
        F.col("common") * 10000 / (F.col("na") + F.col("nb") - F.col("common"))
    ).cast("long")
    return (
        pairs.select("a", "b", jacc.alias("jaccard_bp"))
        .where(F.col("jaccard_bp") >= int(threshold * 10000))
    )


def _hexval(ch: Column) -> Column:
    return F.instr(F.lit("0123456789abcdef"), ch) - 1


def simhash(tok_col, bits: int = SIMHASH_BITS) -> Column:
    """SimHash signature over md5 bits of each token (engine-portable).

    bit i of token t = (hexdigit(md5(t)[i//4]) >> (i%4)) & 1; the
    signature bit is the sign of sum(2*bit - 1) over tokens.
    """
    def bit_summer(nib: int, shift: int):
        # two-arg lambda factory (see text._isin_filter arity note)
        return lambda a, t: (
            a
            + (F.floor(_hexval(F.substring(F.md5(t), nib + 1, 1)) / shift) % 2) * 2
            - 1
        )

    acc = F.lit(0).cast("long")
    for i in range(bits):
        bit_sum = F.aggregate(
            tok_col, F.lit(0).cast("long"), bit_summer(i // 4, 2 ** (i % 4))
        )
        acc = acc + F.when(bit_sum >= 0, F.lit(2**i)).otherwise(F.lit(0))
    return acc
