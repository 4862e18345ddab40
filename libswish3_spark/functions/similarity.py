"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, plus a sign-signature
LSH (random-hyperplane style with deterministic axis planes) as the
bucketed scale path: at 100 TB you bucket first (narrow, shuffle on
bucket key only), then brute-force within buckets.

Scores are returned ×10000 as bigint so Spark and DuckDB hash
identically (no float representation drift).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_bp(a, b) -> Column:
    """Cosine ×10000 as bigint (engine-portable hashing)."""
    return F.floor(cosine(a, b) * 10000).cast("long")


def brute_force_topk(
    df: DataFrame, id_col: str, vec_col: str, query_vec, k: int = 10
) -> DataFrame:
    """Exact top-k by cosine against one query vector.

    The query vector is a literal array → broadcast into codegen; the
    scan is embarrassingly parallel and the only ordering cost is a
    global top-k (Spark's TakeOrdered, no full sort at scale).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine_bp(F.col(vec_col), q).alias("score_bp"),
    )
    return scored.orderBy(F.desc("score_bp"), F.col(id_col)).limit(k)


def sign_signature(vec_col, dims: int = 8) -> Column:
    """IVF-ish coarse bucket: sign bits of the first ``dims`` axes.

    Deterministic and oracle-friendly (axis-aligned hyperplanes). For
    production recall, swap the axis planes for seeded pseudo-random
    planes — the plumbing (bucket → co-partitioned join) is identical.
    """
    bits = [
        F.when(F.element_at(vec_col, i + 1) >= 0, F.lit(1)).otherwise(F.lit(0))
        * (2**i)
        for i in range(dims)
    ]
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total.cast("long")


def lsh_bucketed_topk(
    df: DataFrame, id_col: str, vec_col: str, query_vec, k: int = 10, dims: int = 8
) -> DataFrame:
    """ANN: search only the query's sign bucket, then exact cosine."""
    sig = 0
    for i in range(dims):
        if float(query_vec[i]) >= 0:
            sig += 2**i
    bucketed = df.where(sign_signature(F.col(vec_col), dims) == F.lit(sig))
    return brute_force_topk(bucketed, id_col, vec_col, query_vec, k)
