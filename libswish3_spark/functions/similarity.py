"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, plus seeded
random-hyperplane LSH as the bucketed scale path: at 100 TB you bucket
first (narrow, shuffle on the bucket key only), then brute-force within
buckets — multi-table multi-probe for search recall
(lsh_bucketed_topk), capped single-table buckets for near-dup pair
generation (embedding_near_dup_pairs).

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
    # greatest(·, 1e-12): a zero/failed-encode vector would otherwise
    # produce 0/0 = NaN, and Spark orders NaN ABOVE every number — a
    # NaN cosine passes every `bp >= τ` gate, so one padded embedding
    # would dominate its whole cell/bucket (and DuckDB disagrees on
    # NaN, breaking the oracles). Guarded it scores 0 — identically in
    # Spark, DuckDB and numpy; same rationale as ivf_cell_sql's guard.
    return dot(a, b) / F.greatest(norm(a) * norm(b), F.lit(1e-12))


def cosine_bp(a, b) -> Column:
    """Cosine ×10000 as bigint (engine-portable hashing)."""
    return F.floor(cosine(a, b) * 10000).cast("long")


def pair_cosine_bp(l_vec, r_vec, l_norm, r_norm) -> Column:
    """floor(cosine ×10000) over per-row PRECOMPUTED norms — exactly
    ``cosine_bp``'s op sequence (dot / greatest(na*nb, 1e-12), ×10000,
    floor, bigint), the norm columns being the same doubles ``norm``
    computes. One lambda fold per pair instead of three (the dominant
    cost of every within-bucket pair join)."""
    c = dot(l_vec, r_vec) / F.greatest(l_norm * r_norm, F.lit(1e-12))
    return F.floor(c * 10000).cast("long")


def brute_force_topk(
    df: DataFrame, id_col: str, vec_col: str, query_vec, k: int = 10
) -> DataFrame:
    """Exact top-k by cosine against one query vector.

    The query vector is a literal array → broadcast into codegen; the
    scan is embarrassingly parallel and the only ordering cost is a
    global top-k (Spark's TakeOrdered, no full sort at scale).

    The score stays the LAMBDA-fold cosine deliberately: an unrolled
    64-term tree was tried (round 6) and measured net-SLOWER at bench
    scale — the extra Catalyst analysis per query exceeded the per-row
    eval win on a single-vector scan, and inside join stages the giant
    tree tripped codegen's method-size limit, dropping whole stages to
    interpreted eval.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col),
        cosine_bp(F.col(vec_col), q).alias("score_bp"),
    )
    return scored.orderBy(F.desc("score_bp"), F.col(id_col)).limit(k)


def random_planes(dims: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (md5-derived weights in
    [-1, 1]). Generated driver-side and embedded as LITERALS in both the
    Spark expression and the SQL oracle, so both engines see identical
    constants — the oracle-able form of 'seeded random planes'."""
    import hashlib

    planes = []
    for p in range(n_planes):
        w = []
        for i in range(dims):
            h = int.from_bytes(
                hashlib.md5(f"{seed}:{p}:{i}".encode()).digest()[:4], "big"
            )
            w.append((h % 2001 - 1000) / 1000.0)
        planes.append(w)
    return planes


def _sql_dot(vec_sql: str, plane: list[float]) -> str:
    """SQL text for dot(vec, literal plane) with the exact float math of
    :func:`dot` (promote to double, left fold) — built as ONE expression
    string because composing thousands of plane-weight literals through
    the Column API costs seconds of py4j round-trips on the driver
    (measured: 7.3 s to BUILD the 4-table probe plan vs 0.6 s to run
    it), while expr() is a single parse.

    The LAMBDA form is kept deliberately (round-6 finding): an
    unrolled per-element tree is faster in an isolated scan projection,
    but an L-table × n-plane × dims tree (~15k Catalyst nodes) OOMs a
    default-sized (1 GB) driver heap during analysis, and inside a
    join's fused codegen even one 64-term tree trips the generated-
    method size limit, dropping the whole stage to interpreted eval
    (measured 10.1 s vs 4.4 s on the embedding pair join)."""
    # 0.123D double literals, not CAST('0.123' AS DOUBLE): the same
    # constant bit-for-bit (verified), at half the Catalyst nodes —
    # analysis time of the 4-table probe tree is a per-query driver
    # cost worth shaving
    arr = "array(" + ", ".join(f"{w!r}D" for w in plane) + ")"
    return (
        f"aggregate(zip_with({vec_sql}, {arr},"
        " (x, y) -> CAST(x * y AS DOUBLE)),"
        " CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def plane_signature_sql(vec_sql: str, planes: list[list[float]]) -> str:
    """SQL text: signature int with bit p set iff dot(vec, plane_p) >= 0."""
    return " + ".join(
        f"(CASE WHEN {_sql_dot(vec_sql, plane)} >= 0"
        f" THEN CAST({2**p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for p, plane in enumerate(planes)
    )


def plane_signature(vec_col, planes: list[list[float]]) -> Column:
    """Signature int: bit p set iff dot(vec, plane_p) >= 0.

    ``vec_col`` must be a column NAME (or SQL fragment) — the expression
    is assembled as SQL text, see _sql_dot."""
    return F.expr(plane_signature_sql(vec_col, planes))


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes: list[list[float]] | None = None,
    min_score_bp: int = 3000,
    max_bucket: int | None = 1000,
    sig_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup candidate pairs (a < b) within
    random-hyperplane signature buckets, exact cosine within bucket.

    The two scale guards mirror ``minhash_candidates`` (dedup.py):

    - **random planes, not axis signs** — real embedding corpora are
      anisotropic (mass concentrated along a few principal directions),
      so axis-aligned sign bits put most of the corpus in a handful of
      buckets; seeded random hyperplanes spread the signature space.
    - **``max_bucket`` cap-and-drop** — one hot bucket is O(size²)
      pairs at 100 TB; buckets above the cap are dropped entirely
      (their members remain reachable through exact dedup upstream and
      the pairs they'd contribute are dominated by boilerplate).
      Report what the cap removed with ``dedup.cap_drop_metrics(b,
      "sig", max_bucket)`` — the drops must land in the run's metrics,
      never pass silently.

    The within-bucket self-join shuffles only (id, vec, sig) rows
    hash-partitioned on sig — never the document payload.

    Pass ``sig_col`` to read a STORED signature column (computed once at
    ingest by operators/signatures.py) instead of folding the planes in
    the scan — the 100 TB shape, where every near-dup query starts from
    the materialized index.

    Pair scoring runs over per-row PRECOMPUTED norms (one lambda fold
    per pair instead of three — measured ~3x on the bucket self-join;
    the norm column is the identical double ``norm`` computes, so
    scores are bit-identical).
    """
    if planes is None and sig_col is None:
        raise ValueError(
            "embedding_near_dup_pairs: pass planes (in-scan signature fold) "
            "or sig_col (stored signature index column)"
        )
    sig = F.col(sig_col) if sig_col is not None else plane_signature(vec_col, planes)
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        sig.alias("sig"),
        norm(F.col(vec_col)).alias("nrm"),
    )
    if max_bucket is not None:
        # tiny (sig, count) aggregate, partial map-side, broadcast back.
        # NOT the count-window form candidate_pairs_from_buckets uses:
        # sign signatures have few, fat key groups (2^n_planes buckets)
        # where WindowExec's per-group sort loses (A/B at sf1.0: 2.9 s
        # window vs 1.8 s join), while minhash bucket keys are
        # near-unique and the window wins there
        keep = (
            b.groupBy("sig")
            .agg(F.count("*").alias("_n"))
            .where(F.col("_n") <= max_bucket)
            .select("sig")
        )
        b = b.join(keep, "sig")
    l, r = b.alias("l"), b.alias("r")
    pairs = l.join(
        r, (F.col("l.sig") == F.col("r.sig")) & (F.col("l.id") < F.col("r.id"))
    )
    score = pair_cosine_bp(
        F.col("l.vec"), F.col("r.vec"), F.col("l.nrm"), F.col("r.nrm")
    )
    return pairs.select(
        F.col("l.id").alias("a"),
        F.col("r.id").alias("b"),
        score.alias("score_bp"),
    ).where(F.col("score_bp") >= min_score_bp)


def query_probes(query_vec, planes: list[list[float]], radius: int = 2) -> list[int]:
    """Multi-probe bucket set: the query's signature plus every
    signature within Hamming distance ``radius`` (the classic
    multi-probe LSH recall fix — a near neighbor differs from the query
    only on its marginal hyperplanes, so probing the few-bit flips
    recovers most of what single-probe loses). radius=2 lifts
    recall@10 above 0.9 on weakly-correlated corpora (the hardest
    case: per-plane agreement p ≈ 0.65 → per-table hit prob ~0.47,
    1-(1-r)^4 ≈ 0.92 over 4 tables) at a probe-set cost of
    1 + n + C(n,2) buckets per table."""
    qsig = 0
    for p, plane in enumerate(planes):
        d = sum(float(a) * b for a, b in zip(query_vec, plane))
        if d >= 0:
            qsig += 2**p
    n = len(planes)
    probes = [qsig]
    if radius >= 1:
        probes += [qsig ^ (1 << p) for p in range(n)]
    if radius >= 2:
        probes += [qsig ^ (1 << p) ^ (1 << q) for p in range(n) for q in range(p + 1, n)]
    return probes


def lsh_bucketed_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    probe_radius: int = 2,
) -> DataFrame:
    """ANN: L independent random-hyperplane tables, multi-probe
    (Hamming ≤ probe_radius) per table, candidates = union across
    tables, exact cosine within candidates.

    Single-table sign-LSH has inherently low recall (a neighbor at
    angle θ disagrees per plane with prob θ/π); L tables raise recall
    to 1-(1-r)^L at L× the candidate cost — the standard knob. At scale
    the L signatures are stored/bucketed columns (compute once at
    ingest); here they are computed in the scan projection — still a
    narrow scan-side filter pruning the corpus before the exact top-k
    (TakeOrdered, no global sort).

    The probe condition is one OR of per-table IN-list tests so that a
    row matching an early table short-circuits the remaining signature
    folds; the folds stay the compact lambda form deliberately (an
    unrolled L-table tree OOMs a default-sized driver heap during
    Catalyst analysis — measured round 6, see _sql_dot)."""
    conds = []
    for t in range(n_tables):
        planes = random_planes(len(query_vec), n_planes, seed + t)
        probes = query_probes(query_vec, planes, probe_radius)
        in_list = ", ".join(f"CAST({p} AS BIGINT)" for p in sorted(probes))
        conds.append(f"({plane_signature_sql(vec_col, planes)}) IN ({in_list})")
    return brute_force_topk(
        df.where(F.expr(" OR ".join(conds))), id_col, vec_col, query_vec, k
    )


def _hexval(ch) -> Column:
    return F.instr(F.lit("0123456789abcdef"), ch) - 1


def hashed_tf_embedding(tok_col, dim: int = 64, normalize: bool = True) -> Column:
    """Feature-hashing document embedding (the hashing trick): token t
    adds ±1 to component (((h1·16+h2)·16+h3)·16+h4) mod dim of an
    integer accumulator, where h1..h5 are md5(t) hex digits and the
    sign is the parity of h5 (the classic sign debiasing); the result
    is the L2-normalized vector as array<double>.

    The bucket draws on 16 bits of digest (4 hex digits), so every
    component up to dim 65536 is reachable; when dim does not divide
    65536 the modulo bias is ≤ dim/65536 per bucket — negligible, but
    powers of two are exactly uniform.

    This is the bridge from the TEXT ops to the EMBEDDING ops: hashed
    vectors feed embedding_near_dup_pairs / the IVF/LSH indexes
    directly, giving a no-model vector path for corpora without
    learned embeddings. Integer accumulation is order-independent, so
    the value is deterministic under any partitioning and exactly
    reproducible by a relational GROUP BY in the SQL oracle; md5 keeps
    it engine-portable. Computed WITHIN the row (one fold over the
    token array, like minhash/simhash) — zero shuffle.

    Cost shape: the fold accumulates a sparse (bucket → count) map —
    per-token work is O(occupied buckets), never O(dim) — and the
    dense dim-length vector is built ONCE at the end, so a row costs
    O(tokens · occupied + dim), not the O(tokens · dim) a per-token
    dense indicator array would (wasteful at realistic dims of 512+).
    """
    if not (0 < dim <= 65536):
        raise ValueError(
            f"hashed_tf_embedding: dim must be in (0, 65536] (4 hex digest "
            f"digits address 2^16 buckets); got {dim}"
        )

    def build(toks):
        def pair(t):
            # let-bind the digest via single-element transform so md5
            # evaluates once per token, not once per digit use
            def fromdigest(digest):
                hv = lambda i: _hexval(F.substring(digest, i, 1))
                bucket = (
                    ((hv(1) * 16 + hv(2)) * 16 + hv(3)) * 16 + hv(4)
                ) % dim
                sign = (
                    F.when(hv(5) % 2 == 0, F.lit(1))
                    .otherwise(F.lit(-1))
                    .cast("long")
                )
                return F.struct(
                    bucket.cast("int").alias("b"), sign.alias("s")
                )

            return F.element_at(F.transform(F.array(F.md5(t)), fromdigest), 1)

        def upd(m, p):
            b, s = p["b"], p["s"]
            return F.map_concat(
                F.map_filter(m, lambda k, v: k != b),
                F.create_map(
                    b, F.coalesce(F.element_at(m, b), F.lit(0).cast("long")) + s
                ),
            )

        empty = F.map_from_arrays(
            F.array().cast("array<int>"), F.array().cast("array<bigint>")
        )
        acc_map = F.aggregate(
            toks,
            empty,
            lambda m, t: F.element_at(
                F.transform(F.array(pair(t)), lambda p: upd(m, p)), 1
            ),
        )
        # densify once: map → dim-length array (let-bind the folded map)
        acc = F.element_at(
            F.transform(
                F.array(acc_map),
                lambda m: F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda j: F.coalesce(
                        F.element_at(m, j.cast("int")), F.lit(0).cast("long")
                    ),
                ),
            ),
            1,
        )

        if not normalize:
            return acc

        def l2(a):
            nrm = F.sqrt(
                F.aggregate(
                    a, F.lit(0.0), lambda s, v: s + (v * v).cast("double")
                )
            )
            return F.when(
                nrm > 0, F.transform(a, lambda v: v.cast("double") / nrm)
            ).otherwise(F.transform(a, lambda v: F.lit(0.0)))

        return F.element_at(F.transform(F.array(acc), l2), 1)

    return F.element_at(F.transform(F.array(tok_col), build), 1)


IVF_CELLS = 16
IVF_NPROBE = 6  # measured recall@10 = 0.83 vs brute force at 16 cells
# (nprobe 4 scored 0.67; gate >= 0.8 in test_ann_ivf_recall_vs_brute_force)


def ivf_centroids(emb_df: DataFrame, id_col: str, vec_col: str, n_cells: int = IVF_CELLS):
    """Deterministic IVF coarse centroids: the ``n_cells`` corpus
    vectors ranked first by md5(id) (a seeded spread sample — id order
    would risk correlated picks; md5 order is uniform and reproducible
    in SQL, so the DuckDB oracle selects the identical rows). A k-means
    refinement would tighten cells but costs iterations and breaks
    closed-form oracling; for inverted-file PRUNING the spread sample
    is the standard cheap choice. One driver-side collect of n_cells
    rows (same pattern as the cached query vector)."""
    rows = (
        emb_df.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy(F.md5(F.col("i").cast("string")), F.col("i"))
        .limit(n_cells)
        .collect()
    )
    return [list(r["v"]) for r in rows]


def ivf_cell_sql(vec_sql: str, centroids: list[list[float]]) -> str:
    """SQL text: 1-based index of the centroid with the highest
    direction-normalized dot product (dot(v,c)/||c|| — the vector's own
    norm is constant across cells, so it cannot change the argmax and
    is omitted). First-max-wins on exact ties (array_position), which
    the oracle mirrors as ORDER BY d DESC, cnum."""
    import math

    parts = []
    for c in centroids:
        # the centroid's own norm is a CONSTANT: fold it driver-side
        # with the same double ops (left-fold of double products, max,
        # sqrt — all correctly-rounded IEEE, so the literal equals what
        # the old in-plan sqrt(greatest(...)) computed); the vec dot
        # stays the lambda fold (see _sql_dot on why not unrolled)
        dot_ = _sql_dot(vec_sql, [float(w) for w in c])
        cc = 0.0
        for w in c:
            cc += float(w) * float(w)
        # greatest(cc, 1e-12): an all-zero centroid (failed/padded
        # encodes are commonly zero vectors) would otherwise divide by
        # zero — NaN sorts GREATEST in Spark, silently assigning every
        # row to the degenerate cell. The guard scores it 0 instead,
        # identically in Spark, DuckDB (oracle) and Python (probes).
        den = math.sqrt(max(cc, 1e-12))
        parts.append(f"({dot_} / CAST({den!r} AS DOUBLE))")
    ds = "array(" + ", ".join(parts) + ")"
    return f"array_position({ds}, array_max({ds}))"


def ivf_query_probes(
    query_vec, centroids: list[list[float]], nprobe: int = IVF_NPROBE
) -> list[int]:
    """Top-``nprobe`` cell numbers (1-based) for a query vector —
    Python double math folds left like the SQL expressions, so the
    probe set matches what the oracle derives."""
    import math

    scored = []
    for idx, c in enumerate(centroids):
        d = 0.0
        cc = 0.0
        for x, y in zip(query_vec, c):
            d += float(x) * float(y)
        for y in c:
            cc += float(y) * float(y)
        # max(cc, 1e-12) mirrors the SQL greatest() zero-norm guard
        scored.append((-(d / math.sqrt(max(cc, 1e-12))), idx + 1))
    return [cell for _, cell in sorted(scored)[:nprobe]]


def ann_ivf_topk(
    indexed: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = IVF_NPROBE,
    cell_col: str = "ivf_cell",
) -> DataFrame:
    """IVF ANN over a stored cell assignment: scan only the rows whose
    cell is among the query's top-``nprobe`` centroid cells, exact
    cosine within. The coarse-quantizer complement to the LSH tables —
    at 100 TB the index is PARTITIONED BY cell, so the probe filter is
    partition pruning, not a scan."""
    probes = ivf_query_probes(query_vec, centroids, nprobe)
    return brute_force_topk(
        indexed.where(F.col(cell_col).isin(probes)), id_col, vec_col, query_vec, k
    )


def ann_topk_from_signatures(
    sig_df: DataFrame,
    id_col: str,
    vec_col: str,
    query_vec,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    probe_radius: int = 2,
) -> DataFrame:
    """ANN over a STORED signature-index table (columns sig0..sig{L-1}
    written once at ingest, operators/signatures.py): the probe filter
    is L tiny integer IN-lists over stored columns — no per-query plane
    fold, no ~2000-node literal tree for Catalyst to chew (the in-scan
    lsh_bucketed_topk pays ~1.4 s of analysis per query; this plans in
    milliseconds), and on a bucketed/partitioned index the IN-lists
    prune partitions. Same result set as lsh_bucketed_topk by
    construction — identical planes, identical probes."""
    cond = None
    for t in range(n_tables):
        planes = random_planes(len(query_vec), n_planes, seed + t)
        probes = [int(p) for p in query_probes(query_vec, planes, probe_radius)]
        c = F.col(f"sig{t}").isin(probes)
        cond = c if cond is None else (cond | c)
    return brute_force_topk(sig_df.where(cond), id_col, vec_col, query_vec, k)


def assign_cells_vectorized(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "ivf_cell",
) -> DataFrame:
    """Arrow-batched IVF cell assignment for LARGE centroid counts —
    the 100 TB path. ``ivf_cell_sql`` unrolls one dot-product branch
    per centroid into the plan; at 16 cells that's a fine literal
    tree, but SemDeDup-style clustering sizes k ∝ corpus (thousands+
    of cells) and the unrolled tree would choke Catalyst. Here the
    centroid matrix rides into each Arrow batch once and the argmax is
    one (batch × dims) @ (dims × k) matrix multiply per batch.

    Semantics match ``ivf_cell_sql``: score = dot(v, c)/max(||c||,
    1e-12) (direction-normalized; the row's own norm can't change the
    argmax), first-max-wins on ties (np.argmax = first occurrence =
    array_position's first match), 1-based cell numbers. Float64
    summation ORDER differs (BLAS pairwise vs the SQL fold), so exact
    score ties-to-the-ulp can in principle route differently — the
    agreement pytest pins both paths identical on random corpora."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)  # (k, dims)
    # sqrt(max(||c||², 1e-12)) — the EXACT clamp ivf_cell_sql applies
    # (greatest inside the sqrt), so even degenerate sub-1e-6-norm
    # centroids score identically on both paths
    Cn = (C / np.sqrt(np.maximum((C * C).sum(axis=1), 1e-12))[:, None]).T

    from pyspark.sql.types import StructType

    # copy before .add — df.schema is the DataFrame's cached StructType
    # and .add mutates in place (the source frame would grow a phantom
    # column)
    out_schema = StructType(list(df.schema.fields)).add(out_col, "integer")

    def fn(batches):
        for pdf in batches:
            if len(pdf):
                V = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
                )
                pdf[out_col] = (V @ Cn).argmax(axis=1).astype("int32") + 1
            else:
                pdf[out_col] = np.array([], dtype=np.int32)
            yield pdf

    return df.mapInPandas(fn, schema=out_schema)


SEMDEDUP_BP = 3000  # cosine×10000 duplicate threshold (param; real
# embedding corpora run ~9500-9700 — the synthetic bench vectors top
# out near 0.49 within-cell, so the default exercises a non-trivial
# kept/dropped split at every SF)


def semantic_dedup_cells(
    sigs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
    min_score_bp: int = SEMDEDUP_BP,
) -> DataFrame:
    """SemDeDup-style semantic dedup over the stored IVF cells (Abbas
    et al. 2023: cluster embeddings coarsely, then pairwise-compare
    ONLY within a cluster): a vector is dropped when any SMALLER-id
    vector in its cell has cosine ≥ ``min_score_bp`` (greedy first-wins
    — deterministic, order-free, and exactly reproducible by a
    relational self-join, unlike the paper's random keeper).

    Returns one row per vector: (vec_id, cell, n_dom, max_bp, kept)
    where ``n_dom`` counts dominating smaller-id near-twins, ``max_bp``
    is the strongest such cosine (−1 when kept) and ``kept`` =
    (n_dom == 0) — the surviving semantic representatives.

    Scale shape: the self-join keys on the cell, and the signature
    index is PARTITIONED BY cell (operators/signatures.py), so the
    join co-locates; pair count is Σ|cell|², never |corpus|². At
    100 TB ``n_cells`` grows with the corpus (SemDeDup uses
    k ∝ n — e.g. ~100 k cells — keeping cells bounded and the join
    keys well spread), so neither cell size nor key skew grows with
    data. Only (cell, id, vec) are read — column pruning drops the
    sig columns at the scan. The pair cosine runs over per-row
    PRECOMPUTED norms (bit-identical, one fold per pair instead of
    three — see pair_cosine_bp)."""
    l = sigs.select(
        F.col(cell_col).alias("cell"),
        F.col(id_col).alias("u"),
        F.col(vec_col).alias("uv"),
        norm(F.col(vec_col)).alias("un"),
    )
    r = sigs.select(
        F.col(cell_col).alias("cell"),
        F.col(id_col).alias("v"),
        F.col(vec_col).alias("vv"),
        norm(F.col(vec_col)).alias("vn"),
    )
    bp = pair_cosine_bp(F.col("uv"), F.col("vv"), F.col("un"), F.col("vn"))
    dom = (
        l.join(r, "cell")
        .where(F.col("u") < F.col("v"))
        .select("v", bp.alias("bp"))
        .where(F.col("bp") >= min_score_bp)
        .groupBy("v")
        .agg(F.count("*").alias("_n_dom"), F.max("bp").alias("_max_bp"))
    )
    base = sigs.select(F.col(id_col).alias("vec_id"), F.col(cell_col).alias("cell"))
    return base.join(dom, base["vec_id"] == dom["v"], "left").select(
        "vec_id",
        F.col("cell").cast("int").alias("cell"),
        F.coalesce("_n_dom", F.lit(0)).cast("long").alias("n_dom"),
        F.coalesce("_max_bp", F.lit(-1)).cast("long").alias("max_bp"),
        F.col("_n_dom").isNull().alias("kept"),
    )
