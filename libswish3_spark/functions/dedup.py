"""Deduplication at corpus scale: exact, MinHash+LSH, SimHash, n-gram
Jaccard verification, and connected-components keeper resolution.

All deterministic and engine-portable: hashes are md5-based (identical
in Spark and DuckDB) rather than engine-private hash functions, so every
stage has an independent SQL oracle. Scale notes per operator:

* exact        — one hash-groupBy shuffle on the digest; partial agg
                 map-side, skew-free (digests are uniform).
* minhash LSH  — text → shingles → k minhashes → b band buckets, all
                 computed WITHIN each row (zero shuffle until the
                 candidate join); bucket sizes are capped so a
                 boilerplate-heavy bucket cannot go quadratic.
* jaccard      — exact verification ON LSH CANDIDATE PAIRS ONLY (two
                 linear joins + an array_intersect per pair). The raw
                 all-pairs shingle self-join exists for tiny corpora
                 and tests but must never run at scale.
* resolve      — min-id label propagation over verified pairs →
                 (doc_id, keeper) cluster assignment, bounded rounds
                 with per-round lineage truncation.
* simhash      — fixed-width signature; hamming-radius candidates via
                 band equality on signature nibbles.

Evaluation-count discipline: Catalyst performs no common-subexpression
elimination across column references — a subtree referenced k times is
evaluated k times (ProjectCollapse re-inlines staged selects). The
round-1 formulation paid O(tokens) full-text regexp extractions per
shingle because of exactly this. :func:`bind` pins any intermediate to
a higher-order-function lambda variable, which Spark evaluates exactly
once per row; the whole text → tokens → shingles → signature → buckets
chain below evaluates each stage once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from libswish3_spark.functions.text import fingerprint, tokens

# K=16 in 8 bands of r=2: candidate recall at jaccard s is
# 1-(1-s^2)^8 = 0.90 at the verify threshold s=0.5 (and 0.97 at
# s=0.6). The previous K=8/4-band config scored 0.68 at s=0.5 —
# measured, not just theory: tests/test_functions.py planted-pair
# recall. Doubling K doubles the per-shingle md5 fold, a linear
# narrow-stage cost; the candidate-join shape is unchanged.
MINHASH_K = 16
MINHASH_BANDS = 8  # r = K / BANDS = 2 rows per band
SIMHASH_BITS = 16
# lexicographically above every md5 hex digest; array_min identity
_MINHASH_SENTINEL = "￿"


def bind(col: Column, fn) -> Column:
    """Evaluate ``col`` exactly once per row, then apply ``fn``.

    Wraps the value in a single-element array and binds it to a
    ``transform`` lambda variable — inside ``fn`` every reference to the
    bound value is a variable lookup, not a re-evaluation of the
    subtree. This is the CSE Catalyst doesn't do.
    """
    return F.element_at(F.transform(F.array(col), fn), 1)


def shingles(tok_col, n: int = 3) -> Column:
    """Word n-gram shingles from a token array (JVM-side, single eval).

    Guarded for short docs: Spark's sequence(0, -1) would descend, so
    fewer than n tokens yields an empty array explicitly.
    """

    def make(toks):
        gram = F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
            ),
        )
        return F.when(F.size(toks) >= n, F.array_distinct(gram)).otherwise(
            F.array().cast("array<string>")
        )

    return bind(tok_col, make)


def minhash_signature(sh_col, k: int = MINHASH_K) -> Column:
    """k-element minhash signature array, computed within the row.

    Hash j of a shingle is the 8-hex-char slice j%4 of
    md5(shingle || '#' || j//4) — one md5 yields FOUR independent
    32-bit hash values, so k=16 costs 4 digests per shingle, not 16
    (the md5 fold is the dominant dedup cost; measured 2x on the
    chain). String order on fixed-width hex == numeric order, and md5
    is engine-portable, so the DuckDB oracle is exact. One pass over
    the shingle array accumulates all k mins; NULL for shingle-less
    docs so they can never bucket-collide with each other downstream.
    """

    def sig(sh):
        # constant-size expression tree: seeds/groups unroll at RUNTIME
        # via sequence(), not at plan-build time — Catalyst analysis of
        # a Python-side k-way unroll costs seconds per query
        seeds = F.sequence(F.lit(0), F.lit(k - 1))
        groups = (k + 3) // 4
        init = F.array_repeat(F.lit(_MINHASH_SENTINEL), k)
        folded = F.aggregate(
            sh,
            init,
            lambda acc, s: bind(
                F.transform(
                    F.sequence(F.lit(0), F.lit(groups - 1)),
                    lambda g: F.md5(F.concat(s, F.lit("#"), g.cast("string"))),
                ),
                lambda dg: F.zip_with(
                    acc,
                    F.transform(
                        seeds,
                        lambda j: F.element_at(
                            dg, (F.floor(j / 4) + 1).cast("int")
                        ).substr(((j % 4) * 8 + 1).cast("int"), F.lit(8)),
                    ),
                    lambda a, b: F.least(a, b),
                ),
            ),
        )
        return F.when(F.size(sh) > 0, folded).otherwise(
            F.lit(None).cast("array<string>")
        )

    return bind(sh_col, sig)


def band_buckets(
    sh_col, k: int = MINHASH_K, bands: int = MINHASH_BANDS
) -> Column:
    """Array of LSH band bucket keys (md5 of each band's minhash rows).

    NULL for shingle-less docs (explode drops them — an all-empty
    bucket would otherwise pair every empty doc with every other).
    """
    r = k // bands

    def mk(sig):
        # band key 'b|mh_{br}|mh_{br+1}...' built from a runtime slice —
        # same string as the unrolled concat_ws, constant-size tree
        arr = F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.md5(
                F.concat_ws(
                    "|",
                    b.cast("string"),
                    F.array_join(F.slice(sig, b * r + 1, r), "|"),
                )
            ),
        )
        return F.when(sig.isNotNull(), arr).otherwise(
            F.lit(None).cast("array<string>")
        )

    return bind(minhash_signature(sh_col, k), mk)


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
    """id → k minhash columns (mh0..mh{k-1}); narrow, zero shuffle."""
    sig = minhash_signature(shingles(tokens(F.col(text_col))), k)

    def cols(s):
        return F.struct(*[F.element_at(s, j + 1).alias(f"mh{j}") for j in range(k)])

    packed = df.select(F.col(id_col).alias("id"), bind(sig, cols).alias("s"))
    return packed.select("id", *[F.col(f"s.mh{j}") for j in range(k)])


def doc_band_buckets(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, bucket) exploded band-bucket table.

    The hash chain is computed in a projection and an exchange barrier
    separates it from the explode: without the barrier, ColumnPruning
    inlines the whole chain into Generate, whose interpreted eval of
    nested lambda expressions costs ~3× the projection itself. The
    barrier shuffle carries only (id, bands×32-hex) — skinny rows,
    negligible against the corpus at any scale, and the exploded output
    immediately reshuffles on bucket anyway.

    explode_OUTER + null filter, not plain explode: for a non-outer
    Generate the optimizer infers a ``size(bks) > 0`` predicate and
    pushes it through BOTH exchanges into the file scan's DataFilters —
    re-evaluating the entire signature chain per row inside the scan
    stage (which is as parallel as the file layout, i.e. ONE task for a
    single-file source: measured 4-5× the whole job). The outer form
    infers nothing; the post-Generate null filter is on the generated
    column and cannot sink."""
    packed = df.select(
        F.col(id_col).alias("id"),
        band_buckets(shingles(tokens(F.col(text_col)))).alias("bks"),
    )
    packed = packed.repartition("id")
    return packed.select("id", F.explode_outer("bks").alias("bucket")).where(
        F.col("bucket").isNotNull()
    )


# "auto" edge mode: all-pairs below this many members, star above —
# small buckets keep full verify-stage precision, big (clone-family)
# buckets collapse from O(size²) to O(size) edges
STAR_THRESHOLD = 32


def candidate_pairs_from_buckets(
    exploded: DataFrame,
    max_bucket: int | None = 1000,
    pairs: str = "all",
    star_threshold: int = STAR_THRESHOLD,
) -> DataFrame:
    """(id, bucket) table → candidate pairs (a < b) sharing a bucket.

    Works over a freshly computed :func:`doc_band_buckets` OR a STORED
    bucket-index table (operators/signatures.py) — at 100 TB the index
    is written once at ingest and every dedup query starts here,
    skipping the md5 signature fold entirely.

    ``max_bucket`` caps bucket fan-out: a band bucket with more than
    max_bucket members (boilerplate, templated pages) would contribute
    O(size²) pairs — at web scale one hot bucket can dominate the whole
    job. Capped buckets are dropped entirely; their members are still
    reachable through their other (bands-1) buckets, and genuinely
    templated near-dup farms are better handled by exact dedup first.

    ``pairs`` picks the within-bucket edge set:

    * ``"all"`` (default) — every pair, O(size²) per bucket. Exact and
      oracle-friendly, robust to verify-stage edge drops (any two
      similar members connect directly).
    * ``"star"`` — each member links only to the bucket's MIN id,
      O(size) per bucket. Same connected components BEFORE verification
      (a star spans the bucket), so cluster RESOLUTION over clone
      families is identical while edge volume collapses — measured on
      a 1.28 M-doc corpus of 256-clone families: 222 M all-pairs edges
      in 258 s vs 2.2 M star edges in 15 s (100× fewer, 17× faster,
      equal clusters). The tradeoff: verification prunes edges
      INDIVIDUALLY, so two members that are both similar to a third but
      not to the bucket min can lose their connection; use for massive
      clone-family workloads (exact-dup-heavy web crawls) where the
      family structure dominates, keep ``"all"`` when verify-stage
      precision shapes the clusters.
    * ``"auto"`` — per-bucket dispatch: all-pairs for buckets with at
      most ``star_threshold`` members, star above. The scale-safe
      default for production dedup recipes (submit_extract wires it):
      ordinary buckets keep all-pairs precision, and the clone-family
      buckets that would go quadratic (the r5 scale probe measured
      222 M all-pairs edges vs 2.2 M star edges on a clone-heavy
      1.28 M-doc corpus, identical resolved clusters) emit O(size)
      edges. The oracle queries keep explicit ``"all"``.
    """
    if pairs not in ("all", "star", "auto"):
        raise ValueError(f"pairs must be 'all', 'star' or 'auto', got {pairs!r}")
    if pairs == "auto":
        from pyspark.sql import Window

        w = Window.partitionBy("bucket")
        sized = exploded.withColumn("_n", F.count("*").over(w))
        if max_bucket is not None:
            sized = sized.where(F.col("_n") <= max_bucket)
        small = sized.where(F.col("_n") <= star_threshold).drop("_n")
        big = sized.where(F.col("_n") > star_threshold).drop("_n")
        return (
            candidate_pairs_from_buckets(small, max_bucket=None, pairs="all")
            .unionByName(
                candidate_pairs_from_buckets(big, max_bucket=None, pairs="star")
            )
            .distinct()
        )
    if max_bucket is not None:
        # cap filter as a COUNT WINDOW over the bucket, not a
        # groupBy+join: one shuffle of the (id, bucket) table instead
        # of an aggregate plus a join against it, and the window's
        # hash-partitioning on bucket is exactly what the pair
        # self-join below needs — the exchange is planned once and
        # reused for both join sides (same rows kept either way)
        from pyspark.sql import Window

        w = Window.partitionBy("bucket")
        exploded = (
            exploded.withColumn("_n", F.count("*").over(w))
            .where(F.col("_n") <= max_bucket)
            .drop("_n")
        )
    if pairs == "star":
        # one aggregate for the per-bucket min, one join: edges
        # (min, member) for member != min — linear in bucket size
        mins = exploded.groupBy("bucket").agg(F.min("id").alias("a"))
        return (
            exploded.join(mins, "bucket")
            .where(F.col("id") != F.col("a"))
            .select("a", F.col("id").alias("b"))
            .distinct()
        )
    left = exploded.alias("l")
    right = exploded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .distinct()
    )


def minhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_bucket: int | None = 1000,
) -> DataFrame:
    """LSH candidate pairs (a < b) sharing at least one band bucket —
    signature chain computed inline; see candidate_pairs_from_buckets
    for the stored-index entry and the max_bucket semantics."""
    return candidate_pairs_from_buckets(
        doc_band_buckets(df, id_col, text_col), max_bucket
    )


def cap_drop_metrics(
    bucketed: DataFrame, key: str = "bucket", max_bucket: int = 1000
) -> DataFrame:
    """Observability for the hot-bucket cap: ONE row
    (dropped_buckets, dropped_rows) counting what the cap-and-drop in
    :func:`candidate_pairs_from_buckets` /
    ``similarity.embedding_near_dup_pairs`` silently removes from pair
    coverage. At 100 TB the cap is the right call, but a dedup run must
    be able to report 'N rows lost pair coverage to M hot buckets' next
    to its other counters — silent coverage loss is not a metric, it's
    a surprise. Works over the same (id, key) exploded table (or stored
    index) the candidate join consumes; the aggregate is tiny (one row
    per over-cap bucket before the final fold)."""
    return (
        bucketed.groupBy(key)
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > max_bucket)
        .agg(
            F.count("*").alias("dropped_buckets"),
            F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("dropped_rows"),
        )
    )


def shingle_arrays_vectorized(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, sh) distinct word-n-gram shingle arrays via ONE Arrow batch
    kernel — the scale twin of ``shingles(tokens(col))``, whose nested
    transform/concat_ws lambdas the JVM interprets per element (the
    dominant cost of the jaccard-verify stage at 1 M+ docs). Same
    semantics, pinned element-identical by pytest: ASCII token class on
    lowercased text, space-joined n-grams, first-occurrence distinct,
    empty array (never null) for docs with < n tokens or null text."""
    import re

    from pyspark.sql.types import ArrayType, StringType, StructType

    tok_re = re.compile("[a-z0-9'_]+")  # tokenizer.ASCII_TOKEN_PATTERN_SQL
    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    schema = StructType([src.schema.fields[0]]).add(
        "sh", ArrayType(StringType())
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for text in pdf["_t"]:
                toks = (
                    tok_re.findall(text.lower())
                    if isinstance(text, str) and text
                    else []
                )
                if len(toks) < n:
                    out.append([])
                else:
                    out.append(
                        list(
                            dict.fromkeys(
                                " ".join(toks[i : i + n])
                                for i in range(len(toks) - n + 1)
                            )
                        )
                    )
            yield pd.DataFrame({"id": pdf["id"], "sh": out})

    return src.mapInPandas(kernel, schema=schema)


def jaccard_verify(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    n: int = 3,
    vectorized: bool = True,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only — the scale path.

    Shingle arrays are computed ONLY for documents that appear in a
    candidate pair (semi-join first): candidates are near-dup-bounded,
    so the expensive tokenize+shingle fold runs over a tiny fraction of
    the corpus instead of all of it — at 100 TB that is the difference
    between a full second scan and a lookup. Then two linear joins
    attach each side's (distinct) shingle array and one array_intersect
    scores each pair; never quadratic in the corpus. Jaccard is
    returned ×10000 as a bigint for engine-portable hashing.

    ``vectorized=True`` produces the shingle arrays through the Arrow
    kernel (:func:`shingle_arrays_vectorized`, pinned identical);
    ``False`` keeps the pure-expression fold the oracles mirror.
    """
    cand_ids = (
        candidates.select(F.col("a").alias("cid"))
        .union(candidates.select(F.col("b").alias("cid")))
        .distinct()
    )
    gated = df.join(cand_ids, F.col(id_col) == F.col("cid"), "left_semi")
    if vectorized:
        sh = shingle_arrays_vectorized(gated, id_col, text_col, n)
    else:
        sh = gated.select(
            F.col(id_col).alias("id"),
            shingles(tokens(F.col(text_col)), n).alias("sh"),
        )
    pairs = (
        candidates.join(
            sh.select(F.col("id").alias("a"), F.col("sh").alias("sha")), "a"
        )
        .join(sh.select(F.col("id").alias("b"), F.col("sh").alias("shb")), "b")
    )
    common = F.size(F.array_intersect("sha", "shb"))
    union = F.size("sha") + F.size("shb") - common
    # greatest(union, 1): candidates from the stored index always have
    # shingles, but the docstring admits ANY candidate pairs — two
    # sub-n-token docs give union = 0, which is DIVIDE_BY_ZERO under
    # ANSI (and a silently dropped pair otherwise). The clamp scores
    # the empty-vs-empty pair 0, so it drops below any threshold > 0.
    jacc = F.floor(common * 10000 / F.greatest(union, F.lit(1))).cast("long")
    return pairs.select("a", "b", jacc.alias("jaccard_bp")).where(
        F.col("jaccard_bp") >= int(threshold * 10000)
    )


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.5, n: int = 3
) -> DataFrame:
    """Exact n-gram Jaccard for ALL pairs sharing a shingle.

    Quadratic per shared-shingle bucket — tests/tiny corpora only; at
    scale gate behind LSH: ``jaccard_verify(df, minhash_candidates(df,
    ...), ...)``, which is what the registered dedup queries do.
    """
    sh = (
        df.select(
            F.col(id_col).alias("id"),
            shingles(tokens(F.col(text_col)), n).alias("sh"),
        )
        # outer + null filter: see doc_band_buckets (a plain explode's
        # inferred size()>0 predicate sinks the shingle chain into the scan)
        .select("id", F.size("sh").alias("n_sh"), F.explode_outer("sh").alias("shingle"))
        .where(F.col("shingle").isNotNull())
    )
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


def resolve_clusters(
    pairs: DataFrame, max_rounds: int = 20, require_converged: bool = False
) -> DataFrame:
    """Near-dup pairs → (doc_id, keeper): connected components by min-id
    label propagation with per-round POINTER DOUBLING (label ←
    min(label, label-of-label)), so even a pure chain of diameter d
    converges in O(log d) rounds — a 25-hop chain resolves in ~5 rounds
    where plain propagation needs 25. Near-dup clusters are usually
    shallow (dup farms are star-shaped around a template), so typical
    runs still finish in 2-3 rounds. Each round is two joins + one
    aggregate on the (node, label) table — skinny rows, never the
    document payload. localCheckpoint truncates lineage so round k
    doesn't replay rounds 0..k-1.

    Convergence is SURFACED, not assumed: if ``max_rounds`` elapse
    without the label fixpoint, a warning is emitted (or ValueError
    when ``require_converged``) — returning silently-unconverged labels
    would mislabel keepers with no signal. With doubling, 20 rounds
    covers diameters beyond 2^19 — hitting the cap means something is
    genuinely wrong with the input.

    Keeper sets here are what actually lets dedup DROP rows:
    ``docs.join(resolve_clusters(...), on=id, 'left_anti' for non-
    keepers)`` is the final filter of the pipeline.

    Hybrid execution (guide §1.2: the distributed algorithm is where
    the orders of magnitude live — and below a size floor the
    distributed algorithm IS the overhead): each doubling round costs
    3+ job launches regardless of data size, so a small edge set pays
    seconds of pure scheduling. When the materialized pair table holds
    at most ``spark.libswish3.cc.localEdgeLimit`` directed edges
    (default 2M; as collected python Rows plus the union-find dict that
    is up to a few hundred MB of driver memory with string ids — size
    the knob to the driver heap, or set 0 to always run distributed),
    the components are resolved by a driver-side min-id
    union-find, which is definitionally the same labeling (keeper =
    component minimum; union-find is direction- and duplicate-
    agnostic, so it reads the RAW pairs and skips the edge
    symmetrization/distinct shuffles entirely). Larger sets build the
    symmetric edge table and take the distributed doubling loop
    unchanged — the 100 TB path. The count that makes the decision
    runs on the already-checkpointed pairs, not the candidate
    pipeline.
    """
    spark = pairs.sparkSession
    # materialized once: the local gate counts it, and every doubling
    # round otherwise re-runs the whole candidate+verify pipeline
    raw = pairs.select("a", "b").localCheckpoint(eager=True)
    try:
        local_limit = int(
            spark.conf.get("spark.libswish3.cc.localEdgeLimit", "2000000")
        )
    except ValueError:
        local_limit = 2_000_000
    if local_limit > 0 and 2 * raw.count() <= local_limit:
        return _resolve_clusters_local(spark, raw)
    edges = (
        raw.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(raw.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    labels = labels.localCheckpoint(eager=True)
    # convergence test: one scalar aggregate per round (no extra join),
    # id-type-agnostic — labels change every non-converged round, so the
    # xxhash64 label-sum changes too (a numeric cast here would NULL out
    # string doc_ids, the library's native id type per DOCS_SCHEMA, and
    # silently stop after one round on any component of diameter > 2)
    # sentinel, not None: an EMPTY labels table aggregates to a None
    # sum, which must still compare equal across rounds (trivial
    # fixpoint) instead of spuriously never converging
    prev_sum = object()
    converged = False
    for _ in range(max_rounds):
        neigh = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        stepped = labels.join(neigh, labels.id == neigh.src, "left").select(
            labels.id,
            F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
        )
        # pointer doubling: jump to the label's own label — halves the
        # remaining chain length every round (O(log d) convergence)
        x, y = stepped.alias("x"), stepped.alias("y")
        labels = (
            x.join(y, F.col("x.label") == F.col("y.id"), "left")
            .select(
                F.col("x.id").alias("id"),
                F.least(
                    F.col("x.label"), F.coalesce(F.col("y.label"), F.col("x.label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = labels.agg(
            F.sum(F.xxhash64("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0][0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        msg = (
            f"resolve_clusters: label propagation did not reach a fixpoint "
            f"within max_rounds={max_rounds}; keeper labels may be wrong"
        )
        if require_converged:
            raise ValueError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("keeper"))


def _resolve_clusters_local(spark, edges: DataFrame) -> DataFrame:
    """Driver-side min-id union-find over a SIZE-GATED pair collect
    (see resolve_clusters): every node labeled with its component's
    minimum id — exactly the fixpoint the doubling loop converges to
    (edge direction and duplicates are irrelevant to union-find).
    Output schema matches the distributed branch (same id type)."""
    from pyspark.sql.types import StructField, StructType

    rows = edges.collect()
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in rows:
        a, b = row[0], row[1]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-id representative: the union root is the smaller id
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    out = [(n, find(n)) for n in parent]
    id_type = edges.schema[0].dataType
    schema = StructType(
        [
            StructField("doc_id", id_type, True),
            StructField("keeper", id_type, True),
        ]
    )
    return spark.createDataFrame(out, schema=schema)


def _hexval(ch: Column) -> Column:
    return F.instr(F.lit("0123456789abcdef"), ch) - 1


def simhash(tok_col, bits: int = SIMHASH_BITS) -> Column:
    """SimHash signature over md5 bits of each token (engine-portable).

    bit i of token t = (hexdigit(md5(t)[i//4]) >> (i%4)) & 1; the
    signature bit is the sign of sum(2*bit - 1) over tokens. One
    aggregate pass accumulates all ``bits`` counters (the token array is
    bound once; md5 per token is computed once per nibble via the digest
    binding below).
    """

    def build(toks):
        bit_ids = F.sequence(F.lit(0), F.lit(bits - 1))

        # per token: bind the md5 digest once, emit ±1 per bit; the bit
        # loop unrolls at runtime (sequence), keeping the tree constant-
        # size — a Python-side unroll costs seconds of Catalyst analysis
        def contrib(t):
            def frombits(digest):
                return F.transform(
                    bit_ids,
                    lambda i: (
                        F.floor(
                            _hexval(
                                F.substring(
                                    digest, (F.floor(i / 4) + 1).cast("int"), 1
                                )
                            )
                            / F.pow(F.lit(2.0), (i % 4).cast("double"))
                        ).cast("long")
                        % 2
                    )
                    * 2
                    - 1,
                )

            return bind(F.md5(t), frombits)

        sums = F.aggregate(
            toks,
            F.array_repeat(F.lit(0).cast("long"), bits),
            lambda acc, t: F.zip_with(acc, contrib(t), lambda a, b: a + b),
        )

        def tosig(s):
            weights = F.zip_with(
                s,
                bit_ids,
                lambda v, i: F.when(
                    v >= 0, F.pow(F.lit(2.0), i.cast("double"))
                ).otherwise(F.lit(0.0)),
            )
            return F.aggregate(
                weights, F.lit(0.0), lambda a, b: a + b
            ).cast("long")

        return bind(sums, tosig)

    return bind(tok_col, build)


def duplicated_ngram_starts(
    df: DataFrame, id_col: str, text_col: str, n: int = 8, min_count: int = 2
) -> DataFrame:
    """(id, pos) start positions of every token n-gram whose exact
    content occurs at least ``min_count`` times across the corpus
    (including repeats within one document) — the detection half of
    exact substring dedup (the sequence-level dedup of Lee et al.,
    "Deduplicating Training Data Makes Language Models Better",
    published recipe; 50-token windows there, parameterized here).

    Shape at scale: per-row window hashes (one narrow projection,
    O(tokens·n) bytes hashed), ONE explode to (id, pos, gram-hash)
    rows, one count aggregate on the hash (partial map-side, uniform
    md5 keys — skew-free), one join back. Nothing quadratic; the
    duplicated-hash set is boilerplate-sized, not corpus-sized.
    """
    toks = tokens(F.col(text_col))

    def gram_hashes(ts):
        grams = F.transform(
            F.sequence(F.lit(0), F.size(ts) - n),
            lambda j: F.md5(F.concat_ws(" ", F.slice(ts, j + 1, n))),
        )
        return F.when(F.size(ts) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )

    # outer + null filter: see doc_band_buckets (a plain posexplode's
    # inferred size()>0 predicate sinks the window-hash chain into the scan)
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.posexplode_outer(bind(toks, gram_hashes)).alias("pos", "gh"),
    ).where(F.col("gh").isNotNull())
    dup = (
        exploded.groupBy("gh")
        .agg(F.count("*").alias("_c"))
        .where(F.col("_c") >= min_count)
        .select("gh")
    )
    return exploded.join(dup, "gh").select("id", "pos")


def remove_duplicated_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int = 8, min_count: int = 2
) -> DataFrame:
    """Exact substring dedup: drop every token covered by a duplicated
    n-gram window, rebuild the text from the survivors.

    Returns (id, clean_text, n_kept, n_removed) for EVERY input doc
    (fully-duplicated docs come back with clean_text='' — same
    no-silent-loss contract as drop_frequent_paragraphs). Coverage is
    computed by exploding each duplicated window start to its n token
    positions (O(dup-windows·n), boilerplate-bounded) and anti-joining
    the token stream; reassembly is the ordered collect used across
    this module. The token stream shuffles once (groupBy id).
    """
    starts = duplicated_ngram_starts(df, id_col, text_col, n, min_count)
    covered = starts.select(
        "id", F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("tpos")
    ).distinct()
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokens(F.col(text_col))).alias("tpos", "tok"),
    )
    kept = toks.join(covered, ["id", "tpos"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("tpos", "tok"))),
                lambda e: e["tok"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    totals = df.select(
        F.col(id_col).alias("id"), F.size(tokens(F.col(text_col))).alias("n_total")
    )
    return totals.join(rebuilt, "id", "left").select(
        "id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        (F.col("n_total") - F.coalesce("n_kept", F.lit(0))).cast("long").alias(
            "n_removed"
        ),
    )


def _regex_quote(s: str) -> str:
    """Java-regex literal quoting (Pattern.quote): \\Q...\\E with any
    embedded \\E split out, so a separator like '.' or '||' splits as a
    literal string — matching how array_join re-joins it literally."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def drop_frequent_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    max_doc_freq: int = 10,
) -> DataFrame:
    """Paragraph-level boilerplate removal (the CCNet/RefinedWeb-style
    line dedup): drop every paragraph whose exact content appears in
    more than ``max_doc_freq`` distinct documents (navbars, footers,
    cookie banners — the cross-document repeated furniture document-
    level dedup can't see).

    Shape at scale: one exploded (id, pos, para-hash) pass → a tiny
    (hash, doc-freq) aggregate (frequent-paragraph set is boilerplate,
    orders of magnitude smaller than the corpus) → broadcast anti-join
    → per-document ordered reassembly. The paragraph payload shuffles
    once (the explode's groupBy-back); the frequent set never exceeds
    broadcast size by construction of the threshold.

    ``sep`` is a literal string (regex-quoted for the split, joined
    verbatim on reassembly — the round-trip holds for any separator).

    Returns (id, clean_text, n_paras) — every input document appears in
    the output; documents whose every paragraph was boilerplate yield
    clean_text='' with n_paras=0 (the left join below restores them
    after the anti-join removed all their rows).
    """
    paras = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), _regex_quote(sep))).alias(
            "pos", "para"
        ),
    )
    frequent = (
        paras.groupBy(F.md5("para").alias("h"))
        .agg(F.count_distinct("id").alias("df"))
        .where(F.col("df") > max_doc_freq)
        .select("h")
    )
    kept = paras.join(
        F.broadcast(frequent), F.md5(paras.para) == frequent.h, "left_anti"
    )
    surviving = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda e: e["para"],
            ),
            sep,
        ).alias("clean_text"),
        F.count("*").alias("n_paras"),
    )
    # all-boilerplate docs have zero surviving paragraphs — restore them
    # with an empty clean_text instead of silently dropping the row
    return df.select(F.col(id_col).alias("id")).join(
        surviving, "id", "left"
    ).select(
        "id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_paras", F.lit(0).cast("long")).alias("n_paras"),
    )
