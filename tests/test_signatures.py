"""Stored LSH signature/index tables (operators/signatures.py):
ingest-once materialization must be bit-equal to the in-scan chains."""

import os

from pyspark.sql import functions as F

from libswish3_spark.functions import dedup as D, similarity as S


SF = "/root/testdata/sf0.001"


def test_stored_bucket_candidates_equal_inline(spark):
    """Candidates from the materialized (id, bucket) table == candidates
    from the inline signature chain — same pairs, same cap semantics."""
    from libswish3_spark.operators.signatures import ensure_index_tables

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    inline = {
        (r["a"], r["b"])
        for r in D.minhash_candidates(docs, "doc_id", "text", max_bucket=50).collect()
    }
    idx = ensure_index_tables(spark, SF)["minhash_buckets"]
    stored = {
        (r["a"], r["b"])
        for r in D.candidate_pairs_from_buckets(idx, max_bucket=50).collect()
    }
    assert stored == inline


def test_stored_ann_equals_in_scan(spark):
    """ann_topk_from_signatures over the stored sig columns returns the
    identical result set to lsh_bucketed_topk's in-scan computation
    (same planes, same probes)."""
    from libswish3_spark.operators.signatures import ensure_index_tables

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = list(emb.orderBy("vec_id").limit(1).collect()[0]["embedding"])
    in_scan = [
        (r["vec_id"], r["score_bp"])
        for r in S.lsh_bucketed_topk(emb, "vec_id", "embedding", qv).collect()
    ]
    sigs = ensure_index_tables(spark, SF)["embedding_sigs"]
    stored = [
        (r["vec_id"], r["score_bp"])
        for r in S.ann_topk_from_signatures(sigs, "vec_id", "embedding", qv).collect()
    ]
    assert stored == in_scan
    # and the stored-path plan has no per-row plane fold: the signature
    # computation is a chain of CASE WHEN aggregate(...) bit terms in the
    # in-scan form; the only remaining lambda math is the cosine score
    plan = S.ann_topk_from_signatures(
        sigs, "vec_id", "embedding", qv
    )._jdf.queryExecution().executedPlan().toString()
    assert "CASE WHEN" not in plan
    assert "sig0" in plan  # probes filter on the stored columns


def test_stored_near_dup_equals_inline(spark):
    """embedding_near_dup_pairs(sig_col=...) over stored sig0 == the
    plane-folding form with the table-0 planes."""
    from libswish3_spark.operators.signatures import (
        ANN_SEED,
        build_embedding_signature_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    planes = S.random_planes(64, 8, ANN_SEED)
    inline = {
        (r["a"], r["b"], r["score_bp"])
        for r in S.embedding_near_dup_pairs(
            emb, "vec_id", "embedding", planes, min_score_bp=2000
        ).collect()
    }
    sigs = build_embedding_signature_index(emb)
    stored = {
        (r["a"], r["b"], r["score_bp"])
        for r in S.embedding_near_dup_pairs(
            sigs, "vec_id", "embedding", min_score_bp=2000, sig_col="sig0"
        ).collect()
    }
    assert stored == inline


def test_ivf_finds_planted_near_duplicates(spark):
    """IVF semantics that matter for dedup/similarity: a vector that is
    a tiny perturbation of a corpus vector must land in the same cell
    as its original and be retrieved at rank 1 with the default nprobe.
    Also: cells actually partition (more than one cell in use), and the
    probe filter really prunes rows."""
    import random

    from libswish3_spark.operators.signatures import (
        build_embedding_signature_index,
    )

    rng = random.Random(7)
    base = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(200)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = S.ivf_centroids(emb, "vec_id", "embedding", 8)
    idx = build_embedding_signature_index(
        emb, dims=16, centroids=cents
    ).cache()
    cells = {r["vec_id"]: r["ivf_cell"] for r in idx.collect()}
    assert len(set(cells.values())) > 1  # real partitioning
    hits = 0
    for probe_i in (3, 57, 121, 180):
        q = [x + rng.uniform(-1e-3, 1e-3) for x in base[probe_i]]
        got = S.ann_ivf_topk(
            idx, "vec_id", "embedding", q, cents, k=1, nprobe=4
        ).collect()
        if got and got[0]["vec_id"] == probe_i:
            hits += 1
    assert hits == 4  # near-identical vectors always retrieved
    # pruning: a 4-of-8-cell probe scans a strict subset
    probes = S.ivf_query_probes(base[0], cents, nprobe=4)
    pruned = idx.where(F.col("ivf_cell").isin(probes)).count()
    assert 0 < pruned < len(base)


def test_ivf_probe_filter_is_partition_pruning(spark):
    """The stored embedding index is partitioned by ivf_cell, so the
    ANN probe filter must reach the scan as a PartitionFilter (whole
    partitions skipped), not a post-scan row filter."""
    from libswish3_spark.operators.signatures import ensure_index_tables

    sigs = ensure_index_tables(spark, SF)["embedding_sigs"]
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = list(emb.orderBy("vec_id").limit(1).collect()[0]["embedding"])
    cents = S.ivf_centroids(emb, "vec_id", "embedding")
    out = S.ann_ivf_topk(sigs, "vec_id", "embedding", qv, cents)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [ivf_cell" in plan
    # and it still returns real results
    assert out.count() == 10


def test_hashed_embedding_feeds_embedding_ops(spark):
    """The text→vector bridge composes: hashed-TF embeddings of two
    near-identical documents must surface as an embedding near-dup
    pair through the SAME plane-bucketed operator the embeddings table
    uses; a distinct document must not pair with either."""
    from libswish3_spark.functions.text import tokens

    base = ("the training corpus contains many documents and this one "
            "talks about feature hashing tricks for vectors at scale " * 3)
    near = base.replace("tricks", "methods", 1)
    other = ("completely different topic entirely unrelated words "
             "about cooking pasta recipes and olive oil " * 3)
    # b = exact content dup of a (identical vector → identical bucket,
    # deterministic); n = one-word edit (cosine ≈ 0.99 but may flip a
    # marginal plane — the single-table gap multi-probe exists for)
    df = spark.createDataFrame(
        [("a", base), ("b", base), ("n", near), ("c", other)],
        ["doc_id", "text"],
    )
    emb = df.select(
        "doc_id",
        S.hashed_tf_embedding(tokens(F.col("text"))).alias("embedding"),
    ).cache()
    planes = S.random_planes(64, 8, seed=42)
    pairs = {
        (r["a"], r["b"]): r["score_bp"]
        for r in S.embedding_near_dup_pairs(
            emb, "doc_id", "embedding", planes, min_score_bp=8000
        ).collect()
    }
    assert ("a", "b") in pairs and pairs[("a", "b")] == 10000
    assert not [p for p in pairs if "c" in p]
    # the one-word edit is recovered by the multi-probe multi-table ANN
    qv = list(emb.where(F.col("doc_id") == "n").collect()[0]["embedding"])
    got = [r["vec_id"] for r in S.lsh_bucketed_topk(
        emb.withColumnRenamed("doc_id", "vec_id"), "vec_id", "embedding", qv, k=3
    ).collect()]
    assert "a" in got and "b" in got and "c" not in got


def test_index_build_is_idempotent(spark):
    """ensure_index_tables: second call reuses the materialized parquet
    (the ingest-once contract) — no rewrite."""
    from libswish3_spark.operators.signatures import _index_root, ensure_index_tables

    ensure_index_tables(spark, SF)
    root = _index_root(SF)
    marker = os.path.join(root, "minhash_buckets", "_SUCCESS")
    mtime = os.path.getmtime(marker)
    ensure_index_tables(spark, SF)
    assert os.path.getmtime(marker) == mtime


def test_embedding_near_dup_pairs_contract_requires_planes_or_sig(spark):
    """Neither planes nor sig_col is a contract violation surfaced at
    entry, not an obscure downstream NPE inside plane_signature."""
    import pytest

    df = spark.range(1).select(
        F.col("id"), F.array(F.lit(1.0)).alias("vec")
    )
    with pytest.raises(ValueError, match="planes.*sig_col"):
        S.embedding_near_dup_pairs(df, "id", "vec")


def test_hashed_tf_embedding_dim_validation_and_high_bucket_reach(spark):
    """dim outside (0, 65536] raises; with dim > 256 the 4-hex-digit
    bucket reaches components >= 256 (the 2-digit formulation left them
    permanently zero)."""
    import pytest

    with pytest.raises(ValueError, match="dim"):
        S.hashed_tf_embedding(F.col("x"), dim=0)
    with pytest.raises(ValueError, match="dim"):
        S.hashed_tf_embedding(F.col("x"), dim=65537)

    toks = F.array(*[F.lit(f"token{i}") for i in range(64)])
    row = spark.range(1).select(
        S.hashed_tf_embedding(toks, dim=512, normalize=False).alias("v")
    ).collect()[0]
    assert len(row["v"]) == 512
    assert any(v != 0 for v in row["v"][256:])


def test_embedding_index_derives_dims_from_data(spark):
    """The signature build derives plane dimensionality from the DATA
    (a hardcoded 64 poisoned any other-width corpus: zip_with padded
    missing plane weights with NULL → every signature degenerated and
    query-side buckets, derived from len(query_vec), never matched)."""
    import random

    from pyspark.sql import functions as F

    from libswish3_spark.functions import similarity as S
    from libswish3_spark.operators.signatures import (
        build_embedding_signature_index,
    )

    rng = random.Random(11)
    dims = 32  # NOT the default 64
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dims)]) for i in range(40)]
    rows.append((999, [v + 0.001 for v in rows[0][1]]))  # planted near-dup of 0
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sigs = build_embedding_signature_index(emb).cache()
    # signatures must be non-degenerate (more than one distinct value)
    assert sigs.select("sig0").distinct().count() > 1
    q = rows[0][1]
    top = S.ann_topk_from_signatures(sigs, "vec_id", "embedding", q).collect()
    ids = [r["vec_id"] for r in top]
    assert ids[0] in (0, 999) and 999 in ids[:2]


def test_ivf_zero_norm_centroid_guard(spark):
    """An all-zero vector sampled as a centroid must not crash the
    Python probe path (ZeroDivisionError) nor NaN-poison the SQL cell
    assignment (NaN sorts greatest in Spark → every row lands in the
    degenerate cell). The greatest(cc, 1e-12) guard scores it 0 in all
    three engines."""
    from pyspark.sql import functions as F

    from libswish3_spark.functions import similarity as S

    centroids = [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    probes = S.ivf_query_probes([0.5, 0.5, 0.0], centroids, nprobe=2)
    assert set(probes) == {2, 3}  # the zero centroid never wins a probe
    df = spark.createDataFrame(
        [(1, [0.9, 0.1, 0.0]), (2, [0.0, 0.9, 0.1])],
        "vec_id long, embedding array<double>",
    )
    cells = {
        r["vec_id"]: r["c"]
        for r in df.select(
            "vec_id",
            F.expr(S.ivf_cell_sql("embedding", centroids)).cast("int").alias("c"),
        ).collect()
    }
    assert cells == {1: 2, 2: 3}  # nonzero centroids win; no NaN routing
    # the Arrow-batched assigner applies the IDENTICAL clamp (greatest
    # inside the sqrt) — degenerate centroids route the same way
    vec = {
        r["vec_id"]: r["ivf_cell"]
        for r in S.assign_cells_vectorized(df, centroids).collect()
    }
    assert vec == cells


def test_semantic_dedup_drops_planted_twin_keeps_rest(spark):
    """SemDeDup over stored cells: a near-identical copy of a corpus
    vector (same cell by construction) must be dropped with its
    original as the dominator; vectors with no near-twin are all kept.
    First-wins determinism: the SMALLER id survives."""
    import random

    from libswish3_spark.operators.signatures import (
        build_embedding_signature_index,
    )

    rng = random.Random(11)
    base = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(60)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # plant id=100 as a tiny perturbation of id=5 (cosine ~ 1.0)
    rows.append((100, [float(x + rng.uniform(-1e-4, 1e-4)) for x in base[5]]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = S.ivf_centroids(emb, "vec_id", "embedding", 4)
    idx = build_embedding_signature_index(emb, dims=16, centroids=cents).cache()
    verdicts = {
        r["vec_id"]: r
        for r in S.semantic_dedup_cells(idx, min_score_bp=9900).collect()
    }
    assert len(verdicts) == 61  # every vector gets exactly one verdict
    v100 = verdicts[100]
    assert not v100["kept"] and v100["n_dom"] == 1 and v100["max_bp"] >= 9900
    v5 = verdicts[5]
    assert v5["kept"] and v5["n_dom"] == 0 and v5["max_bp"] == -1
    # at tau=0.99 nothing else in a random 16-dim corpus collides
    assert sum(0 if r["kept"] else 1 for r in verdicts.values()) == 1
    # cells recorded and real (more than one in use)
    assert len({r["cell"] for r in verdicts.values()}) > 1


def test_assign_cells_vectorized_matches_literal_sql_path(spark):
    """The Arrow-batched cell assigner (the large-k scale path) must
    route every vector to the SAME cell as the unrolled ivf_cell_sql
    expression the oracles replay — same normalization, same 1-based
    first-max-wins tie rule."""
    import random

    rng = random.Random(23)
    rows = [
        (i, [float(rng.uniform(-1, 1)) for _ in range(16)]) for i in range(300)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = S.ivf_centroids(emb, "vec_id", "embedding", 12)
    lit = {
        r["vec_id"]: r["c"]
        for r in emb.select(
            "vec_id",
            F.expr(S.ivf_cell_sql("embedding", cents)).cast("int").alias("c"),
        ).collect()
    }
    vec = {
        r["vec_id"]: r["ivf_cell"]
        for r in S.assign_cells_vectorized(emb, cents).collect()
    }
    assert lit == vec


def test_hashed_embedding_semantic_dedup_composes(spark):
    """The text→vector bridge also feeds SemDeDup: hashed-TF vectors of
    an exact content dup must collapse (same cell, cosine 10000,
    smaller id keeps); an unrelated document survives untouched."""
    from libswish3_spark.functions.text import tokens

    base = ("the training corpus contains many documents and this one "
            "talks about feature hashing tricks for vectors at scale " * 3)
    other = ("completely different topic entirely unrelated words "
             "about cooking pasta recipes and olive oil " * 3)
    df = spark.createDataFrame(
        [("a", base), ("b", base), ("c", other)], ["doc_id", "text"]
    )
    emb = df.select(
        "doc_id",
        S.hashed_tf_embedding(tokens(F.col("text"))).alias("embedding"),
    ).cache()
    cents = S.ivf_centroids(emb, "doc_id", "embedding", 2)
    assigned = S.assign_cells_vectorized(emb, cents)
    verdicts = {
        r["vec_id"]: r
        for r in S.semantic_dedup_cells(
            assigned, id_col="doc_id", min_score_bp=9900
        ).collect()
    }
    assert verdicts["a"]["kept"] and verdicts["c"]["kept"]
    vb = verdicts["b"]
    assert not vb["kept"] and vb["n_dom"] == 1 and vb["max_bp"] == 10000


def test_zero_vector_never_dominates_or_pairs(spark):
    """NaN guard: a zero (failed/padded-encode) vector must score
    cosine 0 against everything — Spark orders NaN above every number,
    so an unguarded 0/0 would pass every `bp >= τ` gate and dominate
    its whole cell. Pinned: the zero vector neither pairs, dominates,
    nor is dominated."""
    rows = [
        (1, [1.0] * 8),
        (2, [1.0] * 8),          # exact dup of 1 → dominated by 1
        (3, [0.0] * 8),          # zero vector: cosine must be 0, not NaN
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    one_cell = emb.select("vec_id", "embedding", F.lit(1).alias("ivf_cell"))
    verdicts = {
        r["vec_id"]: r
        for r in S.semantic_dedup_cells(one_cell, min_score_bp=9900).collect()
    }
    assert verdicts[3]["kept"] and verdicts[3]["max_bp"] == -1
    assert verdicts[1]["kept"]
    assert not verdicts[2]["kept"] and verdicts[2]["n_dom"] == 1
    # brute-force scoring: zero vector scores 0 everywhere, never NaN
    scored = {
        r["vec_id"]: r["score_bp"]
        for r in S.brute_force_topk(emb, "vec_id", "embedding", [1.0] * 8, k=3).collect()
    }
    assert scored[3] == 0


def test_vectorized_index_build_matches_expression_build(spark):
    """The Arrow-batched ingest kernel must produce the SAME stored
    index as the pure-expression form the oracles mirror — every sig
    int and every cell, over the real bench embeddings (both SFs'
    worth of value patterns ride on sf0.001 here)."""
    from libswish3_spark.operators.signatures import (
        build_embedding_signature_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = build_embedding_signature_index(emb, vectorized=False).collect()
    b = build_embedding_signature_index(emb, vectorized=True).collect()
    key = lambda rows: {
        r["vec_id"]: (r["sig0"], r["sig1"], r["sig2"], r["sig3"], r["ivf_cell"])
        for r in rows
    }
    assert key(a) == key(b)


def test_vectorized_minhash_index_matches_expression_build(spark):
    """The Arrow-batched minhash ingest kernel must emit the EXACT
    (id, bucket) multiset of the expression chain the oracles mirror —
    over the real bench corpus plus edge docs (empty, null, < 3
    tokens, unicode, apostrophes/underscores)."""
    from libswish3_spark.operators.signatures import (
        build_minhash_bucket_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    edge = spark.createDataFrame(
        [
            ("e1", ""),
            ("e2", None),
            ("e3", "two tokens"),
            ("e4", "don't under_score MIXED Case tokens here"),
            ("e5", "héllo wörld ünïcode stripped down to ascii runs only"),
            ("e6", "a b c a b c a b c repeated shingles collapse"),
        ],
        "doc_id string, text string",
    )
    both = docs.unionByName(edge)
    expr = sorted(
        (r["id"], r["bucket"])
        for r in build_minhash_bucket_index(both, vectorized=False).collect()
    )
    vec = sorted(
        (r["id"], r["bucket"])
        for r in build_minhash_bucket_index(both, vectorized=True).collect()
    )
    assert expr == vec and len(vec) > 0


def test_vectorized_shingles_match_expression_form(spark):
    """shingle_arrays_vectorized must emit element-identical (ordered,
    first-occurrence-distinct) shingle arrays to shingles(tokens(col))
    over the bench corpus + edge docs — jaccard_verify's two forms then
    agree on every pair by construction."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    edge = spark.createDataFrame(
        [
            ("e1", ""),
            ("e2", None),
            ("e3", "just two"),
            ("e4", "a b c a b c duplicated grams collapse to firsts"),
            ("e5", "CASE and don't under_score mix"),
        ],
        "doc_id string, text string",
    )
    both = docs.unionByName(edge)
    from libswish3_spark.functions.dedup import (
        shingle_arrays_vectorized,
        shingles,
    )
    from libswish3_spark.functions.text import tokens

    expr = {
        r["id"]: list(r["sh"])
        for r in both.select(
            F.col("doc_id").alias("id"),
            shingles(tokens(F.col("text"))).alias("sh"),
        ).collect()
    }
    vec = {
        r["id"]: list(r["sh"])
        for r in shingle_arrays_vectorized(both, "doc_id", "text").collect()
    }
    assert expr == vec
