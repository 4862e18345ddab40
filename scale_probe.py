#!/usr/bin/env python
"""Reproducible scale probes behind the SURVEY.md numbers.

Exercises the 100 TB-shaped paths at ~1 M-row scale on one box and
prints one JSON line per probe:

* ``dedup``  — minhash index build over the ×REPLICATE bench corpus
  (256-clone families), star-edge candidates vs (optionally) all-pairs,
  jaccard verify, connected components, apply. Clone families are the
  adversarial case: genuine near-dups BELOW the hot-bucket cap, where
  all-pairs volume is C(n,2) per bucket.
* ``ann``    — embedding signature index (LSH tables + IVF cell,
  partitioned by cell) over ×REPLICATE perturbed vectors; query-time
  brute force vs stored-LSH vs IVF with recall@10.
* ``stream`` — Structured Streaming ingest over the same corpus
  (file source, availableNow): (a) stream → extraction kernel → noop
  sink, the stateless narrow path; (b) stream → stateful exact-dedup
  (applyInPandasWithState over ~1.28 M fingerprints) → noop sink;
  (c) the same dedup via streaming dropDuplicates (JVM state store).
  Reports docs/sec for each, comparable to the batch scaling numbers.
* ``media`` — multimodal decode throughput at media-sized blobs
  (8 KB WAVs, 16-frame video streams): materialize to parquet, then
  time the decode scan alone (docs/sec and MB/sec).

Usage: python scale_probe.py [dedup|ann|stream|media|all] (default: all)
The document corpus is materialized by bench.prepare_corpus (shared
with bench.py, cached in /tmp).
"""

from __future__ import annotations

import json
import sys
import time

import bench
from bench import REPLICATE, SF_DIR, make_spark


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return round(time.perf_counter() - t0, 1), out


def probe_dedup(
    spark, corpus_path: str, n_docs: int, include_all_pairs: bool = False
) -> dict:
    from pyspark.sql import functions as F

    from libswish3_spark.functions import dedup as D
    from libswish3_spark.operators.signatures import build_minhash_bucket_index

    docs = spark.read.parquet(corpus_path).select(
        "doc_id", F.element_at("spans", 1)["text"].alias("text")
    )
    idx_path = "/tmp/scale_probe_idx"
    t_build, _ = _timed(
        lambda: build_minhash_bucket_index(docs, "doc_id", "text")
        .write.mode("overwrite")
        .parquet(idx_path)
    )
    idx = spark.read.parquet(idx_path)
    out = {"probe": "dedup", "n_docs": n_docs, "index_build_sec": t_build}
    if include_all_pairs:  # ~4 min: the quadratic baseline, measured once
        t_all, n_all = _timed(
            lambda: D.candidate_pairs_from_buckets(idx, max_bucket=1000).count()
        )
        out.update({"all_pairs": n_all, "all_pairs_sec": t_all})
    cand = D.candidate_pairs_from_buckets(idx, max_bucket=1000, pairs="star")
    t_cand, n_star = _timed(cand.count)
    ver = D.jaccard_verify(docs, cand, "doc_id", "text", threshold=0.5)
    t_verify, n_ver = _timed(ver.count)
    # resolve_clusters works EAGERLY at construction (per-round
    # localCheckpoints) — the timer must wrap the construction, not
    # just the final count, or the CC cost is attributed nowhere
    def _resolve():
        c = D.resolve_clusters(ver)
        return c, c.count()

    t_resolve, (clusters, n_clusters) = _timed(_resolve)
    losers = clusters.where(F.col("doc_id") != F.col("keeper")).select("doc_id")
    t_apply, survivors = _timed(
        lambda: docs.join(losers, "doc_id", "left_anti").count()
    )
    out.update(
        {
            "star_pairs": n_star,
            "star_pairs_sec": t_cand,
            "verified_pairs": n_ver,
            "verify_sec": t_verify,
            "cluster_rows": n_clusters,
            "resolve_sec": t_resolve,
            "survivors": survivors,
            "apply_sec": t_apply,
        }
    )
    return out


def probe_ann(spark) -> dict:
    from pyspark.sql import functions as F

    from libswish3_spark.functions import similarity as S
    from libswish3_spark.operators.signatures import build_embedding_signature_index

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    reps = spark.range(REPLICATE).select(F.col("id").alias("rep"))
    # distinct replicas: perturb component 1 per replica
    big = (
        emb.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") * REPLICATE + F.col("rep")).alias("vec_id"),
            F.concat(
                F.array(
                    (
                        F.element_at("embedding", 1)
                        + F.col("rep").cast("float") / 100000
                    ).cast("float")
                ),
                F.slice("embedding", 2, 63),
            ).alias("embedding"),
        )
        .repartition(128)
    )
    n = big.count()
    idx_path = "/tmp/scale_emb_idx"
    t_build, _ = _timed(
        lambda: build_embedding_signature_index(big)
        .write.mode("overwrite")
        .partitionBy("ivf_cell")
        .parquet(idx_path)
    )
    sigs = spark.read.parquet(idx_path)
    qv = [float(x) for x in emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]]
    t_bf, bf = _timed(
        lambda: S.brute_force_topk(big, "vec_id", "embedding", qv).collect()
    )
    exact = {r["vec_id"] for r in bf}
    t_lsh, st = _timed(
        lambda: S.ann_topk_from_signatures(sigs, "vec_id", "embedding", qv).collect()
    )
    cent = S.ivf_centroids(big, "vec_id", "embedding")
    t_ivf, iv = _timed(
        lambda: S.ann_ivf_topk(sigs, "vec_id", "embedding", qv, cent).collect()
    )
    # SemDeDup at probe scale: k ∝ n cells (the paper's sizing — the
    # registry's 16-cell literal path would put ~8k vectors per cell
    # and square it), Arrow-batched cell assignment (the literal SQL
    # expression tree can't hold thousands of centroid branches), then
    # the within-cell domination join. The ×REPLICATE corpus has real
    # semantic families (per-base perturbed replicas, cosine ≈ 1.0):
    # at τ=0.99 each family must collapse to its min-id keeper.
    sub = big.where(F.col("vec_id") % 4 == 0).repartition(64).cache()
    n_sub = sub.count()
    n_cells = max(16, n_sub // 128)
    sd_cent = S.ivf_centroids(sub, "vec_id", "embedding", n_cells)
    t_sem, sem = _timed(
        lambda: S.semantic_dedup_cells(
            S.assign_cells_vectorized(sub, sd_cent), min_score_bp=9900
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("kept").cast("long")).alias("kept"),
        )
        .collect()[0]
    )
    sub.unpersist()
    return {
        "probe": "ann",
        "n_vectors": n,
        "index_build_sec": t_build,
        "brute_force_sec": t_bf,
        "stored_lsh_sec": t_lsh,
        "stored_lsh_recall10": len(exact & {r["vec_id"] for r in st}) / 10,
        "ivf_sec": t_ivf,
        "ivf_recall10": len(exact & {r["vec_id"] for r in iv}) / 10,
        "semdedup_n_vectors": n_sub,
        "semdedup_cells": n_cells,
        "semdedup_sec": t_sem,
        "semdedup_kept": int(sem["kept"]),
    }


def probe_stream(spark, corpus_path: str, n_docs: int) -> dict:
    """Streaming ingest throughput over the materialized corpus.

    ``availableNow`` drains the whole corpus through micro-batches —
    the replay/backfill mode a 10^12-doc deployment uses to catch up —
    so wall-clock over n_docs is a fair streaming-docs/sec figure.
    The extract leg is stateless (narrow mapInArrow under the
    micro-batch planner); the dedup leg pays the state store: one
    keeper row per unique fingerprint, hash-partitioned across the
    shuffle partitions, all first-seen (worst case: state only grows).
    """
    import shutil
    import tempfile

    from libswish3_spark.pipeline import extract
    from libswish3_spark.streaming.dedup import dedup_stream

    schema = spark.read.parquet(corpus_path).schema
    out: dict = {"probe": "stream", "n_docs": n_docs}
    work = tempfile.mkdtemp(prefix="stream_probe_")
    try:
        from libswish3_spark.streaming.dedup import _span_fingerprint_cols

        def jvm_dedup(s):
            # the JVM-side alternative when first-arrival-wins suffices:
            # streaming dropDuplicates keeps its seen-set in the state
            # store with NO Python group invocations — the scale path
            # for pure exact dedup; dedup_stream's applyInPandasWithState
            # earns its per-group pandas overhead only when the keeper
            # needs arg-min (seq, doc_id) semantics within a batch
            return s.select("doc_id", *_span_fingerprint_cols()).dropDuplicates(
                ["fp"]
            )

        for leg, build, mode in (
            ("extract", lambda s: extract(s), "append"),
            # applyInPandasWithState runs in update mode; the sink must say so
            ("dedup", lambda s: dedup_stream(s), "update"),
            ("dedup_jvm", jvm_dedup, "append"),
        ):
            src = (
                spark.readStream.schema(schema)
                # bound each micro-batch: one giant batch would be the
                # batch path in disguise; 32 files ≈ 8 batches over the
                # 256-file corpus, enough to pay real batch planning
                .option("maxFilesPerTrigger", "32")
                .parquet(corpus_path)
            )
            q = (
                build(src)
                .writeStream.format("noop")
                .outputMode(mode)
                .option("checkpointLocation", f"{work}/{leg}_ckpt")
                .trigger(availableNow=True)
                .start()
            )
            t0 = time.perf_counter()
            q.awaitTermination()
            dt = time.perf_counter() - t0
            n_batches = len(q.recentProgress)
            out[f"{leg}_sec"] = round(dt, 1)
            out[f"{leg}_docs_per_sec"] = round(n_docs / dt, 1)
            out[f"{leg}_batches"] = n_batches
            # per-leg progress line: a failure in a later leg must not
            # discard an earlier leg's measurement
            print(json.dumps({k: v for k, v in out.items() if leg in str(k) or k in ("probe", "n_docs")}), file=sys.stderr)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


def probe_media(spark, n_docs: int = 256_000) -> dict:
    """Multimodal decode throughput at realistic blob sizes.

    The oracle-covered synthesizers emit ~100-byte blobs (closed-form
    checkable, decode cost ≈ 0); this probe materializes media-SIZED
    blobs — 1-second 8 kHz WAVs (~8 KB) and 16-frame 16×16 RGB video
    streams (~12 KB) — to parquet first, then times ONLY the decode
    scan (read → mapInPandas real_decode → aggregate), the shape a
    100 TB media column actually runs: binary column in, feature
    vector out, no shuffle, cost linear in bytes. Frame-sampling is
    the measured scale lever: stride 2 halves the video pixel passes.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from libswish3_spark.functions.media import (
        MEDIA_SCHEMA,
        extract_media_features,
        real_decode,
    )

    out: dict = {"probe": "media", "n_docs": n_docs}
    work = tempfile.mkdtemp(prefix="media_probe_")

    def synth_wav(batches):
        import struct

        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 8000 + did % 256
                # cheap deterministic PCM: repeat a 256-byte pattern
                pat = bytes((did * 7 + j * 13) % 256 for j in range(256))
                pcm = (pat * (n // 256 + 1))[:n]
                hdr = (
                    b"RIFF"
                    + struct.pack("<I", 36 + n)
                    + b"WAVEfmt "
                    + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
                    + b"data"
                    + struct.pack("<I", n)
                )
                rows.append((f"wav://{did}", "audio/wav", hdr + pcm, None, None, n * 1000 // 8000))
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "media_type", "content", "width", "height", "duration_ms"],
            )

    def synth_vid(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w = h = 16
                pat = bytes((did * 7 + j * 13) % 256 for j in range(256))
                frame = b"P6\n16 16\n255\n" + (pat * 3)[: w * h * 3]
                rows.append((f"vid://{did}", "video/x-raw", frame * 16, w, h, None))
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "media_type", "content", "width", "height", "duration_ms"],
            )

    try:
        ids = spark.range(n_docs).withColumnRenamed("id", "doc_id").repartition(256)
        for leg, synth in (("wav", synth_wav), ("video", synth_vid)):
            path = f"{work}/{leg}"
            t_synth, _ = _timed(
                lambda: ids.mapInPandas(synth, schema=MEDIA_SCHEMA)
                .write.mode("overwrite")
                .parquet(path)
            )
            blobs = spark.read.parquet(path)
            # blob volume measured OUTSIDE the timed decode (the decode
            # projection prunes content's length away)
            n_bytes = blobs.agg(F.sum(F.length("content"))).collect()[0][0]
            t_dec, row = _timed(
                lambda: extract_media_features(blobs, decoder=real_decode)
                .agg(
                    F.count("*").alias("n"),
                    F.sum(
                        F.when(F.col("decode_error").isNotNull(), 1).otherwise(0)
                    ).alias("errs"),
                )
                .collect()[0]
            )
            assert row["n"] == n_docs and row["errs"] == 0, (leg, dict(row.asDict()))
            out[f"{leg}_synth_sec"] = t_synth
            out[f"{leg}_decode_sec"] = t_dec
            out[f"{leg}_docs_per_sec"] = round(n_docs / t_dec, 1)
            out[f"{leg}_mb_per_sec"] = round(n_bytes / t_dec / 1e6, 1)
            print(
                json.dumps({k: v for k, v in out.items() if k.startswith(leg) or k in ("probe", "n_docs")}),
                file=sys.stderr,
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--all-pairs"]
    which = args[0] if args else "all"
    if which not in ("dedup", "ann", "stream", "media", "all") or len(args) > 1:
        sys.exit(
            f"usage: {sys.argv[0]} [dedup|ann|stream|media|all] [--all-pairs] (got {sys.argv[1:]})"
        )
    # materialize the bench corpus BEFORE creating the probe session:
    # prepare_corpus manages its own session and stops it in a finally,
    # and local-mode getOrCreate() returns whatever session is already
    # live in the JVM — calling it mid-probe stopped the probe's own
    # SparkContext out from under it
    corpus = None
    if which in ("dedup", "stream", "all"):
        corpus = bench.prepare_corpus(SF_DIR, REPLICATE)
    spark = make_spark(int(bench.CPUS))
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if which in ("dedup", "all"):
            print(
                json.dumps(
                    probe_dedup(spark, *corpus, "--all-pairs" in sys.argv)
                )
            )
        if which in ("ann", "all"):
            print(json.dumps(probe_ann(spark)))
        if which in ("stream", "all"):
            print(json.dumps(probe_stream(spark, *corpus)))
        if which in ("media", "all"):
            print(json.dumps(probe_media(spark)))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
