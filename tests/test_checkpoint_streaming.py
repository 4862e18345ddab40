"""Checkpoint resume (batch manifest) + Structured Streaming tests."""

import os

import pytest
from pyspark.sql import functions as F

from libswish3_spark.pipeline import DOCS_FULL_SCHEMA
from libswish3_spark.plans import checkpoint as cp
from libswish3_spark.sources import fixtures as fx
from libswish3_spark.streaming import start_extraction_stream

pytestmark = pytest.mark.skipif(
    not fx.reference_available(), reason="reference corpus not present"
)


def _docs(spark):
    return spark.createDataFrame(fx.load_fixture_rows(), schema=DOCS_FULL_SCHEMA)


def test_checkpoint_resume(spark, tmp_path):
    out = str(tmp_path / "extracted")
    docs = _docs(spark)
    n_total = docs.count()

    # first pass: process only 3 of 8 buckets, as if the run died
    r1 = cp.run_extraction(
        spark, docs, out, num_buckets=8, buckets_per_pass=3, max_passes=1
    )
    assert len(r1["processed"]) == 3 and r1["skipped"] == []

    # resume: remaining buckets only
    r2 = cp.run_extraction(spark, docs, out, num_buckets=8)
    assert sorted(r2["skipped"]) == sorted(r1["processed"])
    assert len(r2["processed"]) == 5

    # a third run is a no-op
    r3 = cp.run_extraction(spark, docs, out, num_buckets=8)
    assert r3["processed"] == []

    result = cp.read_extracted(spark, out)
    assert result.count() == n_total
    assert result.select("doc_id").distinct().count() == n_total

    manifest = cp.read_manifest(spark, out)
    m = manifest.agg(F.sum("docs"), F.sum("words")).collect()[0]
    assert m[0] == n_total
    assert m[1] == result.agg(F.sum("nwords")).collect()[0][0]


def test_resume_with_different_bucket_count_croaks(spark, tmp_path):
    """bucket = pmod(hash(doc_id), B): a resume under a different B
    re-hashes every doc into a different bucket, so the manifest's
    done-set silently skips/doubles docs. The manifest records B and
    run_extraction refuses a mismatched resume."""
    out = str(tmp_path / "xbc")
    docs = _docs(spark).limit(6)
    cp.run_extraction(
        spark, docs, out, num_buckets=8, buckets_per_pass=3, max_passes=1
    )
    with pytest.raises(ValueError, match="num_buckets"):
        cp.run_extraction(spark, docs, out, num_buckets=16)
    # the matching count still resumes fine
    r = cp.run_extraction(spark, docs, out, num_buckets=8)
    assert cp.read_extracted(spark, out).count() == 6
    assert len(r["skipped"]) == 3


def test_rerun_bucket_is_idempotent(spark, tmp_path):
    out = str(tmp_path / "x2")
    docs = _docs(spark).limit(6)
    cp.run_extraction(spark, docs, out, num_buckets=2)
    before = cp.read_extracted(spark, out).count()
    # simulate a manifest loss for bucket 0 → reprocess overwrites, not dups
    import shutil

    man = os.path.join(out, "_manifest")
    spark.read.parquet(man).where("bucket != 0").write.mode("overwrite").parquet(
        man + "_new"
    )
    shutil.rmtree(man)
    shutil.move(man + "_new", man)
    cp.run_extraction(spark, docs, out, num_buckets=2)
    assert cp.read_extracted(spark, out).count() == before


def test_streaming_extraction_and_restart(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = _docs(spark)
    first, second = docs.limit(10), docs.subtract(docs.limit(10))

    first.write.mode("append").parquet(src)
    q = start_extraction_stream(spark, src, out, ckpt)
    q.awaitTermination(120)
    got1 = spark.read.parquet(out).count()
    assert got1 == 10

    # new files arrive; a restarted stream picks up ONLY the new ones
    second.write.mode("append").parquet(src)
    q = start_extraction_stream(spark, src, out, ckpt)
    q.awaitTermination(120)
    result = spark.read.parquet(out)
    assert result.count() == docs.count()
    # goldens hold through the streaming path
    got = {r["doc_id"]: r["nwords"] for r in result.collect()}
    for name, exp in fx.GOLDEN_NWORDS.items():
        if exp is not None and name != "xinclude.xml":  # no include map in stream
            assert got[f"test_docs/{name}"] == exp, name


def test_submit_extract_cli_batch(spark, tmp_path):
    """The spark-submit entrypoint end-to-end in batch mode: extract,
    bucket-manifest resume bookkeeping, lineage metrics, postings."""
    import submit_extract

    src = str(tmp_path / "docs_in")
    out = str(tmp_path / "extracted_out")
    postings = str(tmp_path / "postings_out")
    _docs(spark).write.mode("overwrite").parquet(src)

    mh_index = str(tmp_path / "minhash_idx")
    rc = submit_extract.main(
        [
            "--input", src,
            "--output", out,
            "--buckets", "4",
            "--postings", postings,
            "--minhash-index", mh_index,
            "--run-id", "t1",
        ]
    )
    assert rc == 0
    from libswish3_spark.plans import checkpoint as cp

    n = _docs(spark).count()
    assert cp.read_extracted(spark, out).count() == n
    manifest = cp.read_manifest(spark, out)
    assert manifest.select("bucket").distinct().count() == 4
    metrics = spark.read.parquet(os.path.join(out, "_metrics"))
    assert metrics.agg(F.sum("docs")).collect()[0][0] == n
    assert spark.read.parquet(postings).count() > 0
    # ingest-side signature index: (id, bucket) rows, bands per doc
    idx = spark.read.parquet(mh_index)
    assert set(idx.columns) == {"id", "bucket"}
    assert idx.count() > 0
    # second invocation resumes to a no-op (idempotent)
    rc2 = submit_extract.main(
        ["--input", src, "--output", out, "--buckets", "4", "--run-id", "t2"]
    )
    assert rc2 == 0
    assert cp.read_extracted(spark, out).count() == n


def test_buckets_per_pass_processes_all_chunks(spark, tmp_path):
    """buckets_per_pass bounds the crash-loss unit but must run ALL
    chunks in one call (an earlier form silently stopped after the
    first chunk, leaving the rest of the corpus unprocessed)."""
    out = str(tmp_path / "allchunks")
    docs = _docs(spark)
    r = cp.run_extraction(spark, docs, out, num_buckets=8, buckets_per_pass=3)
    assert len(r["processed"]) == 8
    assert cp.read_extracted(spark, out).count() == docs.count()
