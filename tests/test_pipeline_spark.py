"""End-to-end Spark pipeline tests: docs DataFrame → extract() → goldens."""

import pytest
from pyspark.sql import functions as F

import libswish3_spark as lsw
from libswish3_spark.pipeline import DOCS_FULL_SCHEMA, salt_by_size, write_extracted
from libswish3_spark.sources import fixtures as fx

pytestmark = pytest.mark.skipif(
    not fx.reference_available(), reason="reference corpus not present"
)


@pytest.fixture(scope="module")
def extracted(spark):
    docs = spark.createDataFrame(fx.load_fixture_rows(), schema=DOCS_FULL_SCHEMA)
    df = lsw.extract(docs, include_map=fx.load_include_map())
    df.cache()
    yield df
    df.unpersist()


def test_all_goldens_through_spark(extracted):
    got = {r["doc_id"]: r["nwords"] for r in extracted.collect()}
    for name, exp in fx.GOLDEN_NWORDS.items():
        if exp is None:
            continue
        assert got[f"test_docs/{name}"] == exp, name


def test_invariant_nwords_equals_word_spans(extracted):
    bad = extracted.where(
        F.col("nwords")
        != F.size(F.filter("spans", lambda s: s["kind"] == F.lit("word")))
    ).count()
    assert bad == 0


def test_schema_stable(extracted):
    assert [f.name for f in extracted.schema.fields] == [
        "doc_id", "spans", "metanames", "properties", "nwords", "parser", "error",
    ]


def test_plan_is_narrow(spark):
    docs = spark.createDataFrame(fx.load_fixture_rows(), schema=DOCS_FULL_SCHEMA)
    plan = lsw.extract(docs)._jdf.queryExecution().executedPlan().toString()
    # the guarded input spread (local-relation input: no file splits)
    # may round-robin BELOW the kernel; the heavy extracted output must
    # never shuffle, and with spread=False the plan is exchange-free
    assert "Exchange" not in plan.split("MapInArrow")[0]
    assert "MapInArrow" in plan
    plan2 = (
        lsw.extract(docs, spread=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan2


def test_metrics(extracted):
    m = lsw.extraction_metrics(extracted).agg(
        F.sum("docs").alias("docs"), F.sum("words").alias("words")
    ).collect()[0]
    assert m["docs"] == extracted.count()
    total = extracted.agg(F.sum("nwords")).collect()[0][0]
    assert m["words"] == total


def test_salting_preserves_rows(spark):
    docs = spark.createDataFrame(fx.load_fixture_rows(), schema=DOCS_FULL_SCHEMA)
    salted = salt_by_size(docs.select("doc_id", "spans"), 8)
    assert salted.count() == docs.count()
    out = lsw.extract(salted)
    assert out.count() == docs.count()


def test_salt_by_size_balances_bytes_under_skew(spark):
    """1000:1 size-skewed corpus: after salt_by_size no partition may
    hold more than 2x the median partition's bytes (the top docs must
    spread — hash placement would collide them with high probability)."""
    import statistics

    rows = [(f"small{i}", [("text", "x" * 1024, "", 0)]) for i in range(1024)]
    rows += [(f"big{i}", [("text", "y" * 1_000_000, "", 0)]) for i in range(8)]
    docs = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    out = salt_by_size(docs, 8)
    per = (
        out.withColumn(
            "_b",
            F.aggregate("spans", F.lit(0), lambda a, s: a + F.length(s["text"])),
        )
        .groupBy(F.spark_partition_id().alias("p"))
        .agg(F.sum("_b").alias("bytes"))
        .collect()
    )
    vals = sorted(r["bytes"] for r in per)
    assert len(vals) == 8
    assert max(vals) / statistics.median(vals) < 2
    assert out.count() == 1032  # no rows lost


def test_reconcile_actions_latest_wins_and_delete_drops(spark):
    from libswish3_spark.pipeline import reconcile_actions
    from libswish3_spark.sources.stream import parse_framed_stream

    frames = b"".join(
        b"Content-Length: %d\nContent-Location: %s\nLast-Modified: %d\nAction: %s\n\n%s"
        % (len(body), uri, mtime, action, body)
        for uri, mtime, action, body in [
            (b"a.txt", 100, b"add", b"first version"),
            (b"a.txt", 200, b"update", b"second version"),
            (b"b.txt", 100, b"add", b"keep me"),
            (b"c.txt", 100, b"add", b"doomed"),
            (b"c.txt", 300, b"delete", b""),
        ]
    )
    rows = parse_framed_stream(frames)
    assert [r["action"] for r in rows] == ["add", "update", "add", "add", "delete"]
    assert rows[0]["mtime"] == 100
    docs = spark.createDataFrame(rows, schema=DOCS_FULL_SCHEMA)
    from libswish3_spark.pipeline import reconcile_actions  # noqa: F811

    alive = {r["doc_id"]: r for r in reconcile_actions(docs).collect()}
    assert set(alive) == {"a.txt", "b.txt"}
    assert alive["a.txt"]["spans"][0]["text"] == "second version"
    assert alive["a.txt"]["mtime"] == 200


def test_directory_ingest_populates_mtime(spark, tmp_path):
    import os

    from libswish3_spark.sources.files import read_directory

    p = tmp_path / "doc.txt"
    p.write_text("hello world")
    rows = read_directory(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    # binaryFile modificationTime → epoch seconds (docinfo.c:202-258)
    assert abs(rows[0]["mtime"] - os.stat(p).st_mtime) <= 1


def test_reconcile_equal_mtime_resolves_by_stream_seq(spark):
    from libswish3_spark.pipeline import reconcile_actions
    from libswish3_spark.sources.stream import parse_framed_stream

    # two frames for d.txt with IDENTICAL mtime: the later frame must
    # win via the seq frame index, not partition-layout luck
    frames = b"".join(
        b"Content-Length: %d\nContent-Location: %s\nLast-Modified: %d\nAction: %s\n\n%s"
        % (len(body), uri, mtime, action, body)
        for uri, mtime, action, body in [
            (b"d.txt", 100, b"add", b"v1"),
            (b"d.txt", 100, b"update", b"v2"),
        ]
    )
    rows = parse_framed_stream(frames)
    assert [r["seq"] for r in rows] == [0, 1]
    # adversarial layout: reversed arrival order across partitions
    docs = spark.createDataFrame(list(reversed(rows)), schema=DOCS_FULL_SCHEMA)
    docs = docs.repartition(4)
    alive = {r["doc_id"]: r for r in reconcile_actions(docs).collect()}
    assert alive["d.txt"]["spans"][0]["text"] == "v2"


def test_extract_kernel_handles_sliced_arrow_batches():
    """The flat child-array accessors must respect record-batch slicing
    (offsets index the unsliced child array)."""
    import pyarrow as pa

    from libswish3_spark.config import default_config
    from libswish3_spark.pipeline import extract_batch_fn

    span_t = pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )
    rows = [
        [{"kind": "text", "text": f"doc {i} words here", "media_ref": "", "offset": 0}]
        for i in range(10)
    ]
    tbl = pa.RecordBatch.from_arrays(
        [pa.array([f"d{i}.txt" for i in range(10)]), pa.array(rows, type=span_t)],
        names=["doc_id", "spans"],
    )
    fn = extract_batch_fn(default_config())
    full = next(iter(fn(iter([tbl]))))
    sliced = next(iter(fn(iter([tbl.slice(4, 3)]))))
    want = full.column("nwords").to_pylist()[4:7]
    assert sliced.column("nwords").to_pylist() == want
    assert sliced.column("doc_id").to_pylist() == ["d4.txt", "d5.txt", "d6.txt"]
    got_spans = sliced.column("spans").to_pylist()[0]
    assert [s["text"] for s in got_spans][:4] == ["doc", "4", "words", "here"]


def test_write_extracted_relative_dotted_filename_is_a_path(spark, tmp_path):
    """'out.parquet' is a file path, not an Iceberg table named
    'parquet' in schema 'out' — the table/path auto-detect must not
    route dotted relative filenames to writeTo(); catalog-qualified
    names still do. Actual writing is exercised with an absolute path
    (Spark resolves relative paths against the driver JVM cwd)."""
    from libswish3_spark.pipeline import _is_table_target

    for path in ("out.parquet", "data.json", "dump.csv", "/tmp/a.b", "dir/t.x"):
        assert not _is_table_target(path), path
    for table in ("catalog.db.events", "db.extracted", "lake.raw.docs_v2"):
        assert _is_table_target(table), table
    df = spark.range(3).select(F.col("id").alias("doc_id"))
    write_extracted(df, str(tmp_path / "out.parquet"), mode="overwrite")
    assert spark.read.parquet(str(tmp_path / "out.parquet")).count() == 3
