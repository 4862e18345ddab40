"""End-to-end Spark pipeline tests: docs DataFrame → extract() → goldens."""

import pytest
from pyspark.sql import functions as F

import libswish3_spark as lsw
from libswish3_spark.pipeline import DOCS_FULL_SCHEMA, salt_by_size
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
    assert "Exchange" not in plan  # extraction must not shuffle
    assert "MapInArrow" in plan


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
