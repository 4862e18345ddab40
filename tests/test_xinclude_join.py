"""Distributed XInclude resolution (operators/xinclude.py)."""

import pytest
from pyspark.sql import functions as F

from libswish3_spark.operators.xinclude import (
    doc_hrefs,
    extract_with_xinclude,
    with_includes,
)
from libswish3_spark.pipeline import DOCS_FULL_SCHEMA
from libswish3_spark.sources import fixtures as fx

pytestmark = pytest.mark.skipif(
    not fx.reference_available(), reason="reference corpus not present"
)


def test_href_scan_and_resolution(spark):
    docs = spark.createDataFrame(fx.load_fixture_rows(), schema=DOCS_FULL_SCHEMA)
    pairs = {(r["doc_id"], r["target"]) for r in doc_hrefs(docs).collect()}
    assert ("test_docs/xinclude.xml", "test_docs/included.xml") in pairs
    assert ("test_docs/xinclude.xml", "/tmp/nosuchfile.xml") in pairs
    assert ("test_docs/xinclude.xml", "test_docs/include-recursive.xml") in pairs
    assert ("test_docs/include-recursive.xml", "test_docs/included.xml") in pairs


def test_transitive_closure_in_map(spark):
    docs = spark.createDataFrame(fx.load_fixture_rows(), schema=DOCS_FULL_SCHEMA)
    row = (
        with_includes(docs)
        .where(F.col("doc_id") == "test_docs/xinclude.xml")
        .collect()[0]
    )
    keys = set(row["includes"].keys())
    # direct targets present in the corpus + the recursive one's target
    assert "test_docs/included.xml" in keys
    assert "test_docs/include-recursive.xml" in keys
    assert "test_docs/foo.txt" in keys
    # the missing absolute file has no row to join — absent, parse skips it
    assert "/tmp/nosuchfile.xml" not in keys


def test_extract_with_xinclude_matches_golden(spark):
    docs = spark.createDataFrame(fx.load_fixture_rows(), schema=DOCS_FULL_SCHEMA)
    out = extract_with_xinclude(docs)
    got = {r["doc_id"]: r["nwords"] for r in out.collect()}
    # the join-based resolution reproduces every golden, including the
    # xinclude doc that previously needed a driver-side map
    for name, exp in fx.GOLDEN_NWORDS.items():
        if exp is not None:
            assert got[f"test_docs/{name}"] == exp, name
