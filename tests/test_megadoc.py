"""Mega-document segmentation: segmented == unsegmented, exactly."""

import pytest
from pyspark.sql import functions as F

import libswish3_spark as lsw
from libswish3_spark.operators.megadoc import extract_txt_segmented, segment_text_docs
from libswish3_spark.pipeline import DOCS_SCHEMA


@pytest.fixture()
def txt_docs(spark):
    rows = [
        {"doc_id": "big.txt", "spans": [{"kind": "text", "text": " ".join(
            f"word{i} tok" for i in range(5000)), "media_ref": "", "offset": 0}]},
        {"doc_id": "small.txt", "spans": [{"kind": "text", "text": "just three words",
                                           "media_ref": "", "offset": 0}]},
        {"doc_id": "punct.txt", "spans": [{"kind": "text", "text": "don't stop!  me&now",
                                           "media_ref": "", "offset": 0}]},
    ]
    return spark.createDataFrame(rows, schema=DOCS_SCHEMA)


def _spans(df):
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["order"]) for s in r["spans"]]
        for r in df.collect()
    }


def test_segmented_equals_plain(spark, txt_docs):
    plain = _spans(lsw.extract(txt_docs.withColumn("parser", F.lit("TXT"))))
    seg = _spans(extract_txt_segmented(txt_docs, seg_chars=2048))
    assert seg == plain  # span-sequence equality incl. title tail


def test_nwords_match(spark, txt_docs):
    plain = {
        r["doc_id"]: r["nwords"]
        for r in lsw.extract(txt_docs.withColumn("parser", F.lit("TXT"))).collect()
    }
    seg = {
        r["doc_id"]: r["nwords"]
        for r in extract_txt_segmented(txt_docs, seg_chars=2048).collect()
    }
    assert seg == plain


def test_segment_counts(spark, txt_docs):
    seg = segment_text_docs(txt_docs, seg_chars=2048)
    per_doc = {
        r["k"]: r["n"]
        for r in seg.select(
            F.split_part("doc_id", F.lit("\x02"), F.lit(1)).alias("k")
        ).groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    assert per_doc["big.txt"] >= 15  # ~40KB text / 2KB segments
    assert per_doc["small.txt"] == 1


def test_segmentation_is_parallel(spark, txt_docs):
    # one doc fans out to many independent extraction units
    seg = segment_text_docs(txt_docs.where(F.col("doc_id") == "big.txt"), 2048)
    assert seg.count() >= 15
    plan = lsw.extract(seg)._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" in plan
