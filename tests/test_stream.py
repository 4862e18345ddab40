"""Aggregator-stream framing (reference: src/t/001-wordcount.t:83-89)."""

import pytest

from libswish3_spark.parser import parse_document
from libswish3_spark.sources import fixtures as fx
from libswish3_spark.sources.stream import parse_framed_stream

pytestmark = pytest.mark.skipif(
    not fx.reference_available(), reason="reference corpus not present"
)


def _total_words(path):
    with open(path, "rb") as f:
        rows = parse_framed_stream(f.read())
    return rows, sum(
        parse_document(r["doc_id"], r["spans"], parser=r["parser"], error=r["error"])[
            "nwords"
        ]
        for r in rows
    )


def test_doc_xml_stream_total():
    rows, total = _total_words(fx.REFERENCE_TEST_STDIN + "/doc.xml")
    assert len(rows) == 2
    assert total == 8410  # golden: 8408 + 2 internal .txt filename words


def test_parser_type_header_overrides_extension():
    rows, total = _total_words(fx.REFERENCE_TEST_STDIN + "/test.txt")
    # .txt extension but Parser-Type: XML → parsed as XML → 1 word
    assert rows[0]["parser"] == "XML"
    assert total == 1


def test_missing_required_headers():
    with pytest.raises(ValueError):
        parse_framed_stream(b"Content-Type: text/xml\n\n<doc/>")


def test_roundtrip_framing():
    body = b"<doc>hello framed world</doc>"
    stream = (
        b"Content-Length: %d\nContent-Location: a.xml\n\n%s" % (len(body), body)
        + b"\nContent-Length: 3\nContent-Location: b.txt\n\nfoo"
    )
    rows = parse_framed_stream(stream)
    assert [r["doc_id"] for r in rows] == ["a.xml", "b.txt"]
    assert rows[0]["parser"] == "XML" and rows[1]["parser"] == "TXT"
