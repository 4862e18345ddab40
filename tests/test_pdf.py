"""PDF text extraction (functions/pdf.py) + its opt-in ingest wiring.

The reference has no PDF parser (application/pdf → default HTML,
config.c:350); these tests pin (a) that the DEFAULT dispatch parity is
unchanged, and (b) the opt-in ``parsers={"application/pdf": "PDF"}``
path recovers text from synthesized PDFs — uncompressed and
FlateDecode content streams, literal/hex/UTF-16BE strings, TJ arrays,
escape sequences, and the Td/TD/T*/ET line structure.
"""

from __future__ import annotations

import zlib

import pytest

from libswish3_spark.config import default_config
from libswish3_spark.functions.pdf import pdf_text
from libswish3_spark.sources.files import ingest_bytes


def make_pdf(content: bytes, flate: bool = False, filt: bytes | None = None) -> bytes:
    """Minimal single-content-stream PDF."""
    if flate:
        body = zlib.compress(content)
        params = b"/Length %d /Filter /FlateDecode" % len(body)
    elif filt:
        body = content
        params = b"/Length %d /Filter /%s" % (len(body), filt)
    else:
        body = content
        params = b"/Length %d" % len(body)
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< " + params + b" >>\nstream\n" + body + b"\nendstream\nendobj\n"
        b"%%EOF\n"
    )


def test_simple_tj():
    pdf = make_pdf(b"BT /F1 12 Tf (Hello World) Tj ET")
    text, read, skipped = pdf_text(pdf)
    assert text == "Hello World"
    assert (read, skipped) == (1, 0)


def test_flate_stream():
    pdf = make_pdf(b"BT (compressed text) Tj ET", flate=True)
    text, read, skipped = pdf_text(pdf)
    assert text == "compressed text"
    assert skipped == 0


def test_tj_array_concatenates_and_ignores_kerning():
    pdf = make_pdf(b"BT [(Hel) -120 (lo) 5 ( wor) (ld)] TJ ET")
    assert pdf_text(pdf)[0] == "Hello world"


def test_line_structure_td_tstar_quote():
    content = (
        b"BT (line one) Tj 0 -14 Td (line two) Tj T* (line three) Tj "
        b"(line four)' ET"
    )
    assert pdf_text(make_pdf(content))[0] == (
        "line one\nline two\nline three\nline four"
    )


def test_literal_escapes_and_nested_parens():
    # \050 = '(', \051 = ')'; nested balanced parens are legal unescaped
    content = rb"BT (a\(b\)c \050d\051 (nested) \\ \n) Tj ET"
    text = pdf_text(make_pdf(content))[0]
    assert "a(b)c (d) (nested)" in text
    assert "\\" in text


def test_hex_and_utf16be_strings():
    # hex: "Hi" = 4869; UTF-16BE with BOM: feff 0041 = "A"
    content = b"BT <4869> Tj ET BT (\xfe\xff\x00\x41) Tj ET"
    pdf = make_pdf(content)
    assert pdf_text(pdf)[0] == "Hi\nA"


def test_unsupported_filter_counted_not_silent():
    pdf = make_pdf(b"BT (img) Tj ET", filt=b"DCTDecode")
    text, read, skipped = pdf_text(pdf)
    assert text == ""
    assert skipped == 1


def test_non_pdf_bytes_yield_nothing():
    assert pdf_text(b"<html>not a pdf</html>") == ("", 0, 0)


def test_corrupt_flate_skipped():
    body = b"garbage-not-zlib"
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(body)).encode()
        + b" /Filter /FlateDecode >>\nstream\n"
        + body
        + b"\nendstream\nendobj\n"
    )
    text, read, skipped = pdf_text(pdf)
    assert text == "" and skipped == 1


def test_default_dispatch_parity_unchanged():
    """Reference parity: application/pdf has NO parser entry, so the
    default HTML parser applies (config.c:350, libswish3.h:69)."""
    row = ingest_bytes(make_pdf(b"BT (x) Tj ET"), "doc.pdf", default_config())
    assert row["mime"] == "application/pdf"
    assert row["parser"] == "HTML"


def test_opt_in_ingest_extracts_pdf_text():
    cfg = default_config()
    cfg = cfg.with_overrides(
        parsers={**cfg.parsers, "application/pdf": "PDF"}
    )
    pdf = make_pdf(b"BT (quarterly report summary) Tj ET", flate=True)
    row = ingest_bytes(pdf, "reports/q3.pdf", cfg)
    assert row["parser"] == "PDF"
    assert row["spans"][0]["text"] == "quarterly report summary"
    assert row["error"] is None


def test_opt_in_unsupported_pdf_yields_error_row():
    cfg = default_config()
    cfg = cfg.with_overrides(
        parsers={**cfg.parsers, "application/pdf": "PDF"}
    )
    pdf = make_pdf(b"BT (x) Tj ET", filt=b"LZWDecode")
    row = ingest_bytes(pdf, "enc.pdf", cfg)
    assert row["spans"][0]["text"] == ""
    assert "unsupported" in (row["error"] or "")


def test_pdf_not_nul_scrubbed():
    """Binary PDF bytes must reach the extractor unscrubbed: a NUL
    inside the Flate stream is data, not a scrub target."""
    content = b"BT (\xfe\xff\x00\x41\x00\x42) Tj ET"  # UTF-16BE "AB" has NULs
    pdf = make_pdf(content, flate=True)
    assert b"\x00" in pdf or True  # compressed bytes may or may not have NULs
    cfg = default_config()
    cfg = cfg.with_overrides(parsers={**cfg.parsers, "application/pdf": "PDF"})
    row = ingest_bytes(pdf, "a.pdf", cfg)
    assert row["spans"][0]["text"] == "AB"


def test_extract_end_to_end(spark):
    """PDF rows flow through the normal extraction kernel with TXT
    semantics: swishdefault text, title-from-path, word counts."""
    from libswish3_spark.pipeline import extract

    cfg = default_config()
    cfg = cfg.with_overrides(parsers={**cfg.parsers, "application/pdf": "PDF"})
    rows = [
        ingest_bytes(
            make_pdf(b"BT (alpha beta gamma) Tj ET", flate=True),
            "docs/report.pdf",
            cfg,
        ),
        ingest_bytes(make_pdf(b"BT (delta) Tj ET"), "docs/two.pdf", cfg),
    ]
    from libswish3_spark.pipeline import DOCS_FULL_SCHEMA

    df = spark.createDataFrame(rows, schema=DOCS_FULL_SCHEMA)
    out = {r["doc_id"]: r for r in extract(df, config=cfg).collect()}
    r = out["docs/report.pdf"]
    assert r["error"] is None
    assert "alpha beta gamma" in r["metanames"]["swishdefault"]
    # title-from-path (TXT semantics): path tokens counted + title meta
    assert "report.pdf" in r["metanames"]["swishtitle"]
    # 3 content words + path words (docs, report, pdf)
    assert r["nwords"] == 6
    assert out["docs/two.pdf"]["nwords"] == 1 + 3
