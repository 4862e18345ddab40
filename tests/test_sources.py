"""Source-layer tests: filelist (S5), directory scan (S2), postings (S9)."""

import pytest
from pyspark.sql import functions as F

from libswish3_spark.operators.postings import extract_index_postings
from libswish3_spark.pipeline import DOCS_FULL_SCHEMA
from libswish3_spark.sources import fixtures as fx
from libswish3_spark.sources.files import parse_filelist, read_directory, read_filelist

needs_reference = pytest.mark.skipif(
    not fx.reference_available(), reason="reference corpus not present"
)


def test_parse_filelist_skips_comments_and_blanks():
    text = "# header\n\n  /a/b.html  \n#skip\n/c/d.txt\n"
    assert parse_filelist(text) == ["/a/b.html", "/c/d.txt"]


@needs_reference
def test_read_filelist_roundtrip(spark, tmp_path):
    fl = tmp_path / "filelist"
    fl.write_text(
        "# fixture subset\n"
        f"{fx.REFERENCE_TEST_DOCS}/t.html\n"
        "\n"
        f"{fx.REFERENCE_TEST_DOCS}/words.xml\n"
    )
    docs = read_filelist(spark, str(fl))
    from libswish3_spark.pipeline import extract

    got = {r["doc_id"].split("/")[-1]: r["nwords"] for r in extract(docs).collect()}
    assert got["t.html"] == 6
    assert got["words.xml"] == 56


def test_read_directory_skips_dotfiles(spark, tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    (d / "a.html").write_text("<html><body>two words</body></html>")
    (d / ".hidden.html").write_text("<html><body>nope</body></html>")
    docs = read_directory(spark, str(d))
    rows = docs.collect()
    assert len(rows) == 1
    assert rows[0]["doc_id"].endswith("a.html")


@needs_reference
def test_postings_align_with_spans(spark):
    docs = spark.createDataFrame(
        fx.load_fixture_rows(names=["nested_meta.xml"]), schema=DOCS_FULL_SCHEMA
    )
    post = extract_index_postings(docs).collect()
    # positions unique + metaname bucketing visible in postings
    assert len({p["pos"] for p in post}) == len(post)
    metas = {p["metaname"] for p in post}
    assert "swishtitle" in metas and "swishdefault" in metas
    title_terms = sorted(p["term"] for p in post if p["metaname"] == "swishtitle")
    assert title_terms == ["here", "mytitle"]
    # context is the metastack path for nested names
    assert all("/" in p["context"] or p["context"] in ("swishdefault", "swishtitle")
               for p in post)


@needs_reference
def test_postings_count_matches_nwords(spark):
    import libswish3_spark as lsw

    docs = spark.createDataFrame(fx.load_fixture_rows(), schema=DOCS_FULL_SCHEMA)
    n_post = extract_index_postings(docs).count()
    # same parse, same corpus, no include map on either side: every word
    # span must appear as exactly one posting
    n_words = lsw.extract(docs).agg(F.sum("nwords")).collect()[0][0]
    assert n_post == n_words

def test_read_filelist_glob_chars_and_missing(spark, tmp_path):
    weird = tmp_path / "report[1].html"
    weird.write_text("<html><body>bracket file words</body></html>")
    fl = tmp_path / "fl"
    fl.write_text(f"{weird}\n{tmp_path}/gone.html\n")
    docs = read_filelist(spark, str(fl))
    rows = docs.collect()
    # literal bracket path read; missing path skipped with a warning
    assert len(rows) == 1
    assert rows[0]["doc_id"].endswith("report[1].html") or "report" in rows[0]["doc_id"]


def test_postings_resolve_parser_like_extract(spark):
    # parser column absent: postings must fall back to mime/extension
    # dispatch exactly like extract() (TXT -> title-from-path posting)
    docs = spark.createDataFrame(
        [{"doc_id": "note.txt",
          "spans": [{"kind": "text", "text": "alpha beta", "media_ref": "", "offset": 0}]}],
        schema="doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    post = extract_index_postings(docs).orderBy("pos").collect()
    assert [(p["term"], p["metaname"]) for p in post] == [
        ("alpha", "swishdefault"), ("beta", "swishdefault"),
        ("note", "swishtitle"), ("txt", "swishtitle"),
    ]


@needs_reference
def test_postings_include_map(spark):
    docs = spark.createDataFrame(
        fx.load_fixture_rows(names=["xinclude.xml"]), schema=DOCS_FULL_SCHEMA
    )
    with_inc = extract_index_postings(docs, include_map=fx.load_include_map()).count()
    without = extract_index_postings(docs).count()
    assert with_inc == 44  # the golden nwords, one posting per word
    assert without < with_inc


def test_postings_offsets_pack_like_token_buffer(spark):
    """T8: offsets replicate the shared token buffer layout —
    offset_k + len_k + 1 == offset_{k+1} in pos order
    (reference: tokenizer.c:384-386)."""
    from libswish3_spark.operators.postings import extract_index_postings

    docs = spark.createDataFrame(
        [("d1", [("text", "héllo wörld and more words", "", 0)], "TXT")],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, parser string",
    )
    rows = sorted(
        extract_index_postings(docs).collect(), key=lambda r: r["pos"]
    )
    assert rows[0]["offset"] == 0
    for a, b in zip(rows, rows[1:]):
        assert a["offset"] + a["len"] + 1 == b["offset"]
    # utf-8 byte length, not char length (é/ö are 2 bytes)
    assert rows[0]["len"] == len("héllo".encode("utf-8"))


def test_corrupt_gzip_yields_error_row_not_exception():
    """A truncated/corrupt .gz must produce an ERROR ROW (the module's
    error contract, same as undecodable bytes) — an exception out of
    the ingest kernel fails the whole Spark task, so one bad file in a
    crawl would abort the job."""
    import gzip as _gz

    from libswish3_spark.sources.files import ingest_bytes

    good = _gz.compress(b"hello words here")
    row = ingest_bytes(good[: len(good) // 2], "doc.txt.gz")  # truncated
    assert row["doc_id"] == "doc.txt.gz"
    assert row["error"] and "gzip" in row["error"]
    # misnamed: gzip magic absent but .gz name → _is_gzip may decline;
    # magic present but garbage after → must still error-row
    row2 = ingest_bytes(b"\x1f\x8b" + b"not really gzip", "x.txt.gz")
    assert row2["error"] and "gzip" in row2["error"]
    # and an intact gzip still round-trips
    row3 = ingest_bytes(good, "doc.txt.gz")
    assert row3["error"] is None and "hello" in row3["spans"][0]["text"]


def test_stream_frame_with_all_documented_headers_parses():
    """The protocol documents 7 logical headers; a fully-headed frame
    must parse (the old recognized-header cap of 6 raised and killed
    the whole stream). Unbounded garbage header sections still croak."""
    import pytest

    from libswish3_spark.sources.stream import parse_framed_stream

    body = b"some text content"
    frame = (
        b"Content-Length: " + str(len(body)).encode() + b"\n"
        b"Content-Location: full.txt\n"
        b"Content-Type: text/plain\n"
        b"Parser-Type: TXT\n"
        b"Last-Modified: 1700000000\n"
        b"Encoding: UTF-8\n"
        b"Action: update\n"
        b"\n" + body
    )
    rows = parse_framed_stream(frame)
    assert len(rows) == 1
    r = rows[0]
    assert r["doc_id"] == "full.txt" and r["action"] == "update"
    assert r["mtime"] == 1700000000
    bomb = b"".join(b"X-Junk-%d: v\n" % i for i in range(20)) + frame
    with pytest.raises(ValueError, match="too many stream headers"):
        parse_framed_stream(bomb)


def test_parse_buffer_prose_starting_with_content_dash():
    """Plain text beginning with the word 'Content-…' must ingest as a
    document (the old startswith sniff routed it to the stream parser,
    which found no headers and silently returned {})."""
    from libswish3_spark.api import Swish3

    s3 = Swish3()
    r = s3.parse_buffer(b"Content-based image retrieval systems\n\nare widely used today")
    assert r and r["nwords"] > 5


def test_parse_buffer_crlf_framed():
    """CRLF-framed buffers are frames too — the old b'\\n\\n' probe
    missed them and indexed the protocol headers as body words."""
    from libswish3_spark.api import Swish3

    s3 = Swish3()
    r = s3.parse_buffer(
        b"Content-Length: 11\r\nContent-Location: a.txt\r\n\r\nhello world"
    )
    assert r["doc_id"] == "a.txt" and r["nwords"] >= 2
    words = [s["text"] for s in r["spans"] if s["kind"] == "word"]
    assert "content" not in words  # headers are not body


def test_parse_directory_skips_unreadable(tmp_path):
    """One dangling symlink must not abort the walk — warn and continue
    like the reference walker."""
    import warnings

    from libswish3_spark.api import Swish3

    (tmp_path / "good.txt").write_text("three good words")
    (tmp_path / "dangling.txt").symlink_to(tmp_path / "missing-target")
    s3 = Swish3()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rows = s3.parse_directory(str(tmp_path))
    # one surviving row (title-from-path adds path tokens to nwords)
    assert len(rows) == 1 and rows[0]["doc_id"].endswith("good.txt")
    assert rows[0]["nwords"] >= 3
    assert any("dangling" in str(x.message) for x in w)


def test_natural_private_use_char_does_not_wound_xml():
    """ADVICE r5: U+E000 is a legal XML char; a document containing it
    must index ALL its text (the reference delivers everything — the
    char is just a token boundary), not stop at the first occurrence
    by tripping the in-band wound marker."""
    from libswish3_spark.parser import parse_document
    from libswish3_spark.sources.files import ingest_bytes

    xml = "<root>alpha \ue000 beta gamma</root>".encode("utf-8")
    row = ingest_bytes(xml, "pua.xml")
    assert row["error"] is None
    out = parse_document(
        row["doc_id"], row["spans"], parser=row["parser"]
    )
    toks = [s["text"] for s in out["spans"] if s["kind"] == "word"]
    assert toks == ["alpha", "beta", "gamma"]
    # adjacency: U+E000 is a boundary, so scrubbing must not fuse
    xml2 = "<root>a\ue000b</root>".encode("utf-8")
    row2 = ingest_bytes(xml2, "pua2.xml")
    out2 = parse_document(row2["doc_id"], row2["spans"], parser=row2["parser"])
    assert [s["text"] for s in out2["spans"] if s["kind"] == "word"] == ["a", "b"]
