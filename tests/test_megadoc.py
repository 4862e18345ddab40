"""Mega-document segmentation: segmented == unsegmented, exactly."""

import os
import subprocess

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


def _html_doc(i: int) -> str:
    return (
        f"<html><head><title>mega doc {i}</title></head><body>"
        + f"<h1>heading {i} words</h1>"
        + "".join(
            f"<p>para {j} has <b>bold</b> and text tokens here</p>"
            for j in range(14)
        )
        + "<!-- noindex --><p>ignored secret words</p><!-- index -->"
        + '<p>after ignore <img src="img://x"/> tail words</p>'
        + "<script>var x = 1;</script>"
        + "<p>final paragraph closes the document</p></body></html>"
    )


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(f"d{i}", [("text", t, "", 0)], "HTML") for i, t in enumerate(texts)],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, parser string",
    )


def test_html_segmented_matches_unsegmented(spark):
    """HTML mega-doc segmentation: word spans, positions, nwords,
    metanames and (clean-cut) properties all equal the single-pass
    extraction."""
    import libswish3_spark as lsw
    from libswish3_spark.operators.megadoc import extract_html_segmented

    texts = [_html_doc(i) for i in range(4)]
    docs = _docs_df(spark, texts)
    plain = {r["doc_id"]: r for r in lsw.extract(docs).collect()}
    seg = {
        r["doc_id"]: r
        for r in extract_html_segmented(docs, seg_chars=120).collect()
    }
    assert set(seg) == set(plain)
    for d in plain:
        p, s = plain[d], seg[d]
        assert s["nwords"] == p["nwords"], d
        assert [tuple(x) for x in s["spans"]] == [tuple(x) for x in p["spans"]], d
        assert dict(s["metanames"]) == dict(p["metanames"]), d
        assert dict(s["properties"]) == dict(p["properties"]), d


def test_html_segmentation_actually_splits(spark):
    from libswish3_spark.operators.megadoc import segment_html_docs

    docs = _docs_df(spark, [_html_doc(0)])
    n = segment_html_docs(docs, seg_chars=120).count()
    assert n >= 4  # a ~900-char body must split several times


def test_html_cut_scan_never_cuts_inside_noindex_or_rawtext():
    from libswish3_spark.operators.megadoc import _html_cut_scan

    text = _html_doc(0)
    cuts, seeds, chains = _html_cut_scan(text, 40)
    ni_start = text.index("<!-- noindex -->")
    ni_end = text.index("<!-- index -->")
    sc_start = text.index("<script>")
    sc_end = text.index("</script>")
    for c in cuts:
        assert not (ni_start < c <= ni_end)
        assert not (sc_start < c <= sc_end)
        assert text[c] == "<"
    assert all(set(ch) <= {"html", "body"} for ch in chains)


def test_html_segmented_fragment_without_body(spark):
    """Fragments (no html/body wrapper) segment at top level too."""
    import libswish3_spark as lsw
    from libswish3_spark.operators.megadoc import extract_html_segmented

    frag = "".join(f"<p>piece {j} of the fragment text</p>" for j in range(12))
    docs = _docs_df(spark, [frag])
    plain = lsw.extract(docs).collect()[0]
    seg = extract_html_segmented(docs, seg_chars=60).collect()[0]
    assert seg["nwords"] == plain["nwords"]
    assert [tuple(x) for x in seg["spans"]] == [tuple(x) for x in plain["spans"]]
    assert dict(seg["metanames"]) == dict(plain["metanames"])


def test_xml_segmented_matches_unsegmented(spark):
    """XML mega-doc segmentation parity: spans, nwords, metanames."""
    import libswish3_spark as lsw
    from libswish3_spark.operators.megadoc import extract_xml_segmented

    def xml_doc(i):
        return (
            f'<doc id="{i}">'
            + "".join(f"<item>xml item {j} words here</item>" for j in range(12))
            + "<!-- noindex --><item>hidden</item><!-- index -->"
            + "<item>last item closes</item></doc>"
        )

    docs = spark.createDataFrame(
        [(f"x{i}", [("text", xml_doc(i), "", 0)], "XML") for i in range(3)],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, parser string",
    )
    plain = {r["doc_id"]: r for r in lsw.extract(docs).collect()}
    seg = {
        r["doc_id"]: r
        for r in extract_xml_segmented(docs, seg_chars=80).collect()
    }
    for d in plain:
        p, s = plain[d], seg[d]
        assert s["nwords"] == p["nwords"], d
        assert [tuple(x) for x in s["spans"]] == [tuple(x) for x in p["spans"]], d
        assert dict(s["metanames"]) == dict(p["metanames"]), d


def test_xml_segmentation_bails_on_malformed():
    from libswish3_spark.operators.megadoc import _xml_cut_scan

    cuts, seeds, root = _xml_cut_scan("<a><b>mismatched</a></b>" * 20, 10)
    assert cuts == []  # refuse rather than risk divergence


def test_xml_segmented_replays_root_attrs(spark):
    """Root attrs must replay verbatim so xmlns/class baking matches."""
    from libswish3_spark.operators.megadoc import _xml_cut_scan

    text = '<root a="1" b="2">' + "<c>x y z w</c>" * 9 + "</root>"
    cuts, seeds, root_raw = _xml_cut_scan(text, 30)
    assert root_raw == '<root a="1" b="2">'
    assert len(cuts) >= 1
    assert seeds[0] == 1  # text precedes every cut here


def test_segmented_custom_tokenizer_positions_match(spark, txt_docs):
    # a non-default tokenizer must drive the segment offset prefix-sum
    # too, or global positions silently diverge from the actual parse
    from dataclasses import replace

    from libswish3_spark.config import default_config

    cfg = replace(default_config(), token_regex=r"[a-z]+")
    # token counts must DIFFER between tokenizers ("a7b": default 1
    # token, custom 2) or the offset prefix-sum isn't actually exercised
    rows = [
        {
            "doc_id": "digits.txt",
            "spans": [
                {
                    "kind": "text",
                    "text": " ".join(f"a{i}b word" for i in range(5000)),
                    "media_ref": "",
                    "offset": 0,
                }
            ],
        }
    ]
    docs = txt_docs.unionByName(spark.createDataFrame(rows, schema=DOCS_SCHEMA))
    plain = _spans(lsw.extract(docs.withColumn("parser", F.lit("TXT")), config=cfg))
    seg = _spans(extract_txt_segmented(docs, config=cfg, seg_chars=2048))
    assert seg == plain
    # and the custom tokenizer really was in effect (digits split out)
    words = [t for k, t, _ in plain["digits.txt"] if k == "word"]
    assert "a" in words and "b" in words and all(w.isalpha() for w in words)


def test_segmented_after_title_flush_no_phantom_gap(spark):
    # the cut lands right after </title>: the single pass flushed the
    # buffer there, so the continuation must NOT pay a pending bumper
    # (regression: seeding on "text seen ever" shifted all later
    # positions by one)
    from libswish3_spark.operators.megadoc import (
        extract_html_segmented,
        extract_xml_segmented,
    )

    xml = (
        "<doc><title>doc seven from webz</title>"
        "<body>hello world foo bar baz qux</body></doc>"
    )
    html = (
        "<html><head><title>a very long long long long title</title></head>"
        "<body><p>body words here</p><p>more body words</p></body></html>"
    )
    rows = [
        {"doc_id": "x", "spans": [{"kind": "text", "text": xml, "media_ref": "", "offset": 0}]},
    ]
    hrows = [
        {"doc_id": "h", "spans": [{"kind": "text", "text": html, "media_ref": "", "offset": 0}]},
    ]
    xdocs = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    hdocs = spark.createDataFrame(hrows, schema=DOCS_SCHEMA)
    for sc in (16, 24, 40):
        assert _spans(extract_xml_segmented(xdocs, seg_chars=sc)) == _spans(
            lsw.extract(xdocs.withColumn("parser", F.lit("XML")))
        )
    for sc in (8, 20, 60):
        assert _spans(extract_html_segmented(hdocs, seg_chars=sc)) == _spans(
            lsw.extract(hdocs.withColumn("parser", F.lit("HTML")))
        )


def test_segmented_pending_buffer_still_pays_gap(spark):
    # inverse case: root text pending at the cut (no flush between) —
    # the continuation MUST pay exactly one bumper gap
    from libswish3_spark.operators.megadoc import extract_xml_segmented

    xml = (
        "<doc>lead words before anything"
        "<a>first chunk of body</a><a>second chunk of body</a>"
        "<a>third chunk here</a></doc>"
    )
    rows = [
        {"doc_id": "y", "spans": [{"kind": "text", "text": xml, "media_ref": "", "offset": 0}]},
    ]
    docs = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    for sc in (12, 30):
        assert _spans(extract_xml_segmented(docs, seg_chars=sc)) == _spans(
            lsw.extract(docs.withColumn("parser", F.lit("XML")))
        )


def test_xml_segmented_custom_metaname_config(spark):
    # a config-defined mid-body MetaName flushes the buffer mid-document;
    # with config-derived flush tags the cut seeds must still reproduce
    # the single pass (spans, nwords, metanames) at any cut placement
    from libswish3_spark.config import load_config_xml
    from libswish3_spark.operators.megadoc import extract_xml_segmented

    cfg = load_config_xml(
        "<swish><MetaNames><chapter/></MetaNames></swish>"
    )
    xml = (
        "<doc>intro words here"
        "<chapter>first chapter body text</chapter>"
        "between chapters text"
        "<chapter>second chapter more words</chapter>"
        "trailing root words</doc>"
    )
    rows = [
        {"doc_id": "c", "spans": [{"kind": "text", "text": xml, "media_ref": "", "offset": 0}]},
    ]
    docs = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    plain = lsw.extract(docs.withColumn("parser", F.lit("XML")), config=cfg).collect()[0]
    for sc in (10, 25, 45):
        seg = extract_xml_segmented(docs, config=cfg, seg_chars=sc).collect()[0]
        assert seg["nwords"] == plain["nwords"], sc
        assert [tuple(x) for x in seg["spans"]] == [tuple(x) for x in plain["spans"]], sc
        assert dict(seg["metanames"]) == dict(plain["metanames"]), sc


def _rand_xml(rng, vocab):
    def words(k):
        return " ".join(rng.choice(vocab) for _ in range(k))

    def element(depth):
        tag = rng.choice(["a", "b", "chapter", "title", "item"])
        inner = "".join(node(depth + 1) for _ in range(rng.randint(0, 3)))
        return f"<{tag}>{inner}</{tag}>"

    def node(depth):
        if depth >= 3 or rng.random() < 0.5:
            return words(rng.randint(0, 4))
        return element(depth)

    body = "".join(node(1) for _ in range(rng.randint(2, 10)))
    if rng.random() < 0.3:
        body += "<!-- noindex -->" + words(3) + "<!-- index -->" + words(2)
    return f"<doc>{body}</doc>"


def _rand_html(rng, vocab):
    def words(k):
        return " ".join(rng.choice(vocab) for _ in range(k))

    parts = []
    if rng.random() < 0.5:
        parts.append(f"<title>{words(rng.randint(1, 5))}</title>")
    for _ in range(rng.randint(2, 8)):
        roll = rng.random()
        if roll < 0.5:
            parts.append(f"<p>{words(rng.randint(1, 8))}</p>")
        elif roll < 0.65:
            parts.append(f"<b>{words(2)}</b>{words(2)}")
        elif roll < 0.75:
            parts.append(f'<img src="img://{rng.randint(0, 9)}"/>{words(2)}')
        elif roll < 0.85:
            parts.append("<!-- noindex -->" + words(3) + "<!-- index -->")
        else:
            parts.append(f"<script>var x = {rng.randint(0, 99)};</script>{words(3)}")
    return "<html><body>" + "".join(parts) + "</body></html>"


def test_segmentation_fuzz_parity(spark):
    """Seeded fuzz: 60 random XML + 60 random HTML documents (nested
    elements, flush tags, noindex, media, rawtext) — segmented at two
    aggressive seg_chars must equal the single pass span-for-span.
    Every third document is MULTI-SPAN (text split at a random point,
    media span interleaved), exercising the router's whole-doc path in
    the same sweep. One Spark job per (parser, seg_chars)."""
    import random

    from libswish3_spark.operators.megadoc import (
        extract_html_segmented,
        extract_xml_segmented,
    )

    rng = random.Random(20260816)
    vocab = ["alpha", "beta", "g7x", "don't", "mat", "the", "word",
             "café", "привет", "東京", "Ωμέγα"]
    for gen, parser, seg_fn in (
        (_rand_xml, "XML", extract_xml_segmented),
        (_rand_html, "HTML", extract_html_segmented),
    ):
        rows = []
        for i in range(60):
            text = gen(rng, vocab)
            if i % 3 == 2 and len(text) > 10:
                cut = rng.randint(1, len(text) - 1)
                spans = [
                    {"kind": "text", "text": text[:cut], "media_ref": "", "offset": 0},
                    {"kind": "media", "text": "", "media_ref": f"img://{i}", "offset": 0},
                    {"kind": "text", "text": text[cut:], "media_ref": "", "offset": 0},
                ]
            else:
                spans = [
                    {"kind": "text", "text": text, "media_ref": "", "offset": 0}
                ]
            rows.append({"doc_id": f"f{i}", "spans": spans})
        docs = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
        plain = _spans(lsw.extract(docs.withColumn("parser", F.lit(parser))))
        for sc in (16, 64):
            seg = _spans(seg_fn(docs, seg_chars=sc))
            assert seg == plain, (parser, sc)


def test_segmented_null_and_empty_spans_rows_survive(spark):
    """Degenerate rows (spans=NULL, spans=[], null struct element) must
    flow through the segmented entries exactly as through plain extract
    — router edge guard, not a kernel crash."""
    from libswish3_spark.operators.megadoc import extract_txt_segmented

    rows = [
        {"doc_id": "null.txt", "spans": None},
        {"doc_id": "empty.txt", "spans": []},
        {"doc_id": "ok.txt",
         "spans": [{"kind": "text", "text": "three words here", "media_ref": "", "offset": 0}]},
    ]
    docs = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    plain = {
        r["doc_id"]: (r["nwords"], [tuple(x) for x in r["spans"]])
        for r in lsw.extract(docs.withColumn("parser", F.lit("TXT"))).collect()
    }
    seg = {
        r["doc_id"]: (r["nwords"], [tuple(x) for x in r["spans"]])
        for r in extract_txt_segmented(docs, seg_chars=8).collect()
    }
    assert seg == plain


def test_segmented_multi_span_docs_fall_back_to_plain(spark):
    """Interleaved text+media docs can't ride the string segment
    kernels — the document-level entries must route them through the
    plain parser (NOT silently parse only spans[0]) and still return
    every doc."""
    from libswish3_spark.operators.megadoc import (
        extract_html_segmented,
        extract_txt_segmented,
        extract_xml_segmented,
        segmented_nwords,
    )

    multi = {
        "doc_id": "mm",
        "spans": [
            {"kind": "text", "text": "before the image", "media_ref": "", "offset": 0},
            {"kind": "media", "text": "", "media_ref": "img://x", "offset": 0},
            {"kind": "text", "text": "after the image", "media_ref": "", "offset": 0},
        ],
    }
    simple = {
        "doc_id": "ss",
        "spans": [{"kind": "text", "text": "plain words " * 200, "media_ref": "", "offset": 0}],
    }
    docs = spark.createDataFrame([multi, simple], schema=DOCS_SCHEMA)

    for seg_fn, parser in (
        (extract_txt_segmented, "TXT"),
        (extract_html_segmented, "HTML"),
        (extract_xml_segmented, "XML"),
    ):
        plain = {
            r["doc_id"]: r
            for r in lsw.extract(docs.withColumn("parser", F.lit(parser))).collect()
        }
        seg = {r["doc_id"]: r for r in seg_fn(docs, seg_chars=64).collect()}
        assert set(seg) == {"mm", "ss"}, parser
        for d in ("mm", "ss"):
            assert seg[d]["nwords"] == plain[d]["nwords"], (parser, d)
            assert [tuple(x) for x in seg[d]["spans"]] == [
                tuple(x) for x in plain[d]["spans"]
            ], (parser, d)
        # the media span actually survived
        kinds = [s["kind"] for s in seg["mm"]["spans"]]
        assert "media" in kinds, parser

    nw = {r["doc_id"]: r["nwords"] for r in segmented_nwords(docs, seg_chars=64).collect()}
    plain_txt = {
        r["doc_id"]: r["nwords"]
        for r in lsw.extract(docs.withColumn("parser", F.lit("TXT"))).collect()
    }
    assert nw == plain_txt


def test_exotic_configs_route_whole_with_full_parity(spark):
    """The segmented-path config guard: configs the cut scanners can't
    model (UndefinedMetaTags auto, attr metanames, DOM-path aliases,
    cascade) must route EVERY document through the plain parser — equal
    to plain extract span-for-span, never silently shifted positions."""
    from libswish3_spark.config import load_config_xml
    from libswish3_spark.operators.megadoc import (
        config_supports_segmentation,
        extract_xml_segmented,
        segment_xml_docs,
    )

    exotic_xmls = [
        "<swish><UndefinedMetaTags>auto</UndefinedMetaTags></swish>",
        "<swish><UndefinedMetaTags>autoall</UndefinedMetaTags></swish>",
        "<swish><UndefinedMetaTags>ignore</UndefinedMetaTags></swish>",
        "<swish><UndefinedXMLAttributes>auto</UndefinedXMLAttributes></swish>",
        "<swish><XMLClassAttributes>class id</XMLClassAttributes></swish>",
        "<swish><TagAlias><swishtitle>doc.one.two</swishtitle></TagAlias></swish>",
        "<swish><MetaNames><doc.part/></MetaNames></swish>",
        "<swish><CascadeMetaContext>1</CascadeMetaContext></swish>",
    ]
    for cx in exotic_xmls:
        assert not config_supports_segmentation(load_config_xml(cx)), cx
    assert config_supports_segmentation(None)
    assert config_supports_segmentation(
        load_config_xml("<swish><MetaNames><chapter/></MetaNames></swish>")
    )

    # end-to-end: UndefinedMetaTags auto vivifies <item>/<doc> metanames —
    # the literal scanner would mis-seed flushes; the guard must route
    # whole. Long doc ensures seg_chars WOULD have cut it.
    cfg = load_config_xml(
        "<swish><UndefinedMetaTags>auto</UndefinedMetaTags></swish>"
    )
    xml = (
        "<doc>lead words "
        + "".join(f"<item>auto item {j} words</item>" for j in range(12))
        + "tail words</doc>"
    )
    docs = spark.createDataFrame(
        [("e0", [("text", xml, "", 0)])],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    # the router actually went whole (no *SEG rows)
    labels = {
        r["parser"] for r in segment_xml_docs(docs, seg_chars=40, config=cfg).collect()
    }
    assert labels == {"XMLW"}
    plain = lsw.extract(docs.withColumn("parser", F.lit("XML")), config=cfg).collect()[0]
    seg = extract_xml_segmented(docs, config=cfg, seg_chars=40).collect()[0]
    assert seg["nwords"] == plain["nwords"]
    assert [tuple(x) for x in seg["spans"]] == [tuple(x) for x in plain["spans"]]
    assert dict(seg["metanames"]) == dict(plain["metanames"])
    # sanity: the vivified metanames really exist (the config mattered)
    assert "item" in dict(plain["metanames"])


def test_segmented_entries_scan_input_once(spark, tmp_path):
    """Single-pass routing: the executed plan of every segmented entry
    over a parquet source contains exactly ONE file scan (the old
    where(pred)/where(~pred) union read the source twice — 2x scan I/O
    at 100 TB)."""
    from libswish3_spark.operators.megadoc import (
        extract_html_segmented,
        extract_txt_segmented,
        extract_xml_segmented,
        segmented_nwords,
    )

    path = str(tmp_path / "docs")
    _docs_df(spark, [_html_doc(i) for i in range(3)]).drop("parser").write.parquet(path)
    docs = spark.read.parquet(path)
    for fn in (
        extract_html_segmented,
        extract_xml_segmented,
        extract_txt_segmented,
        segmented_nwords,
    ):
        out = fn(docs, seg_chars=120)
        out.count()  # execute so AQE finalizes the plan (ReusedExchange)
        plan = out._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan")[0] if "== Initial Plan" in plan else plan
        assert final.count("Scan parquet") == 1, (fn.__name__, final[:2000])
        # and the kernels each run once: router + extract, nothing re-run
        assert final.count("MapInArrow") == 2, (fn.__name__, final[:2000])


def test_segment_cut_property_whitespace_deviation_is_pinned(spark):
    """Quantifies the ONE documented segmented-path deviation (module
    docstring caveat 1): when a cleanwsp property bucket like
    swishdescription spans a segment cut with whitespace touching the
    cut, the stored VALUE may differ from the single pass only in
    whitespace runs adjacent to cuts — never in token content. This
    test pins that contract: metanames/nwords/spans are exact, and
    property values are exact after collapsing whitespace runs."""
    import re

    from libswish3_spark.operators.megadoc import extract_html_segmented

    # paragraphs padded with leading/trailing space runs so every
    # plausible cut lands against whitespace
    body = "".join(
        f"<p>   para {j} spaced   out tokens   here   </p>" for j in range(12)
    )
    html = f"<html><head><title>ws doc</title></head><body>{body}</body></html>"
    docs = _docs_df(spark, [html])
    plain = lsw.extract(docs).collect()[0]
    seg = extract_html_segmented(docs, seg_chars=100).collect()[0]

    assert seg["nwords"] == plain["nwords"]
    assert [tuple(x) for x in seg["spans"]] == [tuple(x) for x in plain["spans"]]
    assert dict(seg["metanames"]) == dict(plain["metanames"])

    norm = lambda v: re.sub(r"\s+", " ", v).strip()
    p_props, s_props = dict(plain["properties"]), dict(seg["properties"])
    assert set(p_props) == set(s_props)
    diffs = {k for k in p_props if p_props[k] != s_props[k]}
    for k in p_props:
        # whitespace-normalized parity ALWAYS holds
        assert norm(p_props[k]) == norm(s_props[k]), k
    # pin the deviation surface: anything non-identical differs only in
    # whitespace (already proven above) and only in cleanwsp buckets
    assert diffs <= {"swishdescription"}, diffs


def _parity(spark, doc_id, text, parser, fn, seg_chars):
    d = spark.createDataFrame(
        [(doc_id, [("text", text, "", 0)], parser)],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, parser string",
    )
    p = lsw.extract(d).collect()[0]
    s = fn(d, seg_chars=seg_chars).collect()[0]
    assert [tuple(x) for x in s["spans"]] == [tuple(x) for x in p["spans"]]
    assert s["nwords"] == p["nwords"]
    if "metanames" in p.__fields__ and "metanames" in s.__fields__:
        assert dict(s["metanames"]) == dict(p["metanames"])
    return p, s


def test_xml_segmented_root_metaname_routes_whole(spark):
    """A root element that is itself a metaname/alias tag (root <title>)
    must not be cut: a non-final segment's end_document would flush the
    root's text to swishdefault instead of swishtitle (parser.py:451-453
    flush rule). The scanner refuses and the doc runs unsegmented."""
    from libswish3_spark.operators.megadoc import extract_xml_segmented

    x = "<title>" + "".join(
        f"<s>seg{i} " + " ".join(f"w{i}_{j}" for j in range(10)) + "</s>"
        for i in range(8)
    ) + "</title>"
    _parity(spark, "d", x, "XML", extract_xml_segmented, 100)


def test_xml_segmented_noindex_reset_by_undefined_tag(spark):
    """Default UndefinedMetaTags=index: ANY undefined XML tag (start or
    close) resets the noindex counter (parser.c:708-717). The scanner
    must model the reset or text after <!--noindex-->…<tag> is invisible
    to its buffer tracking and the next cut's bumper seed is wrong."""
    from libswish3_spark.operators.megadoc import extract_xml_segmented

    x = (
        "<root><title>a title here padding padding</title>"
        "<!--noindex--><b>btext</b><!--index-->"
        "<d>" + " ".join(f"t{i}" for i in range(12)) + "</d></root>"
    )
    _parity(spark, "d", x, "XML", extract_xml_segmented, 30)


def test_html_segmented_bogus_close_does_not_flush(spark):
    """html_events DROPS a close tag that was never opened — a bogus
    </title> flushes nothing, so the scanner must not clear its
    text_seen (the old form did, losing the cut's pending bumper)."""
    from libswish3_spark.operators.megadoc import extract_html_segmented

    h = (
        "<body>" + " ".join(f"a{i}" for i in range(30))
        + "</title><p>" + " ".join(f"b{i}" for i in range(30)) + "</p></body>"
    )
    _parity(spark, "d", h, "HTML", extract_html_segmented, 60)


def test_html_segmented_implicit_close_flushes(spark):
    """An explicit </body> implicitly pops the still-open <title>, whose
    implied end event DOES flush the buffer — the scanner must clear
    text_seen for every popped flush tag, not just the named one."""
    from libswish3_spark.operators.megadoc import extract_html_segmented

    h = (
        "<html><body><title>" + " ".join(f"a{i}" for i in range(25)) + "</body>"
        + "".join(
            f"<p>para{i} " + " ".join(f"c{i}_{j}" for j in range(10)) + "</p>"
            for i in range(4)
        )
        + "</html>"
    )
    _parity(spark, "d", h, "HTML", extract_html_segmented, 80)


def test_html_segmented_meta_name_inside_content_value(spark):
    """The scanner parses <meta> attributes with the same ATTR_RE as
    html_events/bake_tag — a regex over the raw tag text used to match
    'name=' inside the CONTENT value ('content=\"name=title …\"
    name=\"notdefined\"') and mis-classify the flush."""
    from libswish3_spark.operators.megadoc import extract_html_segmented

    h = (
        "<body>"
        + "".join(
            f"<p>f{i} " + " ".join(f"g{i}_{j}" for j in range(10)) + "</p>"
            for i in range(3)
        )
        + '<meta content="name=title rest" name="notdefined">'
        + "".join(
            f"<p>h{i} " + " ".join(f"k{i}_{j}" for j in range(10)) + "</p>"
            for i in range(3)
        )
        + "</body>"
    )
    _parity(spark, "d", h, "HTML", extract_html_segmented, 70)


def test_txt_segmented_title_tokenizer_guard(spark):
    """The segmented TXT title-from-path tail uses the ASCII
    TOKEN_PATTERN; the plain parse tokenizes the uri with the ENGINE
    tokenizer (edge-strips '_' runs, unicode word runs). doc_ids where
    the two disagree must route whole — and ordinary paths still
    segment."""
    from libswish3_spark.operators.megadoc import (
        extract_txt_segmented,
        segment_text_docs,
    )

    body = " ".join(f"t{i}" for i in range(400))
    for doc_id in ("a/_/b.txt", "café.txt"):
        _parity(spark, doc_id, body, "TXT", extract_txt_segmented, 300)
    # guard must not cost segmentation for normal paths
    d = spark.createDataFrame(
        [("plain.txt", [("text", body, "", 0)], "TXT")],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, parser string",
    )
    segs = segment_text_docs(d, seg_chars=300).collect()
    assert len(segs) > 1 and all(r["parser"] == "TXTSEG" for r in segs)


def test_postings_positions_match_extract_for_txtseg(spark):
    """extract() and extract_index_postings() must agree on token
    positions for megadoc-segmented rows: the postings kernel applies
    the same doc_id-tail global offset the extraction kernel does
    (positions used to restart at 1 per segment, yielding duplicate
    (doc, pos) pairs an indexer would corrupt on)."""
    from libswish3_spark.operators.megadoc import segment_text_docs
    from libswish3_spark.operators.postings import extract_index_postings

    body = " ".join(f"w{i}" for i in range(300))
    docs = spark.createDataFrame(
        [("big.txt", [("text", body, "", 0)], "TXT")],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, parser string",
    )
    segs = segment_text_docs(docs, seg_chars=200)
    assert segs.count() > 1  # actually segmented
    post = extract_index_postings(segs).collect()
    positions = sorted(p["pos"] for p in post)
    plain = lsw.extract(docs).collect()[0]
    expected = sorted(
        s["order"] for s in plain["spans"]
        if s["kind"] == "word" and not s["text"].endswith(".txt") and s["text"] not in ("big",)
    )
    # segment rows carry no title tail; body positions must be the
    # exact global sequence with no duplicates
    assert len(set(positions)) == len(positions)
    assert positions == expected[: len(positions)]


def test_segmented_mega_doc_matches_compiled_reference_live(spark, tmp_path):
    """The strongest mega-doc proof available: a ~90 KB HTML document is
    parsed WHOLE by the compiled reference binary (SWISH_DEBUG=4 token
    dump) and SEGMENTED by our router at seg_chars=4096 (~22 segments,
    cut scan + continuation chains + window prefix-sum + reassembly) —
    the reassembled (value, position) word sequence must match the
    single-pass C engine token-for-token. Covers exactly the skewed
    mega-document path the north rule calls out, against the reference
    itself rather than our own single pass."""
    from test_reference_live_parity import _BLOCK, _ENV, _binary

    import pyarrow.parquet as pq

    from libswish3_spark.operators.megadoc import (
        extract_html_segmented,
        segment_html_docs,
    )

    binary = _binary()
    sf_docs = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    pfile = os.path.join(sf_docs, "documents.parquet")
    if not os.path.exists(pfile):
        pytest.skip("sf documents table not present")
    texts = pq.read_table(pfile, columns=["text"])["text"].to_pylist()[:300]
    body = "\n".join(f"<p>{t}</p>" for t in texts)
    html = (
        "<html><head><title>mega parity doc</title></head>"
        f"<body>\n{body}\n</body></html>"
    )
    path = str(tmp_path / "mega.html")
    with open(path, "w") as f:
        f.write(html)

    r = subprocess.run(
        [binary, "--tokenize", "1", "--xinclude", "0", path],
        capture_output=True,
        env=_ENV,
    )
    err = r.stderr.decode("utf-8", errors="replace")
    part = err.split("swish_token_list_debug:", 1)
    part = part[1] if len(part) > 1 else part[0]
    ref = [
        (v, int(p))
        for p, c, m, o, ln, v in (x.groups() for x in _BLOCK.finditer(part))
    ]
    assert len(ref) > 10000  # the dump really is the mega doc

    docs = spark.createDataFrame(
        [{"doc_id": path,
          "spans": [{"kind": "text", "text": html, "media_ref": "", "offset": 0}]}],
        schema=DOCS_SCHEMA,
    )
    assert segment_html_docs(docs, seg_chars=4096).count() > 10
    row = extract_html_segmented(docs, seg_chars=4096).collect()[0]
    ours = [(s["text"], s["order"]) for s in row["spans"] if s["kind"] == "word"]
    assert len(ours) == len(ref)
    assert ours == ref


def test_segmented_mega_xml_matches_compiled_reference_live(spark, tmp_path):
    """XML twin of the HTML mega-doc live test: _xml_cut_scan +
    root-replay continuations + reassembly vs the reference parsing the
    same ~95 KB feed whole — (value, position) equality over all
    tokens."""
    from test_reference_live_parity import _BLOCK, _ENV, _binary

    import pyarrow.parquet as pq

    from libswish3_spark.operators.megadoc import (
        extract_xml_segmented,
        segment_xml_docs,
    )

    binary = _binary()
    sf_docs = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    pfile = os.path.join(sf_docs, "documents.parquet")
    if not os.path.exists(pfile):
        pytest.skip("sf documents table not present")
    texts = pq.read_table(pfile, columns=["text"])["text"].to_pylist()[:300]
    body = "\n".join(f"<item>{t}</item>" for t in texts)
    xml = f'<?xml version="1.0"?>\n<feed>\n{body}\n</feed>'
    path = str(tmp_path / "mega.xml")
    with open(path, "w") as f:
        f.write(xml)

    r = subprocess.run(
        [binary, "--tokenize", "1", "--xinclude", "0", path],
        capture_output=True,
        env=_ENV,
    )
    err = r.stderr.decode("utf-8", errors="replace")
    part = err.split("swish_token_list_debug:", 1)
    part = part[1] if len(part) > 1 else part[0]
    ref = [
        (v, int(p))
        for p, c, m, o, ln, v in (x.groups() for x in _BLOCK.finditer(part))
    ]
    assert len(ref) > 10000

    docs = spark.createDataFrame(
        [{"doc_id": path,
          "spans": [{"kind": "text", "text": xml, "media_ref": "", "offset": 0}]}],
        schema=DOCS_SCHEMA,
    )
    assert segment_xml_docs(docs, seg_chars=4096).count() > 10
    row = extract_xml_segmented(docs, seg_chars=4096).collect()[0]
    ours = [(s["text"], s["order"]) for s in row["spans"] if s["kind"] == "word"]
    assert ours == ref


def test_segmentation_fuzz_parity_live_generator_constructs(spark):
    """Segmented-vs-plain parity over the LIVE-parity fuzz generators —
    DOCTYPEs (bracket subsets, external ids), bogus `<!` markup, HTML
    PIs/`--!>` comments, rawtext with non-matching closes, invalid
    entity refs in content AND attr values, fatal double-hyphen
    comments. This sweep caught two real cut-scanner bugs: prolog
    whitespace flagging a pending bumper (depth-0 text never buffers),
    and a seeded cut surviving an inline tag that cancels the cut
    tag's bump before the next text (the single pass fuses the token
    across the cut — '</script><td><script>var' glues 'xy'+'var')."""
    import random
    import sys

    sys.path.insert(0, "tests")
    from test_reference_live_fuzz_parity import gen_html_doc, gen_xml_doc

    from libswish3_spark.operators.megadoc import (
        extract_html_segmented,
        extract_xml_segmented,
    )

    rng = random.Random(1234)
    for gen, parser, seg_fn in (
        (gen_xml_doc, "XML", extract_xml_segmented),
        (gen_html_doc, "HTML", extract_html_segmented),
    ):
        rows = []
        for i in range(60):
            rows.append(
                {
                    "doc_id": f"f{i}",
                    "spans": [
                        {"kind": "text", "text": gen(rng),
                         "media_ref": "", "offset": 0}
                    ],
                }
            )
        docs = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
        plain = _spans(lsw.extract(docs.withColumn("parser", F.lit(parser))))
        for sc in (16, 120):
            seg = _spans(seg_fn(docs, seg_chars=sc))
            assert seg == plain, (
                parser,
                sc,
                [k for k in plain if seg.get(k) != plain[k]][:3],
            )


def test_xml_self_closing_root_refuses_segmentation():
    """ADVICE r5: '<root/><x>…</x>' has extra top-level content — the
    whole-doc parse indexes nothing (libxml2 extra-content rule), so
    the cut scan must refuse to segment it (a segmented replay would
    index <x>'s content and diverge)."""
    from libswish3_spark.operators.megadoc import _xml_cut_scan

    body = "<root/><x>" + "<p>word word word</p>" * 8 + "</x>"
    cuts, seeds, root = _xml_cut_scan(body, 20)
    assert (cuts, seeds, root) == ([], [], None)
    # a lone self-closing root still yields the whole-doc single pass
    cuts2, seeds2, root2 = _xml_cut_scan("<root/>" + " " * 64, 20)
    assert cuts2 == []
