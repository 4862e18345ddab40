"""Metaname/property bucketing + span-sequence goldens.

Mirrors the reference's NamedBuffer golden tests (reference:
src/t/003-properties.t, 004-metanames.t, 006-undef-tags.t) and pins
exact span sequences for hand-traceable documents.
"""

import os

import pytest

from libswish3_spark.config import TOKENPOS_BUMPER, default_config, load_config_xml
from libswish3_spark.parser import parse_document
from libswish3_spark.sources import fixtures as fx

B = TOKENPOS_BUMPER
REF_CONF = "/root/reference/src/test_configs"

pytestmark = pytest.mark.skipif(
    not fx.reference_available(), reason="reference corpus not present"
)


def _conf(name):
    with open(os.path.join(REF_CONF, name)) as f:
        return load_config_xml(f.read())


def _parse(name, config=None):
    rows = fx.load_fixture_rows(config=config, names=[name])
    row = rows[0]
    return parse_document(
        row["doc_id"], row["spans"], parser=row["parser"], config=config
    )


def _words(result):
    return [(s["text"], s["order"]) for s in result["spans"] if s["kind"] == "word"]


# --- span sequences (hand-traced from the reference semantics) -------------


def test_t_html_span_sequence():
    r = _parse("t.html")
    # leading whitespace between block tags creates bumper gaps
    assert _words(r) == [
        ("some", 2), ("html", 3), ("title", 4),
        ("foo", 7), ("bar", 8), ("fa", 9),
    ]


def test_inline_html_no_bump_across_inline():
    r = _parse("inline.html")
    words = [t for t, _ in _words(r)]
    # <b> is inline: some<b>thing</b>borrowed is ONE token
    assert "somethingborrowed" in words
    assert words.count("something") == 1  # "some<b>thing</b> blue"
    assert r["nwords"] == 9


def test_inline_xml_every_tag_bumps():
    r = _parse("inline.xml")
    words = [t for t, _ in _words(r)]
    # XML always bumps: some|thing|borrowed are separate tokens
    assert "somethingborrowed" not in words
    assert words[:3] == ["some", "thing", "borrowed"]
    assert r["nwords"] == 14


def test_contractions_span_values():
    r = _parse("contractions.xml")
    words = [t for t, _ in _words(r)]
    assert words[:13] == [
        "we", "don't", "like", "no", "words", "don't", "have",
        "postrophes", "in", "em", "er", "nuthin", "doin",
    ]


# --- properties (003-properties.t) ------------------------------------------


def test_properties_html_buckets():
    r = _parse("properties.html")
    assert r["properties"]["swishtitle"] == "properties test page title"
    desc = r["properties"]["swishdescription"]
    assert desc.startswith("properties test page body")
    assert "a bunch of space between" in desc


def test_dom_conf_dom_path_property():
    cfg = _conf("dom.conf")
    r = _parse("dom.xml", config=cfg)
    # '.' in the reference golden regex is the bumper joiner
    assert r["properties"]["doc.one.two"] == f"green{B}yellow"
    assert r["metanames"]["doc.one.two"].strip() == "green"
    assert r["metanames"]["doc.one.two.three"].strip() == "yellow"


def test_props_conf_no_space_after_utf8():
    cfg = _conf("props.conf")
    r = _parse("props.xml", config=cfg)
    # non-ASCII property value: no ctrl→ws cleanup (string.c:599-600)
    assert r["properties"]["prop1"] == "“foo"
    assert r["properties"]["prop2"] == "bar”"


# --- metanames (004-metanames.t) ---------------------------------------------


def test_properties_xml_meta1_segments():
    cfg = _conf("properties.xml")
    r = _parse("properties.html", config=cfg)
    assert r["properties"]["swishtitle"] == "properties test page title"
    segs = r["metanames"]["meta1"].split(B)
    assert segs == ["properties test page meta1", "more meta1"]


def test_upperlower_xmlclassattributes():
    cfg = _conf("UPPERlower.XML")
    assert "att1" in cfg.stringlists["XMLClassAttributes"]
    assert "att2" in cfg.stringlists["XMLClassAttributes"]
    r = _parse("UPPERlower.XML", config=cfg)
    assert r["metanames"]["swishtitle"].strip() == "mytitle here"
    mytag1 = r["metanames"]["mytag1"]
    assert "some text" in mytag1
    assert "yet again" in mytag1 and "and again" in mytag1
    assert "blah blah" in r["metanames"]["mytag3.foo"]
    assert r["metanames"]["mytag3"].strip() == "foo bar"


# --- undef-tag policies (006-undef-tags.t) -----------------------------------


def test_undeftags_ignore():
    cfg = _conf("undeftags-ignore.conf")
    r = _parse("undeftags.xml", config=cfg)
    assert r["metanames"].get("swishdefault", "") == ""
    assert r["nwords"] == 0


def test_undeftags_auto():
    cfg = _conf("undeftags-auto.conf")
    r = _parse("undeftags.xml", config=cfg)
    assert r["metanames"]["foo"].strip() == "bar"
    assert r["metanames"]["name"].strip() == "John Smith"
    assert r["metanames"]["name.age"] == "23"


def test_undeftags_error():
    cfg = _conf("undeftags-error.conf")
    r = _parse("undeftags.xml", config=cfg)
    assert r["error"] is not None
    assert "not a defined MetaName" in r["error"]
    assert "doc" in r["error"]


def test_undeftags_index():
    cfg = _conf("undeftags-index.conf")
    r = _parse("undeftags.xml", config=cfg)
    sd = r["metanames"]["swishdefault"]
    # attr value indexed before element text (parser.c:636-643)
    assert sd.index("23") < sd.index("John Smith") < sd.index("bar")


# --- xmlns (002-header.t) -----------------------------------------------------


def test_xmlns_prefixed_metanames():
    cfg = default_config().with_overrides(
        ignore_xmlns=False, undef_metas="auto"
    )
    r = _parse("xmlns.xml", config=cfg)
    assert r["metanames"]["foo:name"].strip() == "GEORGE".lower() or (
        "george" in r["metanames"]["foo:name"].lower()
    )
    assert "medium" in r["metanames"]["foo:size"]


def test_media_span_at_bumper_gap():
    r = parse_document(
        "m.html",
        [{"kind": "text", "text": "<body>foo <img src='x.png'> bar</body>", "media_ref": "", "offset": 0}],
        parser="HTML",
    )
    assert [(s["kind"], s["text"] or s["media_ref"], s["order"]) for s in r["spans"]] == [
        ("word", "foo", 1), ("media", "x.png", 2), ("word", "bar", 3),
    ]


def test_token_regex_config_overrides_tokenizer():
    """T10: the Perl binding's settable token regex
    (bindings/perl/lib/SWISH/3.pm:102-133) via config.token_regex —
    hyphenated words stay whole under a custom pattern."""
    from libswish3_spark.config import default_config
    from libswish3_spark.parser import parse_document

    spans_default = parse_document(
        "t.txt",
        [{"kind": "text", "text": "e-mail me", "media_ref": "", "offset": 0}],
        parser="TXTSEG",
    )["spans"]
    assert [s["text"] for s in spans_default] == ["e", "mail", "me"]

    cfg = default_config(token_regex=r"[a-z0-9]+(?:-[a-z0-9]+)*")
    spans_custom = parse_document(
        "t.txt",
        [{"kind": "text", "text": "e-mail me", "media_ref": "", "offset": 0}],
        parser="TXTSEG",
        config=cfg,
    )["spans"]
    assert [s["text"] for s in spans_custom] == ["e-mail", "me"]


def test_registered_tokenizer_by_name():
    from libswish3_spark.config import default_config
    from libswish3_spark.parser import parse_document
    from libswish3_spark.tokenizer import register_tokenizer

    register_tokenizer("shouty", lambda seg: [t.upper() for t in seg.split()])
    cfg = default_config(tokenizer="shouty")
    spans = parse_document(
        "t.txt",
        [{"kind": "text", "text": "hello there", "media_ref": "", "offset": 0}],
        parser="TXTSEG",
        config=cfg,
    )["spans"]
    assert [s["text"] for s in spans] == ["HELLO", "THERE"]


def test_unknown_tokenizer_name_raises():
    import pytest

    from libswish3_spark.config import default_config
    from libswish3_spark.parser import parse_document

    with pytest.raises(KeyError, match="not registered"):
        parse_document(
            "t.txt",
            [{"kind": "text", "text": "x", "media_ref": "", "offset": 0}],
            parser="TXTSEG",
            config=default_config(tokenizer="nope"),
        )


def test_token_regex_round_trips_through_config_xml():
    from libswish3_spark.config import config_to_xml, default_config, load_config_xml

    cfg = default_config(token_regex=r"\w+(?:[’']\w+)*", tokenizer="custom")
    cfg2 = load_config_xml(config_to_xml(cfg))
    assert cfg2.token_regex == cfg.token_regex
    assert cfg2.tokenizer == "custom"


def test_html_uppercase_meta_attrs_indexed():
    """libxml2's HTML parser lowercases attribute NAMES: <META NAME=...
    CONTENT=...> must index its content exactly like the lowercase
    form (the events layer used to pass 'NAME' through and bake_tag's
    case-sensitive meta path never fired)."""
    from libswish3_spark.parser import parse_document

    up = parse_document(
        "u.html",
        [{"kind": "text", "text": '<META NAME="author" CONTENT="bob smith">x', "media_ref": "", "offset": 0}],
        parser="HTML",
    )
    low = parse_document(
        "u.html",
        [{"kind": "text", "text": '<meta name="author" content="bob smith">x', "media_ref": "", "offset": 0}],
        parser="HTML",
    )
    assert up["nwords"] == low["nwords"] == 3


def test_numeric_charref_surrogate_is_replaced():
    """&#xD800; must become U+FFFD, not a lone surrogate — chr(0xD800)
    builds a string Arrow refuses to serialize, killing the task."""
    from libswish3_spark.parser import parse_document

    r = parse_document(
        "s.xml",
        [{"kind": "text", "text": "<d>ok &#xD800; &#0; fine</d>", "media_ref": "", "offset": 0}],
        parser="XML",
    )
    joined = " ".join(s["text"] for s in r["spans"])
    assert "\ud800" not in joined and "\x00" not in joined
    # and the row still round-trips through UTF-8 (what Arrow requires)
    joined.encode("utf-8")


def test_lt_nonname_is_literal_text():
    """'<' followed by a non-name-start char (digit, quote) is TEXT in
    libxml2, not an element — '<3' must not swallow words."""
    from libswish3_spark.parser import parse_document

    r = parse_document(
        "t.html",
        [{"kind": "text", "text": "I <3 you forever", "media_ref": "", "offset": 0}],
        parser="HTML",
    )
    words = [s["text"] for s in r["spans"] if s["kind"] == "word"]
    assert words == ["i", "3", "you", "forever"], words


def test_bake_memo_not_shared_across_parser_kinds():
    """Round-6 review regression: the per-config bake memo must be
    keyed by document kind — an XML parse of <em> (every-XML-tag bump)
    must not poison the HTML inline-tag no-bump rule for the same
    config object, in either order."""
    from libswish3_spark.config import default_config
    from libswish3_spark.parser import parse_to_state

    cfg = default_config()

    def toks(text, parser):
        st = parse_to_state(
            "d", [{"kind": "text", "text": text, "media_ref": "", "offset": 0}],
            parser, cfg,
        )
        return [t for k, t in zip(st.s_kindc, st.s_text) if not k]

    # XML first: <em> bakes with bump=True for XML...
    assert toks("<root>a<em>b</em></root>", "XML") == ["a", "b"]
    # ...and must NOT leak into HTML, where <em> is inline (no bump):
    # 'foo<em>bar</em>' fuses to one token
    assert toks("<body>foo<em>bar</em></body>", "HTML") == ["foobar"]
    # reverse order on a fresh config: HTML's no-bump entry must not
    # leak into XML (every XML tag bumps)
    cfg2 = default_config()

    def toks2(text, parser):
        st = parse_to_state(
            "d", [{"kind": "text", "text": text, "media_ref": "", "offset": 0}],
            parser, cfg2,
        )
        return [t for k, t in zip(st.s_kindc, st.s_text) if not k]

    assert toks2("<body>foo<em>bar</em></body>", "HTML") == ["foobar"]
    assert toks2("<root>a<em>b</em></root>", "XML") == ["a", "b"]
