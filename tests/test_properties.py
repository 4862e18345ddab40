"""Property-based invariants (hypothesis) for tokenizer + parser.

These guard the invariants the goldens can't cover exhaustively:
arbitrary input never crashes the scanners, token/positions invariants
hold for any text, and framing round-trips.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from libswish3_spark.charclasses import word_run_re
from libswish3_spark.events import html_events, xml_events
from libswish3_spark.parser import parse_document
from libswish3_spark.sources.stream import parse_framed_stream
from libswish3_spark.tokenizer import split_tokens, tokenize_with_positions

WORDS = st.lists(
    st.text(alphabet=string.ascii_lowercase + string.digits, min_size=1, max_size=12),
    min_size=0,
    max_size=30,
)


@given(st.text(max_size=500))
@settings(max_examples=200, deadline=None)
def test_tokenizer_never_crashes_and_invariants(s):
    toks, pos = tokenize_with_positions(s, 0)
    positions = [p for _, p, _, _ in toks]
    assert positions == sorted(positions)
    assert len(positions) == len(set(positions))  # strictly increasing
    assert pos >= (positions[-1] if positions else 0)
    for value, _, _, _ in toks:
        assert value == value.lower()
        assert value.strip("'_") != "" or value == ""
        assert len(value.encode("utf-8")) <= 256


@given(WORDS)
@settings(max_examples=100, deadline=None)
def test_space_joined_words_round_trip(words):
    assert split_tokens(" ".join(words)) == words


@given(st.text(max_size=300))
@settings(max_examples=150, deadline=None)
def test_markup_scanners_never_crash(s):
    list(xml_events(s))
    list(html_events(s))
    # text content is fully preserved or dropped as markup — no exception
    # is the contract here (libxml2 recovery analogue)


@given(WORDS)
@settings(max_examples=60, deadline=None)
def test_xml_document_word_count(words):
    body = " ".join(words)
    r = parse_document(
        "prop.xml",
        [{"kind": "text", "text": f"<doc>{body}</doc>", "media_ref": "", "offset": 0}],
        parser="XML",
    )
    assert r["nwords"] == len(words)
    assert [s["text"] for s in r["spans"] if s["kind"] == "word"] == words


@given(WORDS)
@settings(max_examples=60, deadline=None)
def test_txt_title_contract(words):
    body = " ".join(words)
    r = parse_document(
        "somefile.txt",
        [{"kind": "text", "text": body, "media_ref": "", "offset": 0}],
        parser="TXT",
    )
    # title-from-path adds exactly the doc_id's tokens (somefile + txt)
    assert r["nwords"] == len(words) + 2
    assert r["metanames"]["swishtitle"] == "somefile.txt"


@given(
    st.lists(
        st.tuples(
            st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=10),
            st.binary(max_size=200).filter(lambda b: b"\n\n" not in b),
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=60, deadline=None)
def test_framed_stream_round_trip(docs):
    frames = b"".join(
        b"Content-Length: %d\nContent-Location: %s.txt\n\n%s"
        % (len(body), name.encode(), body)
        for name, body in docs
    )
    rows = parse_framed_stream(frames)
    assert len(rows) == len(docs)
    assert [r["doc_id"] for r in rows] == [f"{n}.txt" for n, _ in docs]


@given(st.text(max_size=120))
@settings(max_examples=100, deadline=None)
def test_word_run_class_consistent_with_split(s):
    # every emitted token is a subsequence of some word run
    runs = word_run_re().findall(s.lower())
    for tok in split_tokens(s):
        assert any(tok in run for run in runs)


def test_property_max_truncates_stored_value():
    """Property.max caps the stored buffer (Swish-e 2.x
    PropertyNamesMaxLength; reference parses it at header.c:487-488)."""
    from libswish3_spark.config import load_config_xml
    from libswish3_spark.parser import parse_document

    cfg = load_config_xml(
        '<swish><PropertyNames><shorty max="5"/></PropertyNames></swish>'
    )
    r = parse_document(
        "m.xml",
        [{"kind": "text", "text": "<doc><shorty>abcdefghij</shorty></doc>",
          "media_ref": "", "offset": 0}],
        parser="XML",
        config=cfg,
    )
    assert r["properties"]["shorty"] == "abcde"


def test_typed_property_consumption(spark):
    """Consumer typing per swish_xapian.cpp:449-483: bumper → space,
    atoi for int (leading digits), timestamp for date."""
    from libswish3_spark.config import load_config_xml
    from libswish3_spark.functions.props import typed_properties
    from libswish3_spark.pipeline import extract

    cfg = load_config_xml(
        """<swish><PropertyNames>
             <num type="int"/><when type="date"/><parts/>
           </PropertyNames></swish>"""
    )
    xml = ("<doc><num> 42abc </num><when>2021-06-30</when>"
           "<parts>one</parts><parts>two</parts></doc>")
    docs = spark.createDataFrame(
        [("t.xml", [("text", xml, "", 0)], "XML")],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, parser string",
    )
    row = typed_properties(extract(docs, config=cfg), cfg).collect()[0]
    assert row["num"] == 42  # atoi: leading int of ' 42abc'
    assert str(row["when"]).startswith("2021-06-30")
    assert row["parts"] == "one two"  # bumper joint → space


def test_property_sort_hints(spark):
    """sort/presort/sort_length consumer hints (property.c:41-43,
    swish_xapian.cpp:1041): sort_length truncates the ordering key,
    ignore_case folds it, sort=0 yields no key."""
    from libswish3_spark.config import load_config_xml
    from libswish3_spark.functions.props import typed_properties
    from libswish3_spark.pipeline import extract

    cfg = load_config_xml(
        """<swish><PropertyNames>
             <name sort_length="5"/>
             <blob sort="0"/>
             <exact ignore_case="0"/>
           </PropertyNames></swish>"""
    )
    assert cfg.properties["name"].sort_length == 5
    assert cfg.properties["blob"].sort is False
    assert cfg.properties["exact"].ignore_case is False
    xml = ("<doc><name>Brontosaurus Rex</name><blob>unsortable text</blob>"
           "<exact>MixedCase</exact></doc>")
    docs = spark.createDataFrame(
        [("s.xml", [("text", xml, "", 0)], "XML")],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, parser string",
    )
    row = typed_properties(
        extract(docs, config=cfg), cfg, with_sort_keys=True
    ).collect()[0]
    # first sort_length BYTES, folded, hex-represented (byte parity with
    # the reference's C-string prefix; see functions/props.py sort_key)
    assert row["name_sortkey"] == "62726F6E74"  # hex(b"bront")
    assert "blob_sortkey" not in row.asDict()  # sort=0: no key column
    assert row["exact_sortkey"] == "MixedCase"  # ignore_case=0 keeps case
    # hints round-trip through the config header (C3)
    from libswish3_spark.config import config_to_xml, load_config_xml as reload

    cfg2 = reload(config_to_xml(cfg))
    assert cfg2.properties["name"].sort_length == 5
    assert cfg2.properties["blob"].sort is False


def test_property_max_is_a_byte_cap(spark):
    """Property.max counts UTF-8 BYTES (libswish3.h:357), not
    characters: 'héllo' under max=5 keeps h(1)+é(2)+l(1)+l(1) = 5 bytes
    → 'héll'; a cut that splits a multibyte character drops it whole.
    Store-time (parser) and consumer-side (typed_properties) agree."""
    from pyspark.sql import functions as F

    from libswish3_spark.config import load_config_xml
    from libswish3_spark.functions.props import typed_properties, utf8_byte_truncate
    from libswish3_spark.pipeline import extract

    cfg = load_config_xml(
        '<swish><PropertyNames><desc max="5"/></PropertyNames></swish>'
    )
    docs = spark.createDataFrame(
        [
            (
                "d1",
                [
                    {
                        "kind": "text",
                        "text": "<doc><desc>héllo</desc></doc>",
                        "media_ref": "",
                        "offset": 0,
                    }
                ],
                "XML",
            ),
            (
                "d2",
                [
                    {
                        "kind": "text",
                        # max=5 cuts mid-é (bytes h,e,l,l + first of é):
                        # the split char drops whole → 'hell'
                        "text": "<doc><desc>hellé</desc></doc>",
                        "media_ref": "",
                        "offset": 0,
                    }
                ],
                "XML",
            ),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>, parser string",
    )
    ext = extract(docs, config=cfg)
    stored = {r["doc_id"]: r["properties"].get("desc") for r in ext.collect()}
    assert stored == {"d1": "héll", "d2": "hell"}
    typed = {
        r["doc_id"]: r["desc"]
        for r in typed_properties(ext, cfg).collect()
    }
    assert typed == stored
    # the column helper standalone (consumer path over untruncated text)
    got = (
        spark.createDataFrame([("héllo",), ("hellé",)], ["v"])
        .select(utf8_byte_truncate(F.col("v"), 5).alias("t"))
        .collect()
    )
    assert [r["t"] for r in got] == ["héll", "hell"]


def test_utf8_byte_truncate_parity_python_vs_spark_fuzz(spark):
    """The store-time (parser: encode[:max].decode(errors='ignore')) and
    consumer-side (props.utf8_byte_truncate) byte caps must agree on
    arbitrary Unicode at arbitrary cut points — one batched Spark round
    trip over 240 seeded random strings × caps (ASCII, Latin-1, CJK,
    emoji/astral, combining marks)."""
    import random

    from pyspark.sql import functions as F

    from libswish3_spark.functions.props import utf8_byte_truncate

    rng = random.Random(42)
    # "�" (U+FFFD) entries are deliberate: web text carries literal
    # replacement chars from upstream encoding cleanup; a legit trailing
    # U+FFFD must survive the cap (only a cap-SPLIT char is dropped).
    alphabets = ["ab c", "héèñ", "布朗狗", "😀🚀x", "éä", "ǅß", "�" + "a�", "x�"]
    rows = []
    for i in range(240):
        alpha = alphabets[i % len(alphabets)]
        s = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))
        cap = rng.randint(1, 10)
        rows.append((i, s, cap))
    expected = {
        i: s.encode("utf-8")[:cap].decode("utf-8", "ignore")
        for i, s, cap in rows
    }
    df = spark.createDataFrame(rows, "i int, s string, cap int")
    got = {}
    for cap in sorted({c for _, _, c in rows}):
        part = df.where(F.col("cap") == cap).select(
            "i", utf8_byte_truncate(F.col("s"), cap).alias("t")
        )
        got.update({r["i"]: r["t"] for r in part.collect()})
    assert got == expected
