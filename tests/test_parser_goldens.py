"""Golden parity: nwords per fixture document must match the counts the
reference's own test suite publishes (reference: src/t/001-wordcount.t),
adjusted for our doc_id paths (see fixtures.py docstring)."""

import pytest

from libswish3_spark.parser import make_include_resolver, parse_document
from libswish3_spark.sources import fixtures as fx

pytestmark = pytest.mark.skipif(
    not fx.reference_available(), reason="reference corpus not present"
)


def _parse_one(name: str, default_encoding: str | None = None):
    rows = fx.load_fixture_rows(names=[name], default_encoding=default_encoding)
    assert rows, f"fixture {name} missing"
    row = rows[0]
    resolver = make_include_resolver(fx.load_include_map())
    return parse_document(
        row["doc_id"],
        row["spans"],
        parser=row["parser"],
        include_resolver=resolver,
        error=row["error"],
    )


@pytest.mark.parametrize(
    "name,expected",
    [(n, e) for n, e in fx.GOLDEN_NWORDS.items() if e is not None],
)
def test_golden_nwords(name, expected):
    result = _parse_one(name)
    words = [s for s in result["spans"] if s["kind"] == "word"]
    assert result["nwords"] == expected, (
        f"{name}: nwords {result['nwords']} != {expected}; "
        f"tokens={[w['text'] for w in words][:80]}"
    )
    # invariant: nwords == count(kind='word')
    assert result["nwords"] == len(words)


def test_utf8_demo_range():
    # linux glibc-variant: ~7xx content words (001-wordcount.t:69-73)
    result = _parse_one("UTF-8-demo.txt")
    assert 700 <= result["nwords"] <= 799


def test_gzip_matches_plain():
    plain = _parse_one("UTF-8-demo.txt")
    gz = _parse_one("UTF-8-gzipped.txt.gz")
    # same content; counts differ only via the filename words
    plain_words = [s["text"] for s in plain["spans"] if s["kind"] == "word"]
    gz_words = [s["text"] for s in gz["spans"] if s["kind"] == "word"]
    # strip title tokens (last few = path words)
    assert plain_words[:700] == gz_words[:700]


def test_utf8_tokens_variant():
    result = _parse_one("utf8-tokens-1.txt")
    # 15 or 16 content+filename, +1 for test_docs (001-wordcount.t:74-79)
    assert result["nwords"] in (15 + 1, 16 + 1)


def test_latin1_txt_with_latin1_encoding():
    result = _parse_one("latin1.txt", default_encoding="ISO8859-1")
    assert result["nwords"] == fx.LATIN1_ENV_GOLDENS["latin1.txt"]


def test_greek_and_ojibwe_latin1_env():
    # libxml2 detects the real encoding and overrides SWISH_ENCODING
    # (001-wordcount.t:107-110): the file is valid UTF-8 so the UTF-8
    # path wins regardless of the env encoding.
    result = _parse_one("greek_and_ojibwe.txt", default_encoding="ISO8859-1")
    assert result["nwords"] == fx.LATIN1_ENV_GOLDENS["greek_and_ojibwe.txt"]
