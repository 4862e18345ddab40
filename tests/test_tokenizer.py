"""Tokenizer parity tests (reference: src/t/005-tokenizer.t + tokenizer.c)."""

from libswish3_spark.tokenizer import (
    count_tokens,
    split_tokens,
    tokenize_with_positions,
)


def test_simple_word():
    assert split_tokens("foobar") == ["foobar"]


def test_edge_strip():
    # ++foo++ → foo (005-tokenizer.t:16-21)
    assert split_tokens("++foo++") == ["foo"]


def test_chinese_single_token():
    # no CJK segmentation (005-tokenizer.t:23-31)
    assert split_tokens("布朗在迅速跳下懒狐狗") == ["布朗在迅速跳下懒狐狗"]


def test_spanish_nine_tokens():
    toks = split_tokens("el zorro marrón rápido saltó sobre el perro perezoso")
    assert len(toks) == 9
    assert toks[2] == "marrón"


def test_uri_three_tokens_lowercased():
    assert split_tokens("http://FOOBAR.COM/") == ["http", "foobar", "com"]


def test_contractions_and_underscore():
    # ' and _ are word chars inside (tokenizer.c:88-94) but strip at edges
    assert split_tokens("don't") == ["don't"]
    assert split_tokens("'em") == ["em"]
    assert split_tokens("nuthin'") == ["nuthin"]
    assert split_tokens("some_word") == ["some_word"]
    assert split_tokens("_edge_") == ["edge"]
    assert split_tokens("''") == []


def test_words_txt_punctuation_torture():
    line = "some.word.with.dots.in.it"
    assert split_tokens(line) == ["some", "word", "with", "dots", "in", "it"]
    line2 = "!foo@bar#gab$bang%now^nice&wordy*some(thing)else-here=and+yet?more.here,still"
    assert split_tokens(line2) == [
        "foo", "bar", "gab", "bang", "now", "nice", "wordy", "some",
        "thing", "else", "here", "and", "yet", "more", "here", "still",
    ]


def test_maxwordlen_split_ascii():
    run = "a" * 600
    toks = split_tokens(run)
    assert [len(t) for t in toks] == [256, 256, 88]


def test_positions_and_bumpers():
    toks, pos = tokenize_with_positions("foo bar", 0)
    assert [(t[0], t[1]) for t in toks] == [("foo", 1), ("bar", 2)]
    # bumper byte takes a position of its own (tokenizer.c:693-697)
    toks, pos = tokenize_with_positions("foo\x03bar", 0)
    assert [(t[0], t[1]) for t in toks] == [("foo", 1), ("bar", 3)]
    assert pos == 3
    # bumper with no surrounding tokens still increments
    toks, pos = tokenize_with_positions("\x03", 5)
    assert toks == [] and pos == 6


def test_empty_and_all_punct():
    assert count_tokens("") == 0
    assert count_tokens("!!! ... ???") == 0


def test_lowercasing():
    assert split_tokens("FooBAR Baz") == ["foobar", "baz"]


def test_count_positions_matches_tokenize_with_positions():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from libswish3_spark.tokenizer import count_positions, tokenize_with_positions

    @given(
        st.text(
            alphabet=st.sampled_from(
                list("abz09 '_+.\x03") + ["é", "漢", "’"]
            ),
            max_size=80,
        )
    )
    @settings(max_examples=300, deadline=None)
    def check(text):
        assert count_positions(text) == tokenize_with_positions(text, 0)[1]

    check()


def test_count_positions_long_run_split():
    from libswish3_spark.tokenizer import count_positions, tokenize_with_positions

    for text in ["a" * 700, "a" * 256, "a" * 257, "x" * 256 + " " + "y" * 512]:
        assert count_positions(text) == tokenize_with_positions(text, 0)[1]
