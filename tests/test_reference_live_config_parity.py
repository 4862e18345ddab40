"""Config-variant live parity against the compiled reference binary.

The base live-parity suite (test_reference_live_parity) drives the
compiled ``swish_lint`` under the DEFAULT config only. This module
re-runs the token-stream (SWISH_DEBUG=4) and named-buffer
(SWISH_DEBUG=64) comparisons under the reference's own shipped config
variants, covering the config surface the goldens never exercised
against the living binary:

* the four UndefinedMetaTags / UndefinedXMLAttributes policies
  (src/test_configs/undeftags-*.conf, asserted by src/t/006-undef-tags.t)
  swept over the WHOLE fixture corpus;
* DOM-path MetaNames/PropertyNames (dom.conf, 003-properties.t);
* plain custom metanames+properties (props.conf);
* typed/verbatim/max/sort properties (bindings/perl/t/t.conf);
* --CascadeMetaContext 1 (parser.c cascade_meta_context);
* --xmlns 0/1 (flags->ignore_xmlns; prefixed tag names).

Getting these green fixed two real engine divergences (both in
events.xml_events):

1. xmlns/xmlns:* declarations are NOT attributes — libxml2's SAX2
   layer consumes them before the callbacks, so the reference's attr
   loop (parser.c:599-607) never mints ``tag.xmlns:p`` metanames or
   indexes namespace URIs under UndefinedXMLAttributes=auto/index.
2. the reference's SAX2→atts shim (mystartElementNs, parser.c:897-911)
   writes NULL into the NAME slot of any EMPTY-valued attribute, so
   every ``atts[i] != NULL`` loop stops there: attributes are visible
   only up to (excluding) the first one with an empty value
   (``<xref remap="as" condition="" role="1">`` exposes linkend/remap
   but neither condition nor role).

Reference BUGS pinned (not replicated):

* UndefinedXMLAttributes=auto double-frees (SIGABRT/SIGSEGV) on docs
  whose tags repeat an auto-minted attr metaname in one element chain
  (utf.xml, testutf.xml, xinclude.xml) — ``_AUTO_CRASHERS`` below.
  We parse them fine; parity is asserted for every doc the binary
  survives.
"""

from __future__ import annotations

import glob
import os
import subprocess

import pytest

from test_reference_live_parity import (
    _KNOWN_DIVERGENT,
    _PARSER_BY_EXT,
    _ENV,
    _binary,
    _our_buffers,
    _our_tokens,
    _ref_buffers,
    _ref_tokens,
)

from libswish3_spark.config import default_config, load_config_xml
from libswish3_spark.events import xml_events

REFERENCE = os.environ.get("REFERENCE_PATH", "/root/reference")
TEST_DOCS = os.path.join(REFERENCE, "src", "test_docs")
TEST_CONFIGS = os.path.join(REFERENCE, "src", "test_configs")
PERL_T_CONF = os.path.join(REFERENCE, "bindings", "perl", "t", "t.conf")

# docs where the reference binary ITSELF dies under undeftags-auto.conf
# (double free in the auto attr-metaname path) — a reference bug, so
# only survival parity can be asserted there
_AUTO_CRASHERS = {"testutf.xml", "utf.xml", "xinclude.xml"}


def _load_conf(path: str):
    with open(path) as f:
        return load_config_xml(f.read())


def _norm(d):
    # the reference pre-registers empty buffers: empty == absent
    return {k: v for k, v in d.items() if v}


def _corpus():
    for p in sorted(glob.glob(os.path.join(TEST_DOCS, "*"))):
        name = os.path.basename(p)
        ext = p.rsplit(".", 1)[-1].lower() if "." in name else ""
        parser = _PARSER_BY_EXT.get(ext)
        if parser is None or name in _KNOWN_DIVERGENT:
            continue
        yield p, name, parser


def _compare(binary, path, parser, cfg, extra):
    """Return a list of divergence strings for one (doc, config) pair."""
    out = []
    rt = _ref_tokens(binary, path, extra)
    ot = _our_tokens(path, parser, cfg)
    if rt != ot:
        first = next(
            ((a, b) for a, b in zip(rt, ot) if a != b),
            ("len", (len(rt), len(ot))),
        )
        out.append(f"{os.path.basename(path)} tokens: {first}")
    rb = _ref_buffers(binary, path, extra)
    ob = _our_buffers(path, parser, cfg)
    if (_norm(rb[0]), _norm(rb[1])) != (_norm(ob[0]), _norm(ob[1])):
        out.append(f"{os.path.basename(path)} buffers diverge")
    return out


def _sweep(conf_name: str, allowed_crashers=frozenset()):
    binary = _binary()
    conf = (
        conf_name
        if os.path.isabs(conf_name)
        else os.path.join(TEST_CONFIGS, conf_name)
    )
    cfg = _load_conf(conf)
    extra = ("--config", conf)
    failures, crashed, checked = [], set(), 0
    for p, name, parser in _corpus():
        r = subprocess.run(
            [binary, "--tokenize", "1", *extra, "--xinclude", "0", p],
            capture_output=True,
            env=_ENV,
        )
        if r.returncode != 0:
            crashed.add(name)
            continue
        failures += _compare(binary, p, parser, cfg, extra)
        checked += 1
    assert crashed <= set(allowed_crashers), (
        f"reference binary crashed on unexpected docs under {conf_name}: "
        f"{sorted(crashed - set(allowed_crashers))}"
    )
    assert checked >= 30
    assert not failures, f"{conf_name} divergence:\n" + "\n".join(failures[:10])


def test_undeftags_auto_corpus_parity():
    """auto: every undefined tag/attr mints a metaname — the densest
    bucketing surface. The reference double-frees on three docs
    (_AUTO_CRASHERS); parity holds on the 34 it survives."""
    _sweep("undeftags-auto.conf", _AUTO_CRASHERS)


def test_undeftags_autoall_corpus_parity(tmp_path):
    """autoall: auto metanames AND auto properties for every undefined
    tag/attr. No shipped .conf exists for it (header.c:241-262 parses
    it), so synthesize one."""
    conf = tmp_path / "undeftags-autoall.conf"
    conf.write_text(
        "<swish>\n <UndefinedMetaTags>autoall</UndefinedMetaTags>\n"
        " <UndefinedXMLAttributes>autoall</UndefinedXMLAttributes>\n</swish>\n"
    )
    _sweep(str(conf), _AUTO_CRASHERS)


def test_undeftags_index_corpus_parity():
    """index: undefined attr VALUES are indexed into the enclosing
    context — exercises the empty-attr truncation rule end-to-end."""
    _sweep("undeftags-index.conf")


def test_undeftags_ignore_corpus_parity():
    """ignore: undefined tags suppress their content entirely."""
    _sweep("undeftags-ignore.conf")


def test_undeftags_error_both_engines_croak():
    binary = _binary()
    conf = os.path.join(TEST_CONFIGS, "undeftags-error.conf")
    doc = os.path.join(TEST_DOCS, "undeftags.xml")
    r = subprocess.run(
        [binary, "--tokenize", "1", "--config", conf, "--xinclude", "0", doc],
        capture_output=True,
        env=_ENV,
    )
    assert r.returncode != 0
    assert b"is not a defined MetaName" in r.stderr
    # our engine error-rows instead of killing the task: the croak
    # lands in the row's error column with the reference's wording
    from libswish3_spark.parser import parse_document

    r = parse_document(
        doc,
        [{"kind": "text", "text": open(doc).read(), "media_ref": "", "offset": 0}],
        parser="XML",
        config=_load_conf(conf),
    )
    assert r["error"] is not None and "not a defined MetaName" in r["error"]


@pytest.mark.parametrize(
    "doc,conf",
    [("dom.xml", "dom.conf"), ("props.xml", "props.conf")],
)
def test_custom_metaname_configs_live_parity(doc, conf):
    """003-properties.t combos: DOM-path metanames (doc.one.two.three)
    and plain custom metaname+property pairs."""
    binary = _binary()
    conf_path = os.path.join(TEST_CONFIGS, conf)
    failures = _compare(
        binary,
        os.path.join(TEST_DOCS, doc),
        "XML",
        _load_conf(conf_path),
        ("--config", conf_path),
    )
    assert not failures, failures


@pytest.mark.parametrize(
    "doc,parser",
    [
        ("nested_meta.xml", "XML"),
        ("multi_props.xml", "XML"),
        ("dom.xml", "XML"),
        ("meta.html", "HTML"),
    ],
)
def test_cascade_meta_context_live_parity(doc, parser):
    """--CascadeMetaContext 1: child text ALSO buffers into every
    ancestor metaname (parser.c cascade_meta_context)."""
    binary = _binary()
    cfg = default_config(cascade_meta_context=True)
    failures = _compare(
        binary,
        os.path.join(TEST_DOCS, doc),
        parser,
        cfg,
        ("--CascadeMetaContext", "1"),
    )
    assert not failures, failures


@pytest.mark.parametrize("honor", [True, False])
def test_xmlns_flag_live_parity(honor):
    """--xmlns 0 keeps prefixed tag names (foo:name stays foo:name);
    --xmlns 1 (default) strips prefixes."""
    binary = _binary()
    cfg = default_config(ignore_xmlns=not honor)
    failures = _compare(
        binary,
        os.path.join(TEST_DOCS, "xmlns.xml"),
        "XML",
        cfg,
        ("--xmlns", "0" if honor else "1"),
    )
    assert not failures, failures


def test_typed_properties_tconf_live_parity(tmp_path):
    """bindings/perl/t/t.conf: typed (int/date), verbatim, max+sort and
    ignore_case property declarations over a doc exercising each."""
    binary = _binary()
    doc = tmp_path / "tconf_doc.xml"
    doc.write_text(
        "<?xml version=\"1.0\"?>\n"
        "<doc>\n"
        " <title>Typed Property Doc</title>\n"
        " <someNum> 42 </someNum>\n"
        " <SoMeCaSe>Mixed CASE Value</SoMeCaSe>\n"
        " <soMeOTHERCaSe>other Case VALUE</soMeOTHERCaSe>\n"
        " <dAte>2004-01-17</dAte>\n"
        " <propWithNewlines>line one\nline two\n\nline four</propWithNewlines>\n"
        " <fooname>zebra apple</fooname>\n"
        " plain body words here\n"
        "</doc>\n"
    )
    failures = _compare(
        binary, str(doc), "XML", _load_conf(PERL_T_CONF), ("--config", PERL_T_CONF)
    )
    assert not failures, failures


def test_xml_events_attr_visibility_rules():
    """Unit pin of the two SAX2 atts rules (no binary needed):
    namespace declarations never reach attrs (they ride the nsdecls
    slot), and attrs truncate at the first empty-valued one."""
    evs = list(
        xml_events('<x xmlns:xi="http://u" a="1" b="" c="2"><y xmlns="d"/></x>')
    )
    x = evs[0]
    assert x[0] == "start" and x[1] == "x"
    assert x[2] == [("a", "1")]  # b="" hides itself and c
    assert x[5] == [("xi", "http://u")]
    y = evs[1]
    assert y[2] == [] and y[5] == []  # default xmlns: filtered, unbound


def test_fuzz_corpus_config_variant_parity(tmp_path):
    """Seeded fuzz docs (the generator from the fuzz-parity module)
    compared under the undefined-tags policy configs AND the perl
    typed-property config — the construct classes the fixture corpus
    sweep can't reach (DOCTYPEs, bogus markup, rawtext, attribute
    shapes) interacting with attr-metaname minting and noindex resets.
    Reference crashes (the auto-policy double free, a reference bug)
    are skipped: survival parity only there."""
    import random

    from test_reference_live_fuzz_parity import gen_html_doc, gen_xml_doc

    binary = _binary()
    variants = [
        (None, os.path.join(TEST_CONFIGS, "undeftags-auto.conf")),
        (None, os.path.join(TEST_CONFIGS, "undeftags-index.conf")),
        (None, os.path.join(TEST_CONFIGS, "undeftags-ignore.conf")),
        (None, PERL_T_CONF),
        (None, os.path.join(TEST_CONFIGS, "dom.conf")),
        (
            default_config(cascade_meta_context=True),
            ("--CascadeMetaContext", "1"),
        ),
        (default_config(ignore_xmlns=False), ("--xmlns", "0")),
    ]
    rng = random.Random(20240817)
    failures, checked = [], 0
    for i in range(12):
        for kind, parser, gen in (
            ("xml", "XML", gen_xml_doc),
            ("html", "HTML", gen_html_doc),
        ):
            p = tmp_path / f"cfuzz{i}.{kind}"
            p.write_text(gen(rng))
            for cfg, conf_or_extra in variants:
                if cfg is None:
                    extra = ("--config", conf_or_extra)
                    cfg_obj = _load_conf(conf_or_extra)
                else:
                    extra = conf_or_extra
                    cfg_obj = cfg
                r = subprocess.run(
                    [binary, "--tokenize", "1", *extra, "--xinclude", "0", str(p)],
                    capture_output=True,
                    env=_ENV,
                )
                if r.returncode != 0:
                    continue  # reference double-free: skip
                failures += _compare(binary, str(p), parser, cfg_obj, extra)
                checked += 1
    assert checked >= 50
    assert not failures, "config-variant fuzz divergence:\n" + "\n".join(
        failures[:10]
    )
