"""Differential tests: the fast regex tokenizer must produce IDENTICAL
block-feature tables to the stdlib html.parser path (which defines the
semantics), across the synthetic corpus and generated HTML shapes."""

from hypothesis import given, settings, strategies as st

from pdf_parser_benchmark_spark.extract.html_extractor import (
    parse_html_blocks_fast,
    parse_html_blocks_stdlib,
)
from pdf_parser_benchmark_spark.synth.pages import gen_row, is_pdf_row


def _sig(blocks):
    return [
        (b.tag, b.level, b.text, b.cells, b.link_chars, b.total_chars,
         b.in_chrome)
        for b in blocks
    ]


def test_identical_on_corpus_sample():
    checked = 0
    i = 0
    while checked < 400:
        if not is_pdf_row(i):
            t = gen_row(i)["html"].decode("utf-8")
            assert _sig(parse_html_blocks_fast(t)) == _sig(
                parse_html_blocks_stdlib(t)
            ), f"mismatch at row {i}"
            checked += 1
        i += 1


_tags = st.sampled_from(
    ["p", "h1", "h2", "li", "tr", "td", "br", "a", "div", "nav", "footer",
     "main", "table", "blockquote", "span", "script", "style"]
)
_words = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="<>&\x00"),
    max_size=20,
)
_entity = st.sampled_from(["&amp;", "&lt;", "&gt;", "&#169;", "&copy;", "&nbsp;"])


@st.composite
def html_doc(draw):
    parts = []
    for _ in range(draw(st.integers(1, 25))):
        kind = draw(st.integers(0, 7))
        if kind == 0:
            parts.append(f"<{draw(_tags)}>")
        elif kind == 1:
            parts.append(f"</{draw(_tags)}>")
        elif kind == 2:
            parts.append(draw(_words))
        elif kind == 3:
            parts.append(draw(_entity))
        elif kind == 4:
            parts.append(f"<{draw(_tags)} class='x' id=\"y\">")
        elif kind == 6:
            m = draw(st.sampled_from(["img", "source", "video", "audio", "a"]))
            a = draw(st.sampled_from(
                ['src="/x.png"', 'srcset="/a.webp 1x, /b.webp 2x"',
                 'srcset="/only.avif"', "src", 'src=""',
                 'href="/l1"', "href=''", "href"]
            ))
            parts.append(f"<{m} {a}>")
        elif kind == 5:
            span = draw(st.sampled_from(
                ['colspan="2"', "rowspan='3'", "colspan=2", 'colspan="x"',
                 "rowspan", 'colspan="0" rowspan="2"']
            ))
            parts.append(f"<{draw(st.sampled_from(['td', 'th']))} {span}>")
        else:
            parts.append(f"<{draw(_tags)}/>")
    return "".join(parts)


@given(html_doc())
@settings(max_examples=150, deadline=None)
def test_identical_on_generated_html(doc):
    assert _sig(parse_html_blocks_fast(doc)) == _sig(parse_html_blocks_stdlib(doc))


def _media_both_paths(doc):
    from pdf_parser_benchmark_spark.extract.html_extractor import (
        _BlockParser,
        _drive_fast,
    )

    pf = _BlockParser()
    _drive_fast(doc, pf)
    ps = _BlockParser()
    ps.feed(doc)
    ps.close()
    return pf.media, ps.media


@given(html_doc())
@settings(max_examples=100, deadline=None)
def test_media_refs_identical_on_generated_html(doc):
    fast, std = _media_both_paths(doc)
    assert fast == std


@given(html_doc())
@settings(max_examples=100, deadline=None)
def test_links_identical_on_generated_html(doc):
    from pdf_parser_benchmark_spark.extract.html_extractor import (
        _BlockParser,
        _drive_fast,
    )

    pf = _BlockParser()
    _drive_fast(doc, pf)
    ps = _BlockParser()
    ps.feed(doc)
    ps.close()
    assert pf.links == ps.links


@given(st.text(max_size=300))
@settings(max_examples=80, deadline=None)
def test_fast_path_never_crashes_via_fallback(raw):
    from pdf_parser_benchmark_spark.extract.html_extractor import parse_html_blocks

    blocks = parse_html_blocks(raw)
    assert all(b.text for b in blocks)


def test_identical_under_corpus_mutations():
    """Mutation fuzz: take real corpus pages, apply byte-level mutations
    (truncate, splice, bit-flip inside tags, delete closers) — the fast
    tokenizer must stay differentially identical to the stdlib parser and
    neither may raise."""
    import random

    from pdf_parser_benchmark_spark.extract.html_extractor import (
        parse_html_blocks_fast,
        parse_html_blocks_stdlib,
    )
    from pdf_parser_benchmark_spark.synth.pages import gen_row, is_pdf_row

    rng = random.Random(11)
    pages = [
        gen_row(i)["html"].decode("utf-8")
        for i in range(80)
        if not is_pdf_row(i)
    ][:40]

    def mutate(s: str) -> str:
        ops = rng.sample(range(5), k=rng.randint(1, 3))
        for op in ops:
            if not s:
                break
            if op == 0:  # truncate mid-document (possibly mid-tag)
                s = s[: rng.randrange(1, len(s))]
            elif op == 1:  # delete a closing tag
                s = s.replace("</p>", "", 1) if "</p>" in s else s
            elif op == 2:  # splice a fragment from elsewhere
                i, j = sorted(rng.randrange(len(s)) for _ in range(2))
                s = s[:i] + s[j:] + s[i:j]
            elif op == 3:  # corrupt a random char
                i = rng.randrange(len(s))
                s = s[:i] + rng.choice("<>&\"'x") + s[i + 1 :]
            else:  # duplicate an opener (unbalanced nesting)
                s = s.replace("<div>", "<div><div>", 1) if "<div>" in s else s
        return s

    for page in pages:
        for _ in range(5):
            doc = mutate(page)
            a = [(b.tag, b.text, b.cells, b.path) for b in parse_html_blocks_stdlib(doc)]
            c = [(b.tag, b.text, b.cells, b.path) for b in parse_html_blocks_fast(doc)]
            assert a == c, doc[:200]


# --- curated hostile-HTML fixture set (VERDICT r4 item 8) -------------------
# The mutation fuzzer is generative; these are the named pathological
# constructs real crawls serve constantly. Both tokenizer paths must agree
# exactly, and the full extractor must come back with something.

import os as _os

import pytest as _pytest

_HOSTILE_DIR = _os.path.join(_os.path.dirname(__file__), "fixtures", "hostile_html")
_HOSTILE = sorted(
    f for f in _os.listdir(_HOSTILE_DIR) if f.endswith(".html")
)


@_pytest.mark.parametrize("name", _HOSTILE)
def test_hostile_fixture_tokenizers_identical(name):
    html = open(_os.path.join(_HOSTILE_DIR, name), encoding="utf-8").read()
    assert _sig(parse_html_blocks_fast(html)) == _sig(
        parse_html_blocks_stdlib(html)
    ), name


@_pytest.mark.parametrize("name", _HOSTILE)
def test_hostile_fixture_full_extractor_survives(name):
    from pdf_parser_benchmark_spark.extract.html_extractor import (
        extract_links,
        extract_main_blocks,
        extract_media_refs,
        robots_noindex,
    )

    html = open(_os.path.join(_HOSTILE_DIR, name), encoding="utf-8").read()
    blocks = extract_main_blocks(html)
    assert isinstance(blocks, list)
    extract_links(html), extract_media_refs(html), robots_noindex(html)


def test_hostile_ten_megabyte_single_line_page():
    """10 MB on ONE line (no newline anywhere): both paths identical and
    neither blows up on the pathological no-line-break shape. Built in-test
    so the repo doesn't carry a 10 MB fixture."""
    cell = "<td>cell text <a href='/x'>ln</a></td>"
    row = "<tr>" + cell * 8 + "</tr>"
    para = "<p>filler paragraph with some words in it and a <b>bold</b> run</p>"
    unit = para + "<table>" + row * 4 + "</table>"
    body = unit * (10_000_000 // len(unit) + 1)
    html = "<html><body>" + body + "</body></html>"
    assert len(html) > 10_000_000 and "\n" not in html
    assert _sig(parse_html_blocks_fast(html)) == _sig(
        parse_html_blocks_stdlib(html)
    )


def test_hostile_megabyte_attribute_value():
    """A 1 MB unquoted-ish attribute value must not stall the tokenizer or
    desync the two paths."""
    html = (
        '<html><body><a href="/l" title="' + "t" * 1_000_000
        + '">anchor</a><p>after</p></body></html>'
    )
    assert _sig(parse_html_blocks_fast(html)) == _sig(
        parse_html_blocks_stdlib(html)
    )
