"""Property-based tests (hypothesis): the extractors never crash on
arbitrary input, determinism holds, and the pinned reference rules match an
independent brute-force restatement on random inputs."""

from collections import Counter

from hypothesis import given, settings, strategies as st

from pdf_parser_benchmark_spark.canonical import canonical_json
from pdf_parser_benchmark_spark.extract.assemble import (
    boilerplate_lines,
    extract_document_json,
    strip_boilerplate_text,
)
from pdf_parser_benchmark_spark.extract.html_extractor import parse_html_blocks
from pdf_parser_benchmark_spark.extract.pdf_parser import parse_pdf
from pdf_parser_benchmark_spark.synth.pdf_writer import (
    F2_CMAP,
    build_pdf,
    lines_page,
)

line_text = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\n\r\x00"),
    max_size=120,
)


@given(st.lists(st.lists(line_text, max_size=8), min_size=1, max_size=12))
@settings(max_examples=60, deadline=None)
def test_boilerplate_rule_matches_bruteforce(pages_lines):
    """Operator rule == independent restatement of CLAUDE.md:195-211."""
    pages = ["\n".join(lines) for lines in pages_lines]
    got = boilerplate_lines(pages)
    counts = Counter(
        ln.strip() for t in pages for ln in t.splitlines() if ln.strip()
    )
    expected = {
        ln for ln, c in counts.items() if c > len(pages) * 0.4 and len(ln) < 100
    }
    assert got == expected
    for t in pages:
        clean = strip_boilerplate_text(t, got)
        assert all(ln.strip() not in got for ln in clean.splitlines())


@given(st.text(max_size=400))
@settings(max_examples=60, deadline=None)
def test_html_extractor_never_crashes(raw):
    blocks = parse_html_blocks(raw)
    assert all(b.text for b in blocks)


@given(st.binary(max_size=400))
@settings(max_examples=60, deadline=None)
def test_extract_document_total_on_garbage(payload):
    """Any byte string produces a canonical record or a caught error path —
    here: direct call must not crash on non-PDF garbage (PDF-magic inputs
    may raise; the pipeline catches those per row)."""
    if payload[:5] == b"%PDF-":
        return
    out = extract_document_json("https://h.example/x", payload)
    assert out.endswith("\n")


_f2_chars = st.sampled_from(sorted(set(F2_CMAP.values()) - set("\\()\n\r\t")))
_f1_chars = st.characters(codec="ascii", min_codepoint=0x20, max_codepoint=0x7E)


def _pdf_line(chars):
    return st.text(alphabet=chars, min_size=1, max_size=60).map(str.strip).filter(bool)


@given(st.booleans(), st.booleans(), st.booleans(), st.data())
@settings(max_examples=40, deadline=None)
def test_pdf_writer_parser_roundtrip_random_text(compress, tj, f2, data):
    # F1 (Helvetica/StandardEncoding) carries ASCII; F2's CMap also carries
    # the mapped non-ASCII codepoints
    lines = data.draw(
        st.lists(_pdf_line(_f2_chars if f2 else _f1_chars), min_size=1, max_size=6)
    )
    pdf = build_pdf(
        [lines_page(lines, compress=compress, use_tj_array=tj,
                    font="F2" if f2 else "F1")]
    )
    page = parse_pdf(pdf)[0]
    got_lines = [ln for b in page.blocks for ln in b.lines]
    assert got_lines == lines


@given(st.recursive(
    st.none() | st.booleans() | st.integers(-10**9, 10**9) | st.text(max_size=20),
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(st.text(max_size=8), children, max_size=4),
    max_leaves=20,
))
@settings(max_examples=60, deadline=None)
def test_canonical_json_stable_and_parseable(obj):
    import json

    a = canonical_json(obj)
    assert a == canonical_json(obj)
    assert json.loads(a) == obj
