"""Structural-mutation fuzzing: corrupted PDFs must fail fast (raise or
return partial) — never hang or corrupt state. The pipeline catches raises
per row (plans/pipeline.py); here we pin that parse_pdf itself is total
enough under byte mutations."""

from hypothesis import given, settings, strategies as st

from pdf_parser_benchmark_spark.extract.pdf_parser import parse_pdf
from pdf_parser_benchmark_spark.synth.pdf_writer import build_pdf, lines_page

BASE = build_pdf(
    [
        lines_page(["alpha bravo", "charlie delta"], header="HDR", heading="H1"),
        lines_page(["rotated"], rotate=90),
    ]
)


@given(
    st.lists(
        st.tuples(st.integers(0, len(BASE) - 1), st.integers(0, 255)),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=120, deadline=None)
def test_mutated_pdf_never_hangs(mutations):
    data = bytearray(BASE)
    for pos, val in mutations:
        data[pos] = val
    try:
        pages = parse_pdf(bytes(data))
        assert isinstance(pages, list)
    except Exception:
        pass  # raising is fine — the pipeline isolates it per row


@given(st.integers(10, len(BASE)))
@settings(max_examples=60, deadline=None)
def test_truncated_pdf_never_hangs(cut):
    try:
        parse_pdf(BASE[:cut])
    except Exception:
        pass
