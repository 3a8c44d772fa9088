"""HTML block tokenizer + boilerplate scoring (north_star: text-density /
link-density heuristics over a node-feature table)."""

from pdf_parser_benchmark_spark.extract.html_extractor import (
    extract_main_blocks,
    is_boilerplate,
    parse_html_blocks,
)


PAGE = """
<html><head><title>T</title></head><body>
<header><p>site chrome top</p></header>
<nav><ul><li><a href="/a">nav one</a></li><li><a href="/b">nav two</a></li></ul></nav>
<main>
  <h1>Main Title</h1>
  <h2>Section One</h2>
  <p>A real paragraph with plenty of prose content inside it.</p>
  <p><a href="/x">link</a> <a href="/y">list</a> <a href="/z">of links</a></p>
  <p>   </p>
  <ul><li>item one</li><li>item two</li></ul>
  <table><tr><td>cell a</td><td>cell b</td></tr></table>
</main>
<aside><p><a href="/sub">subscribe now</a></p></aside>
<footer><p>© footer legal line</p></footer>
</body></html>
"""


def test_chrome_blocks_flagged():
    blocks = parse_html_blocks(PAGE)
    chrome = [b.text for b in blocks if b.in_chrome]
    assert "site chrome top" in chrome
    assert "© footer legal line" in chrome
    assert any("nav one" in t for t in chrome)


def test_link_density_drops_link_list_keeps_prose():
    blocks = {b.text: b for b in parse_html_blocks(PAGE)}
    linky = blocks["link list of links"]
    prose = blocks["A real paragraph with plenty of prose content inside it."]
    assert is_boilerplate(linky)
    assert not is_boilerplate(prose)


def test_main_blocks_order_tags_levels():
    main = extract_main_blocks(PAGE)
    got = [(b.tag, b.level, b.text) for b in main]
    assert got == [
        ("header", 1, "Main Title"),
        ("header", 2, "Section One"),
        ("para", None, "A real paragraph with plenty of prose content inside it."),
        ("list_item", None, "item one"),
        ("list_item", None, "item two"),
        ("table_row", None, "cell a | cell b"),
    ]


def test_long_link_dense_block_survives():
    words = " ".join(f"word{i}" for i in range(30))
    html = f'<main><p><a href="/x">{words}</a></p></main>'
    blocks = parse_html_blocks(html)
    assert not is_boilerplate(blocks[0])  # ≥25 words: keep despite links


def test_whitespace_only_block_never_emitted():
    blocks = parse_html_blocks("<p>   </p><p>real</p>")
    assert [b.text for b in blocks] == ["real"]


def test_table_cell_reconstruction():
    """Table rows carry reconstructed cell tuples; text joins cells ' | '."""
    from pdf_parser_benchmark_spark.extract.html_extractor import extract_main_blocks

    html = ("<main><table><caption>Stats</caption>"
            "<tr><th>Name</th><th>Score</th></tr>"
            "<tr><td>alpha beta</td><td>42</td></tr></table></main>")
    blocks = extract_main_blocks(html)
    assert [(b.tag, b.text) for b in blocks] == [
        ("table", "Stats"),
        ("table_row", "Name | Score"),
        ("table_row", "alpha beta | 42"),
    ]
    assert blocks[1].cells == ("Name", "Score")
    assert blocks[2].cells == ("alpha beta", "42")


def test_colspan_rowspan_grid_expansion():
    """Cell geometry (VERDICT r2 item 5): colspan duplicates the cell text
    across its columns; rowspan carries it down into subsequent rows at the
    same column position (pandas.read_html-style grid expansion)."""
    from pdf_parser_benchmark_spark.extract.html_extractor import (
        parse_html_blocks_fast,
        parse_html_blocks_stdlib,
    )

    html = ("<table>"
            '<tr><th colspan="2">Wide</th><th>S</th></tr>'
            '<tr><td rowspan="2">L</td><td>a1</td><td>a2</td></tr>'
            "<tr><td>b1</td><td>b2</td></tr>"
            "<tr><td>c0</td><td>c1</td><td>c2</td></tr></table>")
    for parse in (parse_html_blocks_stdlib, parse_html_blocks_fast):
        rows = [b.cells for b in parse(html) if b.tag == "table_row"]
        assert rows == [
            ("Wide", "Wide", "S"),
            ("L", "a1", "a2"),
            ("L", "b1", "b2"),  # rowspan carried down
            ("c0", "c1", "c2"),  # carry expired after 2 rows
        ]


def test_colspan_run_crossing_rowspan_carry_keeps_carry():
    """ADVICE r3: a colspan run that crosses a column occupied by a pending
    rowspan carry must emit the carried cell inside the run, not drop it."""
    from pdf_parser_benchmark_spark.extract.html_extractor import (
        parse_html_blocks_fast,
        parse_html_blocks_stdlib,
    )

    html = ("<table>"
            '<tr><td>x</td><td rowspan="2">A</td><td>y</td></tr>'
            '<tr><td colspan="3">E</td></tr></table>')
    for parse in (parse_html_blocks_stdlib, parse_html_blocks_fast):
        rows = [b.cells for b in parse(html) if b.tag == "table_row"]
        assert rows == [
            ("x", "A", "y"),
            ("E", "A", "E", "E"),  # carry consumed mid-run, not aged away
        ]


def test_rowspan_zero_and_junk_spans_tolerated():
    from pdf_parser_benchmark_spark.extract.html_extractor import parse_html_blocks

    html = ('<table><tr><td rowspan="0">x</td><td colspan="nope">y</td></tr>'
            "<tr><td>z</td></tr></table>")
    rows = [b.cells for b in parse_html_blocks(html) if b.tag == "table_row"]
    assert rows == [("x", "y"), ("z",)]


def test_nested_table_emits_inner_rows_and_resumes_outer():
    """A table nested in a cell emits its rows as their own blocks (document
    order: inner first), and the OUTER row keeps its remaining cells — the
    round-2 flattening bug lost everything after the nested table."""
    from pdf_parser_benchmark_spark.extract.html_extractor import (
        parse_html_blocks_fast,
        parse_html_blocks_stdlib,
    )

    html = ("<table><tr><td>o1</td>"
            "<td><table><tr><td>i1</td><td>i2</td></tr>"
            "<tr><td>i3</td><td>i4</td></tr></table> after</td>"
            "<td>o3</td></tr></table>")
    for parse in (parse_html_blocks_stdlib, parse_html_blocks_fast):
        rows = [b.cells for b in parse(html) if b.tag == "table_row"]
        assert rows == [("i1", "i2"), ("i3", "i4"), ("o1", "after", "o3")]


def test_nested_table_rowspan_state_is_per_table():
    from pdf_parser_benchmark_spark.extract.html_extractor import parse_html_blocks

    html = ('<table><tr><td rowspan="2">O</td><td>'
            '<table><tr><td rowspan="2">I</td><td>x</td></tr>'
            "<tr><td>y</td></tr></table>"
            "</td></tr><tr><td>z</td></tr></table>")
    rows = [b.cells for b in parse_html_blocks(html) if b.tag == "table_row"]
    assert rows == [("I", "x"), ("I", "y"), ("O",), ("O", "z")]


def test_subtree_scoring_drops_related_box_header():
    """The non-linky header inside a link-dominated container is dropped by
    DOM-subtree density scoring (the per-block rule alone can't see it)."""
    from pdf_parser_benchmark_spark.extract.html_extractor import (
        extract_main_blocks,
        is_boilerplate,
        parse_html_blocks,
    )

    html = ("<main><p>A long paragraph with plenty of ordinary words to stay "
            "above every single threshold used for link density here.</p>"
            "<div><h2>Related Posts</h2><ul>"
            "<li><a href=/r1>first related link</a></li>"
            "<li><a href=/r2>second related link</a></li>"
            "<li><a href=/r3>third related link</a></li></ul></div></main>")
    all_blocks = parse_html_blocks(html)
    header = next(b for b in all_blocks if b.tag == "header")
    assert not is_boilerplate(header)  # per-block rule keeps it...
    texts = [b.text for b in extract_main_blocks(html)]
    assert "Related Posts" not in texts  # ...subtree scoring drops it
    assert any("long paragraph" in t for t in texts)


def test_subtree_scoring_spares_content_with_long_block():
    """A container holding one substantial block survives even when links
    dominate its character count."""
    from pdf_parser_benchmark_spark.extract.html_extractor import extract_main_blocks

    long_para = ("word " * 30).strip()
    html = (f"<main><div><p>{long_para}</p>"
            "<p><a href=/x>a link of moderate length here</a></p></div></main>")
    texts = [b.text for b in extract_main_blocks(html)]
    assert long_para in texts


def test_colgroup_col_widths_attach_to_rows():
    """<colgroup>/<col> widths (attribute, span expansion, style width,
    colgroup-level width with the omitted end tag real pages use) land on
    every table_row block; nested tables keep their own width lists."""
    from pdf_parser_benchmark_spark.extract.html_extractor import (
        parse_html_blocks_fast,
        parse_html_blocks_stdlib,
    )

    html = (
        '<table><colgroup><col width="100">'
        '<col span="2" style="width: 20%"></colgroup>'
        "<tr><td>a</td><td>b</td><td>c</td></tr>"
        '<tr><td>d<table><col width="7"><tr><td>in</td></tr></table>'
        "</td><td>e</td><td>f</td></tr></table>"
        '<table><colgroup span="2" width="50"><tr><td>g</td><td>h</td></tr>'
        "</table>"
    )
    blocks = parse_html_blocks_stdlib(html)
    assert blocks == parse_html_blocks_fast(html)
    widths = [b.col_widths for b in blocks if b.tag == "table_row"]
    assert widths == [
        ("100", "20%", "20%"),
        ("7",),  # the nested table's own single column
        ("100", "20%", "20%"),
        ("50", "50"),
    ]


def test_no_colgroup_leaves_col_widths_empty():
    from pdf_parser_benchmark_spark.extract.html_extractor import (
        parse_html_blocks_stdlib,
    )

    blocks = parse_html_blocks_stdlib("<table><tr><td>a</td></tr></table>")
    (row,) = [b for b in blocks if b.tag == "table_row"]
    assert row.col_widths == ()
