"""From-scratch HTML main-content extractor (stdlib ``html.parser`` only —
lxml/bs4/trafilatura are absent in this container, SURVEY.md §7).

Implements the north_star's "text-density and link-density boilerplate
scoring (Boilerpipe/trafilatura-style heuristics over a node-feature table)":
the tokenizer lowers a page to a flat block-feature list (tag class, text
length, link-char length, container context), then a scoring pass drops
boilerplate blocks (chrome containers, link-dense short blocks).

Chunk-tag vocabulary deliberately mirrors the reference's llmsherpa tags
("header", "para", "list_item", "table", "table_row") so the ordered
substring tag→ChunkType map (/root/reference/src/ingest.py:32-39,118-124)
is applied verbatim downstream (operators/chunk_types.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

# HTML tag → llmsherpa-style chunk tag
_BLOCK_TAGS: dict[str, str] = {
    "h1": "header", "h2": "header", "h3": "header",
    "h4": "header", "h5": "header", "h6": "header",
    "p": "para",
    "li": "list_item",
    "tr": "table_row",
    "caption": "table",
    "blockquote": "para",
    "pre": "para",
    "title": None,  # metadata only; never content
}

# containers whose whole subtree is page chrome
_CHROME = {"nav", "header", "footer", "aside", "script", "style", "head"}

LINK_DENSITY_MAX = 0.4  # blocks above this (and short) are boilerplate
LINK_DENSE_MIN_WORDS = 25  # long blocks survive even if link-dense


@dataclass
class HtmlBlock:
    """One row of the node-feature table."""

    tag: str  # llmsherpa-style: header/para/list_item/table/table_row
    level: int | None  # header level (h1→1 …), else None
    text: str
    link_chars: int = 0
    total_chars: int = 0
    in_chrome: bool = False

    @property
    def link_density(self) -> float:
        return self.link_chars / self.total_chars if self.total_chars else 0.0

    @property
    def word_count(self) -> int:
        return len(self.text.split())


class _BlockParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[HtmlBlock] = []
        self._chrome_depth = 0
        self._link_depth = 0
        self._cur: HtmlBlock | None = None
        self._buf: list[str] = []
        self._link_buf_chars = 0

    def _flush(self) -> None:
        if self._cur is None:
            return
        text = "".join(self._buf)
        self._cur.text = " ".join(text.split())
        self._cur.total_chars = len(self._cur.text)
        self._cur.link_chars = min(self._link_buf_chars, self._cur.total_chars)
        if self._cur.text:
            self.blocks.append(self._cur)
        self._cur = None
        self._buf = []
        self._link_buf_chars = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _CHROME:
            self._chrome_depth += 1
        if tag == "a":
            self._link_depth += 1
        if tag in ("td", "th", "br") and self._cur is not None:
            self._buf.append(" ")  # cell/line separators inside a block
        if tag in _BLOCK_TAGS and _BLOCK_TAGS[tag] is not None:
            self._flush()
            level = int(tag[1]) if tag[0] == "h" and tag[1].isdigit() else None
            self._cur = HtmlBlock(
                tag=_BLOCK_TAGS[tag],
                level=level,
                text="",
                in_chrome=self._chrome_depth > 0,
            )

    def handle_endtag(self, tag: str) -> None:
        if tag in _CHROME and self._chrome_depth > 0:
            self._chrome_depth -= 1
        if tag == "a" and self._link_depth > 0:
            self._link_depth -= 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._cur is not None:
            self._buf.append(data)
            if self._link_depth > 0:
                self._link_buf_chars += len(" ".join(data.split()))


def parse_html_blocks(html: str) -> list[HtmlBlock]:
    """Tokenize a page into the flat block-feature table (document order)."""
    p = _BlockParser()
    p.feed(html)
    p._flush()
    return p.blocks


def is_boilerplate(b: HtmlBlock) -> bool:
    """Link/structure-based boilerplate verdict for one block."""
    if b.in_chrome:
        return True
    if b.link_density > LINK_DENSITY_MAX and b.word_count < LINK_DENSE_MIN_WORDS:
        return True
    return False


def extract_main_blocks(html: str) -> list[HtmlBlock]:
    """Main-content blocks in document order (boilerplate dropped)."""
    return [b for b in parse_html_blocks(html) if not is_boilerplate(b)]
