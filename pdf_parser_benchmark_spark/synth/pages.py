"""Deterministic generator for the input `pages` table
(url, warc_ts, html:binary, text, lang — BASELINE.json input_hint).

Every column is a pure function of (row_id, seed) via splitmix64 mixing, so
generation distributes over executors with `spark.range(n) → mapInPandas`
and is invariant to partitioning — the same row_id always yields the same
bytes at any scale and any parallelism (required for the N-vs-4N scaling
benchmark to compare identical inputs).

Skew is built in on purpose: host 0 holds ~20% of rows (FIXTURES.md §F1),
so the pipeline's host-salting / AQE skew handling has something real to do.
~10% of rows carry synthetic PDF bytes in the binary column (magic `%PDF-`
routes them — the reference's landscape/two-path routing analog,
/root/reference/src/ingest.py:150-207).
"""

from __future__ import annotations

import datetime as _dt
from typing import Iterator

from .pdf_writer import build_pdf, lines_page, two_column_page

SEED = 42
EPOCH = _dt.datetime(2026, 1, 1, 0, 0, 0)

_VOCAB = (
    "learning community data teacher practice assessment growth inquiry "
    "collaboration evidence standards rubric feedback reflection goal team "
    "culture leadership intervention curriculum literacy numeracy equity "
    "coaching model cycle result plan action review support system change"
).split()

_LANGS = ("en", "en", "en", "en", "en", "en", "de", "es", "fr", "en")


def _mix(*parts: int) -> int:
    """splitmix64-style stateless mixer (public-domain algorithm)."""
    x = (SEED * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    for p in parts:
        x = (x + p * 0xBF58476D1CE4E5B9 + 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 31
        x = (x * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 29
    return x


def _words(row_id: int, salt: int, n: int) -> str:
    return " ".join(
        _VOCAB[_mix(row_id, salt, i) % len(_VOCAB)] for i in range(n)
    )


def _sentence(row_id: int, salt: int) -> str:
    n = 6 + _mix(row_id, salt, 99) % 10
    s = _words(row_id, salt, n)
    return s[0].upper() + s[1:] + "."


def host_of(row_id: int) -> str:
    """Zipf-ish host assignment: host0 ≈ 20%, host1 ≈ 8%, long tail."""
    r = _mix(row_id, 1) % 100
    if r < 20:
        return "host0"
    if r < 28:
        return "host1"
    if r < 34:
        return "host2"
    return f"host{3 + _mix(row_id, 2) % 47}"


def is_pdf_row(row_id: int) -> bool:
    return _mix(row_id, 3) % 10 == 7


def lang_of(row_id: int) -> str:
    return _LANGS[_mix(row_id, 4) % len(_LANGS)]


# ---------------------------------------------------------------------------
# HTML pages (templates per FIXTURES.md §F1)
# ---------------------------------------------------------------------------


def _html_page(row_id: int) -> tuple[bytes, str]:
    """Returns (html_bytes, raw_text_layer)."""
    title = _words(row_id, 10, 4).title()
    h = host_of(row_id)
    nav_links = "".join(
        f'<li><a href="/cat{i}">{_words(row_id, 20 + i, 2)}</a></li>' for i in range(6)
    )
    paras = []
    n_sections = 1 + _mix(row_id, 5) % 3
    body_texts: list[str] = [title]
    for s in range(n_sections):
        sec_title = _words(row_id, 30 + s, 3).title()
        body_texts.append(sec_title)
        paras.append(f"<h2>{sec_title}</h2>")
        for p in range(2 + _mix(row_id, 6, s) % 3):
            sent = " ".join(_sentence(row_id, 100 + 10 * s + p + k) for k in range(3))
            body_texts.append(sent)
            paras.append(f"<p>{sent}</p>")
    # some rows carry a reproducible marker (regex fixture, ingest.py:66-69)
    if _mix(row_id, 7) % 5 == 0:
        rid = f"{1 + _mix(row_id, 8) % 9}.{1 + _mix(row_id, 9) % 9}"
        sent = f"See Reproducible {rid} for the team worksheet."
        body_texts.append(sent)
        paras.append(f"<p>{sent}</p>")
    # whitespace-only block (empty filter fixture, ingest.py:180-183)
    paras.append("<p>   </p>")
    # link-dense related block inside main (must be dropped by link density)
    related = " ".join(
        f'<a href="/r{i}">{_words(row_id, 40 + i, 3)}</a>' for i in range(5)
    )
    html = (
        "<html><head><title>{t}</title></head><body>"
        '<header><p>{host} weekly digest</p></header>'
        "<nav><ul>{nav}</ul></nav>"
        "<main><h1>{t}</h1>{paras}<p>{related}</p></main>"
        '<aside><p><a href="/sub">subscribe</a> <a href="/rss">rss</a></p></aside>'
        "<footer><p>© {host} all rights reserved</p></footer>"
        "</body></html>"
    ).format(t=title, host=h, nav=nav_links, paras="".join(paras), related=related)
    return html.encode("utf-8"), "\n".join(body_texts)


# ---------------------------------------------------------------------------
# PDF documents
# ---------------------------------------------------------------------------


def _pdf_doc(row_id: int) -> tuple[bytes, str]:
    n_pages = 4 + _mix(row_id, 50) % 5  # 4..8
    header = f"Handbook h{row_id % 1000} — {_words(row_id, 51, 2)}"[:80]
    footer = f"page footer {row_id % 100}"
    pages = []
    text_lines: list[str] = []
    rotated_idx = _mix(row_id, 52) % n_pages if _mix(row_id, 53) % 3 == 0 else -1
    twocol_idx = _mix(row_id, 54) % n_pages if _mix(row_id, 55) % 4 == 0 else -1
    for p in range(n_pages):
        if p == rotated_idx:
            rid = f"{1 + _mix(row_id, 56) % 9}.{1 + _mix(row_id, 57) % 9}"
            lines = [f"Reproducible {rid}", _sentence(row_id, 200 + p)]
            pages.append(lines_page(lines, rotate=90 if _mix(row_id, 58) % 2 else 270))
            text_lines.extend(lines)
            continue
        if p == twocol_idx and p != rotated_idx:
            left = [_sentence(row_id, 300 + p * 10 + i)[:40] for i in range(3)]
            right = [_sentence(row_id, 400 + p * 10 + i)[:40] for i in range(3)]
            pages.append(two_column_page(left, right, header=header))
            text_lines.extend(left + right)
            continue
        heading = None
        if p % 2 == 0:
            heading = f"Chapter {p // 2 + 1} {_words(row_id, 60 + p, 2).title()}"
            text_lines.append(heading)
        body = [_sentence(row_id, 500 + p * 10 + i)[:90] for i in range(4)]
        text_lines.extend(body)
        pages.append(
            lines_page(
                body,
                header=header,
                footer=footer,
                heading=heading,
                use_tj_array=(p % 3 == 1),
                font="F2" if _mix(row_id, 61, p) % 4 == 0 else "F1",
            )
        )
    return build_pdf(pages), "\n".join(text_lines)


# ---------------------------------------------------------------------------
# row + DataFrame assembly
# ---------------------------------------------------------------------------

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def gen_row(row_id: int) -> dict:
    pdf = is_pdf_row(row_id)
    payload, raw_text = _pdf_doc(row_id) if pdf else _html_page(row_id)
    ext = "pdf" if pdf else "html"
    return {
        "url": f"https://{host_of(row_id)}.example/p/{row_id:08d}.{ext}",
        "warc_ts": EPOCH + _dt.timedelta(seconds=row_id),
        "html": payload,
        "text": raw_text if _mix(row_id, 70) % 4 else None,
        "lang": lang_of(row_id),
    }


def generate_pages_df(spark, n_rows: int, partitions: int | None = None):
    """Distributed deterministic generation: spark.range → mapInPandas."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            rows = [gen_row(int(i)) for i in b["id"]]
            yield pd.DataFrame(rows)

    rng = spark.range(0, n_rows, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, schema=PAGES_SCHEMA)


def generate_pages_local(n_rows: int) -> list[dict]:
    """Driver-side tiny corpora for pytest fixtures."""
    return [gen_row(i) for i in range(n_rows)]
