"""Golden-fixture coverage report: which generator/extractor branches the
pinned fixtures actually exercise (ROADMAP 'testing' item — catches the
silent case where a parser branch exists but no fixture ever reaches it).

Classifies every corpus-fingerprint row (pure row_id probes, no parsing)
and every full golden fixture, then writes tests/golden/COVERAGE.md.
Regenerate together with tools/gen_golden.py.
"""

from __future__ import annotations

import collections
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_benchmark_spark.synth import pages as P
from tools.gen_golden import CORPUS_FP_ROWS, GOLDEN_DIR, GOLDEN_ROW_IDS


def classify(row_id: int) -> list[str]:
    tags: list[str] = []
    if P.is_pdf_row(row_id):
        tags.append("pdf")
        tags.append("class:" + P.doc_class(row_id))
        n_pages = 4 + P._mix(row_id, 50) % 5
        if P._mix(row_id, 53) % 3 == 0:
            tags.append("pdf:rotated-page")
        if P._mix(row_id, 55) % 4 == 0:
            tags.append("pdf:two-column")
        for p in range(n_pages):
            roll = P._mix(row_id, 61, p)
            if roll % 4 == 0:
                tags.append("pdf:font-F2-cmap")
            elif roll % 8 == 1:
                tags.append("pdf:font-F4-type3")
            if P._mix(row_id, 63, p) % 5 == 0:
                if P._mix(row_id, 67, p) % 3 == 0:
                    tags.append("pdf:cjk-vertical")
                else:
                    tags.append("pdf:cjk-identityH")
            if p % 3 == 1:
                tags.append("pdf:tj-array")
    else:
        tags.append("html")
        if P._mix(row_id, 7) % 5 == 0:
            tags.append("html:reproducible-marker")
        if P._mix(row_id, 80) % 4 == 0:
            tags.append("html:table")
            geo = P._mix(row_id, 90) % 4
            if geo == 0:
                tags.append("html:table-colspan-rowspan")
            elif geo == 1:
                tags.append("html:table-nested")
        if P._mix(row_id, 87) % 5 == 0:
            tags.append("html:related-box-subtree")
    return sorted(set(tags))


def main() -> None:
    fp_counts: collections.Counter[str] = collections.Counter()
    for rid in range(CORPUS_FP_ROWS):
        fp_counts.update(classify(rid))

    golden_counts: collections.Counter[str] = collections.Counter()
    span_kinds: collections.Counter[str] = collections.Counter()
    for rid in GOLDEN_ROW_IDS:
        golden_counts.update(classify(rid))
        path = os.path.join(GOLDEN_DIR, f"row{rid:05d}.json")
        rec = json.loads(open(path, "rb").read())
        for sp in rec.get("spans", []):
            span_kinds[sp["kind"]] += 1

    out = os.path.join(GOLDEN_DIR, "COVERAGE.md")
    with open(out, "w") as f:
        f.write("# Golden-fixture branch coverage (generated)\n\n")
        f.write(
            f"{len(GOLDEN_ROW_IDS)} full fixtures + {CORPUS_FP_ROWS} "
            "fingerprint rows. Regenerate: `python tools/golden_coverage.py`\n\n"
        )
        f.write("| branch | fingerprint rows | full fixtures |\n|---|---|---|\n")
        for tag in sorted(set(fp_counts) | set(golden_counts)):
            f.write(f"| {tag} | {fp_counts.get(tag, 0)} | {golden_counts.get(tag, 0)} |\n")
        f.write("\n## Span kinds across full fixtures\n\n")
        f.write("| kind | spans |\n|---|---|\n")
        for k, n in span_kinds.most_common():
            f.write(f"| {k} | {n} |\n")
        uncovered = [t for t in fp_counts if golden_counts.get(t, 0) == 0]
        f.write("\n## Branches with NO full fixture (fingerprint-only)\n\n")
        f.write("".join(f"- {t}\n" for t in sorted(uncovered)) or "(none)\n")
    print(f"wrote {out}")
    for t in sorted(uncovered):
        print(f"  WARNING fingerprint-only branch: {t}")


if __name__ == "__main__":
    main()
