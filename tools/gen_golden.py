"""Generate the pinned golden canonical-JSON fixtures under tests/golden/.

Run ONCE per intentional extractor-semantics change; the byte-identity test
(tests/test_golden.py) compares live extraction against these bytes, so any
unintended drift in parser/extractor/serializer fails the suite
(north_star: byte-identical extracted text per url).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_parser_benchmark_spark.extract.assemble import extract_document_json
from pdf_parser_benchmark_spark.synth.pages import gen_row

# fixed, diverse row ids: mixture of html + pdf, hot + tail hosts
GOLDEN_ROW_IDS = [
    0, 1, 2, 3, 5, 7, 8, 11, 13, 17, 23, 42, 99, 123, 256, 1000,
    # extra PDFs: rotated pages (25, 30, 44, 124) and two-column (56, 202, 223)
    12, 25, 30, 44, 56, 124, 202, 223,
    # corpus v9 table geometry: nested table (21), colspan/rowspan (22)
    21, 22,
    # encrypted-PDF classes the coverage report flagged as fingerprint-only:
    # RC4 (235, 295) and AES-256/R6 (610)
    235, 295, 610,
]

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "tests", "golden")
if os.path.basename(os.getcwd()) == "repo":
    GOLDEN_DIR = os.path.join(os.getcwd(), "tests", "golden")


CORPUS_FP_ROWS = 3000  # corpus-wide fingerprint coverage


def main() -> None:
    import hashlib

    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for rid in GOLDEN_ROW_IDS:
        row = gen_row(rid)
        out = extract_document_json(row["url"], row["html"])
        path = os.path.join(GOLDEN_DIR, f"row{rid:05d}.json")
        with open(path, "wb") as f:
            f.write(out.encode("utf-8"))
        kind = "pdf" if row["html"][:5] == b"%PDF-" else "html"
        print(f"{path} [{kind}] {len(out)} bytes")

    # corpus-wide fingerprints: md5 of every canonical record for the first
    # CORPUS_FP_ROWS row ids — catches regressions the 24 full fixtures miss
    fp_path = os.path.join(GOLDEN_DIR, "corpus_fingerprints.tsv")
    with open(fp_path, "w") as f:
        for rid in range(CORPUS_FP_ROWS):
            row = gen_row(rid)
            out = extract_document_json(row["url"], row["html"])
            f.write(f"{rid}\t{hashlib.md5(out.encode('utf-8')).hexdigest()}\n")
    print(f"{fp_path}: {CORPUS_FP_ROWS} fingerprints")


if __name__ == "__main__":
    main()
