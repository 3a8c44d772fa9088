"""Canonical JSON encoder — the single byte-identity surface."""

from pdf_parser_benchmark_spark.canonical import canonical_json, encode_doc


def test_sorted_keys_compact():
    assert canonical_json({"b": 1, "a": [1, 2]}) == '{"a":[1,2],"b":1}'


def test_unicode_not_escaped():
    assert canonical_json({"t": "é—Ω"}) == '{"t":"é—Ω"}'


def test_encode_doc_trailing_newline_and_shape():
    out = encode_doc("u", "txt", [{"start": 0}], {"parser": "html"})
    assert out.endswith("\n")
    assert out == '{"meta":{"parser":"html"},"spans":[{"start":0}],"text":"txt","url":"u"}\n'


def test_deterministic():
    a = encode_doc("u", "x", [], {"k": 1})
    b = encode_doc("u", "x", [], {"k": 1})
    assert a == b and isinstance(a, str)
