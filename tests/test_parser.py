"""Object-scanner and document-parser golden vectors, ported from the
reference suite (/root/reference/tests/unit_tests.py:189-310)."""

import pytest

from pdf4py_spark.kernel.model import (
    IndirectObject, LiteralString, Operator, Ref, StructureError,
)
from pdf4py_spark.kernel.parser import DocumentParser, ObjectScanner


def test_parse_dictionary():
    data = b"""
    << /Type /Example
        /Subtype /DictionaryExample
        /Version 0.01
        /IntegerItem 12
        /StringItem (a string)
        /Subdictionary << /Item1 0.4
            /Item2 true
            /LastItem (not!)
            /VeryLastItem (OK)
        >>
    >>"""
    expected = {
        "Type": "Example",
        "Subtype": "DictionaryExample",
        "Version": 0.01,
        "IntegerItem": 12,
        "StringItem": LiteralString(b"a string"),
        "Subdictionary": {
            "Item1": 0.4, "Item2": True,
            "LastItem": LiteralString(b"not!"),
            "VeryLastItem": LiteralString(b"OK"),
        },
    }
    assert ObjectScanner(data, content_mode=False).parse() == expected


def test_indirect_object_and_reference():
    sc = ObjectScanner(b"12 0 obj ( Brillig ) endobj 12 0 R",
                       content_mode=False)
    obj = sc.parse()
    ref = sc.parse()
    assert isinstance(obj, IndirectObject)
    assert obj.value == LiteralString(b" Brillig ")
    assert ref == Ref(12, 0)


def test_parse_stream():
    data = b"""28 0 obj
<<
/Length 34
>>
stream
this is the content of the stream.
endstream
endobj
"""
    sc = ObjectScanner(
        data,
        stream_resolver=lambda d, read, oid=None: (
            d["Length"], lambda: read(d["Length"])),
        content_mode=False)
    obj = sc.parse()
    assert bytes(obj.value.payload()) == b"this is the content of the stream."


def test_parse_empty_input():
    sc = ObjectScanner(b"", content_mode=False)
    with pytest.raises(StopIteration):
        sc.parse()


def test_content_stream_mode():
    data = b"""BT
        /F1 12 Tf
        72 712 Td
        (A stream with an indirect length) Tj
        ET"""
    with pytest.raises(StructureError):
        list(ObjectScanner(data, content_mode=False))
    parsed = list(ObjectScanner(data, content_mode=True))
    assert parsed == [
        Operator("BT"), "F1", 12, Operator("Tf"), 72, 712, Operator("Td"),
        LiteralString(b"A stream with an indirect length"), Operator("Tj"),
        Operator("ET"),
    ]


def test_classic_xref_section():
    sample = b"""xref
0 7
0000000000 65535 f
0000000009 00000 n
0000000074 00000 n
0000000120 00000 n
0000000179 00000 n
0000000300 00000 n
0000000384 00000 n

trailer
    << /Size 7
        /Root 1 0 R
    >>
startxref
0
%%EOF"""
    # pad so the xref section does not start at offset 0 (reference parity:
    # rfind cannot match at 0; here the anchor is startxref anyway)
    doc = DocumentParser(b"%fake-header\n" + sample.replace(
        b"startxref\n0", b"startxref\n13"))
    keys = sorted((e.num, e.gen) for e in doc.xref.entries())
    assert keys == [(1, 0), (2, 0), (3, 0), (4, 0), (5, 0), (6, 0)]


def test_three_integer_pushback():
    assert list(ObjectScanner(b"[1 2 3] 7 8 9 [4]", content_mode=False)) == \
        [[1, 2, 3], 7, 8, 9, [4]]
    # reference parity quirk: a trailing bare integer pair at EOF loses the
    # final number (the reference's lex2 is consumed when lex3 hits EOF)
    assert list(ObjectScanner(b"[1 2 3] 7 8 9", content_mode=False)) == \
        [[1, 2, 3], 7, 8]


def test_deep_nesting_raises_structure_error_not_recursion():
    """Adversarial nesting must hit the bounded-depth StructureError well
    below the CPython recursion limit — never RecursionError/segfault."""
    deep = b"[" * 2000 + b"]" * 2000
    with pytest.raises(StructureError, match="nesting"):
        ObjectScanner(deep, content_mode=False).parse()
    # a realistic nesting depth still parses
    ok = b"[" * 50 + b"1" + b"]" * 50
    parsed = ObjectScanner(ok, content_mode=False).parse()
    for _ in range(50):
        assert isinstance(parsed, list) and len(parsed) == 1
        parsed = parsed[0]
    assert parsed == 1


def test_deep_nesting_quarantines_total():
    from pdf4py_spark.kernel.extract import extract_document
    bomb = (b"%PDF-1.4\n1 0 obj\n" + b"[" * 5000 + b"]" * 5000 +
            b"\nendobj\ntrailer << /Root 1 0 R >>")
    r = extract_document(bomb)
    assert r.status != "ok"
    assert "nesting" in (r.error or "") or "StructureError" in (r.error or "")


def test_quarantine_error_carries_context_window():
    """A malformed PDF's quarantine row must include the +-100-byte window
    around the failure offset (parity: reference get_context)."""
    from pdf4py_spark.kernel.extract import extract_document
    filler = b"A" * 300
    # truncated: hex string never closed -> TokenError deep in the payload
    bad = (b"%PDF-1.4\n" + filler + b"\n1 0 obj\n<a1b2")
    r = extract_document(bad)
    assert r.status == "error"
    assert "position" in r.error and "context[" in r.error
    # the window must contain bytes from the payload near the failure
    assert "a1b2" in r.error or "AAAA" in r.error


def _pdf_with_objects(objs: list[bytes]) -> bytes:
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF"
            % (len(objs) + 1, xref_at))
    return bytes(out)


def test_cyclic_page_tree_quarantines_not_recursionerror():
    """ADVICE r2: the page-tree walk was unbounded recursion — a cyclic
    Kids edge (2 0 R -> 3 0 R -> 2 0 R) must quarantine as a depth
    StructureError, never RecursionError, in BOTH text modes."""
    from pdf4py_spark.kernel.extract import extract_document
    pdf = _pdf_with_objects([
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Pages /Kids [2 0 R] /Count 1 /Parent 2 0 R >>",
    ])
    for mode in ("raw", "unicode"):
        r = extract_document(pdf, text_mode=mode)
        assert r.status != "ok"
        assert "page tree" in (r.error or ""), (mode, r.error)


def test_deep_but_legal_page_tree_walks_iteratively():
    """A 300-level chain of single-kid Pages nodes exceeds the old
    recursive walk's comfort zone; the iterative walk handles any depth
    up to the cap. 300 > 256 -> quarantine; 100 -> extracts fine."""
    from pdf4py_spark.kernel.extract import extract_document

    def chain(depth: int) -> bytes:
        objs = [b"<< /Type /Catalog /Pages 2 0 R >>"]
        for i in range(depth):
            objs.append(b"<< /Type /Pages /Kids [%d 0 R] /Count 1 >>"
                        % (i + 3))
        content = b"BT (x) Tj ET"
        objs.append(b"<< /Type /Page /Contents %d 0 R >>" % (depth + 3))
        objs.append(b"<< /Length %d >>\nstream\n" % len(content)
                    + content + b"\nendstream")
        return _pdf_with_objects(objs)

    ok = extract_document(chain(100))
    assert ok.status == "ok" and ok.extracted == b"x"
    deep = extract_document(chain(300))
    assert deep.status != "ok" and "page tree" in (deep.error or "")
