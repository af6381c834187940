"""Property-based differential test: the engine tokenizer versus the
reference lexer on randomized token soup. Both must produce the same
lexeme sequence (or fail at the same prefix) — the strongest evidence
that byte-identity generalizes beyond the corpus."""

import os
import sys

import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

REFERENCE_ROOT = os.environ.get("PDF4PY_REFERENCE_ROOT", "/root/reference")
if not os.path.isdir(os.path.join(REFERENCE_ROOT, "pdf4py")):
    pytest.skip("reference not available", allow_module_level=True)
sys.path.insert(0, REFERENCE_ROOT)

from pdf4py import _lexer as ref_lexer  # noqa: E402
from pdf4py import types as ref_types  # noqa: E402

from pdf4py_spark.kernel import lexer as eng_lexer  # noqa: E402
from pdf4py_spark.kernel import model as eng_model  # noqa: E402

# building blocks that exercise every token class and its edge cases
_TOKEN_SOUP = st.sampled_from([
    b"0", b"7", b"-3", b"+17", b"4.", b"-.002", b"0.0", b"123.456",
    b"true", b"false", b"null", b"R", b"n", b"f",
    b"obj", b"endobj", b"xref", b"startxref", b"trailer",
    b"<<", b">>", b"[", b"]",
    b"/Name", b"/A#42", b"/Lime#20Green", b"/", b"/.notdef",
    b"(simple)", b"(nested (parens))", b"(esc \\n \\t \\053 \\307)",
    b"()", b"(a\\)b)", rb"(\0053)",
    b"<4E6F76>", b"< 4 16 >", b"<>",
    b"% comment\n", b"%\n",
    b" ", b"\n", b"\r\n", b"\t", b"\x00", b"\x0c",
    b"BT", b"ET", b"Tj", b"TJ", b"~", b"@", b"op",
])


def _ref_tokens(data: bytes):
    out = []
    lex = ref_lexer.Lexer(data)
    try:
        while True:
            out.append(next(lex))
    except StopIteration:
        return out, None
    except Exception as exc:
        return out, type(exc).__name__


def _eng_tokens(data: bytes):
    out = []
    tok = eng_lexer.Tokenizer(data)
    try:
        while True:
            out.append(tok.next_token())
    except StopIteration:
        return out, None
    except Exception as exc:
        return out, type(exc).__name__


def _canon_ref(t):
    if isinstance(t, ref_types.PDFLiteralString):
        return ("lit", bytes(t.value))
    if isinstance(t, ref_types.PDFHexString):
        return ("hex", bytes(t.value))
    if isinstance(t, ref_types.PDFOperator):
        return ("op", t.value)
    if isinstance(t, ref_types.PDFKeyword):
        return ("kw", bytes(t.value))
    if isinstance(t, ref_types.PDFSingleton):
        return ("single", t.value)
    if isinstance(t, ref_types.PDFDictDelimiter):
        return ("dict", bytes(t.value))
    if isinstance(t, ref_types.PDFStreamReader):
        return ("stream",)
    return ("val", type(t).__name__, t)


def _canon_eng(t):
    if isinstance(t, eng_model.LiteralString):
        return ("lit", t.value)
    if isinstance(t, eng_model.HexString):
        return ("hex", t.value)
    if isinstance(t, eng_model.Operator):
        return ("op", t.value)
    if isinstance(t, eng_model.Keyword):
        return ("kw", t.value)
    if isinstance(t, eng_model.Singleton):
        return ("single", t.value)
    if isinstance(t, eng_model.DictMark):
        return ("dict", t.value)
    if isinstance(t, eng_model.StreamMark):
        return ("stream",)
    return ("val", type(t).__name__, t)


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=40))
def test_tokenizer_matches_reference_on_raw_bytes(data):
    ref_out, ref_err = _ref_tokens(data)
    eng_out, eng_err = _eng_tokens(data)
    assert (ref_err is None) == (eng_err is None), (data, ref_err, eng_err)
    assert [_canon_ref(t) for t in ref_out] == \
        [_canon_eng(t) for t in eng_out], data


def _canon_obj(o, ref: bool):
    """Canonicalize parsed objects from either implementation."""
    if ref:
        import pdf4py.types as T
        if isinstance(o, T.PDFLiteralString):
            return ("lit", bytes(o.value))
        if isinstance(o, T.PDFHexString):
            return ("hex", bytes(o.value))
        if isinstance(o, T.PDFOperator):
            return ("op", o.value)
        if isinstance(o, T.PDFReference):
            return ("ref", o.object_number, o.generation_number)
        if isinstance(o, T.PDFIndirectObject):
            return ("ind", o.object_number, o.generation_number,
                    _canon_obj(o.value, True))
    else:
        M = eng_model
        if isinstance(o, M.LiteralString):
            return ("lit", o.value)
        if isinstance(o, M.HexString):
            return ("hex", o.value)
        if isinstance(o, M.Operator):
            return ("op", o.value)
        if isinstance(o, M.Ref):
            return ("ref", o.num, o.gen)
        if isinstance(o, M.IndirectObject):
            return ("ind", o.num, o.gen, _canon_obj(o.value, False))
    if isinstance(o, list):
        return tuple(_canon_obj(x, ref) for x in o)
    if isinstance(o, dict):
        return tuple(sorted((k, _canon_obj(v, ref)) for k, v in o.items()))
    return ("val", type(o).__name__, o)


@settings(max_examples=300, deadline=None)
@given(st.lists(_TOKEN_SOUP, min_size=0, max_size=25))
def test_object_parser_matches_reference_on_token_soup(parts):
    from pdf4py.parser import SequentialParser
    from pdf4py_spark.kernel.parser import ObjectScanner

    data = b" ".join(p for p in parts if p != b"stream")
    ref_out, ref_err = [], None
    par = SequentialParser(data, content_stream_mode=True)
    try:
        while True:
            ref_out.append(par.parse_object())
    except StopIteration:
        pass
    except Exception as exc:
        ref_err = type(exc).__name__
    eng_out, eng_err = [], None
    sc = ObjectScanner(data, content_mode=True)
    try:
        while True:
            eng_out.append(sc.parse())
    except StopIteration:
        pass
    except Exception as exc:
        eng_err = type(exc).__name__
    assert (ref_err is None) == (eng_err is None), (data, ref_err, eng_err)
    assert [_canon_obj(o, True) for o in ref_out] == \
        [_canon_obj(o, False) for o in eng_out], data


@settings(max_examples=300, deadline=None)
@given(st.lists(_TOKEN_SOUP, min_size=0, max_size=25))
def test_tokenizer_matches_reference_on_token_soup(parts):
    data = b" ".join(parts)
    ref_out, ref_err = _ref_tokens(data)
    eng_out, eng_err = _eng_tokens(data)
    ref_canon = [_canon_ref(t) for t in ref_out]
    eng_canon = [_canon_eng(t) for t in eng_out]
    if ref_err is None and eng_err is None:
        assert eng_canon == ref_canon, data
    else:
        # both must fail, after identical prefixes
        assert ref_err is not None and eng_err is not None, (
            data, ref_err, eng_err, ref_canon, eng_canon)
        assert eng_canon == ref_canon, data
