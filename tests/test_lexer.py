"""Tokenizer golden vectors, ported from the reference suite
(/root/reference/tests/unit_tests.py:6-156)."""

import pytest

from pdf4py_spark.kernel.lexer import Tokenizer
from pdf4py_spark.kernel.model import (
    DictMark, HexString, Keyword, LiteralString, Operator, Singleton,
)


def toks(data: bytes):
    return list(Tokenizer(data))


def test_comment_only_reaches_eof():
    with pytest.raises(StopIteration):
        Tokenizer(b"% comment ( /% ) blah blah blah").next_token()


def test_tokens_mixed_with_comment():
    assert toks(b"346% comment ( /% ) blah blah blah\n123") == [346, 123]


def test_booleans():
    assert toks(b"true false") == [True, False]


def test_integers():
    assert toks(b"123 43445 +17 -98 0") == [123, 43445, 17, -98, 0]


def test_reals():
    assert toks(b"34.5 -3.62 +123.6 4. -.002 0.0") == \
        [34.5, -3.62, 123.6, 4.0, -0.002, 0.0]


def test_string_literals():
    data = b"""
    ( This is a string )
    (Strings may contain newlines\n and such.)
    (Strings may contain balanced parentheses ( ) and\n special characters ( * ! & } ^ % and so on).)
    (The following is an empty string.)
    ()
    (It has zero (0) length.)
    """
    expected = [" This is a string ",
                "Strings may contain newlines\n and such.",
                "Strings may contain balanced parentheses ( ) and\n"
                " special characters ( * ! & } ^ % and so on).",
                "The following is an empty string.",
                "",
                "It has zero (0) length."]
    assert [t.value.decode("utf8") for t in toks(data)] == expected


def test_string_escapes():
    a, b = toks(b"(These \\ntwo strings \\nare the same.)"
                b" (These \ntwo strings \nare the same.)")
    assert a == b
    assert toks(rb"(\a backslash is ignored)")[0].value == \
        b"a backslash is ignored"


def test_octal_escapes():
    t = toks(rb"(This string contains \245two octal characters\307.)")[0]
    assert t.value.decode("cp1252") == \
        "This string contains ¥two octal charactersÇ."
    t1, t2, t3 = toks(rb"(\0053) (\053) (\53)")
    assert t1.value == b"\x05" b"3"
    assert t2 == t3 == LiteralString(b"+")


def test_hex_string_with_blanks():
    t = toks(rb"<4 E6F762073686D 6F7A206B6120706F702E>")[0]
    assert isinstance(t, HexString)
    assert bytes.fromhex(t.value.decode()) == b"Nov shmoz ka pop."


NAME_VECTORS = {
    b"/Name1": "Name1",
    b"/ASomewhatLongerName": "ASomewhatLongerName",
    b"/A;Name_With-Various***Characters?": "A;Name_With-Various***Characters?",
    b"/1.2": "1.2",
    b"/$$": "$$",
    b"/@pattern": "@pattern",
    b"/.notdef": ".notdef",
    b"/Lime#20Green": "Lime Green",
    b"/paired#28#29parentheses": "paired()parentheses",
    b"/The_Key_of_F#23_Minor": "The_Key_of_F#_Minor",
    b"/A#42": "AB",
    b"/ ": "",
}


def test_names():
    for raw, expected in NAME_VECTORS.items():
        t = Tokenizer(raw).next_token()
        assert isinstance(t, str) and t == expected


def test_keywords_and_singletons():
    data = b"R n null n false f << endobj obj >> trailer xref startxref [ ]"
    got = toks(data)
    vals = [x if (isinstance(x, bool) or x is None)
            else x.value for x in got]
    assert vals == ["R", "n", None, "n", False, "f", b"<<", b"endobj",
                    b"obj", b">>", b"trailer", b"xref", b"startxref",
                    ord("["), ord("]")]
    assert isinstance(got[0], Operator)
    assert isinstance(got[6], DictMark)
    assert isinstance(got[7], Keyword)
    assert isinstance(got[-1], Singleton)


def test_find_last_line():
    data = b"junk\nstartxref\n42\n%%EOF"
    tok = Tokenizer(data)
    pos = tok.find_last_line(b"startxref")
    assert pos == data.index(b"startxref")
    assert tok.next_token() == 42


def test_find_last_line_at_offset_zero_is_miss():
    # reference parity: a keyword line starting at offset 0 is not found
    tok = Tokenizer(b"startxref\n42\n%%EOF")
    assert tok.find_last_line(b"startxref") == -1


def test_bare_operator():
    (t,) = toks(b"                                       ~")
    assert isinstance(t, Operator) and t.value == "~"
