"""Byte-level PDF tokenizer.

From-scratch, index-based scanner over an in-memory payload (the engine
always holds the whole document as one ``binary`` cell, so there is no
file-pointer path). Behavioral parity with the reference tokenizer
(/root/reference/pdf4py/_lexer.py) is the contract, including quirks:

* comments end only at LINE FEED (_lexer.py:296-299)
* string escapes: ``\\n \\r \\b \\t \\f`` map to control bytes, any other
  escaped non-digit byte maps to itself, 1-3 octal digits map to a byte
  (_lexer.py:350-366)
* literal keyword matching is pure prefix matching with no word-boundary
  check, in the same order (true/false/stream/<</>>/null, then
  endobj/obj/trailer/xref/startxref/endstream) (_lexer.py:608-628,
  _charset.py:43-45)
* a token ending exactly at EOF is returned; EOF *inside* a string/hex
  token surfaces as StopIteration (the reference's injected-space +
  ended-flag behavior, _lexer.py:278-285)
* ``rfind`` matches only lines exactly equal to the keyword, scanning
  from EOF, and reports failure for a match at offset 0 (_lexer.py:125-162)
"""

from __future__ import annotations

import re

from .model import (
    DictMark, HexString, Keyword, KernelError, LiteralString, Operator,
    Singleton, StreamMark, TokenError,
)

LF = 0x0A
CR = 0x0D
WHITESPACE = frozenset((0x00, 0x09, 0x0A, 0x0C, 0x0D, 0x20))
DELIMITERS = frozenset(b"()<>[]{}/%")
SINGLE_CHAR_TOKENS = frozenset(b"[]{}")
ESCAPE_MAP = {
    ord("n"): 0x0A, ord("r"): 0x0D, ord("b"): 0x08,
    ord("t"): 0x09, ord("f"): 0x0C,
}
# Longest-match-sensitive order; structural keywords after value literals.
_VALUE_LITERALS = (b"true", b"false", b"stream", b"<<", b">>", b"null")
_STRUCT_KEYWORDS = (b"endobj", b"obj", b"trailer", b"xref", b"startxref",
                    b"endstream")

_HEXDIGITS = frozenset(b"0123456789abcdefABCDEF")
_DIGITS = frozenset(b"0123456789")

# -- C-speed scanning tables (r6) ------------------------------------------------
#
# The per-byte Python loops in the four scanners dominated the extraction
# kernel's profile (lexer tottime ~55% of a corpus pass; ~2.4M
# _is_regular calls). Each scanner now finds its token extent with ONE
# compiled-regex/translate call (C loop) and keeps the byte-level slow
# path only for the rare cases (name '#' escapes, string escapes); the
# produced tokens, positions, and error/StopIteration behaviors are
# byte-identical — pinned by the fuzz-vs-reference suite and a full-corpus
# old-vs-new extraction byte-compare (OPTIMIZATION_r06.md).

#: one-or-more REGULAR bytes (0x21-0x7E minus delimiters)
_NAME_RE = re.compile(rb"[^\x00-\x20\x7f-\xff()<>\[\]{}/%]+")
#: sign? digits* ('.' digits*)? — exactly the hand-rolled number scan
_NUM_RE = re.compile(rb"[+-]?[0-9]*(\.[0-9]*)?")
#: hex-string body: hex digits and whitespace, up to the terminator
_HEX_RE = re.compile(rb"[0-9a-fA-F\x00\x09\x0a\x0c\x0d\x20]*")
#: literal-string structure bytes: nesting parens and backslash
_STR_SPECIAL_RE = re.compile(rb"[()\\]")
#: whitespace run (the token-filler fast path)
_WS_RUN_RE = re.compile(rb"[\x00\x09\x0a\x0c\x0d\x20]+")
#: translate() deletion table argument for stripping whitespace
_WS_BYTES = bytes(sorted(WHITESPACE))

#: first-byte dispatch for _scan_word: most word tokens in content
#: streams are operators (Tj, TD, rg, ...) that match NO literal, so
#: probing all 12 candidates per token dominated the tokenizer profile
#: (21M startswith calls over the corpus, ~12% of kernel wall).
#: Bucketing by first byte keeps the EXACT global probe order (all value
#: literals before any struct keyword — the longest-match contract)
#: while typical operators hit an empty bucket and probe nothing.
_WORD_CANDIDATES: dict = {}
for _lit in _VALUE_LITERALS:
    _WORD_CANDIDATES.setdefault(_lit[0], []).append((_lit, False))
for _kw in _STRUCT_KEYWORDS:
    _WORD_CANDIDATES.setdefault(_kw[0], []).append((_kw, True))
_EMPTY_BUCKET: tuple = ()


def _is_regular(c: int) -> bool:
    return 0x21 <= c <= 0x7E and c not in DELIMITERS


class Tokenizer:
    """Iterator of PDF lexemes over a bytes payload.

    ``pos`` always indexes the first unconsumed byte. ``cur`` holds the
    most recently produced token (needed by the object parser's
    reference-lookahead and by position save/restore).
    """

    __slots__ = ("buf", "n", "pos", "cur", "_pushback", "_checkpoints")

    def __init__(self, payload):
        if isinstance(payload, memoryview):
            payload = bytes(payload)
        self.buf = payload
        self.n = len(payload)
        self.pos = 0
        self.cur = None
        self._pushback = []
        self._checkpoints = []

    # -- iterator protocol ---------------------------------------------------

    def __iter__(self):
        return self

    def __next__(self):
        return self.next_token()

    # -- positioning ----------------------------------------------------------

    def jump(self, pos: int):
        """Move to ``pos``, produce the token starting there, and remember
        the prior (token, position) so ``rewind`` can restore it.
        Parity: Lexer.move_at_position (_lexer.py:230-253)."""
        self._checkpoints.append((self.cur, self.pos))
        self.pos = pos
        return self.next_token()

    def rewind(self):
        """Undo the most recent ``jump``. Parity: Lexer.move_back."""
        if not self._checkpoints:
            raise TokenError("rewind without a prior jump")
        self.cur, self.pos = self._checkpoints.pop()

    def push_back(self, replacement_cur):
        """Return ``cur`` to the stream and set ``cur`` to
        ``replacement_cur``. Parity: Lexer.undo_next (_lexer.py:645-660)."""
        self._pushback.append(self.cur)
        self.cur = replacement_cur

    def find_last_line(self, keyword: bytes) -> int:
        """Scan backwards from EOF for a line exactly equal to ``keyword``;
        position the tokenizer on it and consume it as the current token.

        Returns the byte offset of the line start, or -1 (also -1 when the
        match would start at offset 0 — reference parity, _lexer.py:157-158).
        """
        buf = self.buf
        end = self.n
        while end > 0:
            nl = max(buf.rfind(b"\n", 0, end), buf.rfind(b"\r", 0, end))
            start = nl + 1
            if buf[start:end] == keyword:
                if start == 0:
                    return -1
                self.pos = start
                self.next_token()
                return start
            if start == 0:
                return -1
            end = nl
        return -1

    # -- token scanning --------------------------------------------------------

    def next_token(self):
        if self._pushback:
            self.cur = self._pushback.pop()
            return self.cur

        # _skip_filler inlined (hot: once per token); semantics identical
        # — whitespace runs consumed by one C regex match instead of a
        # per-byte loop
        buf, n = self.buf, self.n
        i = self.pos
        while i < n:
            c = buf[i]
            if c in WHITESPACE:
                i = _WS_RUN_RE.match(buf, i).end()
            elif c == 0x25:  # '%' comment runs to the next LINE FEED only
                j = buf.find(b"\n", i)
                if j < 0:
                    self.pos = n
                    raise StopIteration
                i = j + 1
            else:
                break
        self.pos = i
        if i >= n:
            raise StopIteration
        c = buf[i]

        try:
            # digits probed first (the most frequent content-stream token)
            # with range compares instead of frozenset lookups — dispatch
            # order is free because the first-byte classes are disjoint
            if 0x30 <= c <= 0x39:  # 0-9
                tok = self._scan_number(leading_digit=True)
            elif c == 0x28:  # (
                tok = self._scan_literal_string()
            elif c == 0x3C and not buf.startswith(b"<<", i):  # < but not <<
                tok = self._scan_hex_string()
            elif c == 0x2F:  # /
                self.pos = i + 1
                tok = self._scan_name()
            elif c == 0x2B or c == 0x2D or c == 0x2E:  # + - .
                tok = self._scan_number(leading_digit=False)
            else:
                tok = self._scan_word(c)
        except KernelError as exc:
            if exc.pos is None:  # stamp the failure offset once
                exc.pos = self.pos
            raise

        self.cur = tok
        return tok

    def _scan_word(self, c: int):
        buf, i = self.buf, self.pos
        for lit, is_struct in _WORD_CANDIDATES.get(c, _EMPTY_BUCKET):
            if buf.startswith(lit, i):
                self.pos = i + len(lit)
                if is_struct:
                    return Keyword(lit)
                if lit == b"true":
                    return True
                if lit == b"false":
                    return False
                if lit == b"stream":
                    return self._make_stream_mark()
                if lit == b"null":
                    return None
                return DictMark(lit)
        if c in SINGLE_CHAR_TOKENS:
            self.pos = i + 1
            return Singleton(c)
        if 0x21 <= c <= 0x7E and c not in DELIMITERS:  # _is_regular inline
            return Operator(self._scan_name())
        raise TokenError(
            "unrecognized byte 0x%02x at offset %d" % (c, i))

    def _scan_literal_string(self):
        # chunked: copy whole runs of ordinary bytes between the three
        # structural bytes ( ) \ (located by a C regex search); escape
        # decoding and paren nesting are unchanged byte-for-byte
        buf, n = self.buf, self.n
        i = self.pos + 1
        depth = 1
        out = bytearray()
        while True:
            m = _STR_SPECIAL_RE.search(buf, i)
            if m is None:
                # EOF inside a string: reference surfaces end-of-input
                self.pos = n
                raise StopIteration
            j = m.start()
            out += buf[i:j]
            c = buf[j]
            if c == 0x28:
                depth += 1
                out.append(c)
                i = j + 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.pos = j + 1
                    return LiteralString(bytes(out))
                out.append(c)
                i = j + 1
            else:  # backslash
                i = j + 1
                if i >= n:
                    self.pos = n
                    raise StopIteration
                d = buf[i]
                if d in _DIGITS:
                    val = 0
                    k = 0
                    while k < 3 and i < n and buf[i] in _DIGITS:
                        val = (val << 3) + (buf[i] - 0x30)
                        i += 1
                        k += 1
                    out.append(val)  # ValueError above 255, like the reference
                    continue
                out.append(ESCAPE_MAP.get(d, d))
                i += 1

    def _scan_hex_string(self):
        # one C regex match finds the body extent; whitespace is stripped
        # with translate() — digits, terminator and error offsets are
        # identical to the per-byte loop
        buf, n = self.buf, self.n
        i = self.pos + 1
        j = _HEX_RE.match(buf, i).end()
        if j >= n:
            self.pos = n
            raise StopIteration
        if buf[j] != 0x3E:  # >
            raise TokenError("hex string not closed by '>' at offset %d" % j)
        self.pos = j + 1
        return HexString(buf[i:j].translate(None, _WS_BYTES))

    def _scan_name(self) -> str:
        buf, n = self.buf, self.n
        i = self.pos
        # fast path: the whole regular-byte run in one C regex match;
        # '#xx' escapes (rare) fall back to the byte loop from the start
        m = _NAME_RE.match(buf, i)
        if m is None:
            return ""  # no regular byte at pos — empty name, pos unchanged
        j = m.end()
        raw = buf[i:j]
        if 0x23 not in raw:  # no '#'
            self.pos = j
            return raw.decode("utf8")
        out = bytearray()
        while i < n:
            c = buf[i]
            if not _is_regular(c):
                break
            if c == 0x23:  # '#xx' escape
                if i + 2 >= n or buf[i + 1] not in _HEXDIGITS \
                        or buf[i + 2] not in _HEXDIGITS:
                    raise TokenError(
                        "bad '#' hex escape in name at offset %d" % i)
                out.append(int(buf[i + 1:i + 3], 16))
                i += 3
                continue
            out.append(c)
            i += 1
        self.pos = i
        return out.decode("utf8")

    def _scan_number(self, leading_digit: bool):
        # one C regex match covering exactly the former hand scan:
        # sign? digits* ('.' digits*)?
        buf, i = self.buf, self.pos
        m = _NUM_RE.match(buf, i)
        j = m.end()
        text = buf[i:j]
        if not leading_digit and len(text) == 1:
            raise TokenError(
                "dangling sign/point at offset %d" % i)
        self.pos = j
        if m.group(1) is not None:
            return float(text)
        return int(text)

    def _make_stream_mark(self):
        """Position past the EOL that follows the ``stream`` keyword and
        return a reader over the raw payload bytes.

        Parity with _lexer.py:518-549 including the no-EOL quirk: the data
        offset is always (byte-after-keyword, +1 past a CR/LF pair or a lone
        first byte).
        """
        buf, n = self.buf, self.n
        h = self.pos
        if h < n and buf[h] == CR:
            h += 1
            if h >= n or buf[h] != LF:
                raise TokenError(
                    "CR after 'stream' not followed by LF at offset %d" % h)
        data_start = h + 1
        self.pos = data_start

        def read_raw(length: int) -> bytes:
            return buf[data_start:data_start + length]

        return StreamMark(read_raw)
