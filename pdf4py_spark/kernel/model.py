"""PDF object model (PDF 1.7 §7.3) used by the tokenizer and object parser.

Parity: mirrors the value semantics of the reference's ``pdf4py/types.py``
(namedtuples) but as lightweight ``__slots__`` classes with value equality.
Strings keep raw bytes (no decoding) — the byte-identity contract of the
engine flows through these types.
"""

from __future__ import annotations


class _Box:
    """Single-value wrapper with value equality and hashing."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value

    def __eq__(self, other):
        return type(self) is type(other) and self.value == other.value

    def __hash__(self):
        return hash((type(self).__name__, self.value))

    def __repr__(self):  # pragma: no cover - debugging aid
        return f"{type(self).__name__}({self.value!r})"


class LiteralString(_Box):
    """Literal string ``(...)``; ``value`` is raw bytes after unescaping.

    Parity: pdf4py/types.py:22 (PDFLiteralString).
    """


class HexString(_Box):
    """Hex string ``<...>``; ``value`` is the raw hex-digit bytes, NOT
    unhexlified — callers unhexlify lazily (parity: pdf4py/types.py:11).
    """


class Operator(_Box):
    """A content-stream / bare operator token, ``value`` is str
    (parity: pdf4py/types.py:33)."""


class Keyword(_Box):
    """A structural keyword (``obj``, ``endobj``, ``xref``, ...), bytes value."""


class Singleton(_Box):
    """One-byte token: ``[ ] { }`` — value is the byte's int code."""


class DictMark(_Box):
    """``<<`` or ``>>`` marker, bytes value."""


class StreamMark(_Box):
    """Marks the ``stream`` keyword; ``value`` is a callable(length)->bytes
    that reads the raw payload once the Length is known."""


class Ref:
    """Reference to an indirect object: ``num gen R``."""

    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num = num
        self.gen = gen

    def __eq__(self, other):
        return isinstance(other, Ref) and (self.num, self.gen) == (other.num, other.gen)

    def __hash__(self):
        return hash(("Ref", self.num, self.gen))

    def __repr__(self):  # pragma: no cover
        return f"Ref({self.num},{self.gen})"


class IndirectObject:
    """``num gen obj ... endobj`` wrapper."""

    __slots__ = ("num", "gen", "value")

    def __init__(self, num: int, gen: int, value):
        self.num = num
        self.gen = gen
        self.value = value

    def __repr__(self):  # pragma: no cover
        return f"IndirectObject({self.num},{self.gen},{self.value!r})"


class Stream:
    """A stream object: ``meta`` dict + ``payload`` zero-arg callable that
    returns the decrypted+decoded content (lazy, parity pdf4py/types.py:39-47).
    """

    __slots__ = ("meta", "payload")

    def __init__(self, meta: dict, payload):
        self.meta = meta
        self.payload = payload

    def __iter__(self):  # allow ``D, reader = stream`` style unpacking
        yield self.meta
        yield self.payload


# --- xref entry records ------------------------------------------------------

class UsedEntry:
    """In-use xref record: object lives at byte ``offset``."""

    __slots__ = ("offset", "num", "gen")

    def __init__(self, offset: int, num: int, gen: int):
        self.offset = offset
        self.num = num
        self.gen = gen

    def key(self):
        return (self.num, self.gen)

    def __eq__(self, other):
        return isinstance(other, UsedEntry) and (
            self.offset, self.num, self.gen) == (other.offset, other.num, other.gen)

    def __hash__(self):
        return hash(("UsedEntry", self.offset, self.num, self.gen))

    def __repr__(self):  # pragma: no cover
        return f"UsedEntry(off={self.offset},{self.num},{self.gen})"


class PackedEntry:
    """Compressed-object xref record: object ``num`` lives inside object
    stream ``container`` at index ``index``."""

    __slots__ = ("num", "container", "index")

    def __init__(self, num: int, container: int, index: int):
        self.num = num
        self.container = container
        self.index = index

    def key(self):
        return (self.num, 0)

    def __eq__(self, other):
        return isinstance(other, PackedEntry) and (
            self.num, self.container, self.index) == (other.num, other.container, other.index)

    def __hash__(self):
        return hash(("PackedEntry", self.num, self.container, self.index))

    def __repr__(self):  # pragma: no cover
        return f"PackedEntry({self.num} in {self.container}[{self.index}])"


# --- errors -------------------------------------------------------------------

class KernelError(Exception):
    """Base class for all kernel failures; pipelines convert these into
    quarantine rows, never task failures.

    ``pos`` (optional) is the byte offset in the source payload where the
    failure was detected; the extraction layer uses it to attach a +-100
    byte context window to the quarantine row (parity with the reference's
    get_context, _lexer.py:165-227)."""

    def __init__(self, *args, pos: int | None = None):
        super().__init__(*args)
        self.pos = pos


class TokenError(KernelError):
    """Lexical-level failure (parity: PDFLexicalError)."""


class StructureError(KernelError):
    """Grammar/structure-level failure (parity: PDFSyntaxError)."""


class UnsupportedFeatureError(KernelError):
    """Feature the kernel does not implement (parity: PDFUnsupportedError)."""


class BadPasswordError(KernelError):
    """Supplied password failed authentication (parity: PDFWrongPasswordError)."""
