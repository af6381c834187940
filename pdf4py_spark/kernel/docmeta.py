"""Document-information metadata (PDF 1.7 §14.3.3 Info dictionary) and
annotation census — the document-level metadata table a corpus pipeline
keeps next to the text.

Shared-formatter pattern (same contract as fonts.font_census_line):
each parser stack resolves its OWN objects into {key: raw bytes} and
formats through this one module, so the gated compare spans resource
traversal + string decryption on two independent stacks, not string
formatting.

Text-string decoding per §7.9.2.2: UTF-16BE with BOM, UTF-8 with BOM
(PDF 2.0 §7.9.2.2.1), else 1-byte PDFDocEncoding — the EXACT Annex D
table (r4 verdict #2 closed): the 8 accent code points 0x18-0x1F and
the punctuation block 0x80-0x9E (bullet, daggers, dashes, curly
quotes, ligatures, ...) plus 0xA0 = EURO map per the spec; every other
byte equals Latin-1. The spec-undefined slots (0x7F, 0x9F, 0xAD and
the low control holes) keep their Latin-1 value so the map stays
total (declared; they are control/soft-hyphen characters either way).
Pinned independently of the shared-formatter gate by
tests/test_fonts.py::test_pdfdoc_encoding_exact — a shared decode bug
is structurally invisible to the two-stack compare, so the expected
Unicode is asserted literally there."""

from __future__ import annotations

import re

#: Info keys carried into the canonical line, fixed order
METADATA_KEYS = ("Title", "Author", "Subject", "Creator", "Producer",
                 "CreationDate", "ModDate")

#: PDFDocEncoding positions that differ from Latin-1 (PDF 1.7 Annex D.3)
_PDFDOC_DIFF = {
    0x18: "\u02D8",  # BREVE
    0x19: "\u02C7",  # CARON
    0x1A: "\u02C6",  # MODIFIER LETTER CIRCUMFLEX ACCENT
    0x1B: "\u02D9",  # DOT ABOVE
    0x1C: "\u02DD",  # DOUBLE ACUTE ACCENT
    0x1D: "\u02DB",  # OGONEK
    0x1E: "\u02DA",  # RING ABOVE
    0x1F: "\u02DC",  # SMALL TILDE
    0x80: "\u2022",  # BULLET
    0x81: "\u2020",  # DAGGER
    0x82: "\u2021",  # DOUBLE DAGGER
    0x83: "\u2026",  # HORIZONTAL ELLIPSIS
    0x84: "\u2014",  # EM DASH
    0x85: "\u2013",  # EN DASH
    0x86: "\u0192",  # LATIN SMALL LETTER F WITH HOOK (florin)
    0x87: "\u2044",  # FRACTION SLASH
    0x88: "\u2039",  # SINGLE LEFT-POINTING ANGLE QUOTATION MARK
    0x89: "\u203A",  # SINGLE RIGHT-POINTING ANGLE QUOTATION MARK
    0x8A: "\u2212",  # MINUS SIGN
    0x8B: "\u2030",  # PER MILLE SIGN
    0x8C: "\u201E",  # DOUBLE LOW-9 QUOTATION MARK
    0x8D: "\u201C",  # LEFT DOUBLE QUOTATION MARK
    0x8E: "\u201D",  # RIGHT DOUBLE QUOTATION MARK
    0x8F: "\u2018",  # LEFT SINGLE QUOTATION MARK
    0x90: "\u2019",  # RIGHT SINGLE QUOTATION MARK
    0x91: "\u201A",  # SINGLE LOW-9 QUOTATION MARK
    0x92: "\u2122",  # TRADE MARK SIGN
    0x93: "\uFB01",  # LATIN SMALL LIGATURE FI
    0x94: "\uFB02",  # LATIN SMALL LIGATURE FL
    0x95: "\u0141",  # LATIN CAPITAL LETTER L WITH STROKE
    0x96: "\u0152",  # LATIN CAPITAL LIGATURE OE
    0x97: "\u0160",  # LATIN CAPITAL LETTER S WITH CARON
    0x98: "\u0178",  # LATIN CAPITAL LETTER Y WITH DIAERESIS
    0x99: "\u017D",  # LATIN CAPITAL LETTER Z WITH CARON
    0x9A: "\u0131",  # LATIN SMALL LETTER DOTLESS I
    0x9B: "\u0142",  # LATIN SMALL LETTER L WITH STROKE
    0x9C: "\u0153",  # LATIN SMALL LIGATURE OE
    0x9D: "\u0161",  # LATIN SMALL LETTER S WITH CARON
    0x9E: "\u017E",  # LATIN SMALL LETTER Z WITH CARON
    0xA0: "\u20AC",  # EURO SIGN
}

#: full 256-entry table, precomputed once (latin-1 base + Annex D diffs)
_PDFDOC_TABLE = [
    _PDFDOC_DIFF.get(b, chr(b)) for b in range(256)
]


def decode_text_string(raw: bytes) -> str:
    if raw.startswith(b"\xfe\xff"):
        return raw[2:].decode("utf-16-be", "replace")
    if raw.startswith(b"\xef\xbb\xbf"):
        return raw[3:].decode("utf-8", "replace")
    return "".join(_PDFDOC_TABLE[b] for b in raw)


def _esc(s: str) -> str:
    """Injective escape for census values embedded in |- or \\n-joined
    canonical lines."""
    return (s.replace("\\", "\\\\").replace("|", "\\x7c")
            .replace("\n", "\\n").replace("\r", "\\r"))


def metadata_line(info_raw: dict, n_annots: int) -> str:
    """Canonical one-line form: 7 Info values (empty when absent) + the
    document's annotation count, pipe-joined with pipes/newlines in
    values escaped so the line stays parseable."""
    vals = []
    for key in METADATA_KEYS:
        raw = info_raw.get(key)
        s = decode_text_string(raw) if isinstance(raw, bytes) else ""
        vals.append(_esc(s))
    vals.append(str(n_annots))
    return "|".join(vals)


def links_line(uris) -> str:
    """Canonical outlink census: sorted distinct URI strings, one per
    line. Each URI is newline/backslash-escaped BEFORE joining (r4
    advice #2): a literal-string URI containing '\\n' must not collide
    with two separate URIs — the canonical form is injective."""
    return "\n".join(sorted({_esc(u) for u in uris}))


# --- bounded XMP field extraction (K55) --------------------------------------------
#
# Raw-bytes pinning (K51) stays the cross-stack gate; this layer answers
# the crawl-pipeline question "what is the document's declared title /
# author?" with a REGEX-LEVEL scan — deliberately never an XML parser:
# no entity expansion (numeric references are decoded arithmetically
# with a hard cap, named ones from a fixed 5-entry table), no DTD, no
# namespace resolution, bounded input and output. Hostile packets cost
# O(len) and can emit at most MAX_XMP_ITEMS values per field.

#: Dublin Core properties a training-data pipeline keeps (XMP spec part 1
#: §8.3; dc:title/description are language alternatives, dc:creator is an
#: ordered array — all carried as rdf:li items)
XMP_FIELDS = ("dc:title", "dc:creator", "dc:description")
MAX_XMP_SCAN = 1 << 20
MAX_XMP_ITEMS = 64

_XML_NAMED = {"amp": "&", "lt": "<", "gt": ">",
              "quot": '"', "apos": "'"}
_ENTITY_RE = re.compile(r"&(#x[0-9A-Fa-f]{1,6}|#\d{1,7}|[a-z]{2,4});")
_LI_RE = re.compile(r"<rdf:li[^>]*>(.*?)</rdf:li>", re.S)


def _unescape_xml(s: str) -> str:
    def sub(m):
        body = m.group(1)
        if body.startswith("#x"):
            cp = int(body[2:], 16)
        elif body.startswith("#"):
            cp = int(body[1:])
        else:
            return _XML_NAMED.get(body, m.group(0))
        if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
            return "\ufffd"
        return chr(cp)
    return _ENTITY_RE.sub(sub, s)


def xmp_fields(packet: bytes):
    """[(field, index, value)] from an XMP packet's Dublin Core blocks.
    Values are whitespace-stripped rdf:li item texts (or the element's
    own text when no rdf:li container is present), XML-unescaped at the
    character level only."""
    data = packet[:MAX_XMP_SCAN].decode("utf-8", "replace")
    out = []
    for field in XMP_FIELDS:
        m = re.search("<%s[^>]*>(.*?)</%s>" % (field, field), data, re.S)
        if m is None:
            continue
        block = m.group(1)
        items = [t.strip() for t in _LI_RE.findall(block)]
        if not items:
            txt = block.strip()
            items = [txt] if txt and "<" not in txt else []
        for idx, item in enumerate(items[:MAX_XMP_ITEMS]):
            out.append((field, idx, _unescape_xml(item)))
    return out


def xmp_fields_line(fields) -> str:
    """Canonical form for the (field, index, value) triples: one escaped
    'field|index|value' line per triple, document order."""
    return "\n".join("%s|%d|%s" % (f, i, _esc(v)) for f, i, v in fields)
