"""Minimal CFF (Compact Font Format, Adobe TN #5176 — public spec)
reader for bare-CFF FontFile3 payloads (/Subtype /Type1C).

Purpose: a simple Type1 font with no /Encoding and no /ToUnicode uses
the font program's BUILT-IN encoding (PDF 1.7 §9.6.6.2). For a Type1C
program that chain is: code -> gid (CFF Encoding), gid -> SID (CFF
charset), SID -> glyph name (standard strings or the String INDEX),
name -> Unicode (the shared AGL logic in kernel.fonts). CID-keyed CFF
(Top DICT has ROS) carries no glyph names at all — CffError, caller
keeps the U+FFFD policy (declared; K48 already covers the embedded-
TrueType route).

Hostile-input discipline matches kernel.sfnt: bounds-checked reads,
glyph/code counts capped, typed CffError for every structural
violation so executors quarantine instead of crashing.

The standard-strings table is the spec's Appendix A prefix (SIDs
0-228: .notdef through the Latin repertoire) — the tail (small-caps /
superior variant names) is omitted and resolves to no name, which the
caller maps to U+FFFD; real subset fonts carry custom names in the
String INDEX anyway (SIDs >= 391).
"""

from __future__ import annotations

import struct

MAX_GLYPHS = 1 << 14
MAX_STRINGS = 1 << 12


class CffError(ValueError):
    pass


def _u8(data, off):
    if off < 0 or off >= len(data):
        raise CffError("u8 out of bounds at %d" % off)
    return data[off]


def _u16(data, off):
    if off < 0 or off + 2 > len(data):
        raise CffError("u16 out of bounds at %d" % off)
    return struct.unpack_from(">H", data, off)[0]


def _offset(data, off, sz):
    if off < 0 or off + sz > len(data):
        raise CffError("offset out of bounds at %d" % off)
    return int.from_bytes(data[off:off + sz], "big")


def parse_index(data, off):
    """CFF INDEX at ``off`` -> (list of item bytes, offset past end)."""
    count = _u16(data, off)
    if count == 0:
        return [], off + 2
    if count > MAX_GLYPHS:
        raise CffError("INDEX count %d" % count)
    off_size = _u8(data, off + 2)
    if not 1 <= off_size <= 4:
        raise CffError("offSize %d" % off_size)
    offs = [_offset(data, off + 3 + i * off_size, off_size)
            for i in range(count + 1)]
    base = off + 3 + (count + 1) * off_size - 1
    items = []
    for i in range(count):
        lo, hi = base + offs[i], base + offs[i + 1]
        if not (base < lo <= hi <= len(data)):
            raise CffError("INDEX item bounds")
        items.append(data[lo:hi])
    return items, base + offs[count]


def parse_dict(blob):
    """CFF DICT bytes -> {op: [operands]} (two-byte ops keyed 1200+x).
    Real-number operands are skipped (none of the keys we read take
    them)."""
    out = {}
    operands = []
    i, n = 0, len(blob)
    while i < n:
        b0 = blob[i]
        if b0 <= 21:
            op = b0
            i += 1
            if b0 == 12:
                op = 1200 + _u8(blob, i)
                i += 1
            out[op] = operands
            operands = []
        elif b0 == 28:
            if i + 3 > n:
                raise CffError("int16 past end")
            operands.append(struct.unpack_from(">h", blob, i + 1)[0])
            i += 3
        elif b0 == 29:
            if i + 5 > n:
                raise CffError("int32 past end")
            operands.append(struct.unpack_from(">i", blob, i + 1)[0])
            i += 5
        elif b0 == 30:  # real: nibble-packed, 0xF-terminated
            i += 1
            while i < n:
                nib = blob[i]
                i += 1
                if (nib & 0x0F) == 0x0F or (nib >> 4) == 0x0F:
                    break
            operands.append(0.0)
        elif 32 <= b0 <= 246:
            operands.append(b0 - 139)
            i += 1
        elif 247 <= b0 <= 250:
            operands.append((b0 - 247) * 256 + _u8(blob, i + 1) + 108)
            i += 2
        elif 251 <= b0 <= 254:
            operands.append(-(b0 - 251) * 256 - _u8(blob, i + 1) - 108)
            i += 2
        else:
            raise CffError("bad DICT byte %d" % b0)
    return out


#: Appendix A standard strings, SIDs 0-228 (the Latin repertoire; the
#: small-caps/superior tail is omitted -> no name -> U+FFFD upstream)
STANDARD_STRINGS = (
    ".notdef", "space", "exclam", "quotedbl", "numbersign", "dollar",
    "percent", "ampersand", "quoteright", "parenleft", "parenright",
    "asterisk", "plus", "comma", "hyphen", "period", "slash", "zero",
    "one", "two", "three", "four", "five", "six", "seven", "eight",
    "nine", "colon", "semicolon", "less", "equal", "greater",
    "question", "at", "A", "B", "C", "D", "E", "F", "G", "H", "I",
    "J", "K", "L", "M", "N", "O", "P", "Q", "R", "S", "T", "U", "V",
    "W", "X", "Y", "Z", "bracketleft", "backslash", "bracketright",
    "asciicircum", "underscore", "quoteleft", "a", "b", "c", "d", "e",
    "f", "g", "h", "i", "j", "k", "l", "m", "n", "o", "p", "q", "r",
    "s", "t", "u", "v", "w", "x", "y", "z", "braceleft", "bar",
    "braceright", "asciitilde", "exclamdown", "cent", "sterling",
    "fraction", "yen", "florin", "section", "currency", "quotesingle",
    "quotedblleft", "guillemotleft", "guilsinglleft", "guilsinglright",
    "fi", "fl", "endash", "dagger", "daggerdbl", "periodcentered",
    "paragraph", "bullet", "quotesinglbase", "quotedblbase",
    "quotedblright", "guillemotright", "ellipsis", "perthousand",
    "questiondown", "grave", "acute", "circumflex", "tilde", "macron",
    "breve", "dotaccent", "dieresis", "ring", "cedilla",
    "hungarumlaut", "ogonek", "caron", "emdash", "AE", "ordfeminine",
    "Lslash", "Oslash", "OE", "ordmasculine", "ae", "dotlessi",
    "lslash", "oslash", "oe", "germandbls", "onesuperior",
    "logicalnot", "mu", "trademark", "Eth", "onehalf", "plusminus",
    "Thorn", "onequarter", "divide", "brokenbar", "degree", "thorn",
    "threequarters", "twosuperior", "registered", "minus", "eth",
    "multiply", "threesuperior", "copyright", "Aacute",
    "Acircumflex", "Adieresis", "Agrave", "Aring", "Atilde",
    "Ccedilla", "Eacute", "Ecircumflex", "Edieresis", "Egrave",
    "Iacute", "Icircumflex", "Idieresis", "Igrave", "Ntilde",
    "Oacute", "Ocircumflex", "Odieresis", "Ograve", "Otilde",
    "Scaron", "Uacute", "Ucircumflex", "Udieresis", "Ugrave",
    "Yacute", "Ydieresis", "Zcaron", "aacute", "acircumflex",
    "adieresis", "agrave", "aring", "atilde", "ccedilla", "eacute",
    "ecircumflex", "edieresis", "egrave", "iacute", "icircumflex",
    "idieresis", "igrave", "ntilde", "oacute", "ocircumflex",
    "odieresis", "ograve", "otilde", "scaron", "uacute",
    "ucircumflex", "udieresis", "ugrave", "yacute", "ydieresis",
    "zcaron",
)


def _sid_name(sid, strings):
    if sid < len(STANDARD_STRINGS):
        return STANDARD_STRINGS[sid]
    idx = sid - 391
    if 0 <= idx < len(strings):
        try:
            return strings[idx].decode("latin-1")
        except Exception:  # noqa: BLE001
            return None
    return None


def _parse_charset(data, off, n_glyphs):
    """charset at ``off`` -> [SID per gid] (gid 0 = .notdef, SID 0)."""
    sids = [0]
    fmt = _u8(data, off)
    if fmt == 0:
        for i in range(n_glyphs - 1):
            sids.append(_u16(data, off + 1 + 2 * i))
    elif fmt in (1, 2):
        pos = off + 1
        while len(sids) < n_glyphs:
            first = _u16(data, pos)
            n_left = _u8(data, pos + 2) if fmt == 1 else _u16(data, pos + 2)
            pos += 3 if fmt == 1 else 4
            for k in range(n_left + 1):
                if len(sids) >= n_glyphs:
                    break
                sids.append(first + k)
    else:
        raise CffError("charset format %d" % fmt)
    return sids


def _parse_encoding(data, off):
    """Encoding table at ``off`` -> {code: gid} (supplements ignored)."""
    fmt = _u8(data, off)
    base = fmt & 0x7F
    out = {}
    if base == 0:
        n_codes = _u8(data, off + 1)
        for i in range(min(n_codes, 256)):
            out[_u8(data, off + 2 + i)] = i + 1
    elif base == 1:
        n_ranges = _u8(data, off + 1)
        gid = 1
        for i in range(n_ranges):
            first = _u8(data, off + 2 + 2 * i)
            n_left = _u8(data, off + 3 + 2 * i)
            for k in range(n_left + 1):
                code = first + k
                if code < 256:
                    out[code] = gid
                gid += 1
    else:
        raise CffError("encoding format %d" % fmt)
    return out


def _op_int(top, key) -> int:
    """First operand of DICT op ``key`` as int; CffError when the op is
    absent-with-empty-operands or carries a non-numeric value."""
    vals = top.get(key)
    if not vals:
        raise CffError("DICT op %d has no operand" % key)
    try:
        return int(vals[0])
    except (TypeError, ValueError):
        raise CffError("DICT op %d operand not an int" % key)


def code_to_unicode_type1c(data: bytes) -> dict:
    """code -> unicode for a NON-CID bare-CFF program with an explicit
    Encoding table. Raises CffError for CID-keyed fonts (ROS present),
    the predefined-encoding case (offset 0/1 — needs the standard
    encoding tables; caller falls back), or ANY structural violation —
    the typed error is the whole totality contract, so unexpected
    exception types are converted, never propagated."""
    try:
        return _code_to_unicode(data)
    except CffError:
        raise
    except Exception as exc:  # noqa: BLE001 - totality net
        raise CffError("malformed CFF (%s)" % type(exc).__name__)


def _code_to_unicode(data: bytes) -> dict:
    from .fonts import glyph_to_unicode

    if len(data) < 4:
        raise CffError("truncated header")
    hdr_size = _u8(data, 2)
    names, off = parse_index(data, hdr_size)
    if not names:
        raise CffError("empty Name INDEX")
    top_dicts, off = parse_index(data, off)
    if not top_dicts:
        raise CffError("empty Top DICT INDEX")
    top = parse_dict(top_dicts[0])
    if 1230 in top:  # ROS: CID-keyed, no glyph names
        raise CffError("CID-keyed CFF")
    strings, off = parse_index(data, off)
    if len(strings) > MAX_STRINGS:
        raise CffError("%d strings" % len(strings))
    if 17 not in top:
        raise CffError("no CharStrings")
    charstrings, _ = parse_index(data, _op_int(top, 17))
    n_glyphs = len(charstrings)
    if not 0 < n_glyphs <= MAX_GLYPHS:
        raise CffError("%d glyphs" % n_glyphs)
    charset_off = _op_int(top, 15) if 15 in top else 0
    enc_off = _op_int(top, 16) if 16 in top else 0
    if enc_off in (0, 1):
        # predefined Standard/Expert encodings: not carried here
        raise CffError("predefined CFF encoding")
    if charset_off in (0, 1, 2):
        raise CffError("predefined charset")
    sids = _parse_charset(data, charset_off, n_glyphs)
    enc = _parse_encoding(data, enc_off)
    out = {}
    for code, gid in enc.items():
        if not 0 < gid < len(sids):
            continue
        name = _sid_name(sids[gid], strings)
        if name is None:
            continue
        ch = glyph_to_unicode(name)
        if ch:
            out[code] = ch
    return out
