"""Font/encoding-aware decoding of show-operator strings (PDF 1.7
§9.6-9.10): ToUnicode CMaps, base encodings (Standard/WinAnsi/MacRoman),
and /Differences glyph-name overrides.

This capability is OUT of the reference's scope (it stops at raw string
operands) — it is new functionality layered on the same parsing stack.
The API is pure bytes / plain dicts so tools/make_oracle.py can drive the
IDENTICAL decode logic through the reference parser's objects: the
byte-identity gate then spans two independent parser/filter/decrypt stacks
feeding one shared decode algorithm.

Decode policy (deterministic by construction):
* font has /ToUnicode        -> CMap decode (codespace-aware byte walk);
                                unmapped codes become U+FFFD
* composite font, no CMap    -> 2-byte codes, each U+FFFD (CIDs are glyph
                                ids; not decodable without the font file)
* simple font                -> per-byte: /Differences glyph name first,
                                then the base encoding table, else U+FFFD
* no font selected           -> latin-1 passthrough (total)
"""

from __future__ import annotations

import re
import unicodedata

REPLACEMENT = "�"

# --- glyph names (Adobe Glyph List subset + algorithmic rules) ---------------

#: names that are not derivable from unicodedata lookups
_GLYPH_OVERRIDES = {
    ".notdef": "", "space": " ", "exclam": "!", "quotedbl": '"',
    "numbersign": "#", "dollar": "$", "percent": "%", "ampersand": "&",
    "quotesingle": "'", "parenleft": "(", "parenright": ")",
    "asterisk": "*", "plus": "+", "comma": ",", "hyphen": "-",
    "period": ".", "slash": "/", "zero": "0", "one": "1", "two": "2",
    "three": "3", "four": "4", "five": "5", "six": "6", "seven": "7",
    "eight": "8", "nine": "9", "colon": ":", "semicolon": ";", "less": "<",
    "equal": "=", "greater": ">", "question": "?", "at": "@",
    "bracketleft": "[", "backslash": "\\", "bracketright": "]",
    "asciicircum": "^", "underscore": "_", "grave": "`", "braceleft": "{",
    "bar": "|", "braceright": "}", "asciitilde": "~",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "endash": "–", "emdash": "—", "bullet": "•",
    "ellipsis": "…", "dagger": "†", "daggerdbl": "‡",
    "perthousand": "‰", "fraction": "⁄", "minus": "−",
    "guillemotleft": "«", "guillemotright": "»",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "exclamdown": "¡", "questiondown": "¿", "cent": "¢",
    "sterling": "£", "yen": "¥", "florin": "ƒ",
    "currency": "¤", "section": "§", "paragraph": "¶",
    "periodcentered": "·", "brokenbar": "¦",
    "copyright": "©", "registered": "®", "trademark": "™",
    "degree": "°", "plusminus": "±", "multiply": "×",
    "divide": "÷", "logicalnot": "¬", "mu": "µ",
    "onequarter": "¼", "onehalf": "½",
    "threequarters": "¾", "onesuperior": "¹",
    "twosuperior": "²", "threesuperior": "³",
    "ordfeminine": "ª", "ordmasculine": "º",
    "ae": "æ", "AE": "Æ", "oe": "œ", "OE": "Œ",
    "oslash": "ø", "Oslash": "Ø", "lslash": "ł",
    "Lslash": "Ł", "germandbls": "ß", "dotlessi": "ı",
    "dotlessj": "ȷ", "eth": "ð", "Eth": "Ð",
    "thorn": "þ", "Thorn": "Þ",
    "fi": "ﬁ", "fl": "ﬂ", "ff": "ﬀ", "ffi": "ﬃ",
    "ffl": "ﬄ",
    "acute": "´", "dieresis": "¨", "macron": "¯",
    "cedilla": "¸", "circumflex": "ˆ", "tilde": "˜",
    "breve": "˘", "dotaccent": "˙", "ring": "˚",
    "ogonek": "˛", "caron": "ˇ", "hungarumlaut": "˝",
    "Euro": "€", "Scaron": "Š", "scaron": "š",
    "Zcaron": "Ž", "zcaron": "ž", "Ydieresis": "Ÿ",
    # math / symbol names seen in real Differences arrays
    "Gamma": "Γ", "Sigma": "Σ", "pi": "π",
    "infinity": "∞", "integral": "∫", "radical": "√",
    "notequal": "≠", "lessequal": "≤", "greaterequal": "≥",
    "element": "∈", "asteriskmath": "∗",
    "arrowup": "↑", "arrowdown": "↓", "arrowleft": "←",
    "arrowright": "→", "arrowboth": "↔",
    "angleleft": "〈", "angleright": "〉",
}

#: letter + diacritic construction, e.g. 'aacute' -> LATIN SMALL LETTER A
#: WITH ACUTE (the regular AGL shape for accented Latin letters)
_DIACRITICS = {
    "acute": "ACUTE", "grave": "GRAVE", "circumflex": "CIRCUMFLEX",
    "dieresis": "DIAERESIS", "tilde": "TILDE", "ring": "RING ABOVE",
    "cedilla": "CEDILLA", "caron": "CARON", "breve": "BREVE",
    "macron": "MACRON",
}

_UNI_RE = re.compile(r"^uni([0-9A-Fa-f]{4})$")
_U_RE = re.compile(r"^u([0-9A-Fa-f]{4,6})$")


def glyph_to_unicode(name: str):
    """Glyph name -> unicode string, or None when unknown."""
    got = _GLYPH_OVERRIDES.get(name)
    if got is not None:
        return got
    if len(name) == 1:
        return name
    m = _UNI_RE.match(name) or _U_RE.match(name)
    if m:
        try:
            return chr(int(m.group(1), 16))
        except ValueError:
            return None
    # accented Latin letters: '<letter><diacritic>'
    for suffix, dia in _DIACRITICS.items():
        if name.endswith(suffix) and len(name) == len(suffix) + 1:
            base = name[0]
            if base.isalpha() and base.isascii():
                case = "CAPITAL" if base.isupper() else "SMALL"
                try:
                    return unicodedata.lookup(
                        "LATIN %s LETTER %s WITH %s"
                        % (case, base.upper(), dia))
                except KeyError:
                    return None
    return None


# --- base encodings --------------------------------------------------------------

#: StandardEncoding positions that differ from ASCII / are above 0xA0
#: (PDF 1.7 Appendix D.2, StandardEncoding column)
_STD_SPECIAL = {
    0x27: "’", 0x60: "‘",
    0xA1: "¡", 0xA2: "¢", 0xA3: "£", 0xA4: "⁄",
    0xA5: "¥", 0xA6: "ƒ", 0xA7: "§", 0xA8: "¤",
    0xA9: "'", 0xAA: "“", 0xAB: "«", 0xAC: "‹",
    0xAD: "›", 0xAE: "ﬁ", 0xAF: "ﬂ",
    0xB1: "–", 0xB2: "†", 0xB3: "‡", 0xB4: "·",
    0xB6: "¶", 0xB7: "•", 0xB8: "‚", 0xB9: "„",
    0xBA: "”", 0xBB: "»", 0xBC: "…", 0xBD: "‰",
    0xBF: "¿",
    0xC1: "`", 0xC2: "´", 0xC3: "ˆ", 0xC4: "˜",
    0xC5: "¯", 0xC6: "˘", 0xC7: "˙", 0xC8: "¨",
    0xCA: "˚", 0xCB: "¸", 0xCD: "˝", 0xCE: "˛",
    0xCF: "ˇ", 0xD0: "—",
    0xE1: "Æ", 0xE3: "ª", 0xE8: "Ł", 0xE9: "Ø",
    0xEA: "Œ", 0xEB: "º",
    0xF1: "æ", 0xF5: "ı", 0xF8: "ł", 0xF9: "ø",
    0xFA: "œ", 0xFB: "ß",
}

#: WinAnsiEncoding slots cp1252 leaves undefined
_WINANSI_UNDEFINED = frozenset((0x81, 0x8D, 0x8F, 0x90, 0x9D))

#: built-in encoding of the standard Symbol font (PDF 1.7 Appendix D.5 /
#: Adobe's public symbol encoding vector). A Symbol font with no
#: /Encoding and no /ToUnicode must NOT decode through StandardEncoding
#: (byte 0x61 is GREEK ALPHA, not 'a'). PARTIAL by design: the glyphs
#: with unambiguous Unicode (Greek, operators, arrows, card suits,
#: set/logic symbols) are mapped; the bracket/paren EXTENDER pieces
#: (parenlefttp ...) are left out and fall to U+FFFD rather than risk a
#: wrong mapping.
_SYMBOL_BUILTIN = {
    0x20: " ", 0x21: "!", 0x22: "∀", 0x23: "#", 0x24: "∃", 0x25: "%",
    0x26: "&", 0x27: "∋", 0x28: "(", 0x29: ")", 0x2A: "∗", 0x2B: "+",
    0x2C: ",", 0x2D: "−", 0x2E: ".", 0x2F: "/",
    0x3A: ":", 0x3B: ";", 0x3C: "<", 0x3D: "=", 0x3E: ">", 0x3F: "?",
    0x40: "≅",
    0x41: "Α", 0x42: "Β", 0x43: "Χ", 0x44: "Δ", 0x45: "Ε", 0x46: "Φ",
    0x47: "Γ", 0x48: "Η", 0x49: "Ι", 0x4A: "ϑ", 0x4B: "Κ", 0x4C: "Λ",
    0x4D: "Μ", 0x4E: "Ν", 0x4F: "Ο", 0x50: "Π", 0x51: "Θ", 0x52: "Ρ",
    0x53: "Σ", 0x54: "Τ", 0x55: "Υ", 0x56: "ς", 0x57: "Ω", 0x58: "Ξ",
    0x59: "Ψ", 0x5A: "Ζ", 0x5B: "[", 0x5C: "∴", 0x5D: "]", 0x5E: "⊥",
    0x5F: "_",
    0x61: "α", 0x62: "β", 0x63: "χ", 0x64: "δ", 0x65: "ε", 0x66: "φ",
    0x67: "γ", 0x68: "η", 0x69: "ι", 0x6A: "ϕ", 0x6B: "κ", 0x6C: "λ",
    0x6D: "μ", 0x6E: "ν", 0x6F: "ο", 0x70: "π", 0x71: "θ", 0x72: "ρ",
    0x73: "σ", 0x74: "τ", 0x75: "υ", 0x76: "ϖ", 0x77: "ω", 0x78: "ξ",
    0x79: "ψ", 0x7A: "ζ", 0x7B: "{", 0x7C: "|", 0x7D: "}", 0x7E: "∼",
    0xA1: "ϒ", 0xA2: "′", 0xA3: "≤", 0xA4: "⁄", 0xA5: "∞", 0xA6: "ƒ",
    0xA7: "♣", 0xA8: "♦", 0xA9: "♥", 0xAA: "♠", 0xAB: "↔", 0xAC: "←",
    0xAD: "↑", 0xAE: "→", 0xAF: "↓",
    0xB0: "°", 0xB1: "±", 0xB2: "″", 0xB3: "≥", 0xB4: "×", 0xB5: "∝",
    0xB6: "∂", 0xB7: "•", 0xB8: "÷", 0xB9: "≠", 0xBA: "≡", 0xBB: "≈",
    0xBC: "…", 0xBF: "↵",
    0xC0: "ℵ", 0xC1: "ℑ", 0xC2: "ℜ", 0xC3: "℘", 0xC4: "⊗", 0xC5: "⊕",
    0xC6: "∅", 0xC7: "∩", 0xC8: "∪", 0xC9: "⊃", 0xCA: "⊇", 0xCB: "⊄",
    0xCC: "⊂", 0xCD: "⊆", 0xCE: "∈", 0xCF: "∉",
    0xD0: "∠", 0xD1: "∇", 0xD5: "∏", 0xD6: "√", 0xD7: "⋅", 0xD8: "¬",
    0xD9: "∧", 0xDA: "∨", 0xDB: "⇔", 0xDC: "⇐", 0xDD: "⇑", 0xDE: "⇒",
    0xDF: "⇓",
    0xE0: "◊", 0xE1: "〈", 0xE5: "∑", 0xF1: "〉", 0xF2: "∫",
}
# digits 0-9 keep their ASCII identity in the Symbol vector
_SYMBOL_BUILTIN.update({c: chr(c) for c in range(0x30, 0x3A)})

#: built-in encoding of the standard ZapfDingbats font (PDF 1.7
#: Appendix D.6). Unicode's U+2700 block was TAKEN from ITC Zapf
#: Dingbats, so codes 0x21-0x7E map to 0x2700 + (code - 0x20) except
#: where Unicode 1.0 already had the symbol elsewhere (telephone,
#: pointing hands, black star, geometric shapes); the ornamental
#: brackets live at 0x80-0x8D = U+2768-2775, and the upper half carries
#: ornaments, card suits, the three circled-digit series, and arrows.
#: PARTIAL like the Symbol table: the handful of upper-range ornaments
#: whose codepoints are not certain are left to U+FFFD.
_ZAPF_EXCEPTIONS = {
    0x25: 0x260E,  # telephone
    0x2A: 0x261B,  # black right-pointing index
    0x2B: 0x261E,  # white right-pointing index
    0x48: 0x2605,  # black star
    0x6C: 0x25CF,  # black circle
    0x6E: 0x25A0,  # black square
    0x73: 0x25B2,  # black up triangle
    0x74: 0x25BC,  # black down triangle
    0x75: 0x25C6,  # black diamond
    0x77: 0x25D7,  # right half black circle
}
_ZAPF_BUILTIN = {0x20: " "}
for _c in range(0x21, 0x7F):
    _ZAPF_BUILTIN[_c] = chr(_ZAPF_EXCEPTIONS.get(_c, 0x2700 + _c - 0x20))
for _c in range(0x80, 0x8E):               # ornamental brackets
    _ZAPF_BUILTIN[_c] = chr(0x2768 + _c - 0x80)
for _c in range(0xA1, 0xA8):               # ornaments ❡-❧
    _ZAPF_BUILTIN[_c] = chr(0x2761 + _c - 0xA1)
_ZAPF_BUILTIN.update({
    0xA8: "♣", 0xA9: "♦", 0xAA: "♥", 0xAB: "♠",
    0xD4: "➔", 0xD5: "→", 0xD6: "↔", 0xD7: "↕",
})
for _c in range(0xAC, 0xB6):               # circled one..ten
    _ZAPF_BUILTIN[_c] = chr(0x2460 + _c - 0xAC)
for _c in range(0xB6, 0xC0):               # negative circled one..ten
    _ZAPF_BUILTIN[_c] = chr(0x2776 + _c - 0xB6)
for _c in range(0xC0, 0xCA):               # sans-serif circled
    _ZAPF_BUILTIN[_c] = chr(0x2780 + _c - 0xC0)
for _c in range(0xCA, 0xD4):               # negative sans-serif circled
    _ZAPF_BUILTIN[_c] = chr(0x278A + _c - 0xCA)
for _c in range(0xD8, 0xFF):               # heavy/ornamental arrows
    _ZAPF_BUILTIN[_c] = chr(0x2798 + _c - 0xD8)
del _c

#: BaseFont base name -> built-in table for the standard symbol fonts
_BUILTIN_ENCODINGS = {"Symbol": _SYMBOL_BUILTIN,
                      "ZapfDingbats": _ZAPF_BUILTIN}

_SUBSET_PREFIX = re.compile(r"^[A-Z]{6}\+")


def basefont_base(name):
    """BaseFont name with any subset prefix ('FEGJIP+Symbol') stripped."""
    if not isinstance(name, str):
        return None
    return _SUBSET_PREFIX.sub("", name)


def base_encoding_table(name):
    """Encoding name -> {code: unicode}. Unknown names fall back to
    StandardEncoding (the PDF default for nonsymbolic simple fonts)."""
    table = {}
    if name == "WinAnsiEncoding":
        for b in range(0x20, 0x100):
            if b in _WINANSI_UNDEFINED:
                continue
            try:
                table[b] = bytes([b]).decode("cp1252")
            except UnicodeDecodeError:
                pass
    elif name == "MacRomanEncoding":
        for b in range(0x20, 0x100):
            table[b] = bytes([b]).decode("mac_roman")
    else:  # StandardEncoding (and the None default)
        for b in range(0x20, 0x7F):
            table[b] = chr(b)
        table.update(_STD_SPECIAL)
    return table


# --- ToUnicode CMap --------------------------------------------------------------

_CMAP_TOKEN = re.compile(
    rb"<([0-9A-Fa-f\s]*)>"       # hex string
    rb"|\[|\]"                   # array brackets
    rb"|/[^\s/<>\[\]()]*"        # name
    rb"|[-+]?\d+"                # number
    rb"|[A-Za-z]+"               # keyword
)


def _hex_bytes(groups: bytes) -> bytes:
    digits = bytes(c for c in groups if not chr(c).isspace())
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii"))


def _utf16(dst: bytes) -> str:
    return dst.decode("utf-16-be", "replace")


class ToUnicodeCMap:
    """Parsed ToUnicode CMap: codespace-aware multi-byte code walk plus
    bfchar/bfrange lookups (PDF 1.7 §9.10.3)."""

    def __init__(self):
        self.codespaces = []        # (nbytes, lo, hi)
        self.maps = {}              # (nbytes, code) -> str
        self._lengths = [1]

    def _finish(self):
        # zero-length codespaces (malformed '<>') would consume no bytes
        # and loop forever in decode — drop them
        lens = sorted({n for n, _lo, _hi in self.codespaces if n >= 1})
        self._lengths = lens or [1]
        self.codespaces = [c for c in self.codespaces if c[0] >= 1]

    def decode(self, data: bytes) -> str:
        out = []
        i, n = 0, len(data)
        default_len = self._lengths[0]
        while i < n:
            consumed = 0
            for ln in self._lengths:
                if i + ln > n:
                    continue
                code = int.from_bytes(data[i:i + ln], "big")
                in_space = any(
                    ln == sn and lo <= code <= hi
                    for sn, lo, hi in self.codespaces)
                if in_space:
                    out.append(self.maps.get((ln, code), REPLACEMENT))
                    consumed = ln
                    break
            if not consumed:
                ln = min(default_len, n - i)
                code = int.from_bytes(data[i:i + ln], "big")
                out.append(self.maps.get((ln, code), REPLACEMENT))
                consumed = ln
            i += consumed
        return "".join(out)


# Hostile-input bounds (ADVICE r2): a ~130-byte CMap can declare
# bfrange <00000000> <ffffffff> and ask for 4B expansions. pdf.js caps the
# per-range span at 0xFFFF (MAX_MAP_RANGE in its CMap parser); we match that
# and additionally bound the whole map. Shared with tools/make_oracle.py, so
# the clamp is byte-identical on both sides of the gate.
MAX_BFRANGE_SPAN = 0xFFFF
MAX_CMAP_ENTRIES = 1 << 20


def parse_tounicode(data: bytes) -> ToUnicodeCMap:
    cmap = ToUnicodeCMap()
    toks = []
    for m in _CMAP_TOKEN.finditer(data):
        if m.group(1) is not None:
            toks.append(("hex", _hex_bytes(m.group(1))))
        else:
            toks.append(("kw", m.group(0)))
    i = 0
    while i < len(toks):
        kind, val = toks[i]
        if kind != "kw":
            i += 1
            continue
        if val == b"begincodespacerange":
            i += 1
            while (i + 1 < len(toks) and toks[i][0] == "hex"
                   and toks[i + 1][0] == "hex"):
                lo, hi = toks[i][1], toks[i + 1][1]
                cmap.codespaces.append(
                    (len(lo), int.from_bytes(lo, "big"),
                     int.from_bytes(hi, "big")))
                i += 2
        elif val == b"beginbfchar":
            i += 1
            while i + 1 < len(toks) and toks[i][0] == "hex" \
                    and toks[i + 1][0] == "hex":
                src, dst = toks[i][1], toks[i + 1][1]
                if len(cmap.maps) < MAX_CMAP_ENTRIES:
                    cmap.maps[(len(src), int.from_bytes(src, "big"))] = \
                        _utf16(dst)
                i += 2
        elif val == b"beginbfrange":
            i += 1
            # a truncated CMap must keep every fully-parsed mapping so far
            # (earlier code raised IndexError on toks[i+1]/toks[i+2] and the
            # caller dropped the whole CMap)
            while (i + 2 < len(toks) and toks[i][0] == "hex"
                   and toks[i + 1][0] == "hex"):
                lo, hi = toks[i][1], toks[i + 1][1]
                lo_i, hi_i = (int.from_bytes(lo, "big"),
                              int.from_bytes(hi, "big"))
                hi_i = min(hi_i, lo_i + MAX_BFRANGE_SPAN)
                nxt = toks[i + 2]
                if nxt == ("kw", b"["):
                    j = i + 3
                    code = lo_i
                    while j < len(toks) and toks[j] != ("kw", b"]"):
                        if (toks[j][0] == "hex" and code <= hi_i
                                and len(cmap.maps) < MAX_CMAP_ENTRIES):
                            cmap.maps[(len(lo), code)] = _utf16(toks[j][1])
                            code += 1
                        j += 1
                    i = j + 1
                elif nxt[0] == "hex":
                    dst = nxt[1]
                    base = int.from_bytes(dst, "big") if dst else 0
                    span = min(hi_i - lo_i + 1,
                               MAX_CMAP_ENTRIES - len(cmap.maps))
                    width = max(len(dst), 2)
                    for k in range(span):
                        v = base + k
                        w = max(width, (v.bit_length() + 7) // 8)
                        cmap.maps[(len(lo), lo_i + k)] = _utf16(
                            v.to_bytes(w, "big"))
                    i += 3
                else:
                    break
        else:
            i += 1
    cmap._finish()
    return cmap


# --- predefined CMaps (PDF 1.7 §9.7.5.2, Table 118) --------------------------------
#
# A Type0 font may select one of Adobe's REGISTERED CMaps by name instead
# of embedding one. For text extraction the full code->CID tables are not
# needed: what matters is code->Unicode, and for every registry Adobe
# ships, the character codes are themselves a public encoding —
#
#   * the Uni<ROS>-UCS2 / Uni<ROS>-UTF16 families: the codes ARE
#     UTF-16BE code units (the CMap maps Unicode to CIDs; extraction
#     inverts it for free, exactly)
#   * the legacy families (GBK-EUC, 90ms-RKSJ, ETen-B5, KSC-EUC, ...):
#     the codes are bytes of a standardized CJK encoding with an exact
#     stdlib codec (gbk/cp932/cp950/euc_kr/...)
#
# so the decode is table-free and exact, with two declared
# approximations: GBKp-EUC ~ gbk and B5pc ~ big5 differ from their
# platform variants in a handful of vendor code points. Unlisted
# registries (83pv/90pv/Add/Ext RKSJ Apple variants, raw CNS-EUC) keep
# the U+FFFD fallback rather than decode wrongly.

def _decode_ucs2be(data: bytes) -> str:
    """2-byte big-endian code units, code unit == BMP code point.
    Lone surrogate halves are invalid in UCS-2 -> U+FFFD; a trailing
    odd byte -> U+FFFD (same rule as the Identity path)."""
    out = []
    for i in range(0, len(data) - 1, 2):
        cu = (data[i] << 8) | data[i + 1]
        out.append(REPLACEMENT if 0xD800 <= cu <= 0xDFFF else chr(cu))
    if len(data) % 2:
        out.append(REPLACEMENT)
    return "".join(out)


def _decode_utf16be(data: bytes) -> str:
    return data.decode("utf-16-be", "replace")


def _codec_decoder(codec: str):
    def decode(data: bytes) -> str:
        return data.decode(codec, "replace")
    return decode


#: CMap base name (orientation suffix stripped) -> decoder
PREDEFINED_CMAP_DECODERS = {
    # Adobe-GB1 (Simplified Chinese)
    "UniGB-UCS2": _decode_ucs2be,
    "UniGB-UTF16": _decode_utf16be,
    "GB-EUC": _codec_decoder("gb2312"),
    "GBK-EUC": _codec_decoder("gbk"),
    "GBKp-EUC": _codec_decoder("gbk"),        # declared ~ (vendor slots)
    "GBK2K": _codec_decoder("gb18030"),
    # Adobe-CNS1 (Traditional Chinese)
    "UniCNS-UCS2": _decode_ucs2be,
    "UniCNS-UTF16": _decode_utf16be,
    "ETen-B5": _codec_decoder("cp950"),
    "ETenms-B5": _codec_decoder("cp950"),
    "B5pc": _codec_decoder("big5"),           # declared ~ (vendor slots)
    "HKscs-B5": _codec_decoder("big5hkscs"),
    # Adobe-Japan1
    "UniJIS-UCS2": _decode_ucs2be,
    "UniJIS-UCS2-HW": _decode_ucs2be,
    "UniJIS-UTF16": _decode_utf16be,
    "90ms-RKSJ": _codec_decoder("cp932"),
    "90msp-RKSJ": _codec_decoder("cp932"),
    "EUC": _codec_decoder("euc_jp"),
    # Adobe-Korea1
    "UniKS-UCS2": _decode_ucs2be,
    "UniKS-UTF16": _decode_utf16be,
    "KSC-EUC": _codec_decoder("euc_kr"),
    "KSCms-UHC": _codec_decoder("cp949"),
    "KSCms-UHC-HW": _codec_decoder("cp949"),
}


def predefined_cmap_decoder(name):
    """CMap name (e.g. 'UniGB-UCS2-H') -> fn(bytes) -> str, or None
    when the registry is unknown (caller keeps the U+FFFD policy)."""
    if not isinstance(name, str):
        return None
    base = name[:-2] if name.endswith(("-H", "-V")) else name
    return PREDEFINED_CMAP_DECODERS.get(base)


# --- decoder assembly --------------------------------------------------------------

def build_font_decoder(spec: dict):
    """spec (plain python, parser-agnostic):
        tounicode: bytes | None      decoded ToUnicode stream
        encoding: str | None         base encoding name
        differences: list | None     PDF Differences array (ints + names)
        type0: bool                  composite font
        identity: bool               Encoding is Identity-H / Identity-V
        cmap_name: str | None        Encoding NAME of a Type0 font (for
                                     the predefined-CMap registry)
        symbolic: bool               FontDescriptor Flags bit 3 (simple
                                     TrueType symbol fonts)
        fontfile: bytes | None       embedded font program (FontFile2)
        cid_to_gid: bytes | None     CIDToGIDMap stream payload (2-byte
                                     big-endian gids indexed by CID);
                                     None = /Identity
    Returns fn(bytes) -> str.

    Composite-font policy (r3 verdict #3 + r4 verdict #1): with
    /ToUnicode absent —
    * an Identity encoding + embedded TrueType program: CIDs are glyph
      ids (through CIDToGIDMap), and the font's own 'cmap' table
      (kernel.sfnt) inverted gives gid -> Unicode;
    * a predefined registered CMap name (UniGB-UCS2-H family, the
      legacy GBK/RKSJ/B5/UHC families): the character codes are a
      public encoding — decoded exactly, table-free (see
      PREDEFINED_CMAP_DECODERS above);
    * anything else: U+FFFD per 2-byte code.

    Simple-font policy (r4 verdict #5): a SYMBOLIC TrueType font with
    no /Encoding and no /Differences must NOT decode through
    StandardEncoding (its codes index the font's (3,0)/(1,0) cmap, PDF
    1.7 §9.6.6.4); with an embedded program the code -> gid -> Unicode
    chain recovers real text, else U+FFFD."""
    tu = spec.get("tounicode")
    if tu:
        try:
            cmap = parse_tounicode(tu)
            if cmap.maps:
                return cmap.decode
        except Exception:  # noqa: BLE001 - malformed CMap: fall through
            pass
    if spec.get("type0"):
        if not spec.get("identity"):
            pre = predefined_cmap_decoder(spec.get("cmap_name"))
            if pre is not None:
                return pre
        g2u = None
        if spec.get("identity") and spec.get("fontfile"):
            from .sfnt import SfntError, gid_to_unicode
            try:
                g2u = gid_to_unicode(spec["fontfile"])
            except SfntError:
                g2u = None
        c2g = spec.get("cid_to_gid")

        def decode_cid(data: bytes) -> str:
            if not g2u:
                return REPLACEMENT * ((len(data) + 1) // 2)
            out = []
            for i in range(0, len(data) - 1, 2):
                gid = (data[i] << 8) | data[i + 1]
                if c2g is not None:
                    pos = 2 * gid
                    gid = ((c2g[pos] << 8) | c2g[pos + 1]
                           if pos + 1 < len(c2g) else 0)
                out.append(g2u.get(gid, REPLACEMENT))
            if len(data) % 2:
                out.append(REPLACEMENT)
            return "".join(out)
        return decode_cid
    if spec.get("encoding") is None and not spec.get("differences"):
        if spec.get("cff"):
            # bare-CFF (Type1C) built-in encoding: code -> gid -> SID
            # -> glyph name -> AGL (kernel.cff); PDF 1.7 §9.6.6.2 says
            # a Type1 font without /Encoding uses the font's own table
            from .cff import CffError, code_to_unicode_type1c
            try:
                table = code_to_unicode_type1c(spec["cff"])

                def decode_cff(data: bytes) -> str:
                    return "".join(table.get(b, REPLACEMENT)
                                   for b in data)
                return decode_cff
            except CffError:
                pass  # CID-keyed / predefined-encoding / corrupt
        if spec.get("symbolic") and spec.get("fontfile"):
            table = _symbolic_table(spec.get("fontfile"))

            def decode_symbol(data: bytes) -> str:
                return "".join(table.get(b, REPLACEMENT) for b in data)
            return decode_symbol
        builtin = _BUILTIN_ENCODINGS.get(
            basefont_base(spec.get("basefont")))
        if builtin is not None:
            def decode_builtin(data: bytes) -> str:
                return "".join(builtin.get(b, REPLACEMENT) for b in data)
            return decode_builtin
        if spec.get("symbolic"):
            # symbolic with no program and no known builtin: codes have
            # no public semantics — U+FFFD, never StandardEncoding
            return lambda data: REPLACEMENT * len(data)
    table = base_encoding_table(spec.get("encoding"))
    diffs = spec.get("differences")
    if diffs:
        code = 0
        for item in diffs:
            if isinstance(item, bool):
                continue
            if isinstance(item, (int, float)):
                code = int(item)
            elif isinstance(item, str):
                got = glyph_to_unicode(item)
                table[code] = got if got is not None else REPLACEMENT
                code += 1

    def decode_simple(data: bytes) -> str:
        return "".join(table.get(b, REPLACEMENT) for b in data)
    return decode_simple


def _symbolic_table(fontfile):
    """code -> unicode table for a symbolic simple TrueType font: the
    byte code (tried at 0xF000+code first, the (3,0) convention, then
    bare) selects a glyph through the font's symbol cmap; the glyph
    maps back to Unicode through the font's Unicode cmap when one
    exists. Fonts with only a (3,0) subtable have no Unicode semantics
    at all — empty table, every code U+FFFD (the honest answer)."""
    if not fontfile:
        return {}
    from .sfnt import SfntError, code_to_gid_symbol, gid_to_unicode
    try:
        sym = code_to_gid_symbol(fontfile)
        g2u = gid_to_unicode(fontfile)
    except SfntError:
        return {}
    table = {}
    for b in range(256):
        gid = sym.get(0xF000 | b) or sym.get(b)
        if gid:
            ch = g2u.get(gid)
            if ch:
                table[b] = ch
    return table


def latin1_decoder(data: bytes) -> str:
    """Fallback when no font has been selected: total, reversible."""
    return data.decode("latin-1")


def font_census_line(name: str, font: dict, enc, has_tounicode: bool) -> str:
    """Canonical census line for one font resource entry. SHARED between
    the kernel (textextract.fonts_census) and the reference-driven oracle
    (tools/make_oracle.oracle_fonts_census): both parser stacks resolve
    their own objects, then format through this one function, so the
    fonts gate compares resource-tree traversal, not string formatting.

    ``enc`` must already be resolved by the caller: a name str, a dict,
    or None/absent."""
    subtype = font.get("Subtype")
    base = font.get("BaseFont")
    if isinstance(enc, str):
        enc_kind = enc
    elif isinstance(enc, dict):
        enc_kind = "<dict>"
    else:
        enc_kind = ""
    return "|".join((
        name,
        subtype if isinstance(subtype, str) else "",
        base if isinstance(base, str) else "",
        enc_kind,
        "tounicode" if has_tounicode else ""))
