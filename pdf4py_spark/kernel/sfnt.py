"""Minimal sfnt (TrueType/OpenType) 'cmap' table reader.

Purpose: Identity-H/V composite fonts WITHOUT a /ToUnicode CMap carry
CIDs that are glyph ids (PDF 1.7 §9.7.4.2, CIDToGIDMap). The only route
from glyph id back to Unicode is the embedded font program's 'cmap'
table (OpenType spec, public), which maps Unicode codepoint -> glyph
id; inverting it recovers text the decode policy previously had to
replace with U+FFFD. This capability is beyond the reference's scope
(`/root/reference/README.md:55-65` scopes text extraction out
entirely); the table formats implemented are the ones real fonts use
for Unicode: 4 (segmented BMP), 12 (grouped full-range), 6 (trimmed),
0 (byte).

Hostile-input discipline (same rules as fonts.py's CMap caps): all
reads are bounds-checked, per-segment/group spans and the total mapped
count are capped, and any structural violation raises the typed
SfntError so callers can fall back to the U+FFFD policy instead of
crashing an executor.
"""

from __future__ import annotations

import struct

#: total codepoint->gid entries retained across all segments/groups
MAX_MAPPED = 1 << 16
#: per-group span cap for format 12 (a group claiming 2^31 chars is an
#: attack, not a font)
MAX_GROUP_SPAN = 1 << 16
#: total LOOP iterations across a subtable parse — caps CPU, not just
#: retained entries: a hostile font whose segments/groups all map gid 0
#: or out-of-range codepoints retains nothing, so MAX_MAPPED alone
#: would never fire while each group still burns 64k iterations
#: (review finding: 200 such groups in a 2.4 KB font cost ~1 s)
MAX_SCAN = 1 << 18
MAX_TABLES = 64
MAX_SUBTABLES = 32


class SfntError(ValueError):
    pass


def _u16(data, off):
    if off + 2 > len(data):
        raise SfntError("u16 read past end at %d" % off)
    return struct.unpack_from(">H", data, off)[0]


def _u32(data, off):
    if off + 4 > len(data):
        raise SfntError("u32 read past end at %d" % off)
    return struct.unpack_from(">I", data, off)[0]


def _cmap_offset(data: bytes) -> int:
    if len(data) < 12:
        raise SfntError("truncated sfnt header")
    tag = data[:4]
    if tag not in (b"\x00\x01\x00\x00", b"OTTO", b"true", b"ttcf"):
        raise SfntError("not an sfnt font program (tag %r)" % tag)
    base = 0
    if tag == b"ttcf":  # TrueType collection: use the first font
        if _u32(data, 8) < 1:
            raise SfntError("empty ttc")
        base = _u32(data, 12)
        if _u32(data, base) not in (0x00010000, 0x4F54544F):
            raise SfntError("bad ttc font header")
    num_tables = _u16(data, base + 4)
    if num_tables > MAX_TABLES:
        raise SfntError("%d tables" % num_tables)
    for i in range(num_tables):
        rec = base + 12 + 16 * i
        if rec + 16 > len(data):
            raise SfntError("table record past end")
        if data[rec:rec + 4] == b"cmap":
            return _u32(data, rec + 8)
    raise SfntError("no cmap table")


def _parse_format4(data, off):
    seg_x2 = _u16(data, off + 6)
    seg = seg_x2 // 2
    if seg == 0:
        return {}
    ends = off + 14
    starts = ends + seg_x2 + 2
    deltas = starts + seg_x2
    ranges = deltas + seg_x2
    out = {}
    scanned = 0
    for i in range(seg):
        end = _u16(data, ends + 2 * i)
        start = _u16(data, starts + 2 * i)
        if start > end:
            continue
        delta = _u16(data, deltas + 2 * i)
        roff_pos = ranges + 2 * i
        roff = _u16(data, roff_pos)
        for c in range(start, min(end, 0xFFFE) + 1):
            scanned += 1
            if len(out) >= MAX_MAPPED or scanned > MAX_SCAN:
                return out
            if roff == 0:
                gid = (c + delta) & 0xFFFF
            else:
                gid = _u16(data, roff_pos + roff + 2 * (c - start))
                if gid:
                    gid = (gid + delta) & 0xFFFF
            if gid:
                out[c] = gid
    return out


def _parse_format12(data, off):
    n_groups = _u32(data, off + 12)
    out = {}
    scanned = 0
    for i in range(n_groups):
        g = off + 16 + 12 * i
        start, end, gid0 = _u32(data, g), _u32(data, g + 4), _u32(data, g + 8)
        if end < start or end - start > MAX_GROUP_SPAN:
            raise SfntError("format12 group span %d" % (end - start))
        for k in range(end - start + 1):
            scanned += 1
            if len(out) >= MAX_MAPPED or scanned > MAX_SCAN:
                return out
            c, gid = start + k, gid0 + k
            if gid and c <= 0x10FFFF:
                out[c] = gid
    return out


def _parse_format6(data, off):
    first = _u16(data, off + 6)
    count = _u16(data, off + 8)
    out = {}
    for i in range(min(count, MAX_MAPPED)):
        gid = _u16(data, off + 10 + 2 * i)
        if gid:
            out[first + i] = gid
    return out


def _parse_format0(data, off):
    out = {}
    for c in range(256):
        if off + 6 + c >= len(data):
            raise SfntError("format0 past end")
        gid = data[off + 6 + c]
        if gid:
            out[c] = gid
    return out


_PARSERS = {4: _parse_format4, 12: _parse_format12,
            6: _parse_format6, 0: _parse_format0}

#: subtable preference: full Unicode first, then Unicode BMP, then the
#: legacy platforms (OpenType spec recommended order)
_PLATFORM_RANK = {
    (3, 10): 0, (0, 6): 0, (0, 4): 0,   # Unicode full repertoire
    (3, 1): 1, (0, 3): 1, (0, 2): 2, (0, 1): 2, (0, 0): 2,
    (1, 0): 3,                            # Macintosh Roman (last resort)
}


def _ranked_subtables(data: bytes, rank_map: dict):
    """Usable cmap subtables as [(rank, fmt, abs offset)], best first.
    A corrupt RECORD (offset past EOF, junk format) must not abort the
    whole font while a later valid subtable could still recover text —
    skip it and keep scanning."""
    cmap = _cmap_offset(data)
    n_sub = _u16(data, cmap + 2)
    if n_sub > MAX_SUBTABLES:
        raise SfntError("%d cmap subtables" % n_sub)
    found = []
    for i in range(n_sub):
        try:
            rec = cmap + 4 + 8 * i
            plat, enc = _u16(data, rec), _u16(data, rec + 2)
            sub = cmap + _u32(data, rec + 4)
            rank = rank_map.get((plat, enc))
            if rank is None:
                continue
            fmt = _u16(data, sub)
        except SfntError:
            continue
        if fmt not in _PARSERS:
            continue
        found.append((rank, fmt, sub))
    found.sort(key=lambda t: t[0])
    return found


def _parse_ranked(data: bytes, rank_map: dict, what: str) -> dict:
    """Parse subtables in rank order, falling through to the NEXT
    candidate when the best-ranked one's BODY is corrupt (r4 advice #3:
    guarding only the record reads partially defeated the stated
    skip-corrupt-and-recover intent)."""
    for _rank, fmt, sub in _ranked_subtables(data, rank_map):
        try:
            return _PARSERS[fmt](data, sub)
        except SfntError:
            continue
    raise SfntError("no usable %s cmap subtable" % what)


def unicode_to_gid(data: bytes) -> dict:
    """codepoint -> glyph id from the best parseable Unicode subtable."""
    return _parse_ranked(data, _PLATFORM_RANK, "Unicode")


#: symbol-route subtables for SYMBOLIC simple TrueType fonts (PDF 1.7
#: §9.6.6.4: no Encoding — the single-byte code is looked up in the
#: font's (3,0) symbol or (1,0) Macintosh cmap, the (3,0) codes usually
#: living at 0xF000 + code)
_SYMBOL_RANK = {(3, 0): 0, (1, 0): 1}


def code_to_gid_symbol(data: bytes) -> dict:
    """code -> glyph id from the (3,0)/(1,0) subtable (symbolic simple
    fonts). Raises SfntError when neither is present/parseable."""
    return _parse_ranked(data, _SYMBOL_RANK, "symbol")


def gid_to_unicode(data: bytes) -> dict:
    """glyph id -> unicode char (the inversion Identity-H decode needs).
    Colliding gids keep the SMALLEST codepoint, deterministically."""
    inv = {}
    for c, gid in sorted(unicode_to_gid(data).items()):
        if 0xD800 <= c <= 0xDFFF:
            continue
        if gid not in inv:
            inv[gid] = chr(c)
    return inv
