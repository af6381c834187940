"""Real PNG codec (pure stdlib: zlib inflate + spec-correct defilter).

This is the image leg of the multimodal decode seam. Unlike
``kernel.filters.undo_png_predictor`` — which deliberately keeps the
reference's wrong type-1 "Sub" arithmetic for byte-parity with
/root/reference/pdf4py/_decoders.py:64 — this module implements the PNG
specification (RFC 2083 / W3C PNG 1.2 §6) correctly: the Sub and Average
and Paeth filters reconstruct against the *reconstructed* left neighbor.
The two must stay separate; sharing them would silently corrupt one side.

Scope (honest and declared): 8-bit samples, greyscale (color type 0) and
truecolor RGB (color type 2), no interlace. Palette/alpha/16-bit/Adam7
raise ``PngError`` — at 100 TB an unsupported image quarantines with a
typed error instead of emitting wrong pixels.

The encoder exists so the gated query can round-trip through REAL filter
arithmetic: it cycles the row filter through all five types (row % 5),
so decoding a multi-row image exercises None/Sub/Up/Average/Paeth and a
single-filter shortcut cannot pass. Compression is stdlib zlib — an
external, battle-tested codec on both directions.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: max decoded pixel count (64 Mpx ~ 192 MB RGB) — bounds the inflate
#: budget a hostile IHDR can demand
MAX_PIXELS = 1 << 26

#: bytes per pixel by color type (8-bit depth only)
_BPP = {0: 1, 2: 3}


class PngError(ValueError):
    """Malformed or unsupported PNG container."""


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))


def _filter_row(ftype: int, cur: bytes, recon_prev: bytes, bpp: int) -> bytes:
    """Forward filter one scanline (encoder side), spec §6.6."""
    w = len(cur)
    out = bytearray(w)
    for i in range(w):
        a = cur[i - bpp] if i >= bpp else 0
        b = recon_prev[i]
        c = recon_prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        else:
            pred = _paeth(a, b, c)
        out[i] = (cur[i] - pred) & 0xFF
    return bytes(out)


def _unfilter_row(ftype: int, cur, recon_prev, bpp: int) -> bytes:
    """Reconstruct one scanline (decoder side), spec §6.6 — against the
    RECONSTRUCTED left neighbor, unlike the PDF-parity variant."""
    if ftype not in (0, 1, 2, 3, 4):
        raise PngError("invalid scanline filter type %d" % ftype)
    w = len(cur)
    out = bytearray(w)
    for i in range(w):
        a = out[i - bpp] if i >= bpp else 0
        b = recon_prev[i]
        c = recon_prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        else:
            pred = _paeth(a, b, c)
        out[i] = (cur[i] + pred) & 0xFF
    return bytes(out)


def iter_chunks(data: bytes):
    """Walk the chunk stream after the signature, verifying each CRC."""
    pos = len(PNG_SIGNATURE)
    n = len(data)
    while pos < n:
        if pos + 8 > n:
            raise PngError("truncated chunk header at offset %d" % pos)
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body_end = pos + 8 + length
        if body_end + 4 > n:
            raise PngError("truncated %r chunk at offset %d"
                           % (ctype, pos))
        payload = data[pos + 8:body_end]
        (crc,) = struct.unpack(">I", data[body_end:body_end + 4])
        if crc != zlib.crc32(ctype + payload) & 0xFFFFFFFF:
            raise PngError("CRC mismatch in %r chunk" % ctype)
        yield ctype, payload
        pos = body_end + 4
        if ctype == b"IEND":
            return
    raise PngError("missing IEND chunk")


def decode_png(data: bytes) -> dict:
    """Parse container, inflate IDAT, defilter scanlines.

    Returns ``{"width", "height", "bit_depth", "color_type", "pixels"}``
    where pixels is the raw reconstructed sample bytes (row-major, no
    per-row filter byte). Raises PngError on anything malformed or out
    of the declared scope, so callers can quarantine with a typed error.
    """
    if not data.startswith(PNG_SIGNATURE):
        raise PngError("bad PNG signature")
    ihdr = None
    idat = bytearray()
    saw_end = False
    for ctype, payload in iter_chunks(data):
        if ctype == b"IHDR":
            if ihdr is not None:
                raise PngError("duplicate IHDR")
            if len(payload) != 13:
                raise PngError("IHDR length %d != 13" % len(payload))
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif ctype == b"IDAT":
            if ihdr is None:
                raise PngError("IDAT before IHDR")
            idat.extend(payload)
        elif ctype == b"IEND":
            saw_end = True
    if ihdr is None:
        raise PngError("missing IHDR")
    if not saw_end:
        raise PngError("missing IEND chunk")
    width, height, bit_depth, color_type, comp, filt, interlace = ihdr
    if width == 0 or height == 0:
        raise PngError("zero image dimension")
    # the bounded-inflate cap below is DERIVED from these dimensions,
    # so they must themselves be bounded first — otherwise a hostile
    # IHDR declaring 2^20 x 2^20 makes 'expected' ~4e12 and the cap
    # meaningless (review finding)
    if width * height > MAX_PIXELS:
        raise PngError("declared dimensions %dx%d exceed pixel cap"
                       % (width, height))
    if comp != 0 or filt != 0:
        raise PngError("unknown compression/filter method")
    if interlace != 0:
        raise PngError("Adam7 interlace not supported")
    if bit_depth != 8 or color_type not in _BPP:
        raise PngError("unsupported bit depth %d / color type %d"
                       % (bit_depth, color_type))
    bpp = _BPP[color_type]
    row = width * bpp
    expected = (row + 1) * height
    # Bounded inflate: a hostile PNG (zlib bomb, or huge declared
    # dimensions) must not allocate unbounded memory on an executor.
    # Decompress at most expected+1 bytes — one byte of slack detects
    # "too long" without materializing the overflow.
    try:
        dobj = zlib.decompressobj()
        raw = dobj.decompress(bytes(idat), expected + 1)
    except zlib.error as exc:
        raise PngError("IDAT inflate failed: %s" % exc) from exc
    if len(raw) > expected:
        raise PngError("decompressed size exceeds expected %d" % expected)
    if not dobj.eof:
        # output fits but the deflate stream didn't terminate: either
        # truncated input or more data pending beyond the cap
        raise PngError("truncated or oversized IDAT stream "
                       "(expected %d bytes)" % expected)
    if len(raw) != expected:
        raise PngError("decompressed size %d != expected %d"
                       % (len(raw), expected))
    view = memoryview(raw)
    out = bytearray()
    prev = bytes(row)
    for y in range(height):
        base = y * (row + 1)
        recon = _unfilter_row(raw[base], view[base + 1:base + 1 + row],
                              prev, bpp)
        out.extend(recon)
        prev = recon
    return {"width": width, "height": height, "bit_depth": bit_depth,
            "color_type": color_type, "pixels": bytes(out)}


def encode_png(pixels: bytes, width: int, height: int,
               color_type: int = 0) -> bytes:
    """Write a PNG whose row filters cycle 0..4 (row % 5), so a decoder
    must implement every filter type correctly to round-trip."""
    if color_type not in _BPP:
        raise PngError("unsupported color type %d" % color_type)
    bpp = _BPP[color_type]
    row = width * bpp
    if len(pixels) != row * height:
        raise PngError("pixel buffer %d != %d*%d*%d"
                       % (len(pixels), width, height, bpp))
    prev = bytes(row)
    filtered = bytearray()
    for y in range(height):
        cur = pixels[y * row:(y + 1) * row]
        ftype = y % 5
        filtered.append(ftype)
        filtered.extend(_filter_row(ftype, cur, prev, bpp))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(filtered), 6))
            + _chunk(b"IEND", b""))
