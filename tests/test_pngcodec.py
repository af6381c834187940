"""kernel.pngcodec — the REAL image codec behind the multimodal seam.

Pinned independently of the encoder where possible: the known-answer
test hand-computes the filtered scanlines per the PNG 1.2 spec (§6.6)
and packs the container by hand, so a decoder that round-trips only its
own encoder's conventions cannot pass.
"""

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf4py_spark.kernel.pngcodec import (
    PNG_SIGNATURE, PngError, decode_png, encode_png,
)


def _chunk(ctype, payload):
    return (struct.pack(">I", len(payload)) + ctype + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF))


def _hand_png(width, height, color_type, scanlines):
    """Pack a container around pre-filtered scanlines (filter byte
    included per row) without using encode_png."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(scanlines)))
            + _chunk(b"IEND", b""))


def test_known_answer_all_filters_hand_packed():
    """5x3 greyscale, rows filtered by hand per PNG 1.2 §6.6.

    pixels: row0 = 10 20 30 40 50
            row1 = 15 25 35 45 55
            row2 = 12 22 32 42 52
    row0 Sub(1):  left(recon) = 0,10,20,30,40 -> 10 10 10 10 10
    row1 Up(2):   prev(recon) = row0          ->  5  5  5  5  5
    row2 Paeth(4): a=recon left, b=row1, c=row1 left
      i0: paeth(0,15,0)=15 -> 12-15 = -3 & 0xFF = 253
      i1: paeth(12,25,15): p=22, pa=10,pb=3,pc=7 -> b=25 -> 22-25=253
      i2: paeth(22,35,25): p=32, pa=10,pb=3,pc=7 -> b=35 -> 32-35=253
      i3: paeth(32,45,35): p=42 -> b=45 -> 42-45=253
      i4: paeth(42,55,45): p=52 -> b=55 -> 52-55=253
    """
    rows = [
        bytes([1, 10, 10, 10, 10, 10]),
        bytes([2, 5, 5, 5, 5, 5]),
        bytes([4, 253, 253, 253, 253, 253]),
    ]
    dec = decode_png(_hand_png(5, 3, 0, rows))
    assert dec["width"] == 5 and dec["height"] == 3
    assert dec["bit_depth"] == 8 and dec["color_type"] == 0
    assert dec["pixels"] == bytes(
        [10, 20, 30, 40, 50, 15, 25, 35, 45, 55, 12, 22, 32, 42, 52])


def test_known_answer_average_filter_rgb():
    """2x2 RGB, row1 filtered with Average(3) by hand (bpp=3).

    row0 raw (filter 0): 100 110 120 | 130 140 150
    row1 pixels:          60  70  80 |  90 100 110
      i<3: pred = (0 + prev)//2 -> (100,110,120)//2 = 50,55,60
           filt = 60-50, 70-55, 80-60 = 10, 15, 20
      i>=3: a=recon row1 left=(60,70,80), b=prev=(130,140,150)
           pred = (60+130)//2, (70+140)//2, (80+150)//2 = 95,105,115
           filt = 90-95, 100-105, 110-115 = 251, 251, 251
    """
    rows = [
        bytes([0, 100, 110, 120, 130, 140, 150]),
        bytes([3, 10, 15, 20, 251, 251, 251]),
    ]
    dec = decode_png(_hand_png(2, 2, 2, rows))
    assert dec["color_type"] == 2
    assert dec["pixels"] == bytes(
        [100, 110, 120, 130, 140, 150, 60, 70, 80, 90, 100, 110])


def test_idat_split_across_chunks():
    """IDAT payload may be split arbitrarily; the zlib stream is the
    concatenation (spec §10)."""
    px = bytes(range(12))
    whole = encode_png(px, 4, 3, 0)
    # re-pack: split the single IDAT into 3 chunks
    chunks = []
    pos = len(PNG_SIGNATURE)
    idat = b""
    while pos < len(whole):
        (ln,) = struct.unpack(">I", whole[pos:pos + 4])
        ctype = whole[pos + 4:pos + 8]
        payload = whole[pos + 8:pos + 8 + ln]
        if ctype == b"IDAT":
            idat = payload
        else:
            chunks.append((ctype, payload))
        pos += 12 + ln
    third = max(1, len(idat) // 3)
    repacked = PNG_SIGNATURE + _chunk(b"IHDR", chunks[0][1])
    for i in range(0, len(idat), third):
        repacked += _chunk(b"IDAT", idat[i:i + third])
    repacked += _chunk(b"IEND", b"")
    assert decode_png(repacked)["pixels"] == px


@settings(max_examples=60, deadline=None)
@given(st.integers(1, 9), st.integers(1, 12), st.sampled_from([0, 2]),
       st.binary(min_size=0, max_size=8))
def test_roundtrip_fuzz(width, height, color_type, seed):
    bpp = 1 if color_type == 0 else 3
    n = width * height * bpp
    pixels = bytes((seed * (n // max(len(seed), 1) + 1))[:n]) if seed \
        else bytes(n)
    assert len(pixels) == n
    dec = decode_png(encode_png(pixels, width, height, color_type))
    assert dec["pixels"] == pixels
    assert (dec["width"], dec["height"]) == (width, height)


def test_encoder_exercises_all_five_filters():
    """>=5 rows -> the filtered stream must contain every type 0..4
    (decoded from the IDAT, not trusted from the encoder's docstring)."""
    png = encode_png(bytes(range(48)), 8, 6, 0)
    pos = len(PNG_SIGNATURE)
    raw = b""
    while pos < len(png):
        (ln,) = struct.unpack(">I", png[pos:pos + 4])
        if png[pos + 4:pos + 8] == b"IDAT":
            raw += png[pos + 8:pos + 8 + ln]
        pos += 12 + ln
    scan = zlib.decompress(raw)
    ftypes = {scan[r * 9] for r in range(6)}
    assert ftypes == {0, 1, 2, 3, 4}


@pytest.mark.parametrize("mutate,msg", [
    (lambda p: b"NOPE" + p[4:], "bad PNG signature"),
    (lambda p: p[:-1], "truncated"),
    (lambda p: p[:20] + bytes([p[20] ^ 0xFF]) + p[21:], "CRC mismatch"),
    (lambda p: p[:len(PNG_SIGNATURE)], "missing IEND"),
    (lambda p: p[:len(PNG_SIGNATURE)] + _chunk(b"IEND", b""),
     "missing IHDR"),
])
def test_malformed_containers_raise(mutate, msg):
    png = encode_png(bytes(range(16)), 4, 4, 0)
    with pytest.raises(PngError, match=msg):
        decode_png(mutate(png))


def test_unsupported_shapes_raise_typed():
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    bad = (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
           + _chunk(b"IEND", b""))
    with pytest.raises(PngError, match="unsupported bit depth"):
        decode_png(bad)
    # Adam7 interlace
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    bad = (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(b"\x00" * 10))
           + _chunk(b"IEND", b""))
    with pytest.raises(PngError, match="interlace"):
        decode_png(bad)
    # garbage zlib stream
    good_ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bad = (PNG_SIGNATURE + _chunk(b"IHDR", good_ihdr)
           + _chunk(b"IDAT", b"not-zlib") + _chunk(b"IEND", b""))
    with pytest.raises(PngError, match="inflate failed"):
        decode_png(bad)
    # inflated size disagrees with IHDR dims
    bad = (PNG_SIGNATURE + _chunk(b"IHDR", good_ihdr)
           + _chunk(b"IDAT", zlib.compress(b"\x00" * 5))
           + _chunk(b"IEND", b""))
    with pytest.raises(PngError, match="decompressed size"):
        decode_png(bad)


def test_zlib_bomb_bounded_inflate():
    """ADVICE r3: a hostile PNG declaring small dimensions over a huge
    deflate stream (zlib bomb) must be rejected WITHOUT materializing
    the bomb — inflate is capped at expected+1 bytes. 100 MB of zeros
    compresses to ~100 KB; a full inflate would allocate 100 MB, the
    bounded decode allocates 7 bytes."""
    import resource

    good_ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    bomb = (PNG_SIGNATURE + _chunk(b"IHDR", good_ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * (100 * 2**20)))
            + _chunk(b"IEND", b""))
    before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    with pytest.raises(PngError, match="exceeds expected"):
        decode_png(bomb)
    after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    # ru_maxrss is KiB on Linux: peak must not have grown by ~100 MB
    assert after - before < 50 * 1024


def test_truncated_idat_stream_raises():
    """Deflate stream that ends mid-data (no terminator): typed error,
    not a silent short decode."""
    good_ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    full = zlib.compress(b"\x00" * 6)
    bad = (PNG_SIGNATURE + _chunk(b"IHDR", good_ihdr)
           + _chunk(b"IDAT", full[:len(full) - 4])
           + _chunk(b"IEND", b""))
    with pytest.raises(PngError):
        decode_png(bad)


def test_hostile_dimensions_rejected_before_inflate():
    """Review finding: the inflate cap derives from IHDR dimensions, so
    a 2^20 x 2^20 declaration would make the cap meaningless — the
    pixel-count guard must fire first (no large allocation)."""
    import resource

    ihdr = struct.pack(">IIBBBBB", 1 << 20, 1 << 20, 8, 0, 0, 0, 0)
    bomb = (PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * (4 * 2**20)))
            + _chunk(b"IEND", b""))
    before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    with pytest.raises(PngError, match="pixel cap"):
        decode_png(bomb)
    after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert after - before < 50 * 1024
