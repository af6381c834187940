"""kernel.sfnt — embedded TrueType 'cmap' parsing for Identity-H decode
(r3 verdict #3). Builder-independent where possible: the format-4 hostile
cases are hand-packed, and the end-to-end fixture decode is asserted
against literal expected text through BOTH parser stacks elsewhere
(tools/make_oracle.py golden regeneration)."""

import struct

import pytest

from pdf4py_spark.kernel.sfnt import (
    MAX_GROUP_SPAN, SfntError, gid_to_unicode, unicode_to_gid,
)
from pdf4py_spark.sources.synthpdf import (
    EXPECTED_F1, EXPECTED_F2, EXPECTED_TEXT, identity_h_pdf, make_truetype,
)


def test_format4_roundtrip():
    font, char_to_gid = make_truetype(EXPECTED_F1, fmt=4)
    assert unicode_to_gid(font) == char_to_gid
    inv = gid_to_unicode(font)
    assert "".join(inv[char_to_gid[ord(c)]] for c in EXPECTED_F1) \
        == EXPECTED_F1


def test_format12_roundtrip_including_non_bmp():
    font, char_to_gid = make_truetype(EXPECTED_F2, fmt=12)
    assert unicode_to_gid(font) == char_to_gid
    assert 0x1D11E in char_to_gid  # the non-BMP codepoint is exercised
    inv = gid_to_unicode(font)
    assert "".join(inv[char_to_gid[ord(c)]] for c in EXPECTED_F2) \
        == EXPECTED_F2


def test_gid_collision_keeps_smallest_codepoint():
    font, _ = make_truetype("A", fmt=4)
    # hand-build a format-12 font mapping two codepoints to ONE gid
    sub = struct.pack(">HHIII", 12, 0, 16 + 24, 0, 2)
    sub += struct.pack(">III", 0x41, 0x41, 5)   # 'A' -> gid 5
    sub += struct.pack(">III", 0x61, 0x61, 5)   # 'a' -> gid 5 too
    cmap = struct.pack(">HHHHI", 0, 1, 3, 10, 12) + sub
    from pdf4py_spark.sources.synthpdf import _sfnt
    font = _sfnt({"cmap": cmap})
    assert gid_to_unicode(font) == {5: "A"}


def test_hostile_inputs_raise_typed():
    with pytest.raises(SfntError):
        unicode_to_gid(b"nota-font")
    with pytest.raises(SfntError):
        unicode_to_gid(b"\x00\x01\x00\x00" + b"\x00" * 8)  # no tables
    # format-12 group spanning 2^31 codepoints: rejected, not allocated
    # (and with no other subtable to fall back to, the font is unusable)
    sub = struct.pack(">HHIII", 12, 0, 28, 0, 1)
    sub += struct.pack(">III", 0, MAX_GROUP_SPAN + 2, 1)
    cmap = struct.pack(">HHHHI", 0, 1, 3, 10, 12) + sub
    from pdf4py_spark.sources.synthpdf import _sfnt
    with pytest.raises(SfntError, match="no usable"):
        unicode_to_gid(_sfnt({"cmap": cmap}))
    # truncated subtable offset past end
    cmap = struct.pack(">HHHHI", 0, 1, 3, 1, 9999)
    with pytest.raises(SfntError):
        unicode_to_gid(_sfnt({"cmap": cmap}))


def test_corrupt_best_subtable_falls_through_to_next_rank():
    """r4 advice #3: when the BEST-ranked subtable's body is corrupt
    (here a bomb-span (3,10) format-12), a valid lower-ranked (3,1)
    subtable must still recover the mapping instead of the whole font
    collapsing to U+FFFD."""
    from pdf4py_spark.sources.synthpdf import _cmap_format4, _sfnt
    bad = struct.pack(">HHIII", 12, 0, 28, 0, 1)
    bad += struct.pack(">III", 0, MAX_GROUP_SPAN + 2, 1)
    good = _cmap_format4({0x41: 7})
    n = 2
    off0 = 4 + 8 * n
    cmap = struct.pack(">HH", 0, n) + \
        struct.pack(">HHI", 3, 10, off0) + \
        struct.pack(">HHI", 3, 1, off0 + len(bad)) + bad + good
    assert unicode_to_gid(_sfnt({"cmap": cmap})) == {0x41: 7}


def test_identity_h_pdf_decodes_real_text():
    """End to end through OUR stack: Identity-H without ToUnicode used
    to decode to U+FFFD; with the embedded cmap it must be the literal
    text — format 4, format 12 (non-BMP), and the CIDToGIDMap-stream
    font all in one document."""
    from pdf4py_spark.kernel.parser import DocumentParser
    from pdf4py_spark.kernel.textextract import extract_pdf_text_unicode
    doc = DocumentParser(identity_h_pdf())
    assert extract_pdf_text_unicode(doc).decode("utf-8") == EXPECTED_TEXT
    assert "�" not in EXPECTED_TEXT


def test_identity_h_without_fontfile_still_replacement():
    """The declared fallback survives: no embedded program -> U+FFFD per
    CID (the old policy), never a crash."""
    from pdf4py_spark.kernel.fonts import build_font_decoder
    dec = build_font_decoder({"type0": True, "identity": True})
    assert dec(b"\x00\x05\x00\x06") == "��"
    # corrupt font program: typed error inside -> fallback, not a raise
    dec = build_font_decoder(
        {"type0": True, "identity": True, "fontfile": b"garbage"})
    assert dec(b"\x00\x05") == "�"


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_sfnt_fuzz_total(data):
    """Totality: arbitrary bytes either parse to a dict or raise the
    typed SfntError — never any other exception (the decoder falls back
    to U+FFFD on SfntError; anything else would crash an executor)."""
    try:
        out = unicode_to_gid(data)
        assert isinstance(out, dict)
    except SfntError:
        pass


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=300), st.integers(0, 3))
def test_sfnt_fuzz_mutated_valid_font(tail, which):
    """Structured fuzz: a VALID font with its table area truncated /
    overwritten must stay total too (exercises the bounds checks past
    the header, which random bytes rarely reach)."""
    font, _ = make_truetype(EXPECTED_F1, fmt=4)
    if which == 0:
        data = font[: max(12, len(font) - len(tail) - 1)] + tail
    elif which == 1:
        data = font[:30] + tail + font[30 + len(tail):]
    elif which == 2:
        data = font[:60] + tail + font[60 + len(tail):]
    else:
        data = font + tail
    try:
        out = unicode_to_gid(data)
        assert isinstance(out, dict)
    except SfntError:
        pass


def test_hostile_font_cpu_bounded():
    """Review finding: groups that retain nothing (gid 0 / out-of-range
    codepoints) must not bypass the scan budget — 2000 empty 64k-spans
    would be ~1.3e8 iterations unbounded; with MAX_SCAN it returns in
    well under a second."""
    import time

    from pdf4py_spark.sources.synthpdf import _sfnt
    groups = [struct.pack(">III", 0x200000 + i * 0x20000,
                          0x200000 + i * 0x20000 + 0xFFFF, 1)
              for i in range(2000)]
    sub = struct.pack(">HHIII", 12, 0, 16 + 12 * len(groups), 0,
                      len(groups)) + b"".join(groups)
    cmap = struct.pack(">HHHHI", 0, 1, 3, 10, 12) + sub
    font = _sfnt({"cmap": cmap})
    t0 = time.perf_counter()
    out = unicode_to_gid(font)
    assert time.perf_counter() - t0 < 2.0
    assert out == {}


def test_corrupt_first_subtable_record_does_not_abort_font():
    """Review finding: a record whose offset points past EOF must be
    skipped, not abort the font, when a later valid subtable exists."""
    font, char_to_gid = make_truetype(EXPECTED_F1, fmt=4)
    # prepend a (3,1) record with a hostile offset before the real one
    cmap_off = font.find(b"cmap")
    import struct as _s
    table_off = _s.unpack(">I", font[cmap_off + 8:cmap_off + 12])[0]
    # rebuild the cmap table with 2 records: bad first, good second
    good_sub = font[table_off + 12:]  # the format-4 subtable bytes
    new_cmap = (_s.pack(">HH", 0, 2)
                + _s.pack(">HHI", 3, 1, 0xFFFFFF)   # bad offset
                + _s.pack(">HHI", 3, 1, 20)          # good record
                + good_sub)
    from pdf4py_spark.sources.synthpdf import _sfnt
    rebuilt = _sfnt({"cmap": new_cmap})
    assert unicode_to_gid(rebuilt) == char_to_gid
