"""Stream filter chain (PDF 1.7 §7.4).

Behavioral parity with /root/reference/pdf4py/_decoders.py is the contract,
*including its quirks*, because the engine's output must be byte-identical
to the reference's:

* ASCII85 has no ``z`` shortcut and iterates ``range(0, len-2, 5)``,
  silently dropping a trailing partial group of < 3 chars and decoding a
  final short group positionally (_decoders.py:132-146).
* RunLength copies ``length + 1`` literal bytes for length < 128
  (_decoders.py:155-159).
* PNG filter type 1 ("Sub") adds the *filtered* left neighbor, not the
  reconstructed one (_decoders.py:64) — wrong per the PNG spec, kept for
  parity.
* The filter chain is applied over ``reversed(Filter)`` with a single
  shared DecodeParms dict, ``Crypt`` entries skipped (_decoders.py:167-180).

New beyond the reference: ``LZWDecode`` (the reference raises
PDFUnsupportedError for it — TODO.md:10); implemented per PDF spec with
EarlyChange, feeding the same predictor pass as Flate.

Hot paths (PNG "Up", TIFF horizontal) are vectorized with numpy over the
whole buffer; results are asserted byte-equal to the scalar semantics by
the unit tests.
"""

from __future__ import annotations

import zlib

import numpy as np

from .model import KernelError, UnsupportedFeatureError

_WHITESPACE = frozenset((0x00, 0x09, 0x0A, 0x0C, 0x0D, 0x20))


def undo_tiff_predictor(data: bytes, columns: int, bits: int, colors: int) -> bytes:
    """Invert TIFF predictor 2 (horizontal differencing).

    Parity: _decoders.py:18-29. Vectorized as a per-row cumulative sum
    mod 256 across bpp-strided lanes.
    """
    if bits < 8:
        raise UnsupportedFeatureError(
            "BitsPerComponent=%d not supported for TIFF predictor" % bits)
    bpp = int(bits / 8 * colors)
    row = columns * bpp
    buf = np.frombuffer(data, dtype=np.uint8).copy()
    usable = (len(buf) // row) * row if row else 0
    if usable:
        rows = buf[:usable].reshape(-1, row)
        # cumulative sum (mod 256) along each bpp-strided lane of each row
        lanes = rows.reshape(rows.shape[0], -1, bpp)
        acc = np.cumsum(lanes.astype(np.uint64), axis=1) & 0xFF
        rows[:, :] = acc.reshape(rows.shape).astype(np.uint8)
    tail = len(buf) - usable
    if tail:
        # ragged final row: scalar pass, same arithmetic
        out = bytearray(buf[usable:].tobytes())
        for j in range(bpp, tail):
            out[j] = (out[j - bpp] + out[j]) & 0xFF
        buf[usable:] = np.frombuffer(bytes(out), dtype=np.uint8)
    return buf.tobytes()


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def undo_png_predictor(data: bytes, columns: int, bits: int, colors: int) -> bytes:
    """Invert per-scanline PNG filters (types 0-4).

    Parity: _decoders.py:47-86 — note the deliberate type-1 parity quirk
    (adds the filtered, not reconstructed, left byte). Types 0/1/2 are
    vectorized; 3/4 stay scalar (sequential data dependence).
    """
    if bits < 8:
        raise UnsupportedFeatureError(
            "BitsPerComponent=%d not supported for PNG predictor" % bits)
    bpp = int(bits / 8 * colors)
    row = columns * bpp
    out = bytearray()
    prev = bytes(row)
    view = memoryview(data)
    for base in range(0, len(data), row + 1):
        ftype = data[base]
        cur = view[base + 1:base + 1 + row]
        if ftype == 0:
            recon = bytes(cur)
        elif ftype == 1:
            arr = np.frombuffer(cur, dtype=np.uint8)
            shifted = np.zeros_like(arr)
            if len(arr) > bpp:
                shifted[bpp:] = arr[:-bpp]
            recon = (arr + shifted).astype(np.uint8).tobytes()
            recon = bytes(cur[:bpp]) + recon[bpp:]
        elif ftype == 2:
            arr = np.frombuffer(cur, dtype=np.uint8)
            parr = np.frombuffer(prev, dtype=np.uint8)[:len(arr)]
            recon = (arr + parr).astype(np.uint8).tobytes()
        elif ftype == 3:
            w = len(cur)
            rec = [0] * w
            for i in range(w):
                left = 0 if i < bpp else rec[i - bpp]
                rec[i] = (cur[i] + (left + prev[i]) // 2) & 0xFF
            recon = bytes(rec)
        elif ftype == 4:
            w = len(cur)
            rec = [0] * w
            for i in range(w):
                a = 0 if i < bpp else rec[i - bpp]
                b = prev[i]
                c = 0 if i < bpp else prev[i - bpp]
                rec[i] = (cur[i] + _paeth(a, b, c)) & 0xFF
            recon = bytes(rec)
        else:
            raise UnsupportedFeatureError(
                "PNG filter type %d not supported" % ftype)
        out.extend(recon)
        prev = recon
    return bytes(out)


def _apply_predictor(data: bytes, params: dict) -> bytes:
    predictor = params.get("Predictor", 1)
    if predictor == 1:
        return data
    columns = params.get("Columns", 1)
    colors = params.get("Colors", 1)
    bits = params.get("BitsPerComponent", 8)
    if predictor == 2:
        return undo_tiff_predictor(data, columns, bits, colors)
    if predictor >= 10:
        return undo_png_predictor(data, columns, bits, colors)
    return data


def flate_decode(data: bytes, params: dict) -> bytes:
    """zlib inflate + optional predictor pass. Parity: _decoders.py:89-103."""
    return _apply_predictor(zlib.decompress(data), params)


def lzw_decode(data: bytes, params: dict) -> bytes:
    """LZW per PDF 1.7 §7.4.4 (new capability; the reference has none —
    /root/reference/TODO.md:10). Variable 9-12 bit codes, code 256 = clear,
    257 = EOD, EarlyChange default 1, then the shared predictor pass."""
    early = params.get("EarlyChange", 1)
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    prev_entry = None
    bitbuf = 0
    nbits = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (bitbuf >> nbits) & ((1 << width) - 1)
            if code == 256:
                reset()
                prev_entry = None
                continue
            if code == 257:
                return _apply_predictor(bytes(out), params)
            if prev_entry is None:
                if code >= len(table):
                    raise KernelError(f"LZWDecode: invalid code {code}")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev_entry + entry[:1])
            elif code == len(table):   # KwKwK: the entry being defined
                entry = prev_entry + prev_entry[:1]
                table.append(entry)
            else:
                raise KernelError(
                    f"LZWDecode: code {code} beyond table ({len(table)})")
            out.extend(entry)
            prev_entry = entry
            # Bump when the next assignable code reaches 2^width - EarlyChange
            # (standard convention: with EarlyChange=1, widths grow at table
            # lengths 511/1023/2047 as in pdf.js / pdfminer).
            if len(table) + early >= (1 << width) and width < 12:
                width += 1
    return _apply_predictor(bytes(out), params)


def asciihex_decode(data: bytes, params: dict) -> bytes:
    """Parity: _decoders.py:106-114 — '>' must be the final byte."""
    if data.find(b">") != len(data) - 1:
        raise KernelError("ASCIIHexDecode: '>' terminator misplaced")
    digits = bytes(x for x in data[:-1] if x not in _WHITESPACE)
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii"))


def ascii85_decode(data: bytes, params: dict) -> bytes:
    """Parity with the reference's positional base-85 loop, quirks included
    (_decoders.py:132-146): no 'z' handling, trailing groups shorter than
    3 chars dropped, short groups decoded with positional weights and
    leading zero bytes suppressed."""
    out = bytearray()
    for i in range(0, len(data) - 2, 5):
        group = data[i:i + 5]
        value = 0
        for pos, ch in enumerate(reversed(group)):
            value += (ch - 33) * 85 ** pos
        chunk = bytearray()
        while value > 0:
            value, rem = divmod(value, 256)
            chunk.insert(0, rem)
            if value == 0:
                break
        out.extend(chunk)
    return bytes(out)


def runlength_decode(data: bytes, params: dict) -> bytes:
    """Parity: _decoders.py:149-163 including the length+1 literal-copy
    semantics."""
    out = bytearray()
    i, m = 0, len(data)
    while i < m:
        marker = data[i]
        if marker == 128:
            break
        if marker < 128:
            out.extend(data[i + 1:i + 2 + marker])
            i += marker + 2
        else:
            out.extend(data[i + 1:i + 2] * (257 - marker))
            i += 2
    return bytes(out)


def passthrough(data: bytes, params: dict) -> bytes:
    """Image codecs handed through undecoded (DCT/JPX/JBIG2).
    Parity: _decoders.py:117-129."""
    return data


FILTER_REGISTRY = {
    "FlateDecode": flate_decode,
    "LZWDecode": lzw_decode,
    "ASCIIHexDecode": asciihex_decode,
    "ASCII85Decode": ascii85_decode,
    "RunLengthDecode": runlength_decode,
    "DCTDecode": passthrough,
    "JPXDecode": passthrough,
    "JBIG2Decode": passthrough,
}


def register_filter(name: str, func=None):
    """Plugin seam mirroring the reference's decoder registry
    (_decoders.py:7-14); usable directly or as a decorator."""
    if func is None:
        def wrap(f):
            FILTER_REGISTRY[name] = f
            return f
        return wrap
    FILTER_REGISTRY[name] = func
    return func


def run_filter_chain(meta: dict, data: bytes) -> bytes:
    """Apply ``meta['Filter']`` (name or list) in reverse, skipping Crypt.
    Parity: _decoders.py:167-180."""
    chain = meta.get("Filter")
    if chain is None:
        return data
    if not isinstance(chain, list):
        chain = (chain,)
    params = meta.get("DecodeParms", {})
    if params is None:
        params = {}
    for name in reversed(chain):
        if name == "Crypt":
            continue
        fn = FILTER_REGISTRY.get(name)
        if fn is None:
            raise UnsupportedFeatureError("filter %r not supported" % name)
        data = fn(data, params)
    return data
