"""Standard security handler: RC4, AES-CBC, and PDF key derivation.

From-scratch implementations (stdlib has no AES): the AES S-box, inverse
S-box, round constants, and GF(2^8) multiplication tables are *computed at
import time* from first principles (multiplicative inverse in
GF(2^8)/x^8+x^4+x^3+x+1 plus the affine transform), then the cipher is
pinned against the FIPS-197 appendix vectors in tests.

Behavioral parity targets in the reference:

* key derivation "Algorithm 2" — securityhandler.py:78-117 (password pad,
  O entry, P little-endian signed, ID[0], 50x MD5 for R>=3, EncryptMetadata
  flag for R>=4)
* user/owner authentication — securityhandler.py:121-197
* AESV3 (R6) derivation with SASLprep — securityhandler.py:15-74
* per-object key derivation (+'sAlT' for AES) — securityhandler.py:201-214
* V4/V5 crypt-filter selection (StmF/StrF -> CF -> CFM) —
  securityhandler.py:242-302
* CBC unpad takes the final byte at face value (aes.py:228-230) — kept.
"""

from __future__ import annotations

import stringprep
import unicodedata
from binascii import unhexlify
from hashlib import md5, sha256

from .model import (
    BadPasswordError, HexString, KernelError, LiteralString,
    UnsupportedFeatureError,
)

# ---------------------------------------------------------------------------
# RC4
# ---------------------------------------------------------------------------


def rc4_apply(data: bytes, key: bytes) -> bytes:
    """RC4 keystream XOR (encrypt == decrypt)."""
    S = bytearray(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + S[i] + key[i % klen]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    x = y = 0
    for i, ch in enumerate(data):
        x = (x + 1) & 0xFF
        y = (y + S[x]) & 0xFF
        S[x], S[y] = S[y], S[x]
        out[i] = ch ^ S[(S[x] + S[y]) & 0xFF]
    return bytes(out)


# ---------------------------------------------------------------------------
# AES — tables computed, not transcribed
# ---------------------------------------------------------------------------

def _gf_mul(a: int, b: int) -> int:
    """Multiply in GF(2^8) modulo x^8 + x^4 + x^3 + x + 1 (0x11B)."""
    r = 0
    while b:
        if b & 1:
            r ^= a
        a <<= 1
        if a & 0x100:
            a ^= 0x11B
        b >>= 1
    return r


def _build_tables():
    # multiplicative inverses via brute force (256 elements, import-time only)
    inv = [0] * 256
    for x in range(1, 256):
        for y in range(1, 256):
            if _gf_mul(x, y) == 1:
                inv[x] = y
                break
    sbox = [0] * 256
    for x in range(256):
        b = inv[x]
        s = 0
        for bit in range(8):
            v = ((b >> bit) ^ (b >> ((bit + 4) % 8)) ^ (b >> ((bit + 5) % 8))
                 ^ (b >> ((bit + 6) % 8)) ^ (b >> ((bit + 7) % 8)) ^ (0x63 >> bit)) & 1
            s |= v << bit
        sbox[x] = s
    inv_sbox = [0] * 256
    for x, s in enumerate(sbox):
        inv_sbox[s] = x
    rcon = [0] * 32
    rcon[1] = 1
    for i in range(2, 32):
        rcon[i] = _gf_mul(rcon[i - 1], 2)
    return bytes(sbox), bytes(inv_sbox), rcon


SBOX, INV_SBOX, RCON = _build_tables()
# precomputed GF multiplication lanes for MixColumns / its inverse
_MUL = {n: bytes(_gf_mul(n, x) for x in range(256)) for n in
        (1, 2, 3, 9, 0x0B, 0x0D, 0x0E)}


def expand_key(key: bytes) -> list[int]:
    """FIPS-197 §5.2 key schedule; returns the flat expanded byte list."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise KernelError("AES key must be 16/24/32 bytes")
    nr = nk + 6
    w = list(key)
    i = len(key)
    total = 16 * (nr + 1)
    while i < total:
        t = w[i - 4:i]
        if i % (4 * nk) == 0:
            t = t[1:] + t[:1]
            t = [SBOX[x] for x in t]
            t[0] ^= RCON[i // (4 * nk)]
        elif nk > 6 and (i % (4 * nk)) == 16:
            t = [SBOX[x] for x in t]
        w += [w[i - 4 * nk + k] ^ t[k] for k in range(4)]
        i += 4
    return w


def _encrypt_block(block, w, nr):
    s = [block[i] ^ w[i] for i in range(16)]
    for rnd in range(1, nr + 1):
        s = [SBOX[x] for x in s]
        # ShiftRows on column-major flat state
        s = [s[(i + 4 * (i % 4)) % 16] for i in range(16)]
        if rnd < nr:
            t = [0] * 16
            m2, m3 = _MUL[2], _MUL[3]
            for c in range(0, 16, 4):
                a0, a1, a2, a3 = s[c], s[c + 1], s[c + 2], s[c + 3]
                t[c] = m2[a0] ^ m3[a1] ^ a2 ^ a3
                t[c + 1] = a0 ^ m2[a1] ^ m3[a2] ^ a3
                t[c + 2] = a0 ^ a1 ^ m2[a2] ^ m3[a3]
                t[c + 3] = m3[a0] ^ a1 ^ a2 ^ m2[a3]
            s = t
        rk = w[16 * rnd:16 * (rnd + 1)]
        s = [s[i] ^ rk[i] for i in range(16)]
    return bytes(s)


def _decrypt_block(block, w, nr):
    s = [block[i] ^ w[16 * nr + i] for i in range(16)]
    for rnd in range(nr - 1, -1, -1):
        # inverse ShiftRows
        s = [s[(i - 4 * (i % 4)) % 16] for i in range(16)]
        s = [INV_SBOX[x] for x in s]
        rk = w[16 * rnd:16 * (rnd + 1)]
        s = [s[i] ^ rk[i] for i in range(16)]
        if rnd > 0:
            t = [0] * 16
            m9, mb, md_, me = _MUL[9], _MUL[0x0B], _MUL[0x0D], _MUL[0x0E]
            for c in range(0, 16, 4):
                a0, a1, a2, a3 = s[c], s[c + 1], s[c + 2], s[c + 3]
                t[c] = me[a0] ^ mb[a1] ^ md_[a2] ^ m9[a3]
                t[c + 1] = m9[a0] ^ me[a1] ^ mb[a2] ^ md_[a3]
                t[c + 2] = md_[a0] ^ m9[a1] ^ me[a2] ^ mb[a3]
                t[c + 3] = mb[a0] ^ md_[a1] ^ m9[a2] ^ me[a3]
            s = t
    return bytes(s)


def aes_cbc_decrypt(data: bytes, key: bytes, iv: bytes, unpad: bool = True) -> bytes:
    """AES-CBC decrypt; ``unpad`` strips the last byte's worth of padding
    without validation (parity quirk: aes.py:228-230)."""
    if len(data) % 16:
        raise KernelError("ciphertext length not a multiple of 16")
    w = expand_key(key)
    nr = len(key) // 4 + 6
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = data[i:i + 16]
        plain = _decrypt_block(block, w, nr)
        out.extend(p ^ v for p, v in zip(plain, prev))
        prev = block
    if unpad:
        pad = out[-1]
        return bytes(out[:-pad]) if pad else b""
    return bytes(out)


def aes_cbc_encrypt(data: bytes, key: bytes, iv: bytes, pad: bool = True) -> bytes:
    """CBC encrypt (used by round-trip tests only)."""
    if pad:
        fill = 16 - len(data) % 16
        data = data + bytes([fill]) * fill
    elif len(data) % 16:
        raise KernelError("plaintext length not a multiple of 16")
    w = expand_key(key)
    nr = len(key) // 4 + 6
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(p ^ v for p, v in zip(data[i:i + 16], prev))
        enc = _encrypt_block(block, w, nr)
        out.extend(enc)
        prev = enc
    return bytes(out)


# ---------------------------------------------------------------------------
# PDF standard security handler
# ---------------------------------------------------------------------------

PAD_BYTES = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


def saslprep(text: str) -> str:
    """RFC 4013 subset used for AESV3 passwords.
    Parity: securityhandler.py:15-32 (no bidi checks, like the reference)."""
    kept = []
    for ch in text:
        if stringprep.in_table_c12(ch):
            kept.append(" ")
        elif stringprep.in_table_b1(ch):
            continue
        elif (stringprep.in_table_c21_c22(ch) or stringprep.in_table_c3(ch)
              or stringprep.in_table_c4(ch) or stringprep.in_table_c5(ch)
              or stringprep.in_table_c6(ch) or stringprep.in_table_c7(ch)
              or stringprep.in_table_c8(ch) or stringprep.in_table_c9(ch)):
            raise KernelError("prohibited character in password")
        else:
            kept.append(ch)
    return unicodedata.normalize("NFKC", "".join(kept))


def _string_bytes(obj) -> bytes:
    """O/U/OE/UE entries may be literal or hex strings."""
    if isinstance(obj, LiteralString):
        return obj.value
    if isinstance(obj, HexString):
        return unhexlify(obj.value)
    raise KernelError("expected a string entry in the Encrypt dictionary")


def _derive_rc4_key(password: bytes, enc: dict, doc_id0: bytes) -> bytes:
    """"Algorithm 2" file-key derivation. Parity: securityhandler.py:78-117."""
    rev = enc["R"]
    if enc.get("V", 0) == 3:
        raise UnsupportedFeatureError("V=3 custom algorithm not supported")
    nbytes = enc.get("Length", 40)
    if nbytes % 8:
        raise KernelError("invalid key length")
    nbytes //= 8
    h = md5()
    h.update((password + PAD_BYTES)[:32])
    h.update(_string_bytes(enc["O"]))
    h.update(enc["P"].to_bytes(4, "little", signed=True))
    h.update(doc_id0)
    if rev >= 4 and not enc.get("EncryptMetadata", True):
        h.update(b"\xFF\xFF\xFF\xFF")
    digest = h.digest()
    if rev >= 3:
        for _ in range(50):
            digest = md5(digest[:nbytes]).digest()
    return digest[:nbytes]


def _check_user_password(password: bytes, enc: dict, doc_id0: bytes):
    """Returns the file key if the user password verifies, else None.
    Parity: securityhandler.py:121-154."""
    rev = enc["R"]
    u_entry = _string_bytes(enc["U"])
    key = _derive_rc4_key(password, enc, doc_id0)
    if rev == 2:
        probe = rc4_apply(PAD_BYTES, key)
        ok = u_entry == probe
    else:
        probe = rc4_apply(md5(PAD_BYTES + doc_id0).digest(), key)
        for step in range(1, 20):
            probe = rc4_apply(probe, bytes(b ^ step for b in key))
        ok = u_entry[:16] == probe[:16]
    return key if ok else None


def _check_owner_password(password: bytes, enc: dict, doc_id0: bytes):
    """Derive the user password from O and re-authenticate.
    Parity: securityhandler.py:158-197."""
    rev = enc["R"]
    nbytes = enc.get("Length", 40)
    if nbytes % 8:
        raise KernelError("invalid key length")
    nbytes //= 8
    digest = md5((password + PAD_BYTES)[:32]).digest()
    if rev >= 3:
        for _ in range(50):
            digest = md5(digest).digest()
    rc4_key = digest[:nbytes]
    o_entry = _string_bytes(enc["O"])
    if rev == 2:
        user_pw = rc4_apply(o_entry, rc4_key)
    else:
        user_pw = o_entry
        for step in range(19, -1, -1):
            user_pw = rc4_apply(user_pw, bytes(b ^ step for b in rc4_key))
    return _check_user_password(user_pw, enc, doc_id0)


def _derive_aesv3_key(password: str, enc: dict) -> bytes:
    """AESV3 / R6 file-key recovery. Parity: securityhandler.py:36-74."""
    u_entry = _string_bytes(enc["U"])
    o_entry = _string_bytes(enc["O"])
    pw = saslprep(password).encode("utf8")[:127]
    if sha256(pw + o_entry[32:40] + u_entry).digest() == o_entry[:32]:
        mid = sha256(pw + o_entry[-8:] + u_entry).digest()
        return aes_cbc_decrypt(_string_bytes(enc["OE"]), mid, b"\x00" * 16,
                               unpad=False)
    if sha256(pw + u_entry[32:40]).digest() == u_entry[:32]:
        mid = sha256(pw + u_entry[-8:]).digest()
        return aes_cbc_decrypt(_string_bytes(enc["UE"]), mid, b"\x00" * 16,
                               unpad=False)
    raise BadPasswordError("password does not match U or O validation")


def _object_key(file_key: bytes, obj_id: tuple, aes: bool) -> bytes:
    """Per-object key derivation. Parity: securityhandler.py:201-209."""
    ext = (file_key
           + obj_id[0].to_bytes(4, "little")[:3]
           + obj_id[1].to_bytes(4, "little")[:2])
    if aes:
        ext += b"\x73\x41\x6C\x54"  # 'sAlT'
    return md5(ext).digest()[:min(len(file_key) + 5, 16)]


class SecurityContext:
    """Per-document decryption context (one per parsed document — never
    shared across rows in a batch)."""

    def __init__(self, password, encrypt_dict: dict, doc_id: list):
        self._enc = encrypt_dict
        self._v = encrypt_dict.get("V")
        if self._v not in (0, 1, 2, 3, 4, 5):
            raise KernelError("illegal V entry in Encrypt dictionary")
        if self._v == 5:
            password = "" if password is None else password
            if isinstance(password, bytes):
                password = password.decode("utf8")
            self._key = _derive_aesv3_key(password, encrypt_dict)
        else:
            password = b"" if password is None else password
            if isinstance(password, str):
                password = password.encode("utf8")
            id0 = _string_bytes(doc_id[0]) if doc_id else b""
            self._key = _check_user_password(password, encrypt_dict, id0)
            if self._key is None:
                self._key = _check_owner_password(password, encrypt_dict, id0)
            if self._key is None:
                raise BadPasswordError("user/owner password rejected")

    def _apply_cfm(self, cfm: str, data: bytes, obj_id: tuple) -> bytes:
        if cfm == "V2":
            return rc4_apply(data, _object_key(self._key, obj_id, aes=False))
        if cfm == "AESV2":
            key = _object_key(self._key, obj_id, aes=True)
            return aes_cbc_decrypt(data[16:], key, data[:16])
        if cfm == "AESV3":
            return aes_cbc_decrypt(data[16:], self._key, data[:16])
        raise UnsupportedFeatureError("CFM %r not supported" % cfm)

    def _crypt_filter(self, which: str) -> str:
        name = self._enc.get(which)
        if name is None:
            raise KernelError("missing %s entry (V>=4)" % which)
        return name

    def _named_cfm(self, name: str) -> str:
        cf = self._enc.get("CF")
        if cf is None:
            raise KernelError("missing CF map in Encrypt dictionary")
        cfm = cf[name].get("CFM", "None")
        if cfm == "None":
            raise UnsupportedFeatureError("CFM=None not supported")
        return cfm

    def decrypt_string(self, data: bytes, obj_id: tuple) -> bytes:
        """Parity: securityhandler.py:242-267."""
        if self._v >= 4:
            name = self._crypt_filter("StrF")
            if name == "Identity":
                return data
            return self._apply_cfm(self._named_cfm(name), data, obj_id)
        return rc4_apply(data, _object_key(self._key, obj_id, aes=False))

    def decrypt_stream(self, data: bytes, meta: dict, obj_id: tuple) -> bytes:
        """Parity: securityhandler.py:270-302 (note the reference consults a
        'Filters' key and V==4 exactly; kept as-is)."""
        if self._v == 4:
            filters = meta.get("Filters")
            if isinstance(filters, list):
                filters = filters[-1]
            if filters is None or filters != "Crypt":
                name = self._crypt_filter("StmF")
            else:
                params = meta.get("DecodeParams", {})
                name = params.get("Name", "Identity")
            if name == "Identity":
                return data
            return self._apply_cfm(self._named_cfm(name), data, obj_id)
        # Parity quirk: every non-V4 revision (including V=5) takes the
        # RC4 object-key path for streams (securityhandler.py:301-302).
        return rc4_apply(data, _object_key(self._key, obj_id, aes=False))
