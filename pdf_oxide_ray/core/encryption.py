"""Standard security handler decryption (M4): RC4-40/128, empty-password
authentication.

Re-implements (from public PDF 32000-1:2008 Algorithms 2/4/5) the
computation of the reference's encryption stack:

* ``compute_encryption_key`` / ``authenticate_user_password`` / user-key
  R2/R3 (``/root/reference/src/encryption/algorithms.rs:35-173``)
* per-object key derivation (``/root/reference/src/encryption/
  handler.rs:182-200``): MD5(base_key + obj[0:3] + gen[0:2]),
  key_len = min(base+5, 16)
* RC4 stream cipher (``/root/reference/src/encryption/rc4.rs``)
* decrypt-before-defilter ordering (``/root/reference/src/object.rs:
  187-260``)

AES-128-CBC (handler V4 with the /AESV2 crypt filter) is supported via
the pure-Python FIPS-197 cipher in ``aes.py`` (validated against the
FIPS Appendix C vectors).

AES-256 (V5 with /AESV3, revisions 5 and 6) follows the reference's
surface (``/root/reference/src/encryption/mod.rs:183-231`` parses
OE/UE/Perms and maps (5,5)/(5,6) to Algorithm::Aes256) with the full
public ISO 32000-2 §7.6.4 key derivation: SHA-256 validation against
the /U validation salt (plus the Algorithm 2.B SHA-256/384/512 chain
for R6), then the file key unwrapped from /UE via AES-256-CBC with a
zero IV. V5 uses the file key directly per object (no MD5 rekeying).
"""

from __future__ import annotations

import hashlib

PADDING = (b"\x28\xBF\x4E\x5E\x4E\x75\x8A\x41\x64\x00\x4E\x56\xFF\xFA\x01\x08"
           b"\x2E\x2E\x00\xB6\xD0\x68\x3E\x80\x2F\x0C\xA9\xFE\x64\x53\x69\x7A")


def rc4_crypt(key: bytes, data: bytes) -> bytes:
    """RC4 (symmetric; reference rc4.rs)."""
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _pad_password(password: bytes) -> bytes:
    p = password[:32]
    return p + PADDING[: 32 - len(p)]


def compute_encryption_key(password: bytes, owner_key: bytes,
                           permissions: int, file_id: bytes, revision: int,
                           key_length: int,
                           encrypt_metadata: bool = True) -> bytes:
    """Algorithm 2 (algorithms.rs:35-89)."""
    h = hashlib.md5()
    h.update(_pad_password(password))
    h.update(owner_key)
    h.update((permissions & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(file_id)
    if revision >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    digest = h.digest()
    if revision >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest[:key_length]).digest()
    return digest[:key_length]


def compute_user_key_r2(key: bytes) -> bytes:
    return rc4_crypt(key, PADDING)


def compute_user_key_r3(key: bytes, file_id: bytes) -> bytes:
    digest = hashlib.md5(PADDING + file_id).digest()
    for i in range(20):
        modified = bytes(b ^ i for b in key)
        digest = rc4_crypt(modified, digest)
    return digest + b"\x00" * 16


def authenticate_user_password(password: bytes, user_key: bytes,
                               owner_key: bytes, permissions: int,
                               file_id: bytes, revision: int,
                               key_length: int) -> bytes | None:
    """algorithms.rs:106-141: derived key when the password checks out."""
    key = compute_encryption_key(password, owner_key, permissions, file_id,
                                 revision, key_length)
    expected = (compute_user_key_r3(key, file_id) if revision >= 3
                else compute_user_key_r2(key))
    if expected[:16] == user_key[:16]:
        return key
    return None


class EncryptionError(ValueError):
    pass


import functools


@functools.lru_cache(maxsize=256)
def hash_r6(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B (the R6 iterated SHA-2 hash).

    Start with SHA-256(pwd + salt + udata); then repeat: K1 = 64 copies
    of (pwd + K + udata), E = AES-128-CBC(K[0:16], iv=K[16:32], K1), and
    rehash K1... no — rehash E with SHA-{256,384,512} picked by the first
    16 bytes of E mod 3 (256 == 1 mod 3, so byte-sum mod 3 is identical).
    Stop after round >= 64 when E[-1] <= round - 32.
    """
    from .aes import aes_cbc_encrypt_nopad

    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt_nopad(k[:16], k[16:32], k1)
        mod = sum(e[:16]) % 3
        if mod == 0:
            k = hashlib.sha256(e).digest()
        elif mod == 1:
            k = hashlib.sha384(e).digest()
        else:
            k = hashlib.sha512(e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


class EncryptionHandler:
    """Standard security handler (handler.rs:38-200); empty-password auth
    at construction (mirrors the reference's lazy init,
    document.rs:206-292)."""

    def __init__(self, encrypt_dict: dict, file_id: bytes):
        filt = str(encrypt_dict.get("Filter", ""))
        if filt != "Standard":
            raise EncryptionError(f"unsupported security handler {filt!r}")
        self.v = int(encrypt_dict.get("V", 1) or 1)
        self.r = int(encrypt_dict.get("R", 2) or 2)
        self.algorithm = "rc4"
        if self.v >= 5 or self.r >= 5:
            self._init_v5(encrypt_dict)
            return
        if self.v >= 4:
            # V4: crypt filters — AESV2 (AES-128-CBC) or V2 (RC4)
            cfm = None
            cf = encrypt_dict.get("CF")
            if isinstance(cf, dict):
                stdcf = cf.get("StdCF")
                if isinstance(stdcf, dict):
                    cfm = str(stdcf.get("CFM", ""))
            if cfm == "AESV2":
                self.algorithm = "aes"
            elif cfm == "V2":
                self.algorithm = "rc4"
            else:
                raise EncryptionError(f"unsupported crypt filter {cfm!r}")
        length_bits = int(encrypt_dict.get("Length", 40) or 40)
        self.key_length = max(5, min(length_bits // 8, 16))
        o = encrypt_dict.get("O")
        u = encrypt_dict.get("U")
        if not isinstance(o, bytes) or not isinstance(u, bytes):
            raise EncryptionError("missing /O or /U")
        p = int(encrypt_dict.get("P", -1))
        key = authenticate_user_password(b"", u, o, p, file_id,
                                         self.r, self.key_length)
        if key is None:
            raise EncryptionError("empty user password rejected")
        self.key = key

    def _init_v5(self, encrypt_dict: dict) -> None:
        """AES-256 (V5, R5/R6) empty-user-password authentication:
        validate against /U's validation salt, derive the intermediate key
        from /U's key salt, unwrap the 32-byte file key from /UE
        (ISO 32000-2 §7.6.4.3.3 Algorithm 2.A steps f-g; reference
        mod.rs:183-231 carries the same OE/UE fields)."""
        from .aes import aes_cbc_decrypt_nopad

        u = encrypt_dict.get("U")
        ue = encrypt_dict.get("UE")
        if not isinstance(u, bytes) or len(u) < 48:
            raise EncryptionError("V5 requires a 48-byte /U")
        if not isinstance(ue, bytes) or len(ue) != 32:
            raise EncryptionError("V5 requires a 32-byte /UE")
        password = b""
        vsalt, ksalt = u[32:40], u[40:48]
        if self.r >= 6:
            expected = hash_r6(password, vsalt)
            intermediate = hash_r6(password, ksalt)
        else:  # R5 (Adobe ExtensionLevel 3): single SHA-256
            expected = hashlib.sha256(password + vsalt).digest()
            intermediate = hashlib.sha256(password + ksalt).digest()
        if expected != u[:32]:
            raise EncryptionError("empty user password rejected (V5)")
        self.key = aes_cbc_decrypt_nopad(intermediate, b"\x00" * 16, ue)
        self.algorithm = "aes"
        self.key_length = 32

    def _object_key(self, obj_num: int, gen_num: int) -> bytes:
        if self.key_length == 32:
            # V5: the file key is used directly — no per-object MD5 rekey
            # (ISO 32000-2 §7.6.9; contrast handler.rs:182-200 for V<=4)
            return self.key
        h = hashlib.md5()
        h.update(self.key)
        h.update(obj_num.to_bytes(4, "little")[:3])
        h.update(gen_num.to_bytes(4, "little")[:2])
        if self.algorithm == "aes":
            h.update(b"sAlT")  # handler.rs:191 AES salt
        return h.digest()[: min(len(self.key) + 5, 16)]

    def decrypt(self, data: bytes, obj_num: int, gen_num: int = 0) -> bytes:
        """Decrypt a stream/string with the per-object key: RC4, or
        AES-128-CBC with the IV prefixed (V4 /AESV2)."""
        key = self._object_key(obj_num, gen_num)
        if self.algorithm == "aes":
            from .aes import aes_cbc_decrypt

            return aes_cbc_decrypt(key, data)
        return rc4_crypt(key, data)

    def encrypt(self, data: bytes, obj_num: int, gen_num: int = 0,
                iv: bytes = b"\x00" * 16) -> bytes:
        """Inverse direction (used by the corpus generator)."""
        key = self._object_key(obj_num, gen_num)
        if self.algorithm == "aes":
            from .aes import aes_cbc_encrypt

            return aes_cbc_encrypt(key, iv, data)
        return rc4_crypt(key, data)
