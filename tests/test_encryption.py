"""M4 RC4 encryption tests, mirroring the reference's algorithm suites
(algorithms.rs:193-260, handler.rs:214-240) plus generator roundtrips."""

import random

import pytest

from pdf_oxide_ray.core.encryption import (
    PADDING,
    EncryptionError,
    EncryptionHandler,
    authenticate_user_password,
    compute_encryption_key,
    compute_user_key_r2,
    compute_user_key_r3,
    rc4_crypt,
)
from pdf_oxide_ray.core.payload import extract_payload
from pdf_oxide_ray.gen.transcripts import make_pdf_payload


def test_rc4_roundtrip_and_known_vector():
    # RFC 6229-style check: RC4("Key", "Plaintext")
    out = rc4_crypt(b"Key", b"Plaintext")
    assert out.hex() == "bbf316e8d940af0ad3"
    assert rc4_crypt(b"Key", out) == b"Plaintext"


def test_padding_constant():
    assert len(PADDING) == 32
    assert PADDING[0] == 0x28


def test_key_derivation_revisions_differ():
    o = bytes(range(32))
    fid = bytes(range(16))
    k2 = compute_encryption_key(b"", o, -44, fid, 2, 5)
    k3 = compute_encryption_key(b"", o, -44, fid, 3, 16)
    assert len(k2) == 5
    assert len(k3) == 16
    assert k2 != k3[:5]


def test_authenticate_empty_password():
    o = bytes(range(32))
    fid = bytes(range(16))
    for rev, klen in ((2, 5), (3, 16)):
        key = compute_encryption_key(b"", o, -44, fid, rev, klen)
        u = (compute_user_key_r3(key, fid) if rev >= 3
             else compute_user_key_r2(key))
        got = authenticate_user_password(b"", u, o, -44, fid, rev, klen)
        assert got == key
        # wrong password rejected
        assert authenticate_user_password(b"wrong", u, o, -44, fid,
                                          rev, klen) is None


def test_handler_rejects_aes():
    with pytest.raises(EncryptionError):
        EncryptionHandler({"Filter": "Standard", "V": 4, "R": 4,
                           "O": b"\x00" * 32, "U": b"\x00" * 32, "P": -1},
                          b"")


def test_object_key_length_cap():
    o = bytes(range(32))
    fid = bytes(range(16))
    key = compute_encryption_key(b"", o, -44, fid, 3, 16)
    u = compute_user_key_r3(key, fid)
    h = EncryptionHandler({"Filter": "Standard", "V": 2, "R": 3,
                           "Length": 128, "O": o, "U": u, "P": -44}, fid)
    assert len(h._object_key(1, 0)) == 16  # min(16+5, 16)


def test_generator_encrypted_pdfs_extract():
    n = 0
    for seed in range(150):
        payload = make_pdf_payload(random.Random(seed))
        if "/Encrypt" not in payload:
            continue
        n += 1
        # utf-8 string round trip (the parquet transport)
        res = extract_payload(payload.encode("utf-8").decode("utf-8"))
        assert res["status"] == "ok", res["error"][:200]
        assert res["extracted_text"].strip()
    assert n >= 3


def test_aes_fips_vector():
    from pdf_oxide_ray.core.aes import (aes128_decrypt_block,
                                        aes128_encrypt_block)

    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = aes128_encrypt_block(key, pt)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"  # FIPS-197 C.1
    assert aes128_decrypt_block(key, ct) == pt


def test_aes_cbc_roundtrip_and_padding():
    from pdf_oxide_ray.core.aes import aes_cbc_decrypt, aes_cbc_encrypt

    key = b"0123456789abcdef"
    for n in (0, 1, 15, 16, 17, 100):
        data = bytes(range(256))[:n]
        enc = aes_cbc_encrypt(key, b"\x07" * 16, data)
        assert len(enc) % 16 == 0 and len(enc) >= 32
        assert aes_cbc_decrypt(key, enc) == data
    # invalid payloads pass through rather than raising
    assert aes_cbc_decrypt(key, b"short") == b"short"


def test_handler_v4_aesv2_accepted():
    from pdf_oxide_ray.core.encryption import (EncryptionHandler,
                                               compute_encryption_key,
                                               compute_user_key_r3)

    o = bytes(range(32))
    fid = bytes(range(16))
    key = compute_encryption_key(b"", o, -44, fid, 4, 16)
    u = compute_user_key_r3(key, fid)
    h = EncryptionHandler(
        {"Filter": "Standard", "V": 4, "R": 4, "Length": 128,
         "CF": {"StdCF": {"CFM": "AESV2", "Length": 16}},
         "O": o, "U": u, "P": -44}, fid)
    assert h.algorithm == "aes"
    # encrypt/decrypt roundtrip through the per-object key
    data = b"stream contents here"
    enc = h.encrypt(data, 7, iv=b"\x05" * 16)
    assert h.decrypt(enc, 7) == data
    assert h.decrypt(enc, 8) != data  # different object key


def test_handler_v5_malformed_rejected():
    # a V5 dict without the 48-byte /U + 32-byte /UE must raise cleanly
    with pytest.raises(EncryptionError):
        EncryptionHandler({"Filter": "Standard", "V": 5, "R": 6,
                           "CF": {"StdCF": {"CFM": "AESV3"}},
                           "O": b"\x00" * 32, "U": b"\x00" * 32, "P": -1},
                          b"")


def test_aes256_fips_vector():
    # FIPS-197 Appendix C.3
    from pdf_oxide_ray.core.aes import _decrypt_block, _encrypt_block, _expand_key

    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f"
                        "101112131415161718191a1b1c1d1e1f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = _encrypt_block(pt, _expand_key(key))
    assert ct.hex() == "8ea2b7ca516745bfeafc49904b496089"
    assert _decrypt_block(ct, _expand_key(key)) == pt


def test_hash_r6_deterministic_and_sized():
    from pdf_oxide_ray.core.encryption import hash_r6

    a = hash_r6(b"", b"saltsalt")
    assert len(a) == 32
    assert hash_r6(b"", b"saltsalt") == a
    assert hash_r6(b"", b"other-sa") != a
    assert hash_r6(b"pw", b"saltsalt", b"u" * 48) != a


def _v5_dict(revision: int):
    """Build a V5 encrypt dict + matching handler inputs by hand."""
    import hashlib

    from pdf_oxide_ray.core.aes import aes_cbc_encrypt_nopad
    from pdf_oxide_ray.core.encryption import hash_r6

    file_key = bytes(range(32))
    vsalt, ksalt = b"\x11" * 8, b"\x22" * 8
    if revision == 6:
        u_hash = hash_r6(b"", vsalt)
        inter = hash_r6(b"", ksalt)
    else:
        u_hash = hashlib.sha256(vsalt).digest()
        inter = hashlib.sha256(ksalt).digest()
    u = u_hash + vsalt + ksalt
    ue = aes_cbc_encrypt_nopad(inter, b"\x00" * 16, file_key)
    return ({"Filter": "Standard", "V": 5, "R": revision, "Length": 256,
             "CF": {"StdCF": {"CFM": "AESV3", "Length": 32}},
             "O": b"\x00" * 48, "OE": b"\x00" * 32,
             "U": u, "UE": ue, "P": -44}, file_key)


@pytest.mark.parametrize("revision", [5, 6])
def test_handler_v5_roundtrip(revision):
    enc, file_key = _v5_dict(revision)
    h = EncryptionHandler(enc, b"")
    assert h.key == file_key
    assert h.key_length == 32
    data = b"stream contents for AES-256"
    ct = h.encrypt(data, 3, iv=b"\x07" * 16)
    assert h.decrypt(ct, 3) == data
    # V5 keys are NOT per-object: any object number decrypts
    assert h.decrypt(ct, 99) == data


def test_generator_v5_pdfs_extract():
    n = n6 = 0
    for seed in range(1200):
        payload = make_pdf_payload(random.Random(seed))
        if "/AESV3" not in payload:
            continue
        n += 1
        if "/R 6" in payload:
            n6 += 1
        res = extract_payload(payload)
        assert res["status"] == "ok", res["error"][:200]
        assert res["extracted_text"].strip()
    assert n >= 2


def test_generator_aes_pdfs_extract():
    n = 0
    for seed in range(300):
        payload = make_pdf_payload(random.Random(seed))
        if "/AESV2" not in payload:
            continue
        n += 1
        res = extract_payload(payload.encode("utf-8").decode("utf-8"))
        assert res["status"] == "ok", res["error"][:200]
        assert res["extracted_text"].strip()
    assert n >= 2


def test_fast_cbc_backend_matches_pure(monkeypatch):
    """When the optional cryptography backend is present, all four CBC
    entry points must agree byte-for-byte with the pure FIPS-197
    fallback on random vectors (keys of 16/24/32 bytes, messages of
    0..5 blocks +/- padding)."""
    import random

    from pdf_oxide_ray.core import aes

    if not aes.HAVE_FAST_AES:
        pytest.skip("cryptography backend not present")
    rng = random.Random(20260817)

    def rb(n):
        return bytes(rng.getrandbits(8) for _ in range(n))

    for klen in (16, 24, 32):
        for blocks in (1, 2, 5):
            key, iv = rb(klen), rb(16)
            aligned, ragged = rb(16 * blocks), rb(16 * blocks - 7)
            fast = {
                "enc": aes.aes_cbc_encrypt(key, iv, ragged),
                "enc_np": aes.aes_cbc_encrypt_nopad(key, iv, aligned),
                "dec_np": aes.aes_cbc_decrypt_nopad(key, iv, aligned),
            }
            fast["dec"] = aes.aes_cbc_decrypt(key, fast["enc"])
            with monkeypatch.context() as m:
                m.setattr(aes, "_cbc_fast", None)
                pure = {
                    "enc": aes.aes_cbc_encrypt(key, iv, ragged),
                    "enc_np": aes.aes_cbc_encrypt_nopad(key, iv, aligned),
                    "dec_np": aes.aes_cbc_decrypt_nopad(key, iv, aligned),
                }
                pure["dec"] = aes.aes_cbc_decrypt(key, fast["enc"])
            assert fast == pure
            assert fast["dec"] == ragged
