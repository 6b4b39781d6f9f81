"""Filter pipeline tests (reference src/decoders/* semantics)."""

import base64
import zlib

import pytest

from pdf_oxide_ray.core.decoders import (
    DecodeError, apply_png_predictor, ascii85_decode, ascii_hex_decode,
    decode_stream, flate_decode, lzw_decode, run_length_decode,
)


def test_flate_roundtrip():
    data = b"The quick brown fox" * 10
    assert flate_decode(zlib.compress(data)) == data


def test_ascii_hex():
    assert ascii_hex_decode(b"48 65 6C 6C 6F>") == b"Hello"
    assert ascii_hex_decode(b"484>") == b"H@"  # odd padded


def test_ascii85_roundtrip():
    data = b"Hello, world! 1234"
    enc = base64.a85encode(data) + b"~>"
    assert ascii85_decode(enc) == data


def test_run_length():
    # literal run: length 2 -> 3 bytes; repeat run: 257-254=3 copies
    enc = bytes([2]) + b"abc" + bytes([254]) + b"z" + bytes([128])
    assert run_length_decode(enc) == b"abczzz"


def _lzw_encode(data: bytes) -> bytes:
    """Minimal PDF LZW encoder for the round-trip test."""
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out_bits = []

    def emit(code, width):
        out_bits.append((code, width))

    emit(256, width)  # clear
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
        else:
            emit(table[w], width)
            if next_code >= 4095:  # 12-bit table full: emit CLEAR, reset
                emit(256, width)
                table = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
            else:
                table[wc] = next_code
                next_code += 1
                # EarlyChange=1 (the PDF default): the encoder bumps the
                # width one code early, mirrored by the decoder's
                # len(table)+early >= 1<<width condition
                if next_code >= (1 << width) and width < 12:
                    width += 1
            w = bytes([ch])
    if w:
        emit(table[w], width)
    emit(257, width)  # EOD
    acc = 0
    nbits = 0
    out = bytearray()
    for code, cwidth in out_bits:
        acc = (acc << cwidth) | code
        nbits += cwidth
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_roundtrip():
    data = b"TOBEORNOTTOBEORTOBEORNOT"
    assert lzw_decode(_lzw_encode(data)) == data


def test_lzw_roundtrip_crosses_width_boundary():
    """Regression: streams whose dictionary crosses the 9->10 (and 10->11)
    bit boundary desynced when the decoder bumped the code width one code
    too late (at next_code 512 instead of 511 for EarlyChange=1)."""
    import numpy as np

    data = np.random.RandomState(7).bytes(6000)  # ~4k+ novel dict entries
    assert lzw_decode(_lzw_encode(data)) == data


def test_png_predictor_up():
    # predictor rows: type 2 (Up): row = raw + prev
    raw = bytes([2, 1, 1, 1, 2, 1, 1, 1])
    out = apply_png_predictor(raw, colors=1, bpc=8, columns=3)
    assert out == bytes([1, 1, 1, 2, 2, 2])


def test_chain_a85_then_flate():
    data = b"chained payload" * 5
    enc = base64.a85encode(zlib.compress(data)) + b"~>"
    out = decode_stream(enc, ["ASCII85Decode", "FlateDecode"])
    assert out == data


def test_passthrough_image_codecs():
    assert decode_stream(b"jpegdata", "DCTDecode") == b"jpegdata"


def test_bomb_guard():
    bomb = zlib.compress(b"A" * 10_000_000)
    with pytest.raises(DecodeError):
        flate_decode(bomb)


def test_unknown_filter():
    with pytest.raises(DecodeError):
        decode_stream(b"x", "NoSuchFilter")


def test_ascii_hex_skips_str_whitespace_bytes():
    # parity with the old chr(b).strip() loop: \x1c-\x1f, NEL (\x85)
    # and NBSP (\xa0) are skipped, not treated as bad digits
    assert ascii_hex_decode(b"4\x1c1\x854\xa02\x1f>") == b"AB"
