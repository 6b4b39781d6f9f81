"""Real-codec paths in stages/multimodal: stdlib ``wave`` decode is
always real; PIL-backed image formats decode when PIL is importable and
raise ``DecodeUnavailable`` otherwise (the try-import gate); the fake
decoder's behavior is unchanged either way."""

import io
import wave

import numpy as np
import pyarrow as pa
import pytest

from pdf_oxide_ray.stages.multimodal import (MEDIA_SCHEMA, DecodeUnavailable,
                                             MediaFeatures, _decode_fake,
                                             _decode_real, _PIL_Image)


def _wav_bytes(samples: np.ndarray, nch: int = 1,
               rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(nch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def test_wav_decodes_real_samples():
    samples = np.array([0, 1000, -1000, 32767, -32768, 5], dtype=np.int16)
    arr = _decode_real(_wav_bytes(samples), {"format": "wav"})
    assert arr.shape == (6, 1)
    assert (arr.ravel() == samples).all()
    # stereo: frames x 2 channels
    stereo = np.array([1, 2, 3, 4], dtype=np.int16)
    arr2 = _decode_real(_wav_bytes(stereo, nch=2), {"format": "wav"})
    assert arr2.shape == (2, 2)
    assert arr2[0, 0] == 1 and arr2[0, 1] == 2


def test_wav_malformed_is_value_error_and_row_absorbed():
    with pytest.raises(ValueError):
        _decode_real(b"RIFFgarbage", {"format": "wav"})
    tbl = pa.Table.from_pylist([{
        "media_id": 1, "payload": b"not a wav",
        "meta": {"media_type": "audio", "format": "wav", "width": 0,
                 "height": 0, "duration_ms": 100, "color_space": "",
                 "bits": 16},
    }, {
        "media_id": 2,
        "payload": _wav_bytes(np.arange(64, dtype=np.int16)),
        "meta": {"media_type": "audio", "format": "wav", "width": 0,
                 "height": 0, "duration_ms": 8, "color_space": "",
                 "bits": 16},
    }], schema=MEDIA_SCHEMA)
    out = MediaFeatures(use_fake_decoder=False)(tbl).to_pylist()
    assert out[0]["status"] == "error"
    assert out[1]["status"] == "ok" and out[1]["decoded_h"] == 64


@pytest.mark.skipif(_PIL_Image is not None, reason="PIL present")
def test_image_formats_gated_without_pil():
    with pytest.raises(DecodeUnavailable):
        _decode_real(b"\x89PNG\r\n\x1a\n", {"format": "png"})


@pytest.mark.skipif(_PIL_Image is None, reason="PIL absent")
def test_image_formats_decode_with_pil():
    img = _PIL_Image.new("RGB", (3, 2), (10, 20, 30))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    arr = _decode_real(buf.getvalue(), {"format": "png"})
    assert arr.shape == (2, 3, 3)
    assert tuple(arr[0, 0]) == (10, 20, 30)
    with pytest.raises(ValueError):
        _decode_real(b"\x89PNG garbage", {"format": "png"})


def test_video_still_gated():
    with pytest.raises(DecodeUnavailable):
        _decode_real(b"\x00\x00\x00 ftypmp42", {"format": "mp4"})


def test_fake_decoder_unchanged():
    """media_features' fake path must stay byte-deterministic (pinned
    rows-only hashes depend on it)."""
    a = _decode_fake(b"payload-bytes", {"height": 4, "width": 5})
    b = _decode_fake(b"payload-bytes", {"height": 4, "width": 5})
    assert a.shape == (4, 5) and (a == b).all()
    c = _decode_fake(b"other", {"height": 4, "width": 5})
    assert not (a == c).all()
