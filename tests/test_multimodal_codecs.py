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


# --------------------------------------------------- video frame path

def _mp4_meta(w=4, h=2, dur=3000):
    return {"media_type": "video", "format": "mp4", "width": w,
            "height": h, "duration_ms": dur, "color_space": "",
            "bits": 8}


def test_video_gated_without_codecs(monkeypatch):
    """Neither PyAV nor an ffmpeg binary: decode_video_frames raises
    DecodeUnavailable, and the real-mode FrameSampler absorbs it to a
    single status='error' row per payload."""
    import pdf_oxide_ray.stages.multimodal as mm

    monkeypatch.setattr(mm, "_PY_AV", None)
    monkeypatch.setattr(mm, "_FFMPEG_BIN", None)
    with pytest.raises(DecodeUnavailable):
        mm.decode_video_frames(b"\x00\x00\x00 ftypmp42", _mp4_meta())
    tbl = pa.Table.from_pylist([{
        "media_id": 7, "payload": b"\x00\x00\x00 ftypmp42",
        "meta": _mp4_meta(),
    }], schema=MEDIA_SCHEMA)
    out = mm.FrameSampler(use_fake_decoder=False)(tbl).to_pylist()
    assert len(out) == 1
    assert out[0]["status"] == "error" and out[0]["frame_idx"] == -1
    assert "PyAV" in out[0]["error"] or "ffmpeg" in out[0]["error"]


def test_video_non_container_format_gated():
    import pdf_oxide_ray.stages.multimodal as mm

    with pytest.raises(DecodeUnavailable):
        mm.decode_video_frames(b"xx", {"format": "jpeg"})


def test_video_cli_branch_with_stub_ffmpeg(tmp_path, monkeypatch):
    """Drive _frames_via_ffmpeg_cli end-to-end with a stub 'ffmpeg'
    executable that writes two deterministic 4x2 rgb24 frames — the
    plumbing (arg layout, rawvideo parse, frame split, luma fold) is
    real; only the codec itself is substituted."""
    import pdf_oxide_ray.stages.multimodal as mm

    stub = tmp_path / "ffmpeg"
    # frame 0 = all 10s, frame 1 = all 200s (4*2*3 bytes each)
    stub.write_text(
        "#!/bin/sh\n"
        "printf '%.0s\\012' $(seq 24) ; printf '%.0s\\310' $(seq 24)\n")
    stub.chmod(0o755)
    monkeypatch.setattr(mm, "_PY_AV", None)
    monkeypatch.setattr(mm, "_FFMPEG_BIN", str(stub))
    frames = mm.decode_video_frames(b"fake-container", _mp4_meta(),
                                    every_ms=500)
    assert len(frames) == 2
    (t0, f0), (t1, f1) = frames
    assert (t0, t1) == (0, 500)
    assert f0.shape == (2, 4, 3) and (f0 == 10).all()
    assert (f1 == 200).all()
    tbl = pa.Table.from_pylist([{
        "media_id": 3, "payload": b"fake-container",
        "meta": _mp4_meta(),
    }], schema=MEDIA_SCHEMA)
    out = mm.FrameSampler(every_ms=500,
                          use_fake_decoder=False)(tbl).to_pylist()
    assert [r["status"] for r in out] == ["ok", "ok"]
    assert [r["frame_idx"] for r in out] == [0, 1]
    # all-10 rgb -> luma exactly 10; all-200 -> exactly 200
    assert out[0]["mean_luma_q6"] == 10_000_000
    assert out[1]["mean_luma_q6"] == 200_000_000


def test_video_cli_branch_decode_failure(tmp_path, monkeypatch):
    """A failing ffmpeg binary maps to ValueError (row-absorbable)."""
    import pdf_oxide_ray.stages.multimodal as mm

    stub = tmp_path / "ffmpeg"
    stub.write_text("#!/bin/sh\nexit 1\n")
    stub.chmod(0o755)
    monkeypatch.setattr(mm, "_PY_AV", None)
    monkeypatch.setattr(mm, "_FFMPEG_BIN", str(stub))
    with pytest.raises(ValueError):
        mm.decode_video_frames(b"bad", _mp4_meta())


def test_frame_sampler_fake_schema_unchanged():
    """Pinned rows-only hashes ride the fake path: schema and values
    must stay exactly (media_id, frame_idx, ts_ms)."""
    import pdf_oxide_ray.stages.multimodal as mm

    tbl = pa.Table.from_pylist([{
        "media_id": 1, "payload": b"x", "meta": _mp4_meta(dur=2500),
    }], schema=MEDIA_SCHEMA)
    out = mm.FrameSampler()(tbl)
    assert out.column_names == ["media_id", "frame_idx", "ts_ms"]
    assert out.column("ts_ms").to_pylist() == [0, 1000, 2000]
