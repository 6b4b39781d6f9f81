"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages. Decode coverage by format: ``raw`` PDF image
samples and ``wav`` audio decode for REAL (pure numpy / stdlib
``wave``); jpeg/png/gif/bmp/webp/tiff decode for real WHEN PIL is
importable (the ``core/aes.py`` try-import pattern) and raise
``DecodeUnavailable`` otherwise; video containers decode for real when
PyAV is importable or an ffmpeg binary is on PATH
(`decode_video_frames`), gated honestly otherwise. A deterministic
fake decoder backs plumbing tests either way.

Scale notes: binary payloads are large; batches must be SMALL (default 16
rows) so batch x concurrency fits worker heap; blocks stay Arrow throughout
(zero-copy binary buffers; no pandas object columns).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_META_TYPE = pa.struct([
    ("media_type", pa.string()),   # "image" | "audio" | "video"
    ("format", pa.string()),       # "raw" | "jpeg" | "png" | "wav" | ...
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
    ("color_space", pa.string()),  # PDF color space name for format="raw"
    ("bits", pa.int32()),          # bits per component for format="raw"
])

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("payload", pa.large_binary()),
    ("meta", MEDIA_META_TYPE),
])

FEATURE_DIM = 64


class DecodeUnavailable(NotImplementedError):
    """Raised by the real-codec slot when the needed library is absent
    in this container (the ``core/aes.py`` pattern: use the real lib
    when importable, honest gate otherwise)."""


try:  # PIL-if-importable (mirrors core/aes.py's `cryptography` gate)
    from PIL import Image as _PIL_Image  # type: ignore
except ImportError:  # container has no PIL: jpeg/png decode stays gated
    _PIL_Image = None

_PIL_FORMATS = ("jpeg", "jpg", "png", "gif", "bmp", "webp", "tiff")

try:  # PyAV-if-importable (ffmpeg bindings; same gate pattern)
    import av as _PY_AV  # type: ignore
except ImportError:  # no PyAV: fall through to the ffmpeg CLI probe
    _PY_AV = None

import shutil as _shutil

_FFMPEG_BIN = _shutil.which("ffmpeg")  # CLI fallback when PyAV absent

_VIDEO_FORMATS = ("mp4", "mkv", "webm", "avi", "mov", "mpeg", "mpegts")


def _frames_via_av(payload: bytes, every_ms: int) -> list:
    """PyAV decode: sample the first frame at or after each every_ms
    tick. Returns [(ts_ms, rgb24 ndarray), ...]."""
    import io

    out = []
    try:
        with _PY_AV.open(io.BytesIO(payload)) as container:
            stream = next((s for s in container.streams
                           if s.type == "video"), None)
            if stream is None:
                raise ValueError("no video stream in container")
            tb = float(stream.time_base or 0) or 1e-6
            next_t = 0
            for frame in container.decode(stream):
                t_ms = int((frame.pts or 0) * tb * 1000)
                if t_ms >= next_t:
                    out.append((t_ms, frame.to_ndarray(format="rgb24")))
                    while next_t <= t_ms:
                        next_t += max(every_ms, 1)
    except _PY_AV.error.FFmpegError as exc:  # type: ignore[union-attr]
        raise ValueError(f"bad video payload: {exc}") from exc
    return out


def _frames_via_ffmpeg_cli(payload: bytes, meta: dict,
                           every_ms: int) -> list:
    """ffmpeg-binary decode: rawvideo rgb24 at fps=1000/every_ms,
    scaled to the metadata dimensions (64x64 when absent). Returns
    [(ts_ms, rgb24 ndarray), ...]."""
    import subprocess
    import tempfile

    w = int(meta.get("width") or 0) or 64
    h = int(meta.get("height") or 0) or 64
    fps = 1000.0 / max(every_ms, 1)
    with tempfile.NamedTemporaryFile(suffix=".bin") as f:
        f.write(payload)
        f.flush()
        p = subprocess.run(
            [_FFMPEG_BIN, "-v", "error", "-i", f.name,
             "-vf", f"fps={fps},scale={w}:{h}",
             "-f", "rawvideo", "-pix_fmt", "rgb24", "pipe:1"],
            capture_output=True)
    if p.returncode != 0:
        raise ValueError(
            f"ffmpeg decode failed: {p.stderr[:200]!r}")
    raw = np.frombuffer(p.stdout, np.uint8)
    n = raw.size // (w * h * 3)
    frames = raw[: n * w * h * 3].reshape(n, h, w, 3)
    return [(k * every_ms, frames[k]) for k in range(n)]


def decode_video_frames(payload: bytes, meta: dict,
                        every_ms: int = 1000) -> list:
    """Real video frame sampling: PyAV when importable, the ffmpeg
    binary when on PATH, ``DecodeUnavailable`` otherwise (the honest
    gate — neither ships in this container). Returns
    [(ts_ms, rgb24 ndarray), ...] sampled every ``every_ms``."""
    fmt = str(meta.get("format") or "").lower()
    if fmt not in _VIDEO_FORMATS:
        raise DecodeUnavailable(
            f"format {fmt!r} is not a known video container")
    if _PY_AV is not None:
        return _frames_via_av(payload or b"", every_ms)
    if _FFMPEG_BIN:
        return _frames_via_ffmpeg_cli(payload or b"", meta, every_ms)
    raise DecodeUnavailable(
        f"format {fmt!r} needs PyAV or an ffmpeg binary, "
        "neither available here")


def _decode_real(payload: bytes, meta: dict) -> np.ndarray:
    """Real decode path, by format:

    * ``raw`` (decoded PDF image samples) — pure numpy bit expansion +
      gray/RGB/CMYK to RGB (core/images.to_rgb_pixels, reference
      images.rs:206-430); always available.
    * ``wav`` — stdlib ``wave`` decode to an (n_frames, n_channels)
      sample array; always available.
    * jpeg/png/gif/bmp/webp/tiff — PIL when importable (RGB ndarray),
      ``DecodeUnavailable`` otherwise.
    * anything else (video containers, exotic codecs) —
      ``DecodeUnavailable``.
    """
    fmt = str(meta.get("format") or "").lower()
    if fmt == "raw":
        from ..core.images import to_rgb_pixels

        return to_rgb_pixels(payload or b"", int(meta.get("width") or 0),
                             int(meta.get("height") or 0),
                             str(meta.get("color_space") or ""),
                             int(meta.get("bits") or 8))
    if fmt == "wav":
        import io
        import wave

        try:
            with wave.open(io.BytesIO(payload or b"")) as w:
                nch = w.getnchannels()
                sw = w.getsampwidth()
                raw = w.readframes(w.getnframes())
        except (wave.Error, EOFError) as exc:
            raise ValueError(f"bad wav payload: {exc}") from exc
        dt = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}.get(sw)
        if dt is None:
            raise ValueError(f"unsupported wav sample width {sw}")
        arr = np.frombuffer(raw, dtype=dt)
        n = (arr.size // nch) * nch if nch else 0
        return arr[:n].reshape(-1, max(nch, 1))
    if fmt in _PIL_FORMATS:
        if _PIL_Image is None:
            raise DecodeUnavailable(
                f"format {fmt!r} needs PIL, not importable here")
        import io

        try:
            with _PIL_Image.open(io.BytesIO(payload or b"")) as img:
                return np.asarray(img.convert("RGB"))
        except Exception as exc:  # PIL raises many types on bad bytes
            raise ValueError(f"bad {fmt} payload: {exc}") from exc
    raise DecodeUnavailable(
        f"no codec for {meta.get('format')!r} in this environment")


def _decode_fake(payload: bytes, meta: dict) -> np.ndarray:
    """Deterministic stand-in decoder: payload bytes -> pseudo pixel/sample
    array seeded by content digest (stable across workers/runs)."""
    digest = hashlib.blake2b(payload or b"", digest_size=8).digest()
    rs = np.random.RandomState(int.from_bytes(digest[:4], "big"))
    h = int(meta.get("height") or 8)
    w = int(meta.get("width") or 8)
    return rs.randint(0, 256, size=(max(h, 1), max(w, 1)), dtype=np.uint8)


class MediaFeatures:
    """Actor-pool stage: decode (stub/fake) + feature-extract binary media.

    ``ds.map_batches(MediaFeatures, batch_format="pyarrow", batch_size=16,
    concurrency=N, fn_constructor_kwargs={"use_fake_decoder": True})``

    Emits (media_id, status, error, feature: list<float32>[FEATURE_DIM],
    decoded_h, decoded_w). Row-level error absorption: an undecodable
    payload yields status='error', never a task failure.
    """

    def __init__(self, use_fake_decoder: bool = True):
        self.decode = _decode_fake if use_fake_decoder else _decode_real

    def _features(self, arr: np.ndarray) -> np.ndarray:
        flat = arr.astype(np.float32).ravel()
        if flat.size == 0:
            return np.zeros(FEATURE_DIM, dtype=np.float32)
        pad = (-flat.size) % FEATURE_DIM
        if pad:
            flat = np.pad(flat, (0, pad))
        return flat.reshape(-1, FEATURE_DIM).mean(axis=0) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        metas = batch.column("meta").to_pylist()
        feats, statuses, errors, hs, ws = [], [], [], [], []
        for payload, meta in zip(payloads, metas):
            meta = meta or {}
            try:
                arr = self.decode(payload or b"", meta)
                feats.append(self._features(arr).tolist())
                hs.append(arr.shape[0])
                ws.append(arr.shape[1] if arr.ndim > 1 else 1)
                statuses.append("ok")
                errors.append("")
            except (NotImplementedError, ValueError) as exc:
                feats.append([0.0] * FEATURE_DIM)
                hs.append(0)
                ws.append(0)
                statuses.append("error")
                errors.append(str(exc)[:200])
        return pa.table({
            "media_id": batch.column("media_id"),
            "status": pa.array(statuses, pa.string()),
            "error": pa.array(errors, pa.string()),
            "feature": pa.array(feats, pa.list_(pa.float32(), FEATURE_DIM)),
            "decoded_h": pa.array(hs, pa.int32()),
            "decoded_w": pa.array(ws, pa.int32()),
        })


class FrameSampler:
    """Actor-pool stage for video: emit one row per sampled frame (flat
    layout, ready for a downstream embedding model pool).

    Fake mode (default — the deterministic plumbing path): schedule
    rows derived from duration_ms, schema (media_id, frame_idx, ts_ms)
    — unchanged, so pinned row hashes stay stable. Real mode
    (``use_fake_decoder=False``): `decode_video_frames` (PyAV /
    ffmpeg-CLI when available, gated otherwise) with row-level error
    absorption like MediaFeatures; schema adds (status, error,
    mean_luma_q6) — a failed/gated payload yields ONE status='error'
    row with frame_idx=-1, never a task failure."""

    def __init__(self, every_ms: int = 1000, use_fake_decoder: bool = True):
        self.every_ms = every_ms
        self.use_fake_decoder = use_fake_decoder
        self.decode = _decode_fake if use_fake_decoder else _decode_real

    def _schedule_rows(self, mid: int, meta: dict, cols: dict) -> None:
        duration = int(meta.get("duration_ms") or 0)
        for k, t in enumerate(range(0, max(duration, 1), self.every_ms)):
            cols["media_id"].append(mid)
            cols["frame_idx"].append(k)
            cols["ts_ms"].append(t)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        metas = batch.column("meta").to_pylist()
        mids = batch.column("media_id").to_pylist()
        if self.use_fake_decoder:
            cols: dict = {"media_id": [], "frame_idx": [], "ts_ms": []}
            for mid, meta in zip(mids, metas):
                self._schedule_rows(mid, meta or {}, cols)
            return pa.table({
                "media_id": pa.array(cols["media_id"], pa.int64()),
                "frame_idx": pa.array(cols["frame_idx"], pa.int32()),
                "ts_ms": pa.array(cols["ts_ms"], pa.int32()),
            })
        ids, frame_idx, ts_ms = [], [], []
        statuses, errors, lumas = [], [], []
        for mid, payload, meta in zip(mids, payloads, metas):
            meta = meta or {}
            try:
                frames = decode_video_frames(payload or b"", meta,
                                             self.every_ms)
                for k, (t, arr) in enumerate(frames):
                    ids.append(mid)
                    frame_idx.append(k)
                    ts_ms.append(t)
                    statuses.append("ok")
                    errors.append("")
                    # ITU-R 601 luma, 1e-6 grid (cf. ImageResize)
                    luma = (0.299 * arr[:, :, 0].astype(np.float64)
                            + 0.587 * arr[:, :, 1]
                            + 0.114 * arr[:, :, 2]).mean()
                    lumas.append(int(round(luma * 1e6)))
            except (NotImplementedError, ValueError) as exc:
                ids.append(mid)
                frame_idx.append(-1)
                ts_ms.append(0)
                statuses.append("error")
                errors.append(str(exc)[:200])
                lumas.append(0)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(frame_idx, pa.int32()),
            "ts_ms": pa.array(ts_ms, pa.int32()),
            "status": pa.array(statuses, pa.string()),
            "error": pa.array(errors, pa.string()),
            "mean_luma_q6": pa.array(lumas, pa.int64()),
        })


def synthesize_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for tests/benches (binary payloads +
    typed metadata; no external data)."""
    rs = np.random.RandomState(seed)
    rows = []
    formats = [("image", "jpeg"), ("image", "png"), ("audio", "wav"),
               ("video", "mp4")]
    for i in range(n):
        mtype, fmt = formats[i % len(formats)]
        size = int(rs.randint(64, 4096))
        rows.append({
            "media_id": i,
            "payload": rs.bytes(size),
            "meta": {"media_type": mtype, "format": fmt,
                     "width": int(rs.randint(4, 64)),
                     "height": int(rs.randint(4, 64)),
                     "duration_ms": int(rs.randint(0, 5000))},
        })
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class ImageResize:
    """Actor-pool stage: decode + bilinear resize to fixed thumbnail
    dimensions. REAL end-to-end for ``format="raw"`` payloads (pure
    numpy: to_rgb_pixels decode, then a vectorized bilinear gather) —
    the resize slot the brief's multimodal list names; codec formats
    absorb per row as status='error' like MediaFeatures.

    Emits (media_id, status, error, thumb: binary h*w*3 uint8, thumb_h,
    thumb_w, mean_luma_q6: int64 — mean luminance on a 1e-6 grid, an
    order-stable scalar for pinning)."""

    def __init__(self, out_h: int = 32, out_w: int = 32,
                 use_fake_decoder: bool = False):
        self.out_h = int(out_h)
        self.out_w = int(out_w)
        self.decode = _decode_fake if use_fake_decoder else _decode_real

    def _resize(self, arr: np.ndarray) -> np.ndarray:
        if arr.ndim == 2:
            arr = np.repeat(arr[:, :, None], 3, axis=2)
        src_h, src_w = arr.shape[0], arr.shape[1]
        h, w = self.out_h, self.out_w
        fy = np.clip((np.arange(h) + 0.5) * src_h / h - 0.5, 0,
                     src_h - 1)
        fx = np.clip((np.arange(w) + 0.5) * src_w / w - 0.5, 0,
                     src_w - 1)
        y0 = np.floor(fy).astype(np.int64)
        x0 = np.floor(fx).astype(np.int64)
        y1 = np.minimum(y0 + 1, src_h - 1)
        x1 = np.minimum(x0 + 1, src_w - 1)
        wy = (fy - y0)[:, None, None]
        wx = (fx - x0)[None, :, None]
        a = arr.astype(np.float64)
        out = (a[y0][:, x0] * (1 - wy) * (1 - wx)
               + a[y0][:, x1] * (1 - wy) * wx
               + a[y1][:, x0] * wy * (1 - wx)
               + a[y1][:, x1] * wy * wx)
        return np.rint(out).astype(np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        metas = batch.column("meta").to_pylist()
        thumbs, statuses, errors, lumas = [], [], [], []
        for payload, meta in zip(payloads, metas):
            try:
                arr = self.decode(payload or b"", meta or {})
                th = self._resize(arr)
                thumbs.append(th.tobytes())
                # ITU-R 601 luma on the thumbnail, 1e-6 grid
                luma = (0.299 * th[:, :, 0].astype(np.float64)
                        + 0.587 * th[:, :, 1]
                        + 0.114 * th[:, :, 2]).mean()
                lumas.append(int(round(luma * 1e6)))
                statuses.append("ok")
                errors.append("")
            except (NotImplementedError, ValueError) as exc:
                thumbs.append(b"")
                lumas.append(0)
                statuses.append("error")
                errors.append(str(exc)[:200])
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "status": pa.array(statuses, pa.string()),
            "error": pa.array(errors, pa.string()),
            "thumb": pa.array(thumbs, pa.large_binary()),
            "thumb_h": pa.array([self.out_h] * len(ids), pa.int32()),
            "thumb_w": pa.array([self.out_w] * len(ids), pa.int32()),
            "mean_luma_q6": pa.array(lumas, pa.int64()),
        })
