"""Image XObject extraction (S8).

Re-implements the computation of ``extract_images``
(``/root/reference/src/document.rs:2560-2650``,
``/root/reference/src/extractors/images.rs:30-430``): walk the page's
``/Resources /XObject`` dict, collect ``/Subtype /Image`` entries with
their geometry/colorspace metadata; DCTDecode (JPEG) payloads pass
through still-encoded, everything else is decoded through the filter
chain to raw pixels. Decoding to a viewable bitmap is out of scope here
(no image libs in this container) — the Ray-side contract is the opaque
``binary`` + typed metadata layout used by ``stages/multimodal.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

from .decoders import decode_stream
from .objects import Name, Stream


@dataclass
class PdfImage:
    """reference PdfImage (images.rs:30)."""

    name: str
    width: int
    height: int
    color_space: str
    bits_per_component: int
    format: str  # "jpeg" passthrough | "raw" decoded pixels
    data: bytes


def _filters_of(doc, stream_dict: dict) -> list[str]:
    filt = doc.resolve(stream_dict.get("Filter"))
    if isinstance(filt, Name):
        return [str(filt)]
    if isinstance(filt, list):
        return [str(f) for f in filt if isinstance(f, Name)]
    return []


def extract_images(doc, page: dict) -> list[PdfImage]:
    """All Image XObjects of one page (document.rs:2560)."""
    res = doc.resolve(page.get("Resources"))
    xdict = doc.resolve(res.get("XObject")) if isinstance(res, dict) else None
    if not isinstance(xdict, dict):
        return []
    out: list[PdfImage] = []
    for name, ref in xdict.items():
        obj = doc.resolve(ref)
        if not isinstance(obj, Stream):
            continue
        d = obj.dict
        if str(d.get("Subtype")) != "Image":
            continue
        width = int(doc.resolve(d.get("Width", 0)) or 0)
        height = int(doc.resolve(d.get("Height", 0)) or 0)
        cs = doc.resolve(d.get("ColorSpace"))
        color_space = str(cs) if isinstance(cs, Name) else \
            (str(cs[0]) if isinstance(cs, list) and cs else "Unknown")
        bits = int(doc.resolve(d.get("BitsPerComponent", 8)) or 8)
        filters = _filters_of(doc, d)
        if "DCTDecode" in filters:
            # JPEG passthrough (reference images.rs JPEG path): data stays
            # encoded; strip any pre-filters before the DCT stage
            pre = filters[: filters.index("DCTDecode")]
            data = decode_stream(obj.data, [Name(f) for f in pre] or None,
                                 None) if pre else obj.data
            fmt = "jpeg"
        else:
            try:
                data = decode_stream(obj.data, d.get("Filter"),
                                     d.get("DecodeParms"))
                fmt = "raw"
            except Exception:  # noqa: BLE001 - undecodable -> passthrough
                data = obj.data
                fmt = "undecoded"
        out.append(PdfImage(name=str(name), width=width, height=height,
                            color_space=color_space,
                            bits_per_component=bits, format=fmt, data=data))
    return out


def extract_images_all(doc) -> list[PdfImage]:
    out: list[PdfImage] = []
    for page in doc.pages():
        out.extend(extract_images(doc, page))
    return out


_CS_COMPONENTS = {
    # reference ColorSpace::components (images.rs:261-273)
    "DeviceGray": 1, "CalGray": 1, "Separation": 1, "Indexed": 1,
    "DeviceRGB": 3, "CalRGB": 3, "Lab": 3, "ICCBased": 3, "Pattern": 3,
    "DeviceCMYK": 4, "DeviceN": 4,
}


def to_rgb_pixels(data: bytes, width: int, height: int, color_space: str,
                  bits_per_component: int = 8) -> "np.ndarray":
    """Raw decoded samples -> (height, width, 3) uint8 RGB.

    Re-implements the computation of the reference's raw-pixel path
    (``images.rs:206-430``: components per color space, bit depth
    normalization, CMYK -> RGB with the naive (1-c)(1-k) formula) in
    pure numpy — no image codec library needed for non-DCT images.
    """
    import numpy as np

    if width <= 0 or height <= 0:
        raise ValueError("image has no geometry")
    ncomp = _CS_COMPONENTS.get(color_space, 0)
    arr = np.frombuffer(data, dtype=np.uint8)
    bits = bits_per_component or 8
    if bits == 16:
        samples = arr[::2]  # high byte of big-endian 16-bit samples
    elif bits == 8:
        samples = arr
    elif bits in (1, 2, 4):
        if not ncomp:
            ncomp = 1
        row_bits = width * ncomp * bits
        row_bytes = (row_bits + 7) // 8  # PDF rows are byte-aligned
        need = height * row_bytes
        if len(arr) < need:
            arr = np.pad(arr, (0, need - len(arr)))
        rows = arr[:need].reshape(height, row_bytes)
        unpacked = np.unpackbits(rows, axis=1)[:, :row_bits]
        grouped = unpacked.reshape(height, width * ncomp, bits)
        weights = (1 << np.arange(bits - 1, -1, -1)).astype(np.uint16)
        vals = (grouped.astype(np.uint16) * weights).sum(axis=2)
        samples = (vals * (255 // ((1 << bits) - 1))).astype(np.uint8).ravel()
    else:
        raise ValueError(f"unsupported bits per component {bits}")
    if not ncomp:  # unknown color space: infer from the sample count
        ncomp = max(1, min(4, len(samples) // (width * height) or 1))
    need = width * height * ncomp
    if len(samples) < need:
        samples = np.pad(samples, (0, need - len(samples)))
    px = samples[:need].reshape(height, width, ncomp)
    if ncomp == 1:
        return np.repeat(px, 3, axis=2)
    if ncomp == 2:  # inferred gray+alpha-like layout: first channel as gray
        return np.repeat(px[:, :, :1], 3, axis=2)
    if ncomp == 3:
        return np.ascontiguousarray(px)
    # CMYK -> RGB: r = (255-c)(255-k)/255 etc (naive conversion, matching
    # the reference's non-ICC fallback)
    c, m, y, k = (px[:, :, i].astype(np.uint16) for i in range(4))
    inv_k = 255 - k
    rgb = np.stack([(255 - c) * inv_k // 255,
                    (255 - m) * inv_k // 255,
                    (255 - y) * inv_k // 255], axis=2)
    return rgb.astype(np.uint8)
