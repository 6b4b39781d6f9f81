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
