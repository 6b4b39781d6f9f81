"""PDF 1.5 xref streams (S2) + object streams (S4) + image XObjects (S8)."""

import random

from pdf_oxide_ray.core.document import PdfDocument
from pdf_oxide_ray.core.images import extract_images_all
from pdf_oxide_ray.core.payload import extract_payload
from pdf_oxide_ray.gen.transcripts import _PdfBuilder, make_pdf_payload


def test_xref_stream_layout_parses_and_extracts():
    n = 0
    for seed in range(80):
        payload = make_pdf_payload(random.Random(seed))
        doc = PdfDocument(payload.encode("utf-8"))
        if not doc.xref_compressed:
            continue
        n += 1
        res = extract_payload(payload)
        assert res["status"] == "ok"
        assert res["extracted_text"].strip()
        # compressed objects resolve through the objstm
        for num in doc.xref_compressed:
            obj = doc.load_object(num)
            assert isinstance(obj, dict)
            assert str(obj.get("Type")) == "Font"
    assert n >= 5


def test_hand_built_objstm_roundtrip():
    b = _PdfBuilder()
    nums = b.add_objstm([b"<< /Kind /A /V 1 >>", b"<< /Kind /B /V 2 >>"])
    cnum = b.add_stream("", b"BT /F1 12 Tf (x) Tj ET")
    page = b.add(f"<< /Type /Page /Contents {cnum} 0 R >>".encode())
    pages = b.add(f"<< /Type /Pages /Kids [ {page} 0 R ] /Count 1 >>".encode())
    root = b.add(f"<< /Type /Catalog /Pages {pages} 0 R >>".encode())
    pdf = b.build(root, xref_stream=True)
    doc = PdfDocument(pdf.encode("utf-8"))
    a = doc.load_object(nums[0])
    bb = doc.load_object(nums[1])
    assert str(a["Kind"]) == "A" and a["V"] == 1
    assert str(bb["Kind"]) == "B" and bb["V"] == 2
    assert len(doc.pages()) == 1


def test_image_extraction_and_text_skip():
    for seed in range(80):
        payload = make_pdf_payload(random.Random(seed))
        doc = PdfDocument(payload.encode("utf-8"))
        imgs = extract_images_all(doc)
        if not imgs:
            continue
        im = imgs[0]
        assert im.format == "raw"
        assert im.color_space == "DeviceRGB"
        assert len(im.data) == im.width * im.height * 3
        # the Do-drawn image must not leak into extracted text
        res = extract_payload(payload)
        assert res["status"] == "ok"
        return
    raise AssertionError("no image pdf in 80 seeds")


def test_to_rgb_pixels_gray_rgb_cmyk_and_bits():
    """Real raw-pixel decode (images.rs:206-430 semantics): component
    counts per color space, bit expansion, CMYK naive conversion."""
    import numpy as np

    from pdf_oxide_ray.core.images import to_rgb_pixels

    # DeviceRGB 8-bit passthrough
    rgb = to_rgb_pixels(bytes([255, 0, 0, 0, 255, 0]), 2, 1, "DeviceRGB")
    assert rgb.shape == (1, 2, 3)
    assert rgb[0, 0].tolist() == [255, 0, 0]
    assert rgb[0, 1].tolist() == [0, 255, 0]
    # DeviceGray replicates
    g = to_rgb_pixels(bytes([7, 200]), 2, 1, "DeviceGray")
    assert g[0, 0].tolist() == [7, 7, 7] and g[0, 1].tolist() == [200] * 3
    # 1-bit gray expands to 0/255 with byte-aligned rows
    one = to_rgb_pixels(bytes([0b10100000]), 3, 1, "DeviceGray",
                        bits_per_component=1)
    assert one[0, :, 0].tolist() == [255, 0, 255]
    # CMYK: pure K black -> RGB black; zero ink -> white
    cmyk = to_rgb_pixels(bytes([0, 0, 0, 255, 0, 0, 0, 0]), 2, 1,
                         "DeviceCMYK")
    assert cmyk[0, 0].tolist() == [0, 0, 0]
    assert cmyk[0, 1].tolist() == [255, 255, 255]
    # 16-bit keeps the high byte
    hi = to_rgb_pixels(bytes([0xAB, 0xCD]), 1, 1, "DeviceGray",
                       bits_per_component=16)
    assert hi[0, 0, 0] == 0xAB
    # short data is zero-padded, not an error
    short = to_rgb_pixels(b"\xff", 2, 2, "DeviceRGB")
    assert short.shape == (2, 2, 3) and short[0, 0, 0] == 255


def test_media_features_real_decoder_on_raw():
    import numpy as np
    import pyarrow as pa

    from pdf_oxide_ray.stages.multimodal import MEDIA_SCHEMA, MediaFeatures

    tbl = pa.Table.from_pylist([{
        "media_id": 1,
        "payload": bytes([10, 20, 30] * 4),
        "meta": {"media_type": "image", "format": "raw", "width": 2,
                 "height": 2, "duration_ms": 0,
                 "color_space": "DeviceRGB", "bits": 8},
    }, {
        "media_id": 2,
        "payload": b"\xff\xd8 not decodable here",
        "meta": {"media_type": "image", "format": "jpeg", "width": 2,
                 "height": 2, "duration_ms": 0,
                 "color_space": "", "bits": 8},
    }], schema=MEDIA_SCHEMA)
    out = MediaFeatures(use_fake_decoder=False)(tbl).to_pylist()
    assert out[0]["status"] == "ok"
    assert out[0]["decoded_h"] == 2 and out[0]["decoded_w"] == 2
    assert abs(out[0]["feature"][0]) > 0  # real pixels, non-zero features
    assert out[1]["status"] == "error"  # jpeg needs a codec lib


def test_image_resize_bilinear_known_values():
    """2x2 checkerboard -> 4x4 bilinear: corners keep source values,
    interior interpolates; identity resize is exact."""
    import numpy as np
    import pyarrow as pa

    from pdf_oxide_ray.stages.multimodal import ImageResize

    src = np.array([[0, 255], [255, 0]], dtype=np.uint8)
    r = ImageResize(out_h=4, out_w=4)
    th = r._resize(src)
    assert th.shape == (4, 4, 3)
    assert th[0, 0, 0] == 0 and th[0, 3, 0] == 255
    assert th[3, 0, 0] == 255 and th[3, 3, 0] == 0
    # center pixels average toward 127/128
    assert 63 < th[1, 1, 0] < 192
    # identity: 2x2 -> 2x2 returns the source exactly (gray -> 3ch)
    r2 = ImageResize(out_h=2, out_w=2)
    same = r2._resize(src)
    assert (same[:, :, 0] == src).all()

    # stage call: raw gray payload decodes and resizes end-to-end
    batch = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "payload": pa.array([src.tobytes()], pa.large_binary()),
        "meta": pa.array([{"media_type": "image", "format": "raw",
                           "width": 2, "height": 2,
                           "color_space": "DeviceGray", "bits": 8,
                           "duration_ms": 0}]),
    })
    out = r(batch)
    assert out.column("status").to_pylist() == ["ok"]
    assert len(out.column("thumb")[0].as_py()) == 4 * 4 * 3
