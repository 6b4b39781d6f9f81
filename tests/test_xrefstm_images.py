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
