"""Font/encoding diagnostic report for one PDF page — parity with the
reference's debug tool (``/root/reference/tools/diagnose_font_encoding.rs:
1-86``): per-span text, font name/size, position, Unicode code points
and UTF-8 bytes for the first N spans, then the head of the extracted
text. Single-process (no Ray): a debugging loupe, not a pipeline stage."""

from __future__ import annotations

from .assemble import assemble_text
from .document import PdfDocument


def diagnose_page(pdf_bytes: bytes, page_num: int = 0,
                  max_spans: int = 10, text_head: int = 500) -> dict:
    """Structured diagnostic dict for ``page_num`` of ``pdf_bytes``."""
    doc = PdfDocument(pdf_bytes)
    pages = doc.pages()
    if not pages:
        return {"n_pages": 0, "n_spans": 0, "spans": [], "text_head": "",
                "fonts": []}
    page_num = max(0, min(page_num, len(pages) - 1))
    spans = doc.extract_spans(pages[page_num])
    rows = []
    for i, s in enumerate(spans[:max_spans]):
        utf8 = s.text.encode("utf-8")
        rows.append({
            "span": i,
            "text": s.text,
            "font": s.font_name,
            "font_size": round(float(s.font_size), 2),
            "x": round(float(s.x), 2),
            "y": round(float(s.y), 2),
            "char_codes": [f"U+{ord(c):04X}" for c in s.text[:20]],
            "utf8_bytes": " ".join(f"{b:02X}" for b in utf8[:40]),
            "has_replacement": "�" in s.text,
        })
    fonts = sorted({s.font_name for s in spans if s.font_name})
    text = assemble_text(spans) if spans else ""
    return {
        "n_pages": len(pages),
        "page": page_num,
        "n_spans": len(spans),
        "fonts": fonts,
        "n_replacement_chars": sum(sp.text.count("�")
                                   for sp in spans),
        "spans": rows,
        "text_head": text[:text_head],
    }
