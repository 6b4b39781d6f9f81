"""I6 legacy char mode + R4 char-path markdown conversion."""

import random

from pdf_oxide_ray.core.charmode import CharExtractor, TextChar
from pdf_oxide_ray.core.document import PdfDocument
from pdf_oxide_ray.core.markdown import convert_page_chars
from pdf_oxide_ray.gen.transcripts import make_pdf_payload


def extract_chars_for(content: bytes, fonts: dict | None = None):
    ex = CharExtractor()
    for name, f in (fonts or {}).items():
        ex.add_font(name, f)
    return ex.extract_chars(content)


def test_simple_show_text_chars():
    chars = extract_chars_for(b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (Hi) Tj ET")
    assert [c.char for c in chars] == ["H", "i"]
    assert chars[0].x == 72.0
    assert chars[0].y == 700.0
    # estimated width: 0.5 em split across the string's chars
    assert abs(chars[0].width - (12.0 * 0.5) / 2) < 1e-6


def test_char_sort_reading_order():
    content = (b"BT /F1 12 Tf 1 0 0 1 72 650 Tm (b) Tj "
               b"1 0 0 1 72 700 Tm (a) Tj ET")
    chars = extract_chars_for(content)
    assert [c.char for c in chars] == ["a", "b"]


def test_char_dedup_overlap():
    ex = CharExtractor()
    content = (b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (x) Tj "
               b"1 0 0 1 72.5 700 Tm (x) Tj ET")
    chars = ex.extract_chars(content, dedup=True)
    assert len(chars) == 1


def test_control_chars_skipped():
    chars = extract_chars_for(b"BT /F1 12 Tf 1 0 0 1 72 700 Tm (a\\000b) Tj ET")
    assert [c.char for c in chars] == ["a", "b"]


def test_tj_array_and_newline_ops():
    content = (b"BT /F1 10 Tf 14 TL 1 0 0 1 72 700 Tm "
               b"[ (A) -250 (B) ] TJ T* (C) Tj ET")
    chars = extract_chars_for(content)
    letters = [c.char for c in chars]
    assert set(letters) == {"A", "B", "C"}
    c_char = next(c for c in chars if c.char == "C")
    assert c_char.y == 686.0  # 700 - TL leading


def test_mcid_captured():
    content = (b"BT /F1 12 Tf /P << /MCID 7 >> BDC "
               b"1 0 0 1 72 700 Tm (m) Tj EMC ET")
    chars = extract_chars_for(content)
    assert chars[0].mcid == 7


def test_convert_page_chars_headings_and_words():
    chars = []
    # 24pt bold heading word
    for i, ch in enumerate("Big"):
        chars.append(TextChar(char=ch, x=72.0 + 10.0 * i, y=700.0,
                              width=10.0, height=24.0, font_name="F2",
                              font_size=24.0, bold=True, mcid=None))
    for i, ch in enumerate("body"):
        chars.append(TextChar(char=ch, x=72.0 + 8.0 * i, y=650.0,
                              width=8.0, height=12.0, font_name="F1",
                              font_size=12.0, bold=False, mcid=None))
    md = convert_page_chars(chars)
    assert "# " in md
    assert "Big" in md
    assert "body" in md
    assert md.index("Big") < md.index("body")


def test_char_mode_on_generated_pdfs():
    """Char mode must run on every generated document without raising."""
    n = 0
    for seed in range(25):
        payload = make_pdf_payload(random.Random(seed))
        doc = PdfDocument(payload.encode("latin-1"))
        for page in doc.pages():
            content = doc.get_page_content_data(page)
            ex = CharExtractor()
            for name, f in doc.load_fonts(page).items():
                ex.add_font(name, f)
            chars = ex.extract_chars(content)
            if chars:
                n += 1
                md = convert_page_chars(chars)
                assert isinstance(md, str)
    assert n > 10
