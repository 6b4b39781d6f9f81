"""Document layer (S1-S6) + HTML boilerplate strip tests."""

import base64
import random
import zlib

from pdf_oxide_ray.core.document import PdfDocument
from pdf_oxide_ray.core.htmlstrip import looks_like_html, strip_html
from pdf_oxide_ray.core.payload import detect_payload_kind, extract_payload
from pdf_oxide_ray.gen.transcripts import make_html_payload, make_pdf_payload


def _simple_pdf(content: bytes, with_xref: bool = True) -> bytes:
    out = bytearray(b"%PDF-1.7\n")
    offsets = {}
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
        3: b"<< /Type /Page /Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        4: f"<< /Length {len(content)} >>\nstream\n".encode() + content + b"\nendstream",
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    for num, body in objs.items():
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    if with_xref:
        xref_pos = len(out)
        out += b"xref\n0 6\n0000000000 65535 f \n"
        for num in range(1, 6):
            out += f"{offsets[num]:010d} 00000 n \n".encode()
        out += (b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n"
                + str(xref_pos).encode() + b"\n%%EOF\n")
    return bytes(out)


CONTENT = b"BT /F1 12 Tf 72 720 Td (Hello from xref) Tj ET"


def test_open_with_xref_table():
    doc = PdfDocument(_simple_pdf(CONTENT))
    pages = doc.pages()
    assert len(pages) == 1
    assert doc.extract_text(pages[0]) == "Hello from xref"


def test_open_without_xref_reconstructs():
    doc = PdfDocument(_simple_pdf(CONTENT, with_xref=False))
    assert doc.extract_text(doc.pages()[0]) == "Hello from xref"


def test_corrupt_startxref_reconstructs():
    data = _simple_pdf(CONTENT)
    data = data.replace(b"startxref", b"startxrZf")  # break the pointer
    doc = PdfDocument(data)
    assert doc.extract_text(doc.pages()[0]) == "Hello from xref"


def test_filtered_content_stream():
    enc = base64.a85encode(zlib.compress(CONTENT)) + b"~>"
    raw = (f"<< /Filter [ /ASCII85Decode /FlateDecode ] /Length {len(enc)} >>"
           f"\nstream\n").encode() + enc + b"\nendstream"
    pdf = _simple_pdf(CONTENT)  # build, then replace object 4
    # simpler: build custom
    out = bytearray(b"%PDF-1.7\n")
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
        3: b"<< /Type /Page /Contents 4 0 R >>",
        4: raw,
    }
    for num, body in objs.items():
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    doc = PdfDocument(bytes(out))
    assert doc.extract_text(doc.pages()[0]) == "Hello from xref"


def test_multipage_join_separators():
    # two pages through the generator builder path
    rng = random.Random(3)
    for _ in range(20):
        payload = make_pdf_payload(rng)
        r = extract_payload(payload)
        assert r["status"] == "ok"
    # explicit 2-page doc
    out = bytearray(b"%PDF-1.7\n")
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [ 3 0 R 5 0 R ] /Count 2 >>",
        3: b"<< /Type /Page /Contents 4 0 R >>",
        4: b"<< >>\nstream\nBT /F1 12 Tf 72 720 Td (pageone) Tj ET\nendstream",
        5: b"<< /Type /Page /Contents 6 0 R >>",
        6: b"<< >>\nstream\nBT /F1 12 Tf 72 720 Td (pagetwo) Tj ET\nendstream",
    }
    for num, body in objs.items():
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    doc = PdfDocument(bytes(out))
    assert doc.extract_text_all() == "pageone\n\n---\n\npagetwo"
    # per-page markdown carries its trailing newline (render_line appends \n)
    assert doc.to_markdown_all() == "pageone\n\n---\n\npagetwo\n"


def test_resources_inherited_from_pages_node():
    out = bytearray(b"%PDF-1.7\n")
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: (b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 "
            b"/Resources << /Font << /F9 5 0 R >> >> >>"),
        3: b"<< /Type /Page /Contents 4 0 R >>",
        4: b"<< >>\nstream\nBT /F9 12 Tf 72 720 Td (inherited) Tj ET\nendstream",
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Times-Bold >>",
    }
    for num, body in objs.items():
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    doc = PdfDocument(bytes(out))
    page = doc.pages()[0]
    assert "F9" in doc.load_fonts(page)
    spans = doc.extract_spans(page)
    assert spans[0].bold  # Times-Bold via inherited Resources


# -- HTML ------------------------------------------------------------------

def test_html_detection():
    assert detect_payload_kind("<html><body>x</body></html>") == "html"
    assert detect_payload_kind("%PDF-1.7\n...") == "pdf"
    assert detect_payload_kind("just words") == "plain"
    assert looks_like_html("<div><p>hello</p><p>more</p></div>")


def test_strip_html_keeps_article_drops_boilerplate():
    html = """<html><head><script>evil()</script><style>.x{}</style></head>
    <body><nav><a href="/a">A</a><a href="/b">B</a><a href="/c">C</a></nav>
    <header>SiteName</header>
    <article><h1>Real Title</h1><p>Main content sentence one.</p>
    <ul><li>item alpha</li><li>item beta</li></ul>
    <table><tr><th>k</th><th>v</th></tr><tr><td>x</td><td>1</td></tr></table>
    </article>
    <footer><a href="/f1">F1</a><a href="/f2">F2</a> copyright 2026</footer>
    </body></html>"""
    plain, md = strip_html(html)
    assert "Real Title" in plain
    assert "Main content sentence one." in plain
    assert "- item alpha" in plain
    assert "x | 1" in plain
    assert "evil()" not in plain
    assert "SiteName" not in plain
    assert "copyright" not in plain
    assert md.startswith("# Real Title")


def test_generated_html_plants_only_article():
    rng = random.Random(11)
    for _ in range(10):
        html = make_html_payload(rng)
        plain, _ = strip_html(html)
        assert "tracking" not in plain
        assert "copyright" not in plain
        assert "ad one" not in plain
        assert len(plain) > 50


def test_entities_unescaped():
    plain, _ = strip_html("<div><article><p>a &amp; b &lt;c&gt;</p>"
                          "<p>filler one</p><p>filler two</p></article></div>")
    assert "a & b <c>" in plain
