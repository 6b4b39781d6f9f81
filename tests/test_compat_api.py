"""Reference-compatible Python facade tests.

Port of the reference's Python binding suite
(/root/reference/tests/test_python.py:16-200) against
``pdf_oxide_ray.compat.PdfDocument``, which mirrors the PyO3 class in
/root/reference/src/python.rs:42-416.  Where the reference suite only
asserted types (its fixtures were optional), we pin exact values for our
deterministic fixtures; the real reference fixture simple.pdf is also
exercised directly.
"""

import os

import pytest

from pdf_oxide_ray.compat import PdfDocument
from tests.test_reference_fixtures import _build_pdf, _contentless_pdf, \
    _hello_world_pdf

_REAL_SIMPLE_PDF = "/root/reference/tests/fixtures/simple.pdf"


@pytest.fixture()
def simple_path(tmp_path):
    p = tmp_path / "simple.pdf"
    p.write_bytes(_contentless_pdf())
    return str(p)


@pytest.fixture()
def hello_path(tmp_path):
    p = tmp_path / "hello_world.pdf"
    p.write_bytes(_hello_world_pdf())
    return str(p)


def test_open_pdf(simple_path):
    # test_python.py:16-30
    doc = PdfDocument(simple_path)
    version = doc.version()
    assert isinstance(version, tuple) and len(version) == 2
    assert version == (1, 4)


def test_open_missing_file_raises_ioerror(tmp_path):
    # python.rs:66-71: open failure -> IOError
    with pytest.raises(IOError):
        PdfDocument(str(tmp_path / "nope.pdf"))


def test_open_invalid_header_raises_ioerror(tmp_path):
    p = tmp_path / "bad.pdf"
    p.write_bytes(b"not a pdf at all")
    with pytest.raises(IOError):
        PdfDocument(str(p))


def test_open_bad_version_raises_ioerror(tmp_path):
    # parse_header (document.rs:2814-2816): major > 2 is UnsupportedVersion
    p = tmp_path / "v9.pdf"
    p.write_bytes(_build_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] >>",
    }, header=b"%PDF-9.9\n"))
    with pytest.raises(IOError):
        PdfDocument(str(p))


def test_version_range(simple_path):
    # test_python.py:33-44
    major, minor = PdfDocument(simple_path).version()
    assert 1 <= major <= 2 and 0 <= minor <= 7


def test_page_count(simple_path):
    # test_python.py:47-55
    count = PdfDocument(simple_path).page_count()
    assert isinstance(count, int)
    assert count == 1


def test_extract_text(simple_path):
    # test_python.py:58-67 (content-less page -> empty string is valid)
    text = PdfDocument(simple_path).extract_text(0)
    assert isinstance(text, str)
    assert text == ""


def test_extract_text_with_content(hello_path):
    # test_python.py:71-81
    text = PdfDocument(hello_path).extract_text(0)
    assert "hello" in text.lower()
    assert text == "Hello World"


def test_extract_text_out_of_range(hello_path):
    # python.rs:143-147: failures surface as RuntimeError
    with pytest.raises(RuntimeError):
        PdfDocument(hello_path).extract_text(5)


def test_to_plain_text_equals_extract_text(hello_path):
    # document.rs:2278-2284: to_plain_text == extract_text; options ignored
    doc = PdfDocument(hello_path)
    assert doc.to_plain_text(0) == doc.extract_text(0)
    assert doc.to_plain_text(0, preserve_layout=True,
                             detect_headings=False) == doc.extract_text(0)


def test_to_markdown(hello_path):
    # test_python.py:84-91
    md = PdfDocument(hello_path).to_markdown(0)
    assert isinstance(md, str)
    assert "Hello World" in md


def test_to_markdown_with_options(hello_path):
    # test_python.py:94-109
    doc = PdfDocument(hello_path)
    for kwargs in ({"detect_headings": True}, {"detect_headings": False},
                   {"preserve_layout": True}):
        md = doc.to_markdown(0, **kwargs)
        assert isinstance(md, str)


def test_to_html(hello_path):
    # test_python.py:112-120
    html = PdfDocument(hello_path).to_html(0)
    assert isinstance(html, str)
    assert "Hello World" in html


def test_to_html_preserve_layout(hello_path):
    # html.rs:94-105: layout mode emits absolute-positioned divs
    html = PdfDocument(hello_path).to_html(0, preserve_layout=True)
    assert "position: absolute" in html


def test_all_pages_separators(tmp_path):
    # document.rs:2317-2333 / 2366-2382 / 2514-2528 join semantics,
    # on a two-page doc so the separators actually appear
    c1 = b"BT /F1 12 Tf 72 720 Td (Page one) Tj ET"
    c2 = b"BT /F1 12 Tf 72 720 Td (Page two) Tj ET"
    data = _build_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 6 0 R] /Count 2 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"),
        4: (f"<< /Length {len(c1)} >>\nstream\n".encode() + c1
            + b"\nendstream"),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        6: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 7 0 R /Resources << /Font << /F1 5 0 R >> >> >>"),
        7: (f"<< /Length {len(c2)} >>\nstream\n".encode() + c2
            + b"\nendstream"),
    })
    p = tmp_path / "two.pdf"
    p.write_bytes(data)
    doc = PdfDocument(str(p))
    assert doc.page_count() == 2
    assert doc.to_plain_text_all() == "Page one\n\n---\n\nPage two"
    # each page's markdown carries its trailing line newline
    # (markdown.rs body lines end with '\n'), so the join reads:
    assert doc.to_markdown_all() == "Page one\n\n---\n\nPage two\n"
    html_all = doc.to_html_all()
    assert html_all.count('<div class="page"') == 2
    assert 'data-page="1"' in html_all and 'data-page="2"' in html_all
    assert html_all.index("Page one") < html_all.index("Page two")


def test_has_structure_tree_false(simple_path):
    # test_python.py has_structure_tree surface (python.rs:120-124)
    assert PdfDocument(simple_path).has_structure_tree() is False


def test_repr(hello_path):
    # python.rs:410-412
    assert repr(PdfDocument(hello_path)) == "PdfDocument(version=1.4)"


@pytest.mark.skipif(not os.path.exists(_REAL_SIMPLE_PDF),
                    reason="reference fixture not present")
def test_real_reference_fixture():
    # The reference's own checked-in fixture opens through the facade.
    doc = PdfDocument(_REAL_SIMPLE_PDF)
    assert doc.page_count() >= 1
    assert isinstance(doc.extract_text(0), str)
    assert isinstance(doc.to_markdown_all(), str)
