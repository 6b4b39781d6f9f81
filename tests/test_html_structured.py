"""R6 HTML conversion + R7 structured extraction tests, mirroring the
reference's unit suites (html.rs:620-720 doctests, structured.rs tests)."""

from pdf_oxide_ray.core.html_out import (
    convert_page_from_spans,
    convert_page_layout,
    convert_page_semantic,
    escape_html,
    linkify_urls_and_emails,
)
from pdf_oxide_ray.core.interpret import TextSpan
from pdf_oxide_ray.core.structured import (
    ExtractorConfig,
    detect_list_marker,
    extract_structured,
    structured_to_plain_text,
)


def span(text, x, y, size=12.0, bold=False, font="Helvetica"):
    return TextSpan(text=text, x=x, y=y, width=8.0 * len(text), height=size,
                    font_name=font, font_size=size, bold=bold, mcid=None,
                    sequence=0)


# -- escape / linkify -------------------------------------------------------

def test_escape_html():
    assert escape_html("AT&T <Company>") == "AT&amp;T &lt;Company&gt;"
    assert escape_html('a"b\'c') == "a&quot;b&#x27;c"


def test_linkify_urls_and_emails():
    out = linkify_urls_and_emails(
        "Visit https://example.com or email test@example.com")
    assert '<a href="https://example.com">' in out
    assert '<a href="mailto:test@example.com">' in out


# -- semantic HTML ----------------------------------------------------------

def test_semantic_html_heading_and_paragraph():
    spans = [
        span("Title", 72, 720, size=24, bold=True),
        span("Body text here.", 72, 680, size=12),
    ]
    html = convert_page_semantic(spans)
    assert "<h1>Title</h1>" in html
    assert "<p>Body text here.</p>" in html
    # heading (top of page, larger Y) comes first
    assert html.index("<h1>") < html.index("<p>")


def test_semantic_html_small_text():
    html = convert_page_semantic([span("footnote", 72, 50, size=8)])
    assert "<small>footnote</small>" in html


def test_semantic_html_same_line_merge():
    spans = [span("Hello", 72, 700), span("world", 120, 700)]
    html = convert_page_semantic(spans)
    assert html.count("<p>") == 1
    assert "Hello world" in html


def test_semantic_empty():
    assert convert_page_semantic([]) == ""


def test_layout_html_absolute_divs():
    html = convert_page_layout([span("Positioned", 72, 700)])
    assert 'class="page"' in html
    assert "left: 72px" in html
    assert "top: 700px" in html
    assert "Positioned" in html


def test_dispatcher_modes():
    spans = [span("X", 0, 0)]
    assert "<div" in convert_page_from_spans(spans, preserve_layout=True)
    assert "<div" not in convert_page_from_spans(spans, preserve_layout=False)


# -- structured extraction --------------------------------------------------

def test_detect_list_marker_bullets():
    assert detect_list_marker("• item") == (False, 1)
    assert detect_list_marker("- item") == (False, 1)
    assert detect_list_marker("* item") == (False, 1)


def test_detect_list_marker_ordered():
    assert detect_list_marker("1. item") == (True, 2)
    assert detect_list_marker("12) item") == (True, 3)
    assert detect_list_marker("a. item") == (True, 2)
    assert detect_list_marker("(a) item") == (True, 3)
    assert detect_list_marker("(12) item") == (True, 4)


def test_detect_list_marker_negative():
    assert detect_list_marker("plain text") is None
    assert detect_list_marker("") is None
    assert detect_list_marker("12345. too long") is None


def test_extract_structured_headers_and_paragraphs():
    spans = [
        span("Big Title", 72, 720, size=24, bold=True),
        span("Some body text that is long enough.", 72, 680, size=10),
    ]
    doc = extract_structured(spans)
    types = [el["type"] for el in doc["elements"]]
    assert "header" in types
    assert "paragraph" in types
    header = next(el for el in doc["elements"] if el["type"] == "header")
    assert header["level"] == 1
    assert doc["metadata"]["header_count"] == 1
    assert doc["metadata"]["paragraph_count"] == 1


def test_extract_structured_lists():
    spans = [
        span("- first item", 72, 700, size=10),
        span("- second item", 72, 685, size=10),
        span("1. ordered one", 72, 660, size=10),
        span("2. ordered two", 72, 645, size=10),
    ]
    doc = extract_structured(spans)
    lists = [el for el in doc["elements"] if el["type"] == "list"]
    assert len(lists) == 2
    assert lists[0]["ordered"] is False
    assert [i["text"] for i in lists[0]["items"]] == ["first item",
                                                      "second item"]
    assert lists[1]["ordered"] is True
    assert doc["metadata"]["list_count"] == 2


def test_extract_structured_empty():
    doc = extract_structured([])
    assert doc["elements"] == []
    assert doc["metadata"]["element_count"] == 0


def test_structured_to_plain_text():
    spans = [
        span("Heading", 72, 720, size=24, bold=True),
        span("- a", 72, 680, size=10),
        span("- b", 72, 665, size=10),
    ]
    doc = extract_structured(spans)
    text = structured_to_plain_text(doc)
    assert "Heading" in text
    assert "- a" in text
    assert "- b" in text


def test_structured_config_disable_lists():
    spans = [span("- item", 72, 700, size=10)]
    doc = extract_structured(spans, ExtractorConfig(detect_lists=False))
    assert doc["metadata"]["list_count"] == 0
    assert doc["metadata"]["paragraph_count"] == 1
