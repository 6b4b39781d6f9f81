"""Cleanup (R5) + markdown (R3/L6) tests, mirroring reference
whitespace.rs:347-455 and heading_detector.rs:197-315 test cases."""

from pdf_oxide_ray.core.cleanup import (
    cleanup_markdown, cleanup_plain_text, normalize_horizontal_whitespace,
    normalize_whitespace, remove_page_artifacts,
)
from pdf_oxide_ray.core.markdown import (
    H1, H2, H3, SMALL, BODY, classify_block, convert_page_from_spans,
    format_links, clean_reference_spacing, should_insert_bold_marker,
)
from tests.test_spans_assemble import mock_word


def test_normalize_whitespace():
    assert normalize_whitespace("a\n\n\n\n\n\nb") == "a\n\n\nb"
    assert normalize_whitespace("a\n\nb") == "a\n\nb"


def test_remove_page_artifacts():
    text = "Content\nPage 3\n- 4 -\n[5]\n(6)\n17\n-----\n=====\nMore"
    out = remove_page_artifacts(text)
    for artifact in ("Page 3", "- 4 -", "[5]", "(6)", "-----", "====="):
        assert artifact not in out
    assert "Content" in out and "More" in out
    # 4-digit numbers survive (only 1-3 digits are page numbers)
    assert "1234" in remove_page_artifacts("1234")


def test_horizontal_whitespace_preserves_indent():
    assert normalize_horizontal_whitespace("The  quick    fox") == "The quick fox"
    assert normalize_horizontal_whitespace("   lead  in") == "   lead in"


def test_cleanup_plain_text():
    assert cleanup_plain_text("a  b\n\n\n\n\nc  d") == "a b\n\n\nc d"


def test_cleanup_markdown_removes_artifacts_and_blanks():
    out = cleanup_markdown("x\n\n\n\n\nPage 1\n\n\n\n\ny")
    assert "Page 1" not in out
    assert "\n\n\n\n" not in out


def test_heading_rules():
    assert classify_block(24.0, True) == H1
    assert classify_block(18.0, True) == H2
    assert classify_block(16.0, True) == H2
    assert classify_block(14.0, True) == H3
    assert classify_block(14.0, False) == BODY
    assert classify_block(8.0, False) == SMALL
    assert classify_block(12.0, False) == BODY
    assert classify_block(24.0, False) == BODY  # big but not bold


def test_markdown_heading_rendering():
    spans = [mock_word("Title", 72, 730, size=24, bold=True),
             mock_word("Body text here", 72, 700, size=12)]
    md = convert_page_from_spans(spans)
    # reference renders the heading prefix AND the bold wrap (markdown.rs
    # render_line: prefix then bold-run grouping)
    assert md.startswith("# **Title**\n")
    assert "Body text here" in md


def test_markdown_bold_run():
    spans = [mock_word("normal ", 72, 700, width=40),
             mock_word("bold", 115, 700, bold=True, width=25),
             mock_word(" after", 142, 700, width=30)]
    md = convert_page_from_spans(spans)
    assert "**bold**" in md


def test_markdown_no_midword_bold_markers():
    spans = [mock_word("gr", 72, 700, width=10),
             mock_word("I", 82, 700, bold=True, width=5),
             mock_word("d", 87, 700, width=5)]
    md = convert_page_from_spans(spans)
    assert "**" not in md  # would split the word


def test_format_links():
    assert format_links("see https://example.com/x now") == \
        "see [https://example.com/x](https://example.com/x) now"
    assert format_links("mail a@b.co here") == "mail [a@b.co](mailto:a@b.co) here"


def test_clean_reference_spacing():
    assert clean_reference_spacing("21, 23 –25") == "21, 23–25"
    assert clean_reference_spacing("21– 25") == "21–25"
    # both-sides spacing is NOT collapsed: neither reference pattern matches
    # "d – d" (markdown.rs:814-821 comment notwithstanding) — parity kept
    assert clean_reference_spacing("21 – 25") == "21 – 25"


def test_bold_marker_guards():
    assert should_insert_bold_marker(" ", "t")
    assert not should_insert_bold_marker("r", "I")
    assert not should_insert_bold_marker(")", "=")
    assert should_insert_bold_marker(None, "x")
