"""HTML output conversion (R6) from spans.

Re-implements the computation of
``HtmlConverter::convert_page_from_spans``
(``/root/reference/src/converters/html.rs:94-320``):

* semantic mode: sort spans (y asc, x asc), merge same-line (<5px) +
  similar-size (<2pt) spans into paragraphs (space if x-gap > 1), heading
  detection (L6 rules), emit h1-h3 / p / small tags with URL/email
  linkification
* layout mode: absolute-positioned divs with a fixed CSS prelude
* ``escape_html`` (``html.rs:628-634``), ``linkify_urls_and_emails``
  (``html.rs:660-676``)
"""

from __future__ import annotations

from dataclasses import dataclass

from .interpret import TextSpan
from .markdown import RE_EMAIL, RE_URL, BODY, H1, H2, H3, SMALL, classify_block


def escape_html(text: str) -> str:
    """html.rs:628-634 (same replacement order)."""
    return (text.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;")
            .replace("'", "&#x27;"))


def linkify_urls_and_emails(text: str) -> str:
    """Escape then wrap URLs/emails in <a> tags (html.rs:660-676)."""
    escaped = escape_html(text)
    with_urls = RE_URL.sub(
        lambda m: f'<a href="{m.group(0)}">{m.group(0)}</a>', escaped)
    return RE_EMAIL.sub(
        lambda m: f'<a href="mailto:{m.group(0)}">{m.group(0)}</a>', with_urls)


@dataclass
class _Para:
    x: float
    y: float
    width: float
    height: float
    text: str
    font_size: float
    bold: bool


def _merge_spans_to_paragraphs(spans: list[TextSpan]) -> list[_Para]:
    """Same line (<5px) + similar font size (<2pt) -> one paragraph; space
    inserted when x-gap > 1 (html.rs:155-205)."""
    ordered = sorted(spans, key=lambda s: (s.y, s.x))
    paras: list[_Para] = []
    cur: _Para | None = None
    for s in ordered:
        if cur is None:
            cur = _Para(s.x, s.y, s.width, s.height, s.text, s.font_size, s.bold)
            continue
        same_line = abs(s.y - cur.y) < 5.0
        similar_font = abs(s.font_size - cur.font_size) < 2.0
        if same_line and similar_font:
            x_gap = s.x - (cur.x + cur.width)
            if x_gap > 1.0 and not cur.text.endswith(" ") and not s.text.startswith(" "):
                cur.text += " "
            cur.text += s.text
            new_right = s.x + s.width
            if new_right > cur.x + cur.width:
                cur.width = new_right - cur.x
        else:
            paras.append(cur)
            cur = _Para(s.x, s.y, s.width, s.height, s.text, s.font_size, s.bold)
    if cur is not None:
        paras.append(cur)
    return paras


_TAGS = {H1: "h1", H2: "h2", H3: "h3", BODY: "p", SMALL: "small"}


def convert_page_semantic(spans: list[TextSpan],
                          detect_headings: bool = True) -> str:
    """Semantic HTML (html.rs:122-258). Reading order for the span path is
    TopToBottomLeftToRight (Y descending in PDF coords, X ascending)."""
    if not spans:
        return ""
    paras = _merge_spans_to_paragraphs(spans)
    levels = [classify_block(p.font_size, p.bold) if detect_headings else BODY
              for p in paras]
    ordered = sorted(range(len(paras)), key=lambda i: (-paras[i].y, paras[i].x))
    out: list[str] = []
    for idx in ordered:
        tag = _TAGS[levels[idx]]
        out.append(f"<{tag}>{linkify_urls_and_emails(paras[idx].text)}</{tag}>\n")
    return "".join(out)


_LAYOUT_CSS = (
    "<style>\n"
    ".page {\n"
    "  position: relative;\n"
    "  width: 100%;\n"
    "  height: 100%;\n"
    "}\n"
    ".text {\n"
    "  position: absolute;\n"
    "  white-space: nowrap;\n"
    "}\n"
    "</style>\n"
)


def _fmt(v: float) -> str:
    """Rust's {} float Display: integral values print without decimals."""
    if v == int(v):
        return str(int(v))
    return repr(v)


def convert_page_layout(spans: list[TextSpan]) -> str:
    """Layout-preserving HTML: absolute-positioned divs
    (html.rs:278-320)."""
    if not spans:
        return ""
    parts = [_LAYOUT_CSS, '<div class="page">\n']
    for s in spans:
        parts.append(
            f'  <div class="text" style="left: {_fmt(s.x)}px; '
            f'top: {_fmt(s.y)}px; font-size: {_fmt(s.font_size)}px;">'
            f"{escape_html(s.text)}</div>\n")
    parts.append("</div>\n")
    return "".join(parts)


def convert_page_from_spans(spans: list[TextSpan], *,
                            preserve_layout: bool = False,
                            detect_headings: bool = True) -> str:
    """Dispatcher (html.rs:94-105)."""
    if preserve_layout:
        return convert_page_layout(spans)
    return convert_page_semantic(spans, detect_headings)
