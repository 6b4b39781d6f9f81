"""HTML boilerplate stripping (main-content extraction).

The north-rule fusion stage (SURVEY.md §7 step 4): not present in the
reference library — the reference's own cleanup slot is
``converters/whitespace.rs`` (R5) and this stage extends it for HTML turn
payloads. The heuristics follow the publicly described Readability /
Boilerpipe family (tag-density + text-to-link ratio scoring):

1. parse HTML with a regex tokenizer (html.parser-equivalent
   event stream, ~3x faster) into a light DOM;
2. drop pure-boilerplate subtrees (``script style noscript nav header footer
   aside form iframe button svg``);
3. score candidate containers (``article main section div body td``) by
   non-link text length discounted by link density (link-farm penalty);
4. emit the best-scoring subtree as plain text and as markdown
   (headings -> ``#``/``##``/``###``, ``li`` -> ``- ``, table rows ->
   `` | ``-joined cells), then run the reference's R5 cleanup.

Deterministic: ties broken by document order.
"""

from __future__ import annotations

import re
from html import unescape

from .cleanup import cleanup_markdown, cleanup_plain_text

STRIP_TAGS = frozenset({
    "script", "style", "noscript", "nav", "header", "footer", "aside",
    "form", "iframe", "button", "svg", "template",
})
CANDIDATE_TAGS = frozenset({"article", "main", "section", "div", "body", "td"})
BLOCK_TAGS = frozenset({
    "p", "div", "section", "article", "main", "ul", "ol", "li", "table",
    "tr", "blockquote", "pre", "h1", "h2", "h3", "h4", "h5", "h6", "body",
    "html", "figure", "figcaption",
})
VOID_TAGS = frozenset({
    "br", "hr", "img", "input", "meta", "link", "area", "base", "col",
    "embed", "source", "track", "wbr",
})

_WS = re.compile(r"\s+")


class _Node:
    __slots__ = ("tag", "children", "parent")

    def __init__(self, tag: str, parent=None):
        self.tag = tag
        self.children: list = []  # str | _Node
        self.parent = parent


def _iter_nodes(node: _Node):
    # explicit stack: the generator-chain version pays a Python frame
    # per tree level per yielded node (measured ~450k frames per 2.5k
    # docs); order (pre-order, children left-to-right) is unchanged
    stack = [node]
    while stack:
        n = stack.pop()
        yield n
        stack.extend(c for c in reversed(n.children)
                     if isinstance(c, _Node))


def _all_metrics(root: _Node) -> dict[int, tuple[int, int, int]]:
    """One post-order pass computing, for EVERY node, its subtree
    (text_len, link_text_len, p_count) — text lengths are
    whitespace-collapsed; link_len of a node counts only <a> subtrees
    strictly below it. Replaces a per-candidate recursion that was
    quadratic in tree depth."""
    memo: dict[int, tuple[int, int, int]] = {}

    def walk(node: _Node) -> tuple[int, int, int]:
        tl = ll = pc = 0
        for child in node.children:
            if isinstance(child, str):
                # " ".join(split()) == _WS.sub(" ", s).strip() for the
                # collapsed length (both treat all unicode ws) — 4x faster
                tl += len(" ".join(child.split()))
            else:
                ctl, cll, cpc = walk(child)
                tl += ctl
                pc += cpc + (1 if child.tag == "p" else 0)
                ll += ctl if child.tag == "a" else cll
        memo[id(node)] = (tl, ll, pc)
        return tl, ll, pc

    walk(root)
    return memo


def select_main_content(root: _Node) -> _Node:
    """Pick the candidate container with the best content score."""
    metrics = _all_metrics(root)
    best = root
    best_score = -1.0
    for node in _iter_nodes(root):
        if node.tag not in CANDIDATE_TAGS:
            continue
        text_len, link_len, p_count = metrics[id(node)]
        if text_len == 0:
            continue
        link_density = link_len / text_len
        score = (text_len - link_len) * (1.0 - link_density) * (1.0 + 0.1 * p_count)
        if score > best_score:
            best = node
            best_score = score
    return best


_HEADING_PREFIX = {"h1": "# ", "h2": "## ", "h3": "### "}


def _render(node: _Node, out: list[str], markdown: bool) -> None:
    tag = node.tag
    if tag == "br":
        out.append("\n")
        return
    if tag in VOID_TAGS:
        return
    is_block = tag in BLOCK_TAGS
    if is_block and out and not (out[-1].endswith("\n")):
        out.append("\n")
    prefix = ""
    if tag in _HEADING_PREFIX:
        prefix = _HEADING_PREFIX[tag] if markdown else ""
    elif tag in ("h4", "h5", "h6"):
        prefix = "#### "[:0] if not markdown else "#### "
    elif tag == "li":
        prefix = "- "
    if prefix:
        out.append(prefix)

    if tag == "tr":
        cells: list[str] = []
        for child in node.children:
            if isinstance(child, _Node) and child.tag in ("td", "th"):
                sub: list[str] = []
                _render_inline(child, sub)
                cells.append("".join(sub).strip())
        out.append(" | ".join(c for c in cells))
        out.append("\n")
        return

    for child in node.children:
        if isinstance(child, str):
            # fast path: isprintable() rules out every \s char except
            # the ASCII space (Zs separators and controls are not
            # printable), so without a double space the sub is identity
            if child.isprintable() and "  " not in child:
                out.append(child)
            else:
                out.append(_WS.sub(" ", child))
        else:
            _render(child, out, markdown)

    if is_block:
        if tag in ("p", "blockquote", "table", "ul", "ol") or tag in _HEADING_PREFIX:
            out.append("\n\n")
        else:
            out.append("\n")


def _render_inline(node: _Node, out: list[str]) -> None:
    for child in node.children:
        if isinstance(child, str):
            if child.isprintable() and "  " not in child:  # see _render
                out.append(child)
            else:
                out.append(_WS.sub(" ", child))
        else:
            _render_inline(child, out)


def _finalize(raw: str) -> str:
    lines = [ln.strip() for ln in raw.split("\n")]
    text = "\n".join(lines)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text.strip()


# fast tokenizer: one compiled regex per markup construct; ~3x the
# throughput of stdlib html.parser on this workload (which is pure-Python
# per-char scanning), with an html.parser-equivalent event stream.
_TAG_RE = re.compile(
    r"<(?:"
    r"!--.*?(?:-->|$)"                    # comment
    r"|!\[CDATA\[.*?(?:\]\]>|$)"          # cdata
    r"|![^>]*>?"                          # doctype / decls
    r"|\?[^>]*>?"                         # processing instruction
    r"|/\s*([a-zA-Z][-a-zA-Z0-9:]*)[^>]*(?:>|$)"        # end tag -> g1
    r"|([a-zA-Z][-a-zA-Z0-9:]*)"                        # start tag -> g2
    r"((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)(?:>|$)"         # attrs -> g3
    r")", re.S)
# html.parser treats exactly script/style as CDATA; mirror that so the
# event stream (and therefore golden outputs) is unchanged
_RAWTEXT_TAGS = frozenset({"script", "style"})


def parse_html_tree(text: str) -> _Node:
    root = _Node("#root")
    cur = root
    skip_depth = 0
    pos = 0
    n = len(text)
    lower = None  # lazily lowered copy for rawtext close search
    while pos < n:
        lt = text.find("<", pos)
        data = text[pos:] if lt < 0 else text[pos:lt]
        if data and skip_depth == 0:
            cur.children.append(unescape(data) if "&" in data else data)
        if lt < 0:
            break
        pos = lt
        m = _TAG_RE.match(text, pos)
        if m is None:
            if skip_depth == 0:
                cur.children.append("<")
            pos += 1
            continue
        pos = m.end()
        end_tag, start_tag, attrs = m.group(1), m.group(2), m.group(3)
        if start_tag is not None:
            tag = start_tag.lower()
            if tag in _RAWTEXT_TAGS:
                # raw text element: consume to its closing tag, no events
                # for the contents (script/style are boilerplate-stripped
                # anyway; textarea/title bodies are not main content)
                if lower is None:
                    lower = text.lower()
                close = lower.find(f"</{tag}", pos)
                if tag in STRIP_TAGS or skip_depth > 0:
                    pass  # dropped
                elif close >= 0 and tag not in STRIP_TAGS:
                    node = _Node(tag, cur)
                    cur.children.append(node)
                pos = n if close < 0 else lower.find(">", close) + 1 or n
                continue
            self_closing = bool(attrs) and attrs.rstrip().endswith("/")
            if skip_depth > 0:
                if tag not in VOID_TAGS and not self_closing:
                    skip_depth += 1
                continue
            if tag in STRIP_TAGS:
                if not self_closing:
                    skip_depth = 1
                continue
            if tag in VOID_TAGS:
                cur.children.append(_Node(tag, cur))
                continue
            node = _Node(tag, cur)
            cur.children.append(node)
            if not self_closing:
                cur = node
        elif end_tag is not None:
            tag = end_tag.lower()
            if skip_depth > 0:
                skip_depth -= 1
                continue
            node = cur
            while node is not root and node.tag != tag:
                node = node.parent
            if node is not root:
                cur = node.parent
    return root


def strip_html(html_text: str) -> tuple[str, str]:
    """Return ``(plain_text, markdown)`` of the main content."""
    try:
        root = parse_html_tree(html_text)
    except Exception:  # noqa: BLE001 - malformed HTML: fall back to tag strip
        plain = _WS.sub(" ", re.sub(r"<[^>]+>", " ", html_text)).strip()
        return cleanup_plain_text(plain), cleanup_markdown(plain)
    main = select_main_content(root)
    out_plain: list[str] = []
    _render(main, out_plain, markdown=False)
    out_md: list[str] = []
    _render(main, out_md, markdown=True)
    plain = cleanup_plain_text(_finalize("".join(out_plain)))
    md = cleanup_markdown(_finalize("".join(out_md)))
    return plain, md


def looks_like_html(text: str) -> bool:
    """Payload-kind detector helper: tag density check."""
    head = text[:4096]
    tags = head.count("<")
    closers = head.count(">")
    if tags < 3 or closers < 3:
        return False
    lowered = head.lower()
    if any(m in lowered for m in ("<html", "<body", "<div", "<p>", "<article",
                                  "<head", "<!doctype", "<section", "<span")):
        return True
    return tags / max(len(head), 1) > 0.01 and "</" in head
