"""Markdown conversion from spans (R3) + heading detection (L6).

Re-implements the computation of:

* ``MarkdownConverter::convert_page_from_spans``
  (``/root/reference/src/converters/markdown.rs:191-376``): sort blocks by
  (y asc, x asc), ``merge_adjacent_char_spans`` (``markdown.rs:86-146``),
  heading detection, TopToBottomLeftToRight reading order
  (``markdown.rs:561-594``), line grouping (|dy| < 2pt), bold-run grouping
  with word-boundary guards ``should_insert_bold_marker``
  (``markdown.rs:857-884``), URL/email linkification ``format_links``
  (``markdown.rs:758-793``), dash-spacing repair ``clean_reference_spacing``
  (``markdown.rs:811-824``), and final ``cleanup_markdown``
* heading rules ``detect_headings`` / ``classify_block``
  (``/root/reference/src/layout/heading_detector.rs:74-156``)
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .cleanup import cleanup_markdown
from .interpret import TextSpan

RE_URL = re.compile(r"(https?://[^\s<>\[\]]*[^\s<>\[\].,!?;:])")
RE_EMAIL = re.compile(r"([a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,})")
RE_DASH_BEFORE = re.compile(r"(\d)\s+(–|—)(\d)")
RE_DASH_AFTER = re.compile(r"(\d)(–|—)\s+(\d)")

H1, H2, H3, BODY, SMALL = 0, 1, 2, 3, 4


@dataclass
class _Block:
    x: float
    y: float
    width: float
    height: float
    text: str
    font_size: float
    font: str
    bold: bool
    mcid: int | None = None


def classify_block(size: float, is_bold: bool) -> int:
    """reference heading_detector.rs:134-155 rule cascade."""
    if size >= 22.0 and is_bold:
        return H1
    if size >= 18.0 and is_bold:
        return H2
    if size >= 16.0 and is_bold:
        return H2
    if size >= 14.0 and is_bold:
        return H3
    if size >= 14.0:
        return BODY
    if size < 9.0:
        return SMALL
    return BODY


def detect_headings(blocks: list[_Block]) -> list[int]:
    """reference detect_headings (heading_detector.rs:74-88). The size
    clustering computed there does not influence classify_block's rule
    cascade, so classification is per-block."""
    return [classify_block(b.font_size, b.bold) for b in blocks]


def should_insert_bold_marker(prev_char: str | None, next_char: str | None) -> bool:
    """reference markdown.rs:857-884."""
    if prev_char is not None and next_char is not None:
        if prev_char.isalnum() and next_char.isalnum():
            return False
        if prev_char in ")]}" and next_char in "=-+<>*/&|^":
            return False
    return True


def format_links(text: str) -> str:
    """reference format_links (markdown.rs:758-793). Substring guards
    ("http"/"@" are REQUIRED by the patterns) skip the regex machinery on
    the overwhelmingly common linkless run."""

    if "http" in text:
        def url_sub(m: re.Match) -> str:
            url = m.group(1)
            if f"[{url}]" in text:
                return url
            return f"[{url}]({url})"

        result = RE_URL.sub(url_sub, text)
    else:
        result = text

    if "@" not in result:
        return result

    def email_sub(m: re.Match) -> str:
        email = m.group(1)
        if f"[{email}]" in result or f"//{email}" in result:
            return email
        return f"[{email}](mailto:{email})"

    return RE_EMAIL.sub(email_sub, result)


def clean_reference_spacing(text: str) -> str:
    """reference clean_reference_spacing (markdown.rs:811-824). Guard:
    both patterns require an en/em dash."""
    if "–" not in text and "—" not in text:
        return text
    text = RE_DASH_BEFORE.sub(r"\1\2\3", text)
    return RE_DASH_AFTER.sub(r"\1\2\3", text)


def merge_adjacent_char_spans(blocks: list[_Block]) -> list[_Block]:
    """reference markdown.rs:86-146: merge same-line (<2pt), same
    font/size(<0.5pt)/style blocks whose gap < 0.18 * font_size."""
    if not blocks:
        return blocks
    merged: list[_Block] = []
    current: _Block | None = None
    for block in blocks:
        if current is None:
            current = block
            continue
        same_line = abs(current.y - block.y) < 2.0
        same_font = current.font == block.font
        same_size = abs(current.font_size - block.font_size) < 0.5
        same_style = current.bold == block.bold
        if same_line and same_font and same_size and same_style:
            gap = block.x - (current.x + current.width)
            merge_threshold = current.font_size * 0.18
            prev_is_space = not current.text.strip()
            curr_is_space = not block.text.strip()
            if not prev_is_space and not curr_is_space and gap < merge_threshold:
                current = _Block(
                    x=current.x, y=current.y,
                    width=(block.x + block.width) - current.x,
                    height=current.height, text=current.text + block.text,
                    font_size=current.font_size, font=current.font,
                    bold=current.bold, mcid=current.mcid)
                continue
        merged.append(current)
        current = block
    if current is not None:
        merged.append(current)
    return merged


def convert_page_chars(chars: list, reading_order_mode: str = "top_to_bottom",
                       detect_headings_opt: bool = True) -> str:
    """R4 legacy char path (markdown.rs:417-545): chars -> L1 word
    clustering (epsilon = 0.8 * median font size, markdown.rs:444-445) ->
    word blocks -> the shared block renderer."""
    if not chars:
        return ""
    from .layout import Block as LBlock
    from .layout import cluster_chars_into_words

    lchars = [LBlock(x=c.x, y=c.y, width=c.width, height=c.height,
                     text=c.char, font_size=c.font_size, bold=c.bold)
              for c in chars]
    sizes = sorted(c.font_size for c in chars)
    median_size = sizes[len(sizes) // 2] if sizes else 12.0
    epsilon = 0.8 * median_size
    clusters = cluster_chars_into_words(lchars, epsilon)
    blocks: list[_Block] = []
    for cluster in clusters:
        members = [chars[i] for i in cluster]
        x0 = min(m.x for m in members)
        y0 = min(m.y for m in members)
        x1 = max(m.x + m.width for m in members)
        y1 = max(m.y + m.height for m in members)
        n_bold = sum(1 for m in members if m.bold)
        blocks.append(_Block(
            x=x0, y=y0, width=x1 - x0, height=y1 - y0,
            text="".join(m.char for m in members),
            font_size=sum(m.font_size for m in members) / len(members),
            font=members[0].font_name,
            bold=n_bold * 2 > len(members),
            mcid=members[0].mcid))
    levels = detect_headings(blocks) if detect_headings_opt \
        else [BODY] * len(blocks)
    if reading_order_mode == "column_aware":
        ordered = _column_aware_order(blocks)
    else:
        ordered = sorted(range(len(blocks)),
                         key=lambda i: (-blocks[i].y, blocks[i].x))
    return _render_ordered_blocks(blocks, levels, ordered)


def reorder_by_mcid(blocks: list, mcids: list[int | None],
                    mcid_order: list[int]) -> list[int]:
    """StructureTreeFirst ordering (markdown.rs:659-703): blocks grouped
    by MCID in structure-tree order (spatial sort within an MCID);
    MCID-less blocks appended in index order."""
    ordered: list[int] = []
    seen: set[int] = set()
    for mcid in mcid_order:
        group = [i for i, m in enumerate(mcids) if m == mcid and i not in seen]
        group.sort(key=lambda i: (-blocks[i].y, blocks[i].x))
        ordered.extend(group)
        seen.update(group)
    for i, m in enumerate(mcids):
        if m is None and i not in seen:
            ordered.append(i)
    return ordered


def _column_aware_order(blocks: list) -> list[int]:
    """ColumnAware mode: XY-Cut tree order (markdown.rs:597-612)."""
    from .layout import Block as LBlock
    from .layout import determine_reading_order, xy_cut

    lblocks = [LBlock(x=b.x, y=b.y, width=b.width, height=b.height,
                      text=b.text, font_size=b.font_size, bold=b.bold)
               for b in blocks]
    min_x = min(b.x for b in lblocks)
    min_y = min(b.y for b in lblocks)
    max_x = max(b.x + b.width for b in lblocks)
    max_y = max(b.y + b.height for b in lblocks)
    tree = xy_cut((min_x, min_y, max_x - min_x, max_y - min_y), lblocks)
    return determine_reading_order(tree)


def convert_page_from_spans(spans: list[TextSpan],
                            detect_headings_opt: bool = True,
                            reading_order_mode: str = "top_to_bottom",
                            mcid_order: list[int] | None = None) -> str:
    """reference convert_page_from_spans (markdown.rs:191-376).

    ``reading_order_mode``: ``top_to_bottom`` (span-path default,
    markdown.rs:243-244) | ``column_aware`` (XY-Cut) |
    ``structure_tree`` (MCID order with XY-Cut fallback) — the
    ConversionOptions.ReadingOrderMode surface (converters/mod.rs:69-159).
    """
    if not spans:
        return ""
    blocks = [
        _Block(x=s.x, y=s.y, width=s.width, height=s.height, text=s.text,
               font_size=s.font_size, font=s.font_name, bold=s.bold,
               mcid=s.mcid)
        for s in spans
    ]
    # NB reference sorts blocks by Y ASCENDING here (markdown.rs:224-233)
    blocks.sort(key=lambda b: (b.y, b.x))
    blocks = merge_adjacent_char_spans(blocks)
    levels = detect_headings(blocks) if detect_headings_opt else [BODY] * len(blocks)
    if reading_order_mode == "structure_tree" and mcid_order:
        ordered = reorder_by_mcid(blocks, [b.mcid for b in blocks],
                                  mcid_order)
    elif reading_order_mode == "column_aware":
        ordered = _column_aware_order(blocks)
    else:
        # TopToBottomLeftToRight: Y descending (top first), X ascending
        ordered = sorted(range(len(blocks)),
                         key=lambda i: (-blocks[i].y, blocks[i].x))
    return _render_ordered_blocks(blocks, levels, ordered)


def _render_ordered_blocks(blocks: list[_Block], levels: list[int],
                           ordered: list[int]) -> str:
    """Line grouping (|dy| < 2pt) + per-line heading prefix / bold runs /
    linkify rendering (markdown.rs:246-376); shared by the span and char
    paths."""
    md_parts: list[str] = []

    def md_last_char() -> str | None:
        for part in reversed(md_parts):
            if part:
                return part[-1]
        return None

    def render_line(line_indices: list[int]) -> None:
        if not line_indices:
            return
        level = levels[line_indices[0]]
        if level == H1:
            md_parts.append("# ")
        elif level == H2:
            md_parts.append("## ")
        elif level == H3:
            md_parts.append("### ")
        i = 0
        while i < len(line_indices):
            is_bold = blocks[line_indices[i]].bold
            j = i + 1
            while j < len(line_indices) and blocks[line_indices[j]].bold == is_bold:
                j += 1
            group_text = "".join(blocks[line_indices[k]].text for k in range(i, j))
            prev_char = md_last_char()
            next_char = (blocks[line_indices[j]].text[:1] or None) if j < len(line_indices) else None
            first_char = group_text[:1] or None
            last_char = group_text[-1:] or None
            use_markers = (is_bold
                           and should_insert_bold_marker(prev_char, first_char)
                           and should_insert_bold_marker(last_char, next_char))
            if use_markers:
                md_parts.append("**")
            md_parts.append(clean_reference_spacing(format_links(group_text)))
            if use_markers:
                md_parts.append("**")
            i = j
        if level in (H1, H2, H3):
            md_parts.append("\n\n")
        else:
            md_parts.append("\n")

    current_line: list[int] = []
    current_y: float | None = None
    for idx in ordered:
        by = blocks[idx].y
        if current_y is not None and abs(current_y - by) < 2.0:
            current_line.append(idx)
        else:
            render_line(current_line)
            current_line = [idx]
            current_y = by
    render_line(current_line)

    return cleanup_markdown("".join(md_parts))
