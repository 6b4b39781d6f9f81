"""Plain-text assembly from ordered spans (R1).

Re-implements the computation of the reference's ``extract_text``
(``/root/reference/src/document.rs:1653-1718``) and ``should_insert_space``
(``document.rs:1738-1760``):

walk ordered spans; Y gap > 2pt -> 1-3 newlines (count = y_diff /
(1.2 * max(font_size, 10)), rounded, clamped 1..3); same line -> insert a
space iff gap > 0.25 * font_size and gap < 5 * font_size; finish with
``cleanup_plain_text`` (R5).
"""

from __future__ import annotations

from .cleanup import cleanup_plain_text
from .graphics import round_half_away
from .interpret import TextSpan


def should_insert_space(prev: TextSpan, cur: TextSpan) -> bool:
    """reference document.rs:1738-1760."""
    font_size = max(prev.font_size, cur.font_size, 1.0)
    y_diff = abs(prev.y - cur.y)
    if y_diff > font_size * 0.3:
        return False
    gap = cur.x - (prev.x + prev.width)
    space_threshold = font_size * 0.25
    return gap > space_threshold and gap < font_size * 5.0


def assemble_text(spans: list[TextSpan]) -> str:
    """reference extract_text span-walk (document.rs:1683-1716)."""
    if not spans:
        return ""
    parts: list[str] = []
    prev: TextSpan | None = None
    for span in spans:
        if prev is not None:
            y_diff = abs(prev.y - span.y)
            if y_diff > 2.0:
                font_size = max(span.font_size, 10.0)
                line_height = font_size * 1.2
                num_breaks = round_half_away(y_diff / line_height)
                parts.append("\n" * min(max(num_breaks, 1), 3))
            elif should_insert_space(prev, span):
                parts.append(" ")
        parts.append(span.text)
        prev = span
    return cleanup_plain_text("".join(parts))
