"""Within-payload span post-processing (P1-P3).

Re-implements the computation of the reference span pipeline that runs at the
end of ``extract_text_spans`` (``/root/reference/src/extractors/text.rs``):

* P1 column-aware reading-order sort: ``sort_spans_by_reading_order``
  (``text.rs:732-764``), ``detect_span_columns`` (``text.rs:789-865``),
  ``sort_spans_by_columns`` (``text.rs:870-907``), ``simple_sort_spans``
  (``text.rs:767-784``)
* P2 overlap dedup (bold/shadow double render): 2pt rule
  (``text.rs:912-955``)
* P3 adjacent-span merge + space insertion (``text.rs:966-1124``) with the
  camelCase/digit-boundary heuristic ``should_insert_space_heuristic``
  (``text.rs:2643-2666``)

These are *within-document* operations: in the Ray pipeline they run inside
the extract UDF on one row's spans — never as cluster-wide shuffles.
"""

from __future__ import annotations

from .graphics import round_half_away
from .interpret import TextSpan


def sort_spans_by_reading_order(spans: list[TextSpan]) -> list[TextSpan]:
    """P1 (reference text.rs:732-764)."""
    if not spans:
        return spans
    columns = detect_span_columns(spans)
    if len(columns) <= 1:
        return simple_sort_spans(spans)
    return sort_spans_by_columns(spans, columns)


def simple_sort_spans(spans: list[TextSpan]) -> list[TextSpan]:
    """Y-rounded desc then X asc; stable (Rust sort_by is stable, so is
    Python's sorted). reference text.rs:767-784."""
    return sorted(spans, key=lambda s: (-round_half_away(s.y), s.x))


def detect_span_columns(spans: list[TextSpan]) -> list[tuple[float, float]]:
    """100-bin X histogram gap detection (reference text.rs:789-865).
    Range increments via a difference array + running sum (one add per
    span endpoint instead of one per covered bin; numpy loses here — a
    page has only tens of spans, far below vectorization break-even)."""
    if not spans:
        return []
    min_x = min(s.x for s in spans)
    max_x = max(s.x + s.width for s in spans)
    page_width = max_x - min_x
    bins = 100
    if page_width <= 0.0:
        return [(min_x, max_x)]
    bin_width = page_width / bins
    diff = [0] * (bins + 1)
    for s in spans:
        start_bin = int((s.x - min_x) / bin_width)
        if start_bin < 0 or start_bin >= bins:
            continue
        end_bin = min(int((s.x + s.width - min_x) / bin_width), bins - 1)
        if end_bin < start_bin:
            continue
        diff[start_bin] += 1
        diff[end_bin + 1] -= 1
    histogram = []
    acc = 0
    for i in range(bins):
        acc += diff[i]
        histogram.append(acc)

    avg_density = sum(histogram) / bins
    gap_threshold = max(avg_density * 0.2, 1.0)

    gaps: list[float] = []
    in_gap = False
    gap_start = 0
    for i, count in enumerate(histogram):
        if count <= gap_threshold:
            if not in_gap:
                gap_start = i
                in_gap = True
        elif in_gap:
            gap_width = (i - gap_start) * bin_width
            if gap_width > page_width * 0.05:
                gaps.append(min_x + gap_start * bin_width)
            in_gap = False

    if not gaps:
        return [(min_x, max_x)]
    columns = []
    left = min_x
    for gx in gaps:
        columns.append((left, gx))
        left = gx
    columns.append((left, max_x))
    return columns


def sort_spans_by_columns(spans: list[TextSpan],
                          columns: list[tuple[float, float]]) -> list[TextSpan]:
    """Assign by bbox center, sort within column, concat left->right
    (reference text.rs:870-907)."""
    column_spans: list[list[TextSpan]] = [[] for _ in columns]
    for s in spans:
        cx = s.x + s.width / 2.0
        idx = 0
        for i, (left, right) in enumerate(columns):
            if left <= cx <= right:
                idx = i
                break
        column_spans[idx].append(s)
    out: list[TextSpan] = []
    for col in column_spans:
        out.extend(sorted(col, key=lambda s: (-round_half_away(s.y), s.x)))
    return out


def deduplicate_overlapping_spans(spans: list[TextSpan]) -> list[TextSpan]:
    """P2 (reference text.rs:912-955): drop span if same rounded Y as the
    previously KEPT span and |x - prev_x| < 2pt."""
    out: list[TextSpan] = []
    prev_y: int | None = None
    prev_x: float | None = None
    for s in spans:
        y_rounded = round_half_away(s.y)
        if prev_y is not None and y_rounded == prev_y and abs(s.x - prev_x) < 2.0:
            continue
        out.append(s)
        prev_y = y_rounded
        prev_x = s.x
    return out


def _should_insert_space_heuristic(current_text: str, next_text: str) -> bool:
    """reference text.rs:2643-2666."""
    if not current_text or not next_text:
        return False
    last = current_text[-1]
    first = next_text[0]
    if last.islower() and first.isupper():
        prev_is_upper = len(current_text) >= 2 and current_text[-2].isupper()
        return not prev_is_upper
    if last.isnumeric() and first.isalpha():
        return True
    if last.isalpha() and first.isnumeric():
        return True
    return False


def _copy_span(s: TextSpan) -> TextSpan:
    """Direct-constructor copy (dataclasses.replace was a measured hotspot
    at ~59k calls/3k payloads)."""
    return TextSpan(text=s.text, x=s.x, y=s.y, width=s.width, height=s.height,
                    font_name=s.font_name, font_size=s.font_size, bold=s.bold,
                    mcid=s.mcid, sequence=s.sequence)


def merge_adjacent_spans(spans: list[TextSpan]) -> list[TextSpan]:
    """P3 (reference text.rs:966-1124)."""
    if not spans:
        return spans
    merged: list[TextSpan] = []
    current: TextSpan | None = None
    for span in spans:
        if current is None:
            current = _copy_span(span)
            continue
        y_diff = abs(span.y - current.y)
        same_line = y_diff < 1.0
        current_end_x = current.x + current.width
        gap = span.x - current_end_x
        large_gap_indicates_column = gap > 5.0
        should_merge = (same_line and -0.5 <= gap < 3.0
                        and not large_gap_indicates_column)
        if should_merge:
            space_threshold = current.font_size * 0.25
            needs_space = (gap > space_threshold
                           or _should_insert_space_heuristic(current.text, span.text)
                           or gap > 0.1)
            if needs_space:
                current.text = f"{current.text} {span.text}"
            else:
                current.text = f"{current.text}{span.text}"
            current.width = (span.x + span.width) - current.x
            current.height = max(current.height, span.height)
        else:
            merged.append(current)
            current = _copy_span(span)
    if current is not None:
        merged.append(current)
    return merged


def postprocess_spans(spans: list[TextSpan]) -> list[TextSpan]:
    """P1 -> P2 -> P3 in reference order (text.rs:628-638)."""
    spans = sort_spans_by_reading_order(spans)
    spans = deduplicate_overlapping_spans(spans)
    spans = merge_adjacent_spans(spans)
    return spans
