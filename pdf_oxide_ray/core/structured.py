"""Structured document extraction (R7): spans -> semantic elements.

Re-implements the computation of ``StructuredExtractor``
(``/root/reference/src/extractors/structured.rs:188-741``):

* font-size clustering (descending unique sizes, 0.5pt dedup, k<=6 groups;
  only sizes >= min_header_size become header clusters)
* block classification: cluster match within 1pt -> Header(level) if the
  cluster id < max_header_levels and size >= min_header_size, else
  Paragraph
* list detection: bullet markers (• - * ◦ ▪ ►), "(a)"/"(1)" parens,
  "1." / "a)" prefixes (<=4 chars); consecutive same-ordered items group
* alignment: |left-right margin| < 10 -> center; left < 50 -> left;
  right < 50 -> right
* metadata counts; JSON-serializable dict output (serde twin)
"""

from __future__ import annotations

from dataclasses import dataclass

from .interpret import TextSpan

BULLET_MARKERS = set("•-*◦▪►")


@dataclass
class ExtractorConfig:
    """structured.rs:195-218."""

    min_header_size: float = 14.0
    max_header_levels: int = 6
    paragraph_gap_threshold: float = 1.5
    detect_lists: bool = True
    detect_tables: bool = False


def detect_list_marker(text: str) -> tuple[bool, int] | None:
    """Returns (is_ordered, marker_len) or None (structured.rs:505-546)."""
    if not text:
        return None
    first = text[0]
    if first in BULLET_MARKERS:
        return (False, len(first.encode("utf-8")) and 1)
    b = text.encode("utf-8")
    if b[0:1] == b"(":
        end = 1
        while end < len(b) and chr(b[end]).isalnum() and b[end] < 128:
            end += 1
        if end < len(b) and b[end:end + 1] == b")":
            return (True, end + 1)
    idx = 0
    while idx < len(b) and (chr(b[idx]).isdigit() or
                            (97 <= b[idx] <= 122)):
        idx += 1
    if 0 < idx < len(b) and b[idx:idx + 1] in (b".", b")") and idx <= 4:
        return (True, idx + 1)
    return None


def _cluster_font_sizes(sizes: list[float],
                        min_header_size: float) -> dict[int, float]:
    """structured.rs:330-376: unique sizes desc (0.5 dedup), k<=6 groups by
    rank, representative = max size in group (only >= min_header_size)."""
    if not sizes:
        return {}
    uniq: list[float] = []
    for s in sorted(sizes, reverse=True):
        if not uniq or abs(uniq[-1] - s) >= 0.5:
            uniq.append(s)
    if not uniq:
        return {}
    k = min(6, len(uniq))
    import math
    group_size = math.ceil(len(uniq) / k)
    clusters: dict[int, float] = {}
    for i, size in enumerate(uniq):
        cid = min(i // group_size, k - 1)
        if size >= min_header_size:
            clusters[cid] = max(clusters.get(cid, 0.0), size)
    return clusters


def _detect_alignment(x: float, width: float, page_width: float) -> str:
    """structured.rs:579-593."""
    left_margin = x
    right_margin = page_width - (x + width)
    if abs(left_margin - right_margin) < 10.0:
        return "center"
    if left_margin < 50.0:
        return "left"
    if right_margin < 50.0:
        return "right"
    return "left"


def _style(span_like: dict) -> dict:
    font = span_like.get("font", "")
    return {
        "font_family": font,
        "font_size": float(span_like.get("size", 12.0)),
        "bold": bool(span_like.get("bold")) or "Bold" in font,
        "italic": "Italic" in font or "Oblique" in font,
    }


def extract_structured(spans: list[TextSpan],
                       config: ExtractorConfig | None = None) -> dict:
    """spans -> StructuredDocument dict (structured.rs:247-294 pipeline).

    Output: {elements: [...], page_size: (w,h), metadata: {...}} where each
    element is a tagged dict mirroring the serde JSON layout
    (structured.rs:61-113)."""
    config = config or ExtractorConfig()
    if not spans:
        return {"elements": [], "page_size": (0.0, 0.0),
                "metadata": {"element_count": 0, "header_count": 0,
                             "paragraph_count": 0, "list_count": 0,
                             "table_count": 0}}

    blocks = [{"x": s.x, "y": s.y, "w": s.width, "h": s.height,
               "text": s.text, "size": s.font_size, "font": s.font_name,
               "bold": s.bold} for s in spans]

    clusters = _cluster_font_sizes([b["size"] for b in blocks],
                                   config.min_header_size)

    def classify(b: dict) -> int | None:
        """Header level (1-based) or None=paragraph
        (structured.rs:378-413)."""
        for cid, rep in clusters.items():
            if abs(b["size"] - rep) < 1.0:
                if cid < config.max_header_levels and \
                        b["size"] >= config.min_header_size:
                    return cid + 1
                return None
        return None

    classified = [(b, classify(b)) for b in blocks]

    elements: list[dict] = []
    i = 0
    while i < len(classified):
        b, level = classified[i]
        trimmed = b["text"].strip()
        marker = detect_list_marker(trimmed) if config.detect_lists else None
        if marker is not None:
            is_ordered, mlen = marker
            items = [{"text": trimmed[mlen:].strip(), "style": _style(b),
                      "bbox": (b["x"], b["y"], b["w"], b["h"])}]
            bbox = [b["x"], b["y"], b["w"], b["h"]]
            i += 1
            while i < len(classified):
                nb, _ = classified[i]
                nt = nb["text"].strip()
                nm = detect_list_marker(nt)
                if nm is None or nm[0] != is_ordered:
                    break
                items.append({"text": nt[nm[1]:].strip(), "style": _style(nb),
                              "bbox": (nb["x"], nb["y"], nb["w"], nb["h"])})
                x1 = max(bbox[0] + bbox[2], nb["x"] + nb["w"])
                y1 = max(bbox[1] + bbox[3], nb["y"] + nb["h"])
                bbox[0] = min(bbox[0], nb["x"])
                bbox[1] = min(bbox[1], nb["y"])
                bbox[2] = x1 - bbox[0]
                bbox[3] = y1 - bbox[1]
                i += 1
            elements.append({"type": "list", "items": items,
                             "ordered": is_ordered, "bbox": tuple(bbox)})
            continue
        if level is not None:
            elements.append({"type": "header", "level": level,
                             "text": b["text"], "style": _style(b),
                             "bbox": (b["x"], b["y"], b["w"], b["h"])})
        else:
            page_width = b["x"] + b["w"] + 100.0
            elements.append({
                "type": "paragraph", "text": b["text"], "style": _style(b),
                "bbox": (b["x"], b["y"], b["w"], b["h"]),
                "alignment": _detect_alignment(b["x"], b["w"], page_width)})
        i += 1

    max_x = max(s.x + s.width for s in spans)
    max_y = max(s.y + s.height for s in spans)
    counts = {"header": 0, "paragraph": 0, "list": 0, "table": 0}
    for el in elements:
        counts[el["type"]] += 1
    return {
        "elements": elements,
        "page_size": (max_x, max_y),
        "metadata": {"element_count": len(elements),
                     "header_count": counts["header"],
                     "paragraph_count": counts["paragraph"],
                     "list_count": counts["list"],
                     "table_count": counts["table"]},
    }


def structured_to_plain_text(doc: dict) -> str:
    """structured.rs:698-733: headers/paragraphs newline-joined; list items
    rendered with '- ' / 'N. ' prefixes."""
    parts: list[str] = []
    for el in doc["elements"]:
        if el["type"] == "header":
            parts.append(el["text"])
        elif el["type"] == "paragraph":
            parts.append(el["text"])
        elif el["type"] == "list":
            for n, item in enumerate(el["items"], 1):
                prefix = f"{n}. " if el["ordered"] else "- "
                parts.append(prefix + item["text"])
    return "\n".join(parts)
