"""ToUnicode CMap parser (M6).

Re-implements the computation of ``/root/reference/src/fonts/cmap.rs``:
``parse_tounicode_cmap`` (``cmap.rs:90-122``) over ``bfchar``/``bfrange``
sections, including UTF-16 surrogate-pair targets and multi-char (ligature)
targets (``cmap.rs:37-52``), and both bfrange forms (sequential destination
and per-code destination array).

A CMap is ``dict[int, str]`` (char code -> Unicode string).
"""

from __future__ import annotations

import re

_RE_BFCHAR = re.compile(r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_RE_BFRANGE_SEQ = re.compile(r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_RE_BFRANGE_ARR = re.compile(
    r"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[((?:\s*<[0-9A-Fa-f]+>\s*)+)\]"
)
_RE_HEX_ITEM = re.compile(r"<([0-9A-Fa-f]+)>")


def _decode_utf16_surrogate_pair(value: int) -> str | None:
    """reference cmap.rs decode_utf16_surrogate_pair."""
    high = (value >> 16) & 0xFFFF
    low = value & 0xFFFF
    if 0xD800 <= high <= 0xDBFF and 0xDC00 <= low <= 0xDFFF:
        cp = 0x10000 + ((high & 0x3FF) << 10) + (low & 0x3FF)
        try:
            return chr(cp)
        except ValueError:
            return None
    try:
        return chr(value)
    except ValueError:
        return None


def _chr_or_none(cp: int) -> str | None:
    if 0xD800 <= cp <= 0xDFFF or cp > 0x10FFFF:
        return None
    return chr(cp)


def _decode_dst_hex(dst_hex: str) -> str | None:
    """Destination decode per reference cmap.rs parse_bfchar_line:
    <=4 hex digits: single code point; ==8: surrogate pair else two code
    points; >8: 4-digit chunks (ligatures)."""
    if len(dst_hex) <= 4:
        return _chr_or_none(int(dst_hex, 16))
    if len(dst_hex) == 8:
        val = int(dst_hex, 16)
        decoded = _decode_utf16_surrogate_pair(val)
        if decoded is not None:
            return decoded
        out = ""
        for i in (0, 4):
            ch = _chr_or_none(int(dst_hex[i : i + 4], 16))
            if ch:
                out += ch
        return out or None
    out = ""
    for i in range(0, len(dst_hex), 4):
        ch = _chr_or_none(int(dst_hex[i : i + 4], 16))
        if ch:
            out += ch
    return out or None


def parse_tounicode_cmap(data: bytes | str) -> dict[int, str]:
    """Parse a ToUnicode CMap stream into ``{code: unicode_string}``."""
    content = data.decode("utf-8", errors="replace") if isinstance(data, bytes) else data
    cmap: dict[int, str] = {}

    for section in _extract_sections(content, "beginbfchar", "endbfchar"):
        for line in section.splitlines():
            m = _RE_BFCHAR.search(line)
            if not m:
                continue
            try:
                src = int(m.group(1), 16)
            except ValueError:
                continue
            dst = _decode_dst_hex(m.group(2))
            if dst is not None:
                cmap[src] = dst

    for section in _extract_sections(content, "beginbfrange", "endbfrange"):
        for line in section.splitlines():
            for src, dst in _parse_bfrange_line(line):
                cmap[src] = dst

    return cmap


def _extract_sections(content: str, begin: str, end: str) -> list[str]:
    """reference cmap.rs extract_sections."""
    sections = []
    rest = content
    while True:
        i = rest.find(begin)
        if i < 0:
            break
        after = rest[i + len(begin) :]
        j = after.find(end)
        if j < 0:
            break
        sections.append(after[:j])
        rest = after[j + len(end) :]
    return sections


def _parse_bfrange_line(line: str) -> list[tuple[int, str]]:
    """Both bfrange forms; array form tried first (reference order)."""
    m = _RE_BFRANGE_ARR.search(line)
    if m:
        try:
            start = int(m.group(1), 16)
            end = int(m.group(2), 16)
        except ValueError:
            return []
        out = []
        for k, item in enumerate(_RE_HEX_ITEM.findall(m.group(3))):
            if start + k > end:
                break
            dst = _decode_dst_hex(item)
            if dst is not None:
                out.append((start + k, dst))
        return out

    m = _RE_BFRANGE_SEQ.search(line)
    if m:
        try:
            start = int(m.group(1), 16)
            end = int(m.group(2), 16)
            base = int(m.group(3), 16)
        except ValueError:
            return []
        if end < start or end - start > 0x10000:
            return []
        out = []
        for k in range(end - start + 1):
            ch = _chr_or_none(base + k)
            if ch is not None:
                out.append((start + k, ch))
        return out
    return []
